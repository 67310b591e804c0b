#!/bin/sh
# Serial TPU measurement queue (tunnel serializes anyway).
set -x
cd /root/repo
timeout 1700 python bench.py --breakdown        > /tmp/tpu1_breakdown.log 2>&1
tail -12 /tmp/tpu1_breakdown.log
timeout 1200 python scratch/profile_select.py   > /tmp/tpu2_select.log 2>&1
tail -20 /tmp/tpu2_select.log
timeout 1700 python bench.py --verify           > /tmp/tpu3_verify.log 2>&1
tail -6 /tmp/tpu3_verify.log
timeout 1700 python bench.py --engine xla       > /tmp/tpu4_xla.log 2>&1
tail -4 /tmp/tpu4_xla.log
timeout 1700 python bench.py --tile 1024        > /tmp/tpu5_tile1024.log 2>&1
tail -3 /tmp/tpu5_tile1024.log
timeout 1200 python bench.py --nsel 2048 --prefilter 2048 > /tmp/tpu6_nsel2048.log 2>&1
tail -3 /tmp/tpu6_nsel2048.log
timeout 1200 python bench.py --batch 256        > /tmp/tpu7_b256.log 2>&1
tail -3 /tmp/tpu7_b256.log
echo QUEUE_DONE
