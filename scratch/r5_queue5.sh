#!/bin/bash
# Round-5 TPU queue 5: wait for the HLO dump, then measure the
# bf16-split XLA engine (VERDICT task 5 "done" bar) + same-queue
# fused reference, and the XLA screen-only timing.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r5hlo.pid) 2>/dev/null; do sleep 20; done
timeout 1800 python bench.py --engine xla > /tmp/r5_bench_xla.log 2>&1
tail -3 /tmp/r5_bench_xla.log
timeout 1200 python bench.py > /tmp/r5_bench_ref2.log 2>&1
grep stars_per_sec /tmp/r5_bench_ref2.log
timeout 1200 python scratch/screen_xla_timing.py > /tmp/r5_xla_screen.log 2>&1
tail -8 /tmp/r5_xla_screen.log
echo QUEUE5_DONE
