#!/bin/sh
# Round-5 queue #3 (post 3-D coeff layout commit 02f9938):
# 1. device trace (is the 0.45 ms copy_bitcast gone? new budget)
# 2. scan-batches 4 vs 8 interleaved A/B (wall-vs-device gap)
# 3. 49-band recall probe (VERDICT task 6 accuracy half; long)
set -x
cd /root/repo
timeout 1700 python -u scratch/trace_step.py   > /tmp/r5_trace3.log 2>&1
timeout 600  python scratch/parse_xplane.py   >> /tmp/r5_trace3.log 2>&1
timeout 1200 python bench.py --scan-batches 4  > /tmp/r5_scan_ab.log 2>&1
timeout 1200 python bench.py --scan-batches 8 >> /tmp/r5_scan_ab.log 2>&1
timeout 1200 python bench.py --scan-batches 4 >> /tmp/r5_scan_ab.log 2>&1
timeout 1200 python bench.py --scan-batches 8 >> /tmp/r5_scan_ab.log 2>&1
grep stars_per_sec /tmp/r5_scan_ab.log
timeout 3000 python -u scratch/recall_f49.py 32 > /tmp/r5_recall49.log 2>&1
tail -12 /tmp/r5_recall49.log
echo QUEUE3_DONE
