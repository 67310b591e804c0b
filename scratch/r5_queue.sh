#!/bin/sh
# Round-5 serial TPU measurement queue (the tunnel serializes anyway).
# 1. fresh device trace (budget ground truth at current defaults)
# 2. approx-vs-exact block select, interleaved x2 (same-queue phases)
# 3. screen_k=24576 throughput point (FUNNEL_AB default decision)
# 4. 49-band envelope (VERDICT task 6)
set -x
cd /root/repo
timeout 1700 python -u scratch/trace_step.py   > /tmp/r5_trace.log 2>&1
timeout 600  python scratch/parse_xplane.py   >> /tmp/r5_trace.log 2>&1
tail -25 /tmp/r5_trace.log
timeout 1200 python bench.py --screen-select exact   > /tmp/r5_sel_ab.log 2>&1
timeout 1200 python bench.py --screen-select approx >> /tmp/r5_sel_ab.log 2>&1
timeout 1200 python bench.py --screen-select exact  >> /tmp/r5_sel_ab.log 2>&1
timeout 1200 python bench.py --screen-select approx >> /tmp/r5_sel_ab.log 2>&1
grep stars_per_sec /tmp/r5_sel_ab.log
timeout 1200 python bench.py --screen 24576          > /tmp/r5_k24576.log 2>&1
tail -3 /tmp/r5_k24576.log
timeout 1700 python bench.py --filters 49            > /tmp/r5_f49.log 2>&1
tail -4 /tmp/r5_f49.log
echo QUEUE_DONE
