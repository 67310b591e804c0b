#!/bin/sh
# Round-5 queue #2 (post split-gather + bf16-prefilter commit):
# 1. F=49 envelope (re-run after the alignment-gate fix)
# 2. fresh device trace at committed defaults (new budget ground truth)
# 3. headline bench x2 (same-queue phases)
set -x
cd /root/repo
timeout 1700 python bench.py --filters 49            > /tmp/r5_f49b.log 2>&1
tail -4 /tmp/r5_f49b.log
timeout 1700 python -u scratch/trace_step.py   > /tmp/r5_trace2.log 2>&1
timeout 600  python scratch/parse_xplane.py   >> /tmp/r5_trace2.log 2>&1
timeout 1200 python bench.py  > /tmp/r5_head1.log 2>&1
timeout 1200 python bench.py >> /tmp/r5_head1.log 2>&1
grep stars_per_sec /tmp/r5_head1.log
echo QUEUE2_DONE
