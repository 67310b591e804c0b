#!/bin/sh
# Round-5 queue #4:
# 1. F=49 recall probe (fixed screen_block mismatch; dense chunks cached)
# 2. TPU HLO dump of the step (find copy.612's producer/consumer)
# 3. F=49 bench perf row (VERDICT task 6 perf half)
# 4. default bench (same-queue reference)
set -x
cd /root/repo
timeout 3000 python -u scratch/recall_f49.py 32 > /tmp/r5_recall49.log 2>&1
tail -14 /tmp/r5_recall49.log
timeout 1800 python -u scratch/dump_step_hlo.py > /tmp/r5_hlodump.log 2>&1
tail -20 /tmp/r5_hlodump.log
timeout 1800 python bench.py --filters 49 > /tmp/r5_bench_f49.log 2>&1
tail -3 /tmp/r5_bench_f49.log
timeout 1200 python bench.py > /tmp/r5_bench_ref.log 2>&1
grep stars_per_sec /tmp/r5_bench_ref.log
echo QUEUE4_DONE
