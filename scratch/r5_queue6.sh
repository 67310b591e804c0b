#!/bin/bash
# Round-5 TPU queue 6: waits for queue5, then
#  1. interleaved A/B: --prefilter-block 8 vs default (slice-rate fix)
#  2. B=256 batch-size probe (fixed per-batch costs amortize 2x)
#  3. trace of the SCANNED step (the ~2.7 ms scan-mode wall gap)
set -x
cd /root/repo
while ! grep -q QUEUE5_DONE /tmp/r5_queue5.log 2>/dev/null; do sleep 20; done
timeout 1800 python bench.py --prefilter-block 8 > /tmp/r5_pblk8_a.log 2>&1
grep stars_per_sec /tmp/r5_pblk8_a.log
timeout 1200 python bench.py > /tmp/r5_ref_a.log 2>&1
grep stars_per_sec /tmp/r5_ref_a.log
timeout 1200 python bench.py --prefilter-block 8 > /tmp/r5_pblk8_b.log 2>&1
grep stars_per_sec /tmp/r5_pblk8_b.log
timeout 1800 python bench.py --batch 256 > /tmp/r5_b256.log 2>&1
grep stars_per_sec /tmp/r5_b256.log
timeout 1200 python bench.py --batch 256 --prefilter-block 8 > /tmp/r5_b256_pblk.log 2>&1
grep stars_per_sec /tmp/r5_b256_pblk.log
timeout 1700 python -u scratch/trace_scan.py > /tmp/r5_trace_scan.log 2>&1
tail -4 /tmp/r5_trace_scan.log
timeout 600 python scratch/parse_xplane.py $(find /tmp/jax_trace_scan -name '*.xplane.pb' -printf '%T@ %p\n' 2>/dev/null | sort -rn | head -1 | cut -d' ' -f2) > /tmp/r5_trace_scan_parse.log 2>&1
head -40 /tmp/r5_trace_scan_parse.log
echo QUEUE6_DONE
