#!/bin/bash
# Round-5 TPU queue 7 (post-wedge): health-gate, then
#   1. reference bench (healthy-phase yardstick, warm cache)
#   2. trace of the SCANNED step + parse (the ~2.7 ms scan-mode gap)
#   3. B=256 probe + interleaved B=128 reference
#   4. XLA screen timing retry (bf16 split screen documentation)
set -x
cd /root/repo
# health gate: a trivial device op must complete in <120 s
until timeout 120 python -c "
import jax, jax.numpy as jnp
print(jnp.ones((8,128)).sum())" >/dev/null 2>&1; do
  echo "tunnel still wedged $(date +%H:%M)"; sleep 120
done
echo "tunnel healthy $(date +%H:%M)"
timeout 1500 python bench.py > /tmp/r5_ref_c.log 2>&1
grep stars_per_sec /tmp/r5_ref_c.log
timeout 1700 python -u scratch/trace_scan.py > /tmp/r5_trace_scan.log 2>&1
tail -4 /tmp/r5_trace_scan.log
timeout 600 python scratch/parse_xplane.py $(find /tmp/jax_trace_scan -name '*.xplane.pb' -printf '%T@ %p\n' 2>/dev/null | sort -rn | head -1 | cut -d' ' -f2) > /tmp/r5_trace_scan_parse.log 2>&1
head -40 /tmp/r5_trace_scan_parse.log
timeout 1800 python bench.py --batch 256 > /tmp/r5_b256.log 2>&1
grep stars_per_sec /tmp/r5_b256.log
timeout 1500 python bench.py > /tmp/r5_ref_d.log 2>&1
grep stars_per_sec /tmp/r5_ref_d.log
timeout 1800 python scratch/screen_xla_timing.py > /tmp/r5_xla_screen2.log 2>&1
tail -8 /tmp/r5_xla_screen2.log
echo QUEUE7_DONE
