#!/bin/bash
# Round-5 TPU queue 8: post-pack-trim reference + B=256 pathology trace.
#   1. reference bench (after dropping lnprob from the prefilter pack)
#   2. trace of the scanned step at B=256 + parse (queue-7 interleave
#      confirmed B=256 is ~13% SLOWER per star than B=128 despite the
#      screen's weight-stream amortization — find what grew)
#   3. B=128 trace re-parse companion at the same code rev (layout diff)
#   4. reference bench again (phase bracket)
set -x
cd /root/repo
until timeout 120 python -c "
import jax, jax.numpy as jnp
print(jnp.ones((8,128)).sum())" >/dev/null 2>&1; do
  echo "tunnel still wedged $(date +%H:%M)"; sleep 120
done
echo "tunnel healthy $(date +%H:%M)"
timeout 1500 python bench.py > /tmp/r5_ref_e.log 2>&1
grep stars_per_sec /tmp/r5_ref_e.log
TRACE_B=256 TRACE_LOGDIR=/tmp/jax_trace_b256 timeout 1700 python -u scratch/trace_scan.py > /tmp/r5_trace_b256.log 2>&1
tail -4 /tmp/r5_trace_b256.log
timeout 600 python scratch/parse_xplane.py $(find /tmp/jax_trace_b256 -name '*.xplane.pb' -printf '%T@ %p\n' 2>/dev/null | sort -rn | head -1 | cut -d' ' -f2) > /tmp/r5_trace_b256_parse.log 2>&1
head -40 /tmp/r5_trace_b256_parse.log
TRACE_B=128 TRACE_LOGDIR=/tmp/jax_trace_b128 timeout 1700 python -u scratch/trace_scan.py > /tmp/r5_trace_b128.log 2>&1
tail -4 /tmp/r5_trace_b128.log
timeout 600 python scratch/parse_xplane.py $(find /tmp/jax_trace_b128 -name '*.xplane.pb' -printf '%T@ %p\n' 2>/dev/null | sort -rn | head -1 | cut -d' ' -f2) > /tmp/r5_trace_b128_parse.log 2>&1
head -40 /tmp/r5_trace_b128_parse.log
timeout 1500 python bench.py > /tmp/r5_ref_f.log 2>&1
grep stars_per_sec /tmp/r5_ref_f.log
echo QUEUE8_DONE
