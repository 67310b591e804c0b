#!/bin/bash
# Round-5 TPU queue 9: kernel-pack A/B + new device-budget trace.
#   1. bench, kernel_pack ON (new default; first run pays the Mosaic
#      compile of the stacked fit kernel)
#   2. bench --no-kernel-pack (the round-5a XLA-restack path)
#   3. bench ON again (phase bracket)
#   4. trace of the scanned step + parse (new device budget)
set -x
cd /root/repo
until timeout 120 python -c "
import jax, jax.numpy as jnp
print(jnp.ones((8,128)).sum())" >/dev/null 2>&1; do
  echo "tunnel still wedged $(date +%H:%M)"; sleep 120
done
echo "tunnel healthy $(date +%H:%M)"
timeout 1800 python bench.py > /tmp/r5_pack_on.log 2>&1
grep stars_per_sec /tmp/r5_pack_on.log || tail -5 /tmp/r5_pack_on.log
timeout 1800 python bench.py --no-kernel-pack > /tmp/r5_pack_off.log 2>&1
grep stars_per_sec /tmp/r5_pack_off.log || tail -5 /tmp/r5_pack_off.log
timeout 1500 python bench.py > /tmp/r5_pack_on2.log 2>&1
grep stars_per_sec /tmp/r5_pack_on2.log || tail -5 /tmp/r5_pack_on2.log
TRACE_B=128 TRACE_LOGDIR=/tmp/jax_trace_pack timeout 1700 python -u scratch/trace_scan.py > /tmp/r5_trace_pack.log 2>&1
tail -4 /tmp/r5_trace_pack.log
timeout 600 python scratch/parse_xplane.py $(find /tmp/jax_trace_pack -name '*.xplane.pb' -printf '%T@ %p\n' 2>/dev/null | sort -rn | head -1 | cut -d' ' -f2) > /tmp/r5_trace_pack_parse.log 2>&1
head -40 /tmp/r5_trace_pack_parse.log
echo QUEUE9_DONE
