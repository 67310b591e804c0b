#!/bin/bash
# Round-5 TPU queue 10: cheap high-value A/Bs at the current healthy
# phase, each bracketed by a default-config reference:
#   1. scan-batches 8 (re-test dispatch amortization post kernel-pack)
#   2. tile 1024 / tile 256 (fit+screen model-tile sweep)
set -x
cd /root/repo
until timeout 120 python -c "
import jax, jax.numpy as jnp
print(jnp.ones((8,128)).sum())" >/dev/null 2>&1; do
  echo "tunnel still wedged $(date +%H:%M)"; sleep 120
done
echo "tunnel healthy $(date +%H:%M)"
timeout 1500 python bench.py > /tmp/r5_q10_ref_a.log 2>&1
grep -o '"value": [0-9.]*' /tmp/r5_q10_ref_a.log | head -1
timeout 1500 python bench.py --scan-batches 8 > /tmp/r5_q10_scan8.log 2>&1
grep -o '"value": [0-9.]*' /tmp/r5_q10_scan8.log | head -1
timeout 1500 python bench.py > /tmp/r5_q10_ref_b.log 2>&1
grep -o '"value": [0-9.]*' /tmp/r5_q10_ref_b.log | head -1
timeout 1800 python bench.py --tile 1024 > /tmp/r5_q10_tile1024.log 2>&1
grep -o '"value": [0-9.]*' /tmp/r5_q10_tile1024.log | head -1
timeout 1500 python bench.py > /tmp/r5_q10_ref_c.log 2>&1
grep -o '"value": [0-9.]*' /tmp/r5_q10_ref_c.log | head -1
timeout 1800 python bench.py --tile 256 > /tmp/r5_q10_tile256.log 2>&1
grep -o '"value": [0-9.]*' /tmp/r5_q10_tile256.log | head -1
timeout 1500 python bench.py > /tmp/r5_q10_ref_d.log 2>&1
grep -o '"value": [0-9.]*' /tmp/r5_q10_ref_d.log | head -1
echo QUEUE10_DONE
