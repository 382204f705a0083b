#!/bin/bash
# Per-variant subprocess isolation for bench_1m: a wedged tunnel op kills
# only that variant's process; we poll liveness and move on. Usage:
#   bash benchmarks/run_1m_campaign.sh [variant ...]
set -o pipefail
cd "$(dirname "$0")/.."
VARIANTS=("$@")
if [ ${#VARIANTS[@]} -eq 0 ]; then
  VARIANTS=(fused_full fused_tight presort_tight exact2pass_tight \
            fused_tight_tiletest presort_tight_tiletest \
            fused_tight_group2 presort_tight_group2 \
            fused_tight_group4 presort_tight_group4 \
            fused_tight_group2_tt fused_tight_group4_tt)
fi
probe() {
  timeout 60 python -c "
import jax, jax.numpy as jnp
jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128))).block_until_ready()" \
    >/dev/null 2>&1
}
wait_alive() {
  for i in $(seq 1 12); do
    probe && return 0
    echo "[campaign] device not responding, waiting ($i)..."
    sleep 45
  done
  return 1
}
for v in "${VARIANTS[@]}"; do
  wait_alive || { echo "[campaign] device never recovered; abort"; exit 1; }
  echo "[campaign] === $v ==="
  GSPLAT_VARIANTS="$v" PYTHONUNBUFFERED=1 timeout "${VARIANT_TIMEOUT:-1500}" \
    python benchmarks/bench_1m.py "${N_GAUSSIANS:-1048576}" \
    2>&1 | stdbuf -oL grep -v WARNING
  rc=$?
  [ $rc -ne 0 ] && echo "[campaign] $v exited rc=$rc"
done
