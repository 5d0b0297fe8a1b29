#!/bin/bash
# Stage 8d: 16^2 CG-backend A/B at the ladder optima — the chains-last
# fused Dirac kernel (commit 9d934ee) vs the stage-8c xla re-times, on
# identical configs/states. If cl wins, the final ladder eff/s uses it
# for BOTH samplers. Queued behind stage 8c (WAIT_PID).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 8d ==="
fi

FLOW=artifacts/flow8x8_b3_rncp24_ftb6

timeout 3600 python experiments/schwinger_mts_scan.py \
  --out runs/retime_b7_fused --L 16 --beta 7 --mass 0.1 \
  --chains 128 --ntraj 384 --cg-maxiter 1000 --cg-backend fused \
  --plain-state artifacts/round3/states/b7_plain_t2n8.npz \
  --ft-state artifacts/round3/states/b7_ft_t05n4.npz \
  --row plain:8:0:tau=2.0 \
  --row ft:4:0:$FLOW
echo "=== stage8d b7 fused exit $? ==="
cp runs/retime_b7_fused/scan.json artifacts/round3/retime_b7_fused.json 2>/dev/null
sleep 20

timeout 2400 python experiments/schwinger_mts_scan.py \
  --out runs/retime_b6_fused --L 16 --beta 6 --mass 0.1 \
  --chains 128 --ntraj 384 --cg-maxiter 1000 --cg-backend fused \
  --row plain:8:0:tau=2.0 \
  --row ft:4:0:$FLOW
echo "=== stage8d b6 fused exit $? ==="
cp runs/retime_b6_fused/scan.json artifacts/round3/retime_b6_fused.json 2>/dev/null
echo "=== stage 8d done ==="
