#!/bin/bash
# Stage 15: bf16 conv-dtype A/B on the FT side at volume. The FT
# trajectory is flow-VJP-bound at 32^2/64^2 (the entire wall-clock gap
# vs plain at 64^2 is the 24L VJP's 1.61 s/traj), and bf16 was only
# ~13% at 16^2 where the convs are latency/overhead-bound — at 64^2
# they are bandwidth-bound, where bf16's traffic halving should show.
# Same warm latent state both dtypes; acceptance/mobility recorded (a
# bf16-collapsed acceptance would itself be the answer; MH exactness
# holds either way — bf16 changes WHICH flow runs, not detailed
# balance).
# Queued behind stage 13 (WAIT_PID).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 15 ==="
fi

FLOW=artifacts/flow8x8_b3_rncp24_ftb6

for DT in float32 bfloat16; do
  timeout 2700 python experiments/schwinger_mts_scan.py \
    --out runs/schw_L64_ft_$DT --L 64 --beta 6 --mass 0.1 \
    --chains 32 --ntraj 256 --call-block 32 \
    --cg-maxiter 2000 --cg-backend fused --conv-dtype $DT \
    --ft-state runs/schw_L64_ft_chain/run_state.npz \
    --row ft:16:0:$FLOW:tau=0.5
  echo "=== stage15 L64 $DT exit $? ==="
  cp runs/schw_L64_ft_$DT/scan.json \
     artifacts/round3/bf16ab_L64_$DT.json 2>/dev/null
  sleep 30
  timeout 1500 python experiments/schwinger_mts_scan.py \
    --out runs/schw_L32_ft_$DT --L 32 --beta 6 --mass 0.1 \
    --chains 64 --ntraj 512 --call-block 128 \
    --cg-maxiter 2000 --cg-backend fused --conv-dtype $DT \
    --ft-state runs/schw_L32_ft2/run_state.npz \
    --row ft:6:0:$FLOW:tau=0.5
  echo "=== stage15 L32 $DT exit $? ==="
  cp runs/schw_L32_ft_$DT/scan.json \
     artifacts/round3/bf16ab_L32_$DT.json 2>/dev/null
  sleep 30
done
echo "=== stage 15 done ==="
