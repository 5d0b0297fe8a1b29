#!/bin/bash
# Stage 18 (round-3 session-10): two measurements the session-10 verdicts
# point at directly:
#   A) 32^2 beta=9 mobility pair — the crossover-surface projection
#      ("32^2 flips to FT at beta~9", BENCH.md session-10) converted to a
#      measurement. Warm beta=6 states; each row re-thermalizes at the
#      target beta in the untimed pass (plaq self-validates vs the exact
#      Bessel value 0.94387, and sanity_report flags a stuck chain).
#   B) 64^2 beta=6 FT optimum re-scan under the new bf16 recipe — the
#      n16 row was chosen when fp32 set the budget; with x1.25 from bf16
#      the acceptance/nstep optimum may sit coarser (n12/n10/n8), and the
#      12L lesson (high-tau_int flows prefer LONG trajectories) says try
#      tau=1 too. Closes "can FT shrink the plain x5.6 at 64^2 further?"
# Queued behind stage 17 (WAIT_PID).
set -u
cd /root/repo
FLOW=artifacts/flow8x8_b3_rncp24_ftb6
mkdir -p runs artifacts/round3

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 18 ==="
fi

echo "=== A) 32^2 beta=9 mobility pair ==="
timeout 5400 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L32b9_plain_mob --L 32 --beta 9 --mass 0.1 \
  --chains 64 --ntraj 12288 --call-block 1024 \
  --cg-maxiter 2000 --cg-backend fused \
  --plain-state runs/st32_plain/run_state.npz \
  --row plain:10:0:tau=2.0 --row plain:12:0:tau=2.0
echo "=== A1 (plain) exit $? ==="
cp runs/schw_L32b9_plain_mob/scan.json \
   artifacts/round3/probe_L32b9_plain.json 2>/dev/null
sleep 30
timeout 4500 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L32b9_ft_mob --L 32 --beta 9 --mass 0.1 \
  --chains 64 --ntraj 4096 --call-block 512 \
  --cg-maxiter 2000 --cg-backend fused \
  --ft-state runs/st32_ft/run_state.npz \
  --row ft:4:0:$FLOW:tau=0.5 --row ft:3:0:$FLOW:tau=0.5
echo "=== A2 (FT) exit $? ==="
cp runs/schw_L32b9_ft_mob/scan.json \
   artifacts/round3/probe_L32b9_ft.json 2>/dev/null
sleep 30

echo "=== B) 64^2 beta=6 FT optimum under bf16 ==="
timeout 5400 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L64_ft_opt --L 64 --beta 6 --mass 0.1 \
  --chains 32 --ntraj 256 --call-block 32 \
  --cg-maxiter 2000 --cg-backend fused --conv-dtype bfloat16 \
  --ft-state runs/st64_ft/run_state.npz \
  --row ft:12:0:$FLOW:tau=0.5 --row ft:10:0:$FLOW:tau=0.5 \
  --row ft:8:0:$FLOW:tau=0.5 --row ft:24:0:$FLOW:tau=1.0
echo "=== B exit $? ==="
cp runs/schw_L64_ft_opt/scan.json \
   artifacts/round3/probe_L64_ft_opt.json 2>/dev/null
echo "=== stage 18 done ==="
