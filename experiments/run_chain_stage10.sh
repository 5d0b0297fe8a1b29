#!/bin/bash
# Stage 10: round-3 wrap-up measurements.
#  (a) beta=9 16^2 mobility pair: the wall-clock verdict ratio
#      eff_FT/eff_plain = (mob_FT/s_FT)/(mob_plain/s_plain) is chi_Q-
#      and r-free (both cancel in tau_FT/tau_plain), so a mobility pair
#      extends the ladder one more rung with NO convergence-length chain.
#      Both sides warm from the beta=8 states; the untimed mts-scan pass
#      re-equilibrates the beta shift.
#  (b) CG cost map pushed to m <= 0.01 at L = 32/64 (ROADMAP round-4
#      item: the true CG-dominated scaling regime).
#  (c) 64^2 plain chain extension 8k -> 24k trajectories (18 -> ~40 tau;
#      it anchors the 64^2 verdict AND the r calibration at 64^2).
# Queued behind stage 9f (WAIT_PID).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 10 ==="
fi

FLOW=artifacts/flow8x8_b3_rncp24_ftb6

# (a) beta=9 mobility pair
timeout 1500 python experiments/schwinger_mts_scan.py \
  --out runs/schw_b9_plain_mob --L 16 --beta 9 --mass 0.1 \
  --chains 128 --ntraj 24576 --call-block 4096 \
  --cg-maxiter 1500 --cg-backend fused \
  --plain-state runs/schw_b8_plain_mob_n10/run_state.npz \
  --row plain:10:0:tau=2.0
echo "=== stage10a-plain exit $? ==="
cp runs/schw_b9_plain_mob/scan.json \
   artifacts/round3/probe_b9_plain.json 2>/dev/null
sleep 30
timeout 2400 python experiments/schwinger_mts_scan.py \
  --out runs/schw_b9_ft_mob --L 16 --beta 9 --mass 0.1 \
  --chains 128 --ntraj 16384 --call-block 2048 \
  --cg-maxiter 1500 --cg-backend fused \
  --ft-state runs/schw_b8_ft/run_state.npz \
  --row ft:4:0:$FLOW:tau=0.5 --row ft:3:0:$FLOW:tau=0.5
echo "=== stage10a-ft exit $? ==="
cp runs/schw_b9_ft_mob/scan.json \
   artifacts/round3/probe_b9_ft.json 2>/dev/null
sleep 30

# (b) CG cost map, light masses (eo + full, iterations + wall/solve)
timeout 5400 python experiments/cg_cost.py --out runs/cg_cost_light \
  --beta 6 --L 32 64 --mass 0.02 0.01 0.005 --chains 64 \
  --cg-maxiter 8000
echo "=== stage10b exit $? ==="
cp runs/cg_cost_light/cg_cost.json \
   artifacts/round3/cg_cost_light.json 2>/dev/null
sleep 30

# (c) 64^2 plain chain extension (resumes at 8192)
for i in 1 2 3; do
  timeout 3300 python experiments/schwinger_tauint.py \
    --L 64 --beta 6 --mass 0.1 --tau 2.0 --nstep 16 --integrator omelyan \
    --chains 64 --ntraj 24576 --block 256 --block-timeout 900 \
    --cg-maxiter 2000 --cg-backend fused \
    --start hot --out runs/schw_L64_plain_ext
  rc=$?
  echo "=== stage10c slice $i exit $rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
cp runs/schw_L64_plain_ext/results.json \
   artifacts/round3/schwinger_L64_b6_plain_t2n16_ext.json 2>/dev/null
echo "=== stage 10 done ==="
