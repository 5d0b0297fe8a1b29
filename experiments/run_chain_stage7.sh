#!/bin/bash
# Serial TPU chain, stage 7 (round-3 session-5): re-run of the lost stage-6c
# 64^2 dynamical pipeline, results committed to artifacts/ this time.
# 1. plain 64^2 thermalization from hot (doubles as the mobility probe)
# 2. invert the flow on the thermalized state -> FT latent seed
# 3. FT nstep scan FROM EQUILIBRIUM (a 64^2 cold FT start cannot
#    self-thermalize at any usable nstep - measured, stage 6b)
# Production tau_int chains are launched separately once the scan winner
# is known (stage 7b).
set -u
cd /root/repo

timeout 3600 python experiments/schwinger_tauint.py \
  --L 64 --beta 6 --mass 0.1 --tau 2.0 --nstep 16 --integrator omelyan \
  --chains 64 --ntraj 768 --block 32 --block-timeout 900 --start hot \
  --cg-backend fused \
  --out runs/schw_L64_plain_therm
echo "=== L64 plain therm/probe exit $? ==="
sleep 30

timeout 1800 python experiments/seed_ft64.py \
  --plain-state runs/schw_L64_plain_therm/run_state.npz \
  --ckpt artifacts/flow8x8_b3_rncp24_ftb6 --out runs/schw_L64_ft_seed
echo "=== seed exit $? ==="
sleep 30

timeout 7200 python experiments/schwinger_scan.py \
  --ckpt artifacts/flow8x8_b3_rncp24_ftb6 --L 64 --beta 6 --mass 0.1 \
  --tau 0.5 --plain-nsteps --ft-nsteps 8 12 16 \
  --ft-state runs/schw_L64_ft_seed/run_state.npz \
  --warmup-traj 16 --chains 64 --ntraj 96 --block 32 \
  --cg-backend fused \
  --out runs/schw_scan_L64b6_eq
echo "=== L64 eq scan exit $? ==="
echo "=== stage 7 done ==="
