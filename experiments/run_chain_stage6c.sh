#!/bin/bash
# Serial TPU chain, stage 6c: corrected 64^2 pipeline.
# 1. verify_drive2: fused-vs-xla CG backend A/B of the full dynamical step
# 2. plain 64^2 thermalization from hot (doubles as the mobility probe)
# 3. invert the flow on the thermalized state -> FT latent seed
# 4. FT nstep scan FROM EQUILIBRIUM (a 64^2 cold FT start cannot
#    self-thermalize at any usable nstep - measured)
set -u
cd /root/repo
PREV_PID=$(cat /tmp/chain_s6b.pid)
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
echo "=== stage 6b done, starting stage 6c ==="

timeout 1800 python /tmp/verify_drive2.py
echo "=== verify2 exit $? ==="
sleep 30

timeout 3600 python experiments/schwinger_tauint.py \
  --L 64 --beta 6 --mass 0.1 --tau 2.0 --nstep 16 --integrator omelyan \
  --chains 64 --ntraj 768 --block 32 --block-timeout 900 --start hot \
  --out runs/schw_L64_plain_therm
echo "=== L64 plain therm/probe exit $? ==="
sleep 30

timeout 1800 python experiments/seed_ft64.py \
  --plain-state runs/schw_L64_plain_therm/run_state.npz \
  --ckpt artifacts/flow8x8_b3_rncp24_ftb6 --out runs/schw_L64_ft_seed
echo "=== seed exit $? ==="
sleep 30

timeout 5400 python experiments/schwinger_scan.py \
  --ckpt artifacts/flow8x8_b3_rncp24_ftb6 --L 64 --beta 6 --mass 0.1 \
  --tau 0.5 --plain-nsteps --ft-nsteps 8 12 16 \
  --ft-state runs/schw_L64_ft_seed/run_state.npz \
  --warmup-traj 16 --chains 64 --ntraj 96 --block 32 \
  --out runs/schw_scan_L64b6_eq
echo "=== L64 eq scan exit $? ==="
echo "=== stage 6c done ==="
