#!/bin/bash
# Stage 9: finish the round-3 measurement program on the chains stage
# 8f/8g left behind.
#  (a) 32^2 beta=6 plain (nstep, tau) probe at EQUILIBRIUM (warm start
#      from the converged 79-tau chain) — the direct chain ran at
#      tau=2/n16 with acc 0.978, which is over-provisioned; the earlier
#      cold-start n8 re-time row (acc 0.02 at plaq 0.996) was measured
#      un-thermalized and decides nothing.
#  (b) beta=8 16^2 plain (nstep, tau) probe, warm from the stage-8g
#      mobility run — plain's own cost-optimum for the mobility-relation
#      tau estimate (acc was 0.41 at tau=2/n8).
#  (c) beta=8 FT chain extension 98k -> 262k trajectories: the 19-tau
#      chain (tau_FT = 3813) is under the >=40-tau convergence bar that
#      BENCH.md's own convergence study established.
#  (d) 32^2 FT chain extension 8k -> 16k (26 -> ~50 tau), xla backend
#      (measured faster than fused for the 32^2 FT row: 0.188 vs 0.260
#      s/traj).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 9 ==="
fi

FLOW=artifacts/flow8x8_b3_rncp24_ftb6

# (a) 32^2 plain equilibrium probe
timeout 3000 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L32_plain_probe --L 32 --beta 6 --mass 0.1 \
  --chains 64 --ntraj 1024 --call-block 128 \
  --cg-maxiter 2000 --cg-backend fused \
  --plain-state runs/schw_L32_plain_tauint/run_state.npz \
  --row plain:8:0:tau=2.0 --row plain:10:0:tau=2.0 \
  --row plain:12:0:tau=2.0 --row plain:16:0:tau=2.0 \
  --row plain:24:0:tau=3.0 --row plain:32:0:tau=4.0
echo "=== stage9a exit $? ==="
cp runs/schw_L32_plain_probe/scan.json \
   artifacts/round3/probe_L32_plain.json 2>/dev/null
sleep 30

# (b) beta=8 plain equilibrium probe (mobility needs statistics: the
#     timed pass is 16k traj x 128 chains per row)
timeout 3600 python experiments/schwinger_mts_scan.py \
  --out runs/schw_b8_plain_probe --L 16 --beta 8 --mass 0.1 \
  --chains 128 --ntraj 16384 --call-block 4096 \
  --cg-maxiter 1500 --cg-backend fused \
  --plain-state runs/schw_b8_plain_mob/run_state.npz \
  --row plain:8:0:tau=2.0 --row plain:10:0:tau=2.0 \
  --row plain:12:0:tau=2.0 --row plain:12:0:tau=3.0
echo "=== stage9b exit $? ==="
cp runs/schw_b8_plain_probe/scan.json \
   artifacts/round3/probe_b8_plain.json 2>/dev/null
sleep 30

# (c) beta=8 FT chain extension (resumes run_state.npz at 98304)
for i in 1 2 3 4; do
  timeout 3300 python experiments/schwinger_tauint.py \
    --ckpt $FLOW --L 16 --beta 8 --mass 0.1 --tau 0.5 --nstep 4 \
    --integrator omelyan --chains 128 --ntraj 262144 --block 2048 \
    --block-timeout 900 --cg-maxiter 1500 --cg-backend fused \
    --start cold --out runs/schw_b8_ft
  rc=$?
  echo "=== stage9c FT slice $i exit $rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
cp runs/schw_b8_ft/results.json \
   artifacts/round3/schwinger_b8_ft_ftb6_t05n4_ext.json 2>/dev/null
sleep 30

# (d) 32^2 FT chain, fresh (the old resume dir was cleaned up):
#     thermalized start = the converged plain chain's physical configs
#     mapped to latent space by the flow inverse, so a 12k-trajectory
#     chain is ~49 tau of usable statistics at therm-frac 0.05.
#     xla backend (measured faster than fused for the 32^2 FT row).
for i in 1 2 3; do
  timeout 3300 python experiments/schwinger_tauint.py \
    --ckpt $FLOW --L 32 --beta 6 --mass 0.1 --tau 0.5 --nstep 6 \
    --integrator omelyan --chains 64 --ntraj 12288 --block 128 \
    --block-timeout 900 --cg-maxiter 1000 --cg-backend xla \
    --init-state runs/schw_L32_plain_tauint/run_state.npz \
    --therm-frac 0.05 --out runs/schw_L32_ft2
  rc=$?
  echo "=== stage9d FT slice $i exit $rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
cp runs/schw_L32_ft2/results.json \
   artifacts/round3/schwinger_L32_b6_ft_t05n6_ext2.json 2>/dev/null
echo "=== stage 9 done ==="
