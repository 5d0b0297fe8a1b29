#!/bin/bash
# Stage 9e: the n10 discovery, applied everywhere honesty requires.
# Stage-9a/9b probes found that plain's per-beta cost optimum at tau=2
# sits at nstep=10 (acc ~0.87), not n8 (acc 0.41-0.53) — the acceptance
# cliff between dt=1/4 and dt=1/5 was costing plain ~30-45% at 32^2 and
# beta=8. The same question must be asked at every ladder point and of
# the FT side (beta=8 FT runs at acc 0.895 — over-provisioned in the
# other direction), or the ladder's "own measured cost-optimum" claim
# is false. Probes first (cheap), then the two follow-up chains.
# Queued behind stage 9 (WAIT_PID).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 9e ==="
fi

FLOW=artifacts/flow8x8_b3_rncp24_ftb6

# (a) beta=7 plain probe at equilibrium (warm from the 262k ext40 chain)
timeout 1800 python experiments/schwinger_mts_scan.py \
  --out runs/schw_b7_plain_probe --L 16 --beta 7 --mass 0.1 \
  --chains 128 --ntraj 8192 --call-block 2048 \
  --cg-maxiter 1500 --cg-backend fused \
  --plain-state runs/schw_b7_plain_ext40/run_state.npz \
  --row plain:8:0:tau=2.0 --row plain:10:0:tau=2.0 \
  --row plain:12:0:tau=2.0
echo "=== stage9e-a exit $? ==="
cp runs/schw_b7_plain_probe/scan.json \
   artifacts/round3/probe_b7_plain.json 2>/dev/null
sleep 30

# (b) beta=6 plain probe — no beta=6 state survives; re-equilibrated
#     from the beta=7 chain state during the untimed pass (acc/cost/
#     mobility equilibrate fast; only the within-scan RANKING is used)
timeout 1800 python experiments/schwinger_mts_scan.py \
  --out runs/schw_b6_plain_probe --L 16 --beta 6 --mass 0.1 \
  --chains 128 --ntraj 8192 --call-block 2048 \
  --cg-maxiter 1500 --cg-backend fused \
  --plain-state runs/schw_b7_plain_ext40/run_state.npz \
  --row plain:8:0:tau=2.0 --row plain:10:0:tau=2.0
echo "=== stage9e-b exit $? ==="
cp runs/schw_b6_plain_probe/scan.json \
   artifacts/round3/probe_b6_plain.json 2>/dev/null
sleep 30

# (c) beta=8 FT probe: can acc 0.895 at n4 be traded for coarser steps?
#     Warm latent state from the (by now extended) beta=8 FT chain.
timeout 2400 python experiments/schwinger_mts_scan.py \
  --out runs/schw_b8_ft_probe --L 16 --beta 8 --mass 0.1 \
  --chains 128 --ntraj 4096 --call-block 1024 \
  --cg-maxiter 1500 --cg-backend fused \
  --ft-state runs/schw_b8_ft/run_state.npz \
  --row ft:4:0:$FLOW:tau=0.5 --row ft:3:0:$FLOW:tau=0.5 \
  --row ft:2:0:$FLOW:tau=0.5
echo "=== stage9e-c exit $? ==="
cp runs/schw_b8_ft_probe/scan.json \
   artifacts/round3/probe_b8_ft.json 2>/dev/null
sleep 30

# (d) 32^2 FT probe (n5/n6/n8), warm latent state from the stage-9d chain
timeout 2400 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L32_ft_probe --L 32 --beta 6 --mass 0.1 \
  --chains 64 --ntraj 512 --call-block 128 \
  --cg-maxiter 1000 --cg-backend xla \
  --ft-state runs/schw_L32_ft2/run_state.npz \
  --row ft:6:0:$FLOW:tau=0.5 --row ft:5:0:$FLOW:tau=0.5 \
  --row ft:8:0:$FLOW:tau=0.5
echo "=== stage9e-d exit $? ==="
cp runs/schw_L32_ft_probe/scan.json \
   artifacts/round3/probe_L32_ft.json 2>/dev/null
sleep 30

# (e) 32^2 plain tau_int chain at the 9a winner (tau=2, n10), thermalized
#     init from the converged n16 chain
for i in 1 2 3; do
  timeout 3300 python experiments/schwinger_tauint.py \
    --L 32 --beta 6 --mass 0.1 --tau 2.0 --nstep 10 --integrator omelyan \
    --chains 64 --ntraj 49152 --block 256 --block-timeout 900 \
    --cg-maxiter 2000 --cg-backend fused \
    --init-state runs/schw_L32_plain_tauint/run_state.npz \
    --therm-frac 0.05 --out runs/schw_L32_plain_n10
  rc=$?
  echo "=== stage9e-e slice $i exit $rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
cp runs/schw_L32_plain_n10/results.json \
   artifacts/round3/schwinger_L32_b6_plain_t2n10.json 2>/dev/null
sleep 30

# (f) beta=8 plain mobility chain at the 9b winner (tau=2, n10) — feeds
#     tau_est = r(beta) * chi_Q / mobility (experiments/mobility_relation.py)
for i in 1 2; do
  timeout 3300 python experiments/schwinger_tauint.py \
    --L 16 --beta 8 --mass 0.1 --tau 2.0 --nstep 10 --integrator omelyan \
    --chains 128 --ntraj 49152 --block 4096 --block-timeout 900 \
    --cg-maxiter 1500 --cg-backend fused \
    --init-state runs/schw_b8_plain_mob/run_state.npz \
    --therm-frac 0.05 --out runs/schw_b8_plain_mob_n10
  rc=$?
  echo "=== stage9e-f slice $i exit $rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
cp runs/schw_b8_plain_mob_n10/results.json \
   artifacts/round3/schwinger_b8_plain_mobility_n10.json 2>/dev/null
echo "=== stage 9e done ==="
