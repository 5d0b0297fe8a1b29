#!/bin/bash
# Stage 8g: the beta=8 16^2 ladder point — converting "FT wins from
# beta~8" from projection to measurement. Direct tau_int on the FT side
# (tau_FT ~ 2000-2500 expected -> 98k traj ~ 40-50tau, affordable at the
# re-timed 0.0276 s/traj). The plain side's direct tau would need ~1.1M
# trajectories (tau ~ 27k x 40), so it gets a mobility measurement
# instead: tau ~ 2 chi_Q / mobility was validated against direct chains
# at beta=6/7 16^2 and 64^2 (12% worst case); the BENCH row labels it an
# estimate. Both fused CG (chains-last kernel), B=128, cold starts.
# Queued behind stage 8f (WAIT_PID).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 8g ==="
fi

FLOW=artifacts/flow8x8_b3_rncp24_ftb6

# (a) FT direct tau_int chain
for i in 1 2 3; do
  timeout 3300 python experiments/schwinger_tauint.py \
    --ckpt $FLOW --L 16 --beta 8 --mass 0.1 --tau 0.5 --nstep 4 \
    --integrator omelyan --chains 128 --ntraj 98304 --block 2048 \
    --block-timeout 900 --cg-maxiter 1500 --cg-backend fused \
    --start cold --out runs/schw_b8_ft
  rc=$?
  echo "=== stage8g FT slice $i exit $rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
cp runs/schw_b8_ft/results.json \
   artifacts/round3/schwinger_b8_ft_ftb6_t05n4.json 2>/dev/null
sleep 30

# (b) plain mobility run (therm ~16k >> gauge-field equilibration; Q's
#     own distribution needs O(tau)=27k so chi_Q here is biased low —
#     the relation uses the FT chain's chi_Q, both samplers agree on it
#     at every measured point)
for i in 1 2; do
  timeout 3300 python experiments/schwinger_tauint.py \
    --L 16 --beta 8 --mass 0.1 --tau 2.0 --nstep 8 \
    --integrator omelyan --chains 128 --ntraj 65536 --block 4096 \
    --block-timeout 900 --cg-maxiter 1500 --cg-backend fused \
    --start cold --out runs/schw_b8_plain_mob
  rc=$?
  echo "=== stage8g plain slice $i exit $rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
cp runs/schw_b8_plain_mob/results.json \
   artifacts/round3/schwinger_b8_plain_mobility.json 2>/dev/null
echo "=== stage 8g done ==="
