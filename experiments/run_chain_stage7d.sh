#!/bin/bash
# Stage 7d: converge the beta=7 16^2 m=0.1 headline rows to >=40 tau.
# Round-3 session-4's convergence study showed sub-40tau chains
# underestimate tau_int 25-70%; both beta=7 rows were short (plain 22tau,
# FT 32tau) and their run_state was lost with runs/ (gitignored).
# Fresh chains, same configs/estimator; the tauint harness resumes from
# run_state.npz, so rerun-until-done loops survive worker crashes.
# Plain first (the bigger caveat: its tau_int RISES as the chain
# converges, so this is the conservative direction for the FT win).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "=== predecessor $WAIT_PID done, starting stage 7d ==="
fi

# beta=7 plain: 262144 traj -> 196608 used ~ 44 tau at tau_int ~ 4466.
# ~0.038 s/traj -> ~2.8 h; run in resumable 55-min slices.
for i in 1 2 3 4 5 6; do
  timeout 3300 python experiments/schwinger_tauint.py \
    --L 16 --beta 7 --mass 0.1 --tau 2.0 --nstep 8 --integrator omelyan \
    --chains 128 --ntraj 262144 --block 512 --block-timeout 600 \
    --start cold --out runs/schw_b7_plain_ext40
  rc=$?
  echo "=== b7 plain slice $i exit $rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
cp runs/schw_b7_plain_ext40/results.json artifacts/round3/schwinger_b7_plain_t2n8_40tau.json 2>/dev/null
cp runs/schw_b7_plain_ext40/run_state.npz artifacts/round3/states/b7_plain_t2n8.npz 2>/dev/null

# beta=7 FT (ftb6 flow): 57344 traj -> 43008 used ~ 45 tau at tau_int ~ 955.
# ~0.051 s/traj -> ~50 min.
for i in 1 2; do
  timeout 3300 python experiments/schwinger_tauint.py \
    --ckpt artifacts/flow8x8_b3_rncp24_ftb6 \
    --L 16 --beta 7 --mass 0.1 --tau 0.5 --nstep 4 --integrator omelyan \
    --chains 128 --ntraj 57344 --block 512 --block-timeout 600 \
    --start cold --out runs/schw_b7_ft_ext40
  rc=$?
  echo "=== b7 ft slice $i exit $rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
cp runs/schw_b7_ft_ext40/results.json artifacts/round3/schwinger_b7_ft_ftb6_t05n4_40tau.json 2>/dev/null
cp runs/schw_b7_ft_ext40/run_state.npz artifacts/round3/states/b7_ft_t05n4.npz 2>/dev/null
echo "=== stage 7d done ==="
