#!/bin/bash
# Stage 19 (round-3 session-10): upgrade the 64^2 beta=6 m=0.1
# head-to-head from 15-18tau chains to ~30tau+ converged chains at the
# session-10 production recipes:
#   - FT: ftb6 flow, tau=0.5/n16, --conv-dtype bfloat16 (the measured
#     x1.25 recipe at 64^2), warm start from the physical st64 states
#     (flow-inverse mapped), resilient resume (a second invocation
#     continues the same chain from run_state.npz).
#   - plain: tau=2/n12 (the best single-scale config from the 64^2 mts
#     scan), warm from st64_plain.
# The current BENCH 64^2 verdict (plain x7 -> x5.6 with bf16) rests on a
# 15tau FT chain; tau_int convergence bias reads LOW at that length
# (convergence study), so this either firms the verdict or revises it
# honestly. Queued behind stage 18 (WAIT_PID).
set -u
cd /root/repo
FLOW=artifacts/flow8x8_b3_rncp24_ftb6
mkdir -p runs artifacts/round3

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 19 ==="
fi

echo "=== A) 64^2 plain tau=2/n12 chain to ~35tau ==="
timeout 4200 python experiments/schwinger_tauint.py \
  --out runs/t64_plain_n12 --L 64 --beta 6 --mass 0.1 \
  --tau 2.0 --nstep 12 --chains 64 --ntraj 12288 --block 64 \
  --therm-frac 0.1 --init-state runs/st64_plain/run_state.npz \
  --cg-backend fused --cg-maxiter 2000 --block-timeout 1200
echo "=== A exit $? ==="
cp runs/t64_plain_n12/results.json \
   artifacts/round3/schwinger_L64_b6_plain_t2n12.json 2>/dev/null
sleep 30

echo "=== B) 64^2 FT bf16 tau=0.5/n16 chain (resume-chained) ==="
for TRY in 1 2 3; do
  timeout 5400 python experiments/schwinger_tauint.py \
    --out runs/t64_ft_bf16 --ckpt $FLOW --conv-dtype bfloat16 \
    --L 64 --beta 6 --mass 0.1 --tau 0.5 --nstep 16 \
    --chains 32 --ntraj 4096 --block 32 \
    --therm-frac 0.1 --init-state runs/st64_plain/run_state.npz \
    --cg-backend fused --cg-maxiter 2000 --block-timeout 1500
  RC=$?
  echo "=== B try $TRY exit $RC ==="
  [ "$RC" -eq 0 ] && break
  sleep 60
done
cp runs/t64_ft_bf16/results.json \
   artifacts/round3/schwinger_L64_b6_ft_bf16_t05n16.json 2>/dev/null
sleep 30

echo "=== C) 64^2 beta=8 FT mobility rows (stage-16F2 retry) ==="
# The stage-16F2 attempt died silently on the worker (53 min blocked in a
# device sync, no row written). Retry with the bf16 recipe (25% cheaper at
# this volume) and call-block 16 (shorter device programs, more sync
# points). Completes the 64^2 beta=8 pair whose plain side landed.
timeout 3600 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L64b8_ft_mob2 --L 64 --beta 8 --mass 0.1 \
  --chains 32 --ntraj 256 --call-block 16 \
  --cg-maxiter 2000 --cg-backend fused --conv-dtype bfloat16 \
  --ft-state runs/st64_ft/run_state.npz \
  --row ft:12:0:$FLOW:tau=0.5 --row ft:8:0:$FLOW:tau=0.5
echo "=== C exit $? ==="
cp runs/schw_L64b8_ft_mob2/scan.json \
   artifacts/round3/probe_L64b8_ft.json 2>/dev/null
echo "=== stage 19 done ==="
