#!/bin/bash
# Stage 14: the round-4 flow-quality candidate, pulled forward — a
# 24-layer lambda=1 smoothness-regularized flow (joint KL + E||F_eff||^2
# objective). Questions, in order of value:
#  (1) Seed robustness at depth 24: pure-KL 24L needed the lucky seed +
#      a force-matching fine-tune stage; 12L lambda=1 trained smooth on
#      the first seed. Does lambda=1 do the same at 24L? (Two seeds.)
#  (2) beta/volume headroom: the 12L lambda-reg flow died at beta=7
#      (acc <= 0.45) and 32^2 (acc 0.14) where the 24L ftb6 holds
#      0.83/0.43. Depth was the suspected missing ingredient — a 24L
#      lambda-reg flow that holds beta=7 would give a ONE-STAGE
#      production recipe (no post-hoc FM pass, which is a measured
#      NEGATIVE on lambda-reg flows).
# Known dose facts (BENCH): lambda=0.3 on 24L was still rugged;
# lambda=1 is the 12L interior optimum (lambda=3 trades away
# trivialization: beta=3 tau_int doubles). So: lambda=1, 24L, 2 seeds.
# Evals: built-in beta=3 acc/tau_int at 16^2, then quenched acceptance
# scans at beta=6 (n4/n6/n8) and beta=7 (n3/n4/n6) vs ftb6's known
# 0.83-0.97 at dt=1/8. Schwinger production probes only if these pass
# (a later stage).
# Queued behind stage 13 (WAIT_PID).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 14 ==="
fi

for SEED in 11 13; do
  OUT=runs/b3_24l_fw10_s$SEED
  timeout 5400 python experiments/train_highbeta.py \
    --train-L 8 --L 16 --beta 3 --beta-init 2 --anneal-frac 0.5 \
    --n-layers 24 --n-mixture 8 --hidden 32 32 --s-clip 3.0 \
    --coupling rncp --batch 512 --lr 1e-3 --grad-clip 1 --sched \
    --force-weight 1.0 --n-era 30 --n-epoch 500 --seed $SEED \
    --integrator omelyan --tau 0.5 --nsteps 16 24 \
    --eval-ntraj 64 --eval-chains 64 \
    --outdir $OUT > $OUT.log 2>&1
  echo "=== stage14 train seed $SEED exit $? ==="
  sleep 20
  CKPT=$OUT/checkpoints/ckpt_era29_epoch500
  timeout 2400 python experiments/eval_flow_beta.py \
    --ckpt $CKPT --L 16 --beta 6.0 --tau 0.5 --nsteps 4 6 8 \
    --integrator omelyan --eval-chains 64 --eval-ntraj 96 \
    --tauint-ntraj 0 --outdir ${OUT}_at_b6 > ${OUT}_at_b6.log 2>&1
  echo "=== stage14 eval b6 seed $SEED exit $? ==="
  sleep 20
  timeout 2400 python experiments/eval_flow_beta.py \
    --ckpt $CKPT --L 16 --beta 7.0 --tau 0.5 --nsteps 3 4 6 \
    --integrator omelyan --eval-chains 64 --eval-ntraj 96 \
    --tauint-ntraj 0 --outdir ${OUT}_at_b7 > ${OUT}_at_b7.log 2>&1
  echo "=== stage14 eval b7 seed $SEED exit $? ==="
  sleep 20
done
for SEED in 11 13; do
  for B in b6 b7; do
    cp runs/b3_24l_fw10_s${SEED}_at_$B/results.json \
       artifacts/round3/eval_24l_fw10_s${SEED}_$B.json 2>/dev/null
  done
done
echo "=== stage 14 done ==="
