#!/bin/bash
# Stage 17 (round-3 session-10): the 24-layer smoothness-regularized
# retrain — the ROADMAP round-4 candidate, pulled forward. Facts it
# builds on (BENCH.md):
#   - lambda=1 12L flows are SEED-ROBUST and dramatically smoother
#     (acc 0.97 at 16^2 beta=3 n16 vs 0.65 for lambda=0; trained in
#     ~200 s) but lose capacity by beta=7 (acc <= 0.45 -> negative);
#   - the 24L pure-KL flagship is seed-sensitive (fresh retrains came
#     out rugged) and needs dt=1/8 with the ftb6 fine-tune;
#   - FT wall-clock at beta>=6 is flow-VJP-bound: every dt coarsening
#     is a direct 1.3-2x end-to-end win.
# Question: does 24L + lambda=1 keep the depth (capacity at beta>=7)
# AND gain the smoothness (dt=1/6..1/4)? Two seeds (the claim being
# tested is seed-robustness), ftb6-style fine-tune, then a Schwinger
# mobility head-to-head vs the production flagship at identical
# settings.
# Queued behind stage 16 (WAIT_PID).
set -u
cd /root/repo
FLOW=artifacts/flow8x8_b3_rncp24_ftb6
mkdir -p runs artifacts/round3

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 17 ==="
fi

# 1) train 24L rncp lambda=1, beta-annealed 2->3 at 8^2 (the flagship
# recipe + the regularizer), seeds 7 and 8
for SEED in 7 8; do
  timeout 3600 python experiments/train_highbeta.py \
    --train-L 8 --L 16 --beta 3.0 --beta-init 2.0 --anneal-frac 0.5 \
    --n-era 30 --n-epoch 500 --batch 512 --lr 1e-3 \
    --coupling rncp --n-mixture 8 --n-layers 24 --hidden 32 32 \
    --force-weight 1.0 --grad-clip 1.0 --seed $SEED \
    --tau 0.5 --nsteps 16 24 --eval-ntraj 192 \
    --outdir runs/b3_24l_fw10_s$SEED
  echo "=== stage17 train seed $SEED exit $? ==="
  sleep 30
done

# 2) pure-gauge force-matching fine-tune at 16^2 beta=6 (the ftb6
# recipe), both seeds; eval acc over dt=1/4..1/16
for SEED in 7 8; do
  timeout 3600 python experiments/finetune_force.py \
    --ckpt runs/b3_24l_fw10_s$SEED/checkpoints --L 16 --beta 6 \
    --lr 2e-5 --steps 1200 --batch 16 \
    --eval-nsteps 4 6 8 12 16 --eval-ntraj 256 \
    --out runs/ftft_b6_24l_s$SEED
  echo "=== stage17 finetune seed $SEED exit $? ==="
  cp runs/ftft_b6_24l_s$SEED/results.json \
     artifacts/round3/l1_24l_ftb6_s$SEED.json 2>/dev/null
  sleep 30
done

# 3) Schwinger mobility head-to-head at 16^2 beta=6 m=0.1: candidate
# (both seeds) vs production flagship, same rows, same cold-start
# self-therm protocol. n4=dt(1/8) is the flagship optimum; n3/n2 are
# the coarser steps only a smoother flow can afford.
timeout 3600 python experiments/schwinger_mts_scan.py \
  --out runs/schw_b6_l1ab --L 16 --beta 6 --mass 0.1 \
  --chains 128 --ntraj 4096 --call-block 1024 \
  --cg-maxiter 1500 --cg-backend fused \
  --row ft:4:0:$FLOW:tau=0.5 \
  --row ft:4:0:runs/ftft_b6_24l_s7/checkpoints:tau=0.5 \
  --row ft:3:0:runs/ftft_b6_24l_s7/checkpoints:tau=0.5 \
  --row ft:2:0:runs/ftft_b6_24l_s7/checkpoints:tau=0.5 \
  --row ft:4:0:runs/ftft_b6_24l_s8/checkpoints:tau=0.5 \
  --row ft:3:0:runs/ftft_b6_24l_s8/checkpoints:tau=0.5
echo "=== stage17 schwinger A/B exit $? ==="
cp runs/schw_b6_l1ab/scan.json \
   artifacts/round3/l1_24l_schw_b6_ab.json 2>/dev/null

# 4) quenched high-beta capacity check: does 24L+lambda keep beta=7/8?
# (the 12L lambda flow died here). Seed 7 candidate, acc vs nstep.
timeout 2400 python experiments/eval_flow_beta.py \
  --ckpt runs/ftft_b6_24l_s7/checkpoints --L 16 --beta 7 \
  --tau 0.5 --nsteps 4 6 8 --eval-ntraj 192 --hmc-ntraj 0 \
  --out runs/l1_24l_evalb7 2>/dev/null || \
timeout 2400 python experiments/eval_flow_beta.py \
  --ckpt runs/ftft_b6_24l_s7/checkpoints --L 16 --beta 7 \
  --tau 0.5 --nsteps 4 6 8 --eval-ntraj 192 --hmc-ntraj 0
echo "=== stage17 beta=7 eval exit $? ==="
cp runs/l1_24l_evalb7/results.json \
   artifacts/round3/l1_24l_evalb7.json 2>/dev/null
echo "=== stage 17 done ==="
