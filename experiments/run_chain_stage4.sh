#!/bin/bash
# Serial TPU chain, stage 4 (decision-free parts): beta=7 mini-grid and
# 32^2 mini-scan with the fw10 flow, width-scan training (12L hidden 64^2,
# lambda=1), CG cost-structure microbench.
set -u
cd /root/repo
PREV_PID=$(cat /tmp/chain_prod2.pid)
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 20; done
echo "=== prod2 done, starting stage 4 ==="

# beta=7 mini-grid (hot start + 512-traj warmup per row)
for row in "0.5:2 3" "1.0:6 8"; do
  TAU=${row%%:*}; NS=${row#*:}
  timeout 2400 python experiments/schwinger_scan.py \
    --ckpt artifacts/flow8x8_b3_rncp12_fw10 --L 16 --beta 7 --mass 0.1 \
    --tau "$TAU" --plain-nsteps --ft-nsteps $NS \
    --warmup-traj 512 --chains 128 --ntraj 384 --block 128 \
    --out "runs/schw_grid_b7_12l_tau${TAU}"
  echo "=== b7 grid tau=$TAU exit $? ==="
  sleep 20
done

# 32^2 beta=6 mini-scan (B=64; blocks small at 32^2)
timeout 3600 python experiments/schwinger_scan.py \
  --ckpt artifacts/flow8x8_b3_rncp12_fw10 --L 32 --beta 6 --mass 0.1 \
  --tau 0.5 --plain-nsteps --ft-nsteps 3 4 6 \
  --warmup-traj 128 --chains 64 --ntraj 256 --block 64 \
  --out runs/schw_grid_L32b6_12l
echo "=== L32 scan exit $? ==="
sleep 20

# width scan: 12L hidden 64x64, lambda=1.0 (capacity at fixed smoothness
# dose; also raises MXU utilization - ROADMAP "one change, two wins")
timeout 5400 python experiments/train_highbeta.py \
  --train-L 8 --L 16 --beta 3 --beta-init 2 --anneal-frac 0.5 \
  --n-layers 12 --n-mixture 8 --hidden 64 64 --s-clip 3.0 --coupling rncp \
  --batch 512 --lr 1e-3 --grad-clip 1 --sched --force-weight 1.0 \
  --n-era 30 --n-epoch 500 --seed 7 \
  --integrator omelyan --tau 0.5 --nsteps 16 24 --eval-ntraj 64 --eval-chains 64 \
  --outdir runs/b3_12l_w64_fw10 > runs/b3_12l_w64_fw10.log 2>&1
echo "=== w64 train exit $? ==="
sleep 20
timeout 3600 python experiments/eval_flow_beta.py \
  --ckpt runs/b3_12l_w64_fw10/checkpoints/ckpt_era29_epoch500 \
  --L 16 --beta 6.0 --tau 0.5 --nsteps 4 6 8 \
  --integrator omelyan --eval-chains 64 --eval-ntraj 96 \
  --tauint-ntraj 0 --outdir runs/b3_12l_w64_fw10_at_b6 > runs/b3_12l_w64_fw10_at_b6.log 2>&1
echo "=== w64 b6 eval exit $? ==="
sleep 20

# CG cost structure across (L, mass) - decides the mixed-precision question
timeout 3600 python experiments/cg_cost.py --out runs/cg_cost_b6 \
  --beta 6 --L 16 32 64 --mass 0.1 0.05 0.02 --chains 64
echo "=== cg_cost exit $? ==="
echo "=== stage 4 done ==="
