#!/bin/bash
# Serial TPU chain: (tau, nstep) grid for the 12L fw10 flow at Schwinger
# beta=6 from a thermalized latent state, then the two missing lambda-grid
# trainings (24L lambda=0.3, 12L lambda=3.0) with beta=6 transfer evals.
set -u
cd /root/repo
STATE=runs/schw_b6_ft12l_t05n4/run_state.npz

for row in "0.5:2 3" "1.0:4 6 8" "2.0:8 12"; do
  TAU=${row%%:*}; NS=${row#*:}
  timeout 2400 python experiments/schwinger_scan.py \
    --ckpt artifacts/flow8x8_b3_rncp12_fw10 --L 16 --beta 6 --mass 0.1 \
    --tau "$TAU" --plain-nsteps --ft-nsteps $NS \
    --ft-state "$STATE" --warmup-traj 96 \
    --chains 128 --ntraj 384 --block 96 \
    --out "runs/schw_grid_b6_12l_tau${TAU}"
  echo "=== grid tau=$TAU exit $? ==="
  sleep 20
done

for cfg in "0.3 24 fw03_24l" "3.0 12 fw30"; do
  set -- $cfg
  W=$1; NL=$2; TAG=$3
  timeout 5400 python experiments/train_highbeta.py \
    --train-L 8 --L 16 --beta 3 --beta-init 2 --anneal-frac 0.5 \
    --n-layers $NL --n-mixture 8 --hidden 32 32 --s-clip 3.0 --coupling rncp \
    --batch 512 --lr 1e-3 --grad-clip 1 --sched --force-weight $W \
    --n-era 30 --n-epoch 500 --seed 7 \
    --integrator omelyan --tau 0.5 --nsteps 16 24 --eval-ntraj 64 --eval-chains 64 \
    --outdir runs/b3_12l_$TAG > runs/b3_12l_$TAG.log 2>&1
  echo "=== $TAG exit $? ==="
  sleep 20
  timeout 3600 python experiments/eval_flow_beta.py \
    --ckpt runs/b3_12l_$TAG/checkpoints/ckpt_era29_epoch500 \
    --L 16 --beta 6.0 --tau 0.5 --nsteps 4 6 8 12 \
    --integrator omelyan --eval-chains 64 --eval-ntraj 96 \
    --tauint-ntraj 0 --outdir runs/b3_12l_${TAG}_at_b6 > runs/b3_12l_${TAG}_at_b6.log 2>&1
  echo "=== ${TAG}_at_b6 exit $? ==="
  sleep 20
done
echo "=== chain done ==="
