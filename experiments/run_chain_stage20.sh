#!/bin/bash
# Stage 20 (round-3 session-11): beta-SPECIFIC force-matching fine-tunes
# at the cells FT wins. Production transfers the beta=6 fine-tune (ftb6)
# unchanged to beta=8/9, where the FT optimum is already the coarsest
# acceptable step (n2 at tau=0.5, acc 0.63 at beta=8) — i.e. the binding
# constraint is the acceptance cliff at dt=1/4..1/2, exactly what the
# force-matching pass moves (at beta=6 it bought 0.04->0.46 at dt=1/8).
# Untried lever (BENCH.md has only the beta=6 fine-tune).
#
# Design points:
#  - fine-tune at TARGET beta=8 from BOTH parents: ftb6 (compounded FM —
#    risk: transport drift, the lambda-reg lesson) and the pure-KL
#    b3_rncp24 parent (fresh FM at 8). Quenched acc ladder decides.
#  - beta=9 fine-tune from ftb6 only (cheap; same question).
#  - Schwinger 16^2 mobility head-to-heads at the mob2 protocol
#    (cold start, 128 chains, first untimed call thermalizes), each new
#    flow vs the ftb6 control re-measured in the SAME run (paired).
# Queued behind the 17->18->19 master (stage_chain2 waits on its PID).
set -u
cd /root/repo
PARENT=artifacts/flow8x8_b3_rncp24
FTB6=artifacts/flow8x8_b3_rncp24_ftb6
mkdir -p runs artifacts/round3

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 20 ==="
fi

echo "=== A) beta=8 fine-tune from ftb6 ==="
timeout 2400 python experiments/finetune_force.py \
  --ckpt $FTB6 --L 16 --beta 8 --lr 2e-5 --steps 1200 --batch 16 \
  --eval-nsteps 2 3 4 6 8 --eval-ntraj 256 \
  --out runs/ftft_b8_from_ftb6
echo "=== A exit $? ==="
cp runs/ftft_b8_from_ftb6/results.json \
   artifacts/round3/ftb8_from_ftb6.json 2>/dev/null
sleep 30

echo "=== B) beta=8 fine-tune from the pure-KL parent ==="
timeout 2400 python experiments/finetune_force.py \
  --ckpt $PARENT --L 16 --beta 8 --lr 2e-5 --steps 1200 --batch 16 \
  --eval-nsteps 2 3 4 6 8 --eval-ntraj 256 \
  --out runs/ftft_b8_from_parent
echo "=== B exit $? ==="
cp runs/ftft_b8_from_parent/results.json \
   artifacts/round3/ftb8_from_parent.json 2>/dev/null
sleep 30

echo "=== C) beta=9 fine-tune from ftb6 ==="
timeout 2400 python experiments/finetune_force.py \
  --ckpt $FTB6 --L 16 --beta 9 --lr 2e-5 --steps 1200 --batch 16 \
  --eval-nsteps 2 3 4 6 8 --eval-ntraj 256 \
  --out runs/ftft_b9_from_ftb6
echo "=== C exit $? ==="
cp runs/ftft_b9_from_ftb6/results.json \
   artifacts/round3/ftb9_from_ftb6.json 2>/dev/null
sleep 30

echo "=== D) Schwinger 16^2 beta=8 head-to-head (new flows vs ftb6 control) ==="
timeout 4800 python experiments/schwinger_mts_scan.py \
  --out runs/schw_b8_ftb8ab --L 16 --beta 8 --mass 0.1 \
  --chains 128 --ntraj 8192 --call-block 2048 \
  --cg-maxiter 1500 --cg-backend fused \
  --row ft:2:0:$FTB6:tau=0.5 \
  --row ft:2:0:runs/ftft_b8_from_ftb6/checkpoints:tau=0.5 \
  --row ft:1:0:runs/ftft_b8_from_ftb6/checkpoints:tau=0.5 \
  --row ft:2:0:runs/ftft_b8_from_parent/checkpoints:tau=0.5 \
  --row ft:3:0:runs/ftft_b8_from_parent/checkpoints:tau=0.5
echo "=== D exit $? ==="
cp runs/schw_b8_ftb8ab/scan.json \
   artifacts/round3/schw_b8_ftb8_ab.json 2>/dev/null
sleep 30

echo "=== E) Schwinger 16^2 beta=9 head-to-head (ftb9 vs ftb6 control) ==="
timeout 4800 python experiments/schwinger_mts_scan.py \
  --out runs/schw_b9_ftb9ab --L 16 --beta 9 --mass 0.1 \
  --chains 128 --ntraj 16384 --call-block 2048 \
  --cg-maxiter 1500 --cg-backend fused \
  --row ft:2:0:$FTB6:tau=0.5 \
  --row ft:2:0:runs/ftft_b9_from_ftb6/checkpoints:tau=0.5 \
  --row ft:1:0:runs/ftft_b9_from_ftb6/checkpoints:tau=0.5
echo "=== E exit $? ==="
cp runs/schw_b9_ftb9ab/scan.json \
   artifacts/round3/schw_b9_ftb9_ab.json 2>/dev/null
echo "=== stage 20 done ==="
