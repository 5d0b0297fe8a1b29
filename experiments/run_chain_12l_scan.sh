#!/bin/bash
# Serial TPU job chain: wait for the fine-tune, then Schwinger beta=6
# nstep scans with the 12-layer lambda-regularized flow (raw + fine-tuned).
set -u
cd /root/repo
FT_PID=$(cat /tmp/ft12.pid)
while kill -0 "$FT_PID" 2>/dev/null; do sleep 15; done
echo "=== fine-tune done, starting scans ==="

timeout 2400 python experiments/schwinger_scan.py \
  --ckpt artifacts/flow8x8_b3_rncp12_fw10 --L 16 --beta 6 --mass 0.1 \
  --tau 0.5 --plain-nsteps --ft-nsteps 2 3 4 6 \
  --chains 128 --ntraj 192 --block 48 \
  --out runs/schw_scan_b6_12l
echo "=== fw10 scan exit $? ==="

CKPT=$(ls -d runs/ft_finetune_b6_12l/checkpoints/ckpt_* 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  timeout 2400 python experiments/schwinger_scan.py \
    --ckpt "$CKPT" --L 16 --beta 6 --mass 0.1 \
    --tau 0.5 --plain-nsteps --ft-nsteps 2 3 4 6 \
    --chains 128 --ntraj 192 --block 48 \
    --out runs/schw_scan_b6_12lft
  echo "=== fw10-ft scan exit $? ==="
fi
echo "=== chain done ==="
