#!/bin/bash
# Stage 22 (round-3 session-11): the 64^2 beta=8 FT mobility rows, COLD-
# START edition — completes the matrix corner whose plain side landed in
# stage-16F (probe_L64b8_plain.json: n16 acc 0.946, mob/s 0.492 bar).
# Two prior attempts with warm st64 states died with their VMs
# (stage-16F2 silent worker death mid-sync; stage-19C never ran). Cold
# start: f^{-1}(0) + the untimed full-ntraj pass thermalizes (ordered
# start at beta=8 relaxes fast; ~30 expected tunneling events per pass at
# the plain-side rate — enough for a +-20% probe row; sanity_report
# validates plaq vs Bessel 0.93676).
# Recipe: bf16 convs (the measured x1.25 at 64^2), fused CG, call-block
# 16 (short device programs — the 64^2 FT crash lesson).
set -u
cd /root/repo
FLOW=artifacts/flow8x8_b3_rncp24_ftb6
mkdir -p runs artifacts/round3

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "=== predecessor $WAIT_PID done, starting stage 22 ==="
  sleep 60
fi

echo "=== 64^2 beta=8 FT mobility rows (cold, n12+n8, bf16) ==="
timeout 3000 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L64b8_ft_mob2 --L 64 --beta 8 --mass 0.1 \
  --chains 32 --ntraj 256 --call-block 16 \
  --cg-maxiter 2000 --cg-backend fused --conv-dtype bfloat16 \
  --row ft:12:0:$FLOW:tau=0.5 --row ft:8:0:$FLOW:tau=0.5
echo "=== exit $? ==="
cp runs/schw_L64b8_ft_mob2/scan.json \
   artifacts/round3/probe_L64b8_ft.json 2>/dev/null
echo "=== stage 22 done ==="
