#!/bin/bash
# Stage 11: 32^2 beta=8 mobility pair — the "FT domain = volume x high
# beta" claim measured directly. At 16^2 the verdict flips to FT at
# beta~8; at 32^2 beta=6 plain still wins x1.8-2.1. This rung asks the
# only remaining question: does the 16^2 beta=8 flip survive the 4x
# volume? Both sides warm from the 32^2 beta=6 chains (the untimed
# mts-scan pass re-equilibrates the beta shift, same as the beta=9 16^2
# rung). If plain shows ~0 tunneling events the row is a freeze-out
# bound, which is itself the answer.
# Queued behind stage 10d (WAIT_PID).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 11 ==="
fi

FLOW=artifacts/flow8x8_b3_rncp24_ftb6

# (a) plain side: nstep around the 32^2 cliff (n10 optimal at beta=6;
# higher beta smooths fields so n8 may re-enter)
timeout 2400 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L32b8_plain_mob --L 32 --beta 8 --mass 0.1 \
  --chains 64 --ntraj 8192 --call-block 1024 \
  --cg-maxiter 2000 --cg-backend fused \
  --plain-state runs/schw_L32_plain_n10/run_state.npz \
  --row plain:8:0:tau=2.0 --row plain:10:0:tau=2.0
echo "=== stage11a exit $? ==="
cp runs/schw_L32b8_plain_mob/scan.json \
   artifacts/round3/probe_L32b8_plain.json 2>/dev/null
sleep 30

# (b) FT side: FT acceptance at fixed dt rises with beta, so the beta=6
# optimum n6 should over-provision; scan n4/n5/n6
timeout 4800 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L32b8_ft_mob --L 32 --beta 8 --mass 0.1 \
  --chains 64 --ntraj 1024 --call-block 128 \
  --cg-maxiter 2000 --cg-backend fused \
  --ft-state runs/schw_L32_ft2/run_state.npz \
  --row ft:4:0:$FLOW:tau=0.5 --row ft:5:0:$FLOW:tau=0.5 \
  --row ft:6:0:$FLOW:tau=0.5
echo "=== stage11b exit $? ==="
cp runs/schw_L32b8_ft_mob/scan.json \
   artifacts/round3/probe_L32b8_ft.json 2>/dev/null
echo "=== stage 11 done ==="
