#!/bin/bash
# Stage 13: 64^2 beta=8 mobility pair — the extreme corner of the
# "FT domain = volume x high beta" matrix (16^2: FT from beta~8;
# 32^2 beta=8 = stage-11; 64^2 beta=6 = plain x7 on wall-clock but FT
# has the tau advantage). At 64^2 beta=8 plain may show ~0 tunneling
# events in the affordable budget — that is a freeze-out BOUND and is
# itself the answer (FT >= xN with N from the event-count limit).
# Both sides warm from the stage-10/10d-extended beta=6 chains; the
# untimed mts-scan pass re-equilibrates the beta shift (plaq moves
# 0.9148 -> ~0.944, checked in the row output).
# Queued behind stage 12 (WAIT_PID).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 13 ==="
fi

FLOW=artifacts/flow8x8_b3_rncp24_ftb6

# (a) plain side: n10 (the measured 32^2/16^2 optimum) + n16 (higher-
# beta fields are smoother, but 64^2 volume pushes the cliff up)
timeout 4500 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L64b8_plain_mob --L 64 --beta 8 --mass 0.1 \
  --chains 64 --ntraj 8192 --call-block 256 \
  --cg-maxiter 2000 --cg-backend fused \
  --plain-state runs/schw_L64_plain_ext/run_state.npz \
  --row plain:10:0:tau=2.0 --row plain:16:0:tau=2.0
echo "=== stage13a exit $? ==="
cp runs/schw_L64b8_plain_mob/scan.json \
   artifacts/round3/probe_L64b8_plain.json 2>/dev/null
sleep 30

# (b) FT side: acceptance at fixed dt rises with beta (0.49 at n16
# beta=6), so n12/n8 bracket the expected optimum
timeout 3600 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L64b8_ft_mob --L 64 --beta 8 --mass 0.1 \
  --chains 32 --ntraj 512 --call-block 32 \
  --cg-maxiter 2000 --cg-backend fused \
  --ft-state runs/schw_L64_ft_chain/run_state.npz \
  --row ft:12:0:$FLOW:tau=0.5 --row ft:8:0:$FLOW:tau=0.5
echo "=== stage13b exit $? ==="
cp runs/schw_L64b8_ft_mob/scan.json \
   artifacts/round3/probe_L64b8_ft.json 2>/dev/null
echo "=== stage 13 done ==="
