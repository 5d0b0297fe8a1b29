#!/bin/bash
# Stage 10d: the acceptance-cliff question at 64^2, both sides, plus the
# 64^2 FT chain toward convergence. The 64^2 verdict (plain x7) used
# plain at n16/acc 0.956 — over-provisioned by the same cliff logic that
# cost 32^2 plain 43%; FT ran n16/acc 0.487 with no scan around it.
# Probes are within-scan rankings (warm states, untimed re-equilibration
# pass). Queued behind stage 10 (WAIT_PID).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 10d ==="
fi

FLOW=artifacts/flow8x8_b3_rncp24_ftb6

# (a) 64^2 plain probe (warm from the by-now-extended plain chain)
timeout 2400 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L64_plain_probe --L 64 --beta 6 --mass 0.1 \
  --chains 64 --ntraj 512 --call-block 128 \
  --cg-maxiter 2000 --cg-backend fused \
  --plain-state runs/schw_L64_plain_ext/run_state.npz \
  --row plain:10:0:tau=2.0 --row plain:12:0:tau=2.0 \
  --row plain:16:0:tau=2.0
echo "=== stage10d-a exit $? ==="
cp runs/schw_L64_plain_probe/scan.json \
   artifacts/round3/probe_L64_plain.json 2>/dev/null
sleep 30

# (b) 64^2 FT probe (warm latent state from the FT chain; B=32)
timeout 3600 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L64_ft_probe --L 64 --beta 6 --mass 0.1 \
  --chains 32 --ntraj 256 --call-block 32 \
  --cg-maxiter 2000 --cg-backend fused \
  --ft-state runs/schw_L64_ft_chain/run_state.npz \
  --row ft:16:0:$FLOW:tau=0.5 --row ft:12:0:$FLOW:tau=0.5 \
  --row ft:20:0:$FLOW:tau=0.5
echo "=== stage10d-b exit $? ==="
cp runs/schw_L64_ft_probe/scan.json \
   artifacts/round3/probe_L64_ft.json 2>/dev/null
sleep 30

# (c) 64^2 FT chain extension 2048 -> 4096 (15 -> ~30 tau)
for i in 1 2 3; do
  timeout 3300 python experiments/schwinger_tauint.py \
    --ckpt $FLOW --L 64 --beta 6 --mass 0.1 --tau 0.5 --nstep 16 \
    --integrator omelyan --chains 32 --ntraj 4096 --block 16 \
    --block-timeout 900 --cg-maxiter 2000 --cg-backend fused \
    --start cold --out runs/schw_L64_ft_chain
  rc=$?
  echo "=== stage10d-c slice $i exit $rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
cp runs/schw_L64_ft_chain/results.json \
   artifacts/round3/schwinger_L64_b6_ft_t05n16_ext.json 2>/dev/null
echo "=== stage 10d done ==="
