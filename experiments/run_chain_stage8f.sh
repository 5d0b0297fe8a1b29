#!/bin/bash
# Stage 8f: measure what was previously only inferred — plain HMC's
# tau_int(Q) at 32^2 beta=6 m=0.1. The old "O(1e4), effectively frozen"
# claim came from a mobility bound; the 64^2 chain showed
# tau ~ chi_Q/mobility (338 vs 322), which predicts ~1300 here — a
# DIRECT chain decides the 32^2 verdict. Plus the 32^2 FT row re-timed
# on the fused backend (chunked mts_scan) so both sides use their best
# backend. Queued behind stage 8e (WAIT_PID).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 8f ==="
fi

FLOW=artifacts/flow8x8_b3_rncp24_ftb6

# (a) 32^2 FT row on the fused backend (chunked calls)
timeout 2400 python experiments/schwinger_mts_scan.py \
  --out runs/retime_L32_ft_fused --L 32 --beta 6 --mass 0.1 \
  --chains 64 --ntraj 256 --call-block 32 --cg-maxiter 2000 \
  --cg-backend fused \
  --row ft:6:0:$FLOW
echo "=== stage8f L32 ft fused exit $? ==="
cp runs/retime_L32_ft_fused/scan.json artifacts/round3/retime_L32_ft_fused.json 2>/dev/null
sleep 30

# (b) 32^2 plain tau_int production chain (fused CG, resumable slices)
for i in 1 2 3 4 5 6; do
  timeout 3300 python experiments/schwinger_tauint.py \
    --L 32 --beta 6 --mass 0.1 --tau 2.0 --nstep 16 --integrator omelyan \
    --chains 64 --ntraj 65536 --block 256 --block-timeout 900 \
    --cg-maxiter 2000 --cg-backend fused \
    --start hot --out runs/schw_L32_plain_tauint
  rc=$?
  echo "=== stage8f L32 plain slice $i exit $rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
cp runs/schw_L32_plain_tauint/results.json \
   artifacts/round3/schwinger_L32_b6_plain_t2n16.json 2>/dev/null
echo "=== stage 8f done ==="
