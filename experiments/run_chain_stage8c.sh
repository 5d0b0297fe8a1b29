#!/bin/bash
# Stage 8c: re-time the whole Schwinger ladder AFTER the half-spinor
# Wilson hop landed (commit 6d2c9da halves the XLA Dirac path's HBM
# traffic — the 40tau beta=7 plain extension already shows ~3x faster
# s/traj than the BENCH table's pre-hop timings). Every BENCH ladder row
# gets a fresh equilibrium timing at its recorded optimum so eff/s and
# the crossover are computed from timings that match the shipped code.
# Timing discipline: mts_scan compiles+advances on call 1, times call 2
# (chained state, fresh key). Queued behind stage 8b (WAIT_PID).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 8c ==="
fi

FLOW=artifacts/flow8x8_b3_rncp24_ftb6

# 16^2 rows, B=128 (ladder convention). beta=7 has saved equilibrium
# states; beta<=6 cold-start and thermalize in the untimed first call.
for B in 4 5 6; do
  timeout 2400 python experiments/schwinger_mts_scan.py \
    --out runs/retime_b$B --L 16 --beta $B --mass 0.1 \
    --chains 128 --ntraj 384 --cg-maxiter 1000 --cg-backend xla \
    --row plain:8:0:tau=2.0 \
    $( [ $B = 6 ] && echo "--row plain:4:0:tau=1.0 --row ft:4:0:$FLOW" ) \
    --row ft:8:0:$FLOW
  echo "=== stage8c beta=$B exit $? ==="
  cp runs/retime_b$B/scan.json artifacts/round3/retime_b$B.json 2>/dev/null
  sleep 20
done

timeout 2400 python experiments/schwinger_mts_scan.py \
  --out runs/retime_b7 --L 16 --beta 7 --mass 0.1 \
  --chains 128 --ntraj 384 --cg-maxiter 1000 --cg-backend xla \
  --plain-state artifacts/round3/states/b7_plain_t2n8.npz \
  --ft-state artifacts/round3/states/b7_ft_t05n4.npz \
  --row plain:8:0:tau=2.0 \
  --row ft:4:0:$FLOW \
  --row ft:8:0:$FLOW
echo "=== stage8c beta=7 exit $? ==="
cp runs/retime_b7/scan.json artifacts/round3/retime_b7.json 2>/dev/null
sleep 20

# 32^2 beta=6 rows, B=64 (volume-persistence section convention);
# xla vs fused on the same plain row doubles as a 32^2 backend A/B.
for BE in xla fused; do
  timeout 3600 python experiments/schwinger_mts_scan.py \
    --out runs/retime_L32_$BE --L 32 --beta 6 --mass 0.1 \
    --chains 64 --ntraj 256 --cg-maxiter 2000 --cg-backend $BE \
    --row plain:8:0:tau=2.0 \
    $( [ $BE = xla ] && echo "--row plain:16:0:tau=2.0 --row ft:6:0:$FLOW" )
  echo "=== stage8c L32 $BE exit $? ==="
  cp runs/retime_L32_$BE/scan.json artifacts/round3/retime_L32_$BE.json 2>/dev/null
  sleep 20
done
echo "=== stage 8c done ==="
