#!/bin/bash
# SUPERSEDED by run_chain_stage21b.sh: --call-block 1024 below crashed
# this class of VM 3/3 at 32^2 (CLAUDE.md: start new VMs at cb<=256).
# Kept for the record; do not re-run as-is.
# Stage 21 (round-3 session-11): the 32^2 beta=9 mobility pair, COLD-START
# edition. Stage-18A was queued with warm beta=6 states (runs/st32_*), but
# the VM recycled before it ran and the state files died with it. The
# mts-scan harness cold-starts when --plain-state/--ft-state are omitted:
# the first, UNTIMED full-ntraj pass doubles as thermalization (ordered
# start relaxes fast at high beta; sanity_report validates plaq against
# the exact Bessel value and flags a stuck chain).
# Budgets sized for a ~45-min session window (32^2 costs measured at
# beta=8: plain ~0.05 s/traj, FT ~0.2 s/traj, x2 for the untimed pass).
# Question: does the 16^2 beta=9 FT x2.56 survive x4 volume? (32^2 beta=8
# was a statistical tie; the crossover surface projects FT from beta~9.)
set -u
cd /root/repo
FLOW=artifacts/flow8x8_b3_rncp24_ftb6
mkdir -p runs artifacts/round3

echo "=== A) 32^2 beta=9 plain mobility (cold, n12) ==="
timeout 1800 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L32b9_plain_mob --L 32 --beta 9 --mass 0.1 \
  --chains 64 --ntraj 6144 --call-block 1024 \
  --cg-maxiter 2000 --cg-backend fused \
  --row plain:12:0:tau=2.0
echo "=== A exit $? ==="
cp runs/schw_L32b9_plain_mob/scan.json \
   artifacts/round3/probe_L32b9_plain.json 2>/dev/null
sleep 30

echo "=== B) 32^2 beta=9 FT mobility (cold, n4+n3) ==="
timeout 2700 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L32b9_ft_mob --L 32 --beta 9 --mass 0.1 \
  --chains 64 --ntraj 1536 --call-block 256 \
  --cg-maxiter 2000 --cg-backend fused \
  --row ft:4:0:$FLOW:tau=0.5 --row ft:3:0:$FLOW:tau=0.5
echo "=== B exit $? ==="
cp runs/schw_L32b9_ft_mob/scan.json \
   artifacts/round3/probe_L32b9_ft.json 2>/dev/null
echo "=== stage 21 done ==="
