#!/bin/bash
# Stage 12: round-3 session-9 follow-ups.
#  (a) beta=9 16^2 FT rows at the HIGH-beta FT optimum (n3/n2): the
#      stage-10 run timed out after the over-provisioned n4 row
#      (acc 0.925 -> the known pattern says n3/n2 win x1.3-2.3), so the
#      landed beta=9 verdict (FT x1.30 vs plain n10) is a lower bound.
#  (b) beta=9 plain side: n12 cliff check (acc slid to 0.79 at n10) and
#      an n10 re-run to double the tunneling-event count (the landed
#      n10 row has only ~23 events -> +-21%).
#  (c) CG cost map RE-RUN with valid thermalization: the session-9 CPU
#      check proved the earlier maps' tau=2/n8 cold-start thermalization
#      has acc 0.0-0.05 at L>=32 (fields stayed ordered), so their
#      L>=32 rows measured the free operator. Warm production states +
#      per-mass re-therm at dt=1/16, acceptance recorded in the rows.
# Queued behind stage 11 (WAIT_PID).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 12 ==="
fi

FLOW=artifacts/flow8x8_b3_rncp24_ftb6

# (a) beta=9 FT optimum rows
timeout 3000 python experiments/schwinger_mts_scan.py \
  --out runs/schw_b9_ft_mob2 --L 16 --beta 9 --mass 0.1 \
  --chains 128 --ntraj 16384 --call-block 2048 \
  --cg-maxiter 1500 --cg-backend fused \
  --ft-state runs/schw_b8_ft/run_state.npz \
  --row ft:3:0:$FLOW:tau=0.5 --row ft:2:0:$FLOW:tau=0.5
echo "=== stage12a exit $? ==="
cp runs/schw_b9_ft_mob2/scan.json \
   artifacts/round3/probe_b9_ft_n23.json 2>/dev/null
sleep 30

# (b) beta=9 plain cliff check + stats
timeout 2400 python experiments/schwinger_mts_scan.py \
  --out runs/schw_b9_plain_mob2 --L 16 --beta 9 --mass 0.1 \
  --chains 128 --ntraj 32768 --call-block 4096 \
  --cg-maxiter 1500 --cg-backend fused \
  --plain-state runs/schw_b8_plain_mob_n10/run_state.npz \
  --row plain:12:0:tau=2.0 --row plain:10:0:tau=2.0
echo "=== stage12b exit $? ==="
cp runs/schw_b9_plain_mob2/scan.json \
   artifacts/round3/probe_b9_plain_n12.json 2>/dev/null
sleep 30

# (c) CG cost map, valid thermalization (supersedes cg_cost_b6 L>=32
# rows AND all of cg_cost_light)
timeout 5400 python experiments/cg_cost.py --out runs/cg_cost_v2 \
  --beta 6 --L 16 32 64 --mass 0.1 0.05 0.02 0.01 0.005 --chains 64 \
  --therm 64 --therm-tau 1.0 --therm-nstep 16 --cg-maxiter 8000 \
  --state 32:runs/schw_L32_plain_n10/run_state.npz \
  --state 64:runs/schw_L64_plain_ext/run_state.npz
echo "=== stage12c exit $? ==="
cp runs/cg_cost_v2/cg_cost.json \
   artifacts/round3/cg_cost_v2.json 2>/dev/null
echo "=== stage 12 done ==="
