#!/bin/bash
# Stage 9f: keep the 16^2 ladder DIRECT on both sides after the n10
# revision. Gated on the stage-9e probes: if plain's tau=2/n10 beats the
# n8 rows the beta=7 (and beta=6) chains were run at, re-run the DIRECT
# tau_int chains at n10 — estimated rows are fine for beta=8 (plain
# there needs ~1M trajectories) but the beta<=7 headline rows should not
# rest on a proxy. Also probes FT n3 at beta=7 (same symmetry argument
# as the beta=8 FT probe). Queued behind stage 9e (WAIT_PID).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 9f ==="
fi

FLOW=artifacts/flow8x8_b3_rncp24_ftb6

gate () {  # gate SCAN WINNER_NSTEP BASE_NSTEP THRESH
  python - "$1" "$2" "$3" "$4" <<'EOF'
import json, sys
scan, win, base, thr = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), float(sys.argv[4])
rows = {r["nstep"]: r["q_mobility"] / r["s_per_traj"]
        for r in json.load(open(scan))["rows"] if r["sampler"] == "plain"}
ok = win in rows and base in rows and rows[win] > thr * rows[base]
print(f"gate {scan}: n{win}={rows.get(win, 0):.5f} vs n{base}="
      f"{rows.get(base, 0):.5f} -> {'RUN' if ok else 'SKIP'}",
      file=sys.stderr)
sys.exit(0 if ok else 1)
EOF
}

# (a) beta=7 FT n3 probe (one cheap row, warm from the ext40 latent state)
timeout 1500 python experiments/schwinger_mts_scan.py \
  --out runs/schw_b7_ft_probe --L 16 --beta 7 --mass 0.1 \
  --chains 128 --ntraj 4096 --call-block 1024 \
  --cg-maxiter 1500 --cg-backend fused \
  --ft-state runs/schw_b7_ft_ext40/run_state.npz \
  --row ft:4:0:$FLOW:tau=0.5 --row ft:3:0:$FLOW:tau=0.5
echo "=== stage9f-a exit $? ==="
cp runs/schw_b7_ft_probe/scan.json \
   artifacts/round3/probe_b7_ft.json 2>/dev/null
sleep 30

# (b) beta=7 plain direct chain at n10 (gated on the 9e-a probe)
if gate runs/schw_b7_plain_probe/scan.json 10 8 1.12; then
  for i in 1 2 3; do
    timeout 3300 python experiments/schwinger_tauint.py \
      --L 16 --beta 7 --mass 0.1 --tau 2.0 --nstep 10 \
      --integrator omelyan --chains 128 --ntraj 196608 --block 4096 \
      --block-timeout 900 --cg-maxiter 1500 --cg-backend fused \
      --init-state runs/schw_b7_plain_ext40/run_state.npz \
      --therm-frac 0.05 --out runs/schw_b7_plain_n10
    rc=$?
    echo "=== stage9f-b slice $i exit $rc ==="
    [ $rc -eq 0 ] && break
    sleep 60
  done
  cp runs/schw_b7_plain_n10/results.json \
     artifacts/round3/schwinger_b7_plain_t2n10.json 2>/dev/null
fi
sleep 30

# (c) beta=6 plain direct chain at n10 (gated on the 9e-b probe);
#     no beta=6 state survives -> init from the beta=7 chain and give
#     the re-equilibration a full 25% therm cut (~20 tau at n10)
if gate runs/schw_b6_plain_probe/scan.json 10 8 1.12; then
  for i in 1 2; do
    timeout 3300 python experiments/schwinger_tauint.py \
      --L 16 --beta 6 --mass 0.1 --tau 2.0 --nstep 10 \
      --integrator omelyan --chains 128 --ntraj 49152 --block 4096 \
      --block-timeout 900 --cg-maxiter 1500 --cg-backend fused \
      --init-state runs/schw_b7_plain_ext40/run_state.npz \
      --therm-frac 0.25 --out runs/schw_b6_plain_n10
    rc=$?
    echo "=== stage9f-c slice $i exit $rc ==="
    [ $rc -eq 0 ] && break
    sleep 60
  done
  cp runs/schw_b6_plain_n10/results.json \
     artifacts/round3/schwinger_b6_plain_t2n10.json 2>/dev/null
fi
echo "=== stage 9f done ==="
