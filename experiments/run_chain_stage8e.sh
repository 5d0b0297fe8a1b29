#!/bin/bash
# Stage 8e: the 64^2 FT-HMC side of the head-to-head, via the CHUNKED
# tauint harness — the mts_scan's single-call 96-traj FT rows exceed the
# worker's sustained-execution threshold and hard-crash it (stage-8b,
# 3/3 attempts), so this uses block<=16 persist+watchdog chunks instead
# (the proven long-run pattern). B=32 keeps the per-block program light.
# Plain-side comparator: schwinger_L64_b6_plain_t2n16.json (tau=338(18),
# 0.137 s/traj at B=64). Queued behind stage 8d (WAIT_PID).
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 8e ==="
fi

FLOW=artifacts/flow8x8_b3_rncp24_ftb6

# (a) B=32 latent seed from the thermalized plain state
timeout 1800 python experiments/seed_ft64.py \
  --plain-state runs/schw_L64_plain_therm/run_state.npz \
  --chains 32 --ckpt $FLOW --out runs/schw_L64_ft_seed32
echo "=== stage8e seed exit $? ==="
sleep 30

# (b) acceptance probe at nstep=8 (tau=0.5, fused CG, 16-traj blocks)
mkdir -p runs/schw_L64_ft_probe_n8
cp runs/schw_L64_ft_seed32/run_state.npz runs/schw_L64_ft_probe_n8/
timeout 2700 python experiments/schwinger_tauint.py \
  --ckpt $FLOW --L 64 --beta 6 --mass 0.1 --tau 0.5 --nstep 8 \
  --integrator omelyan --chains 32 --ntraj 128 --block 16 \
  --block-timeout 600 --cg-maxiter 2000 --cg-backend fused \
  --start cold --therm-frac 0.25 --out runs/schw_L64_ft_probe_n8
echo "=== stage8e probe n8 exit $? ==="
sleep 30

ACC=$(python -c "import json;print(json.load(open('runs/schw_L64_ft_probe_n8/results.json'))['acc'])" 2>/dev/null || echo 0)
echo "=== probe n8 acc=$ACC ==="
if python -c "exit(0 if float('$ACC') >= 0.5 else 1)"; then
  NS=8
else
  NS=16
  mkdir -p runs/schw_L64_ft_probe_n16
  cp runs/schw_L64_ft_seed32/run_state.npz runs/schw_L64_ft_probe_n16/
  timeout 2700 python experiments/schwinger_tauint.py \
    --ckpt $FLOW --L 64 --beta 6 --mass 0.1 --tau 0.5 --nstep 16 \
    --integrator omelyan --chains 32 --ntraj 128 --block 16 \
    --block-timeout 600 --cg-maxiter 2000 --cg-backend fused \
    --start cold --therm-frac 0.25 --out runs/schw_L64_ft_probe_n16
  echo "=== stage8e probe n16 exit $? ==="
  sleep 30
fi

# (c) tau_int chain at the chosen nstep, resumable slices
mkdir -p runs/schw_L64_ft_chain
[ -f runs/schw_L64_ft_chain/run_state.npz ] || \
  cp runs/schw_L64_ft_probe_n$NS/run_state.npz runs/schw_L64_ft_chain/
for i in 1 2 3 4; do
  timeout 3300 python experiments/schwinger_tauint.py \
    --ckpt $FLOW --L 64 --beta 6 --mass 0.1 --tau 0.5 --nstep $NS \
    --integrator omelyan --chains 32 --ntraj 2048 --block 16 \
    --block-timeout 600 --cg-maxiter 2000 --cg-backend fused \
    --start cold --out runs/schw_L64_ft_chain
  rc=$?
  echo "=== stage8e chain slice $i exit $rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
cp runs/schw_L64_ft_chain/results.json \
   artifacts/round3/schwinger_L64_b6_ft_t05n$NS.json 2>/dev/null
echo "=== stage 8e done ==="
