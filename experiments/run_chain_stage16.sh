#!/bin/bash
# Stage 16 (round-3 session-10): fresh-VM rebuild + the outstanding
# measurement matrix. The VM reset wiped runs/ (all warm run_state.npz
# files), so stages 12/13/15 queued last session never produced
# artifacts. This master stage:
#   A) rebuilds thermalized states at 32^2/64^2 beta=6 (fine-dt therm,
#      acceptance recorded by the resilient runner — the session-9
#      lesson: a state is only valid if its thermalization acceptance
#      is recorded);
#   B) beta=9 16^2 rung completion (FT n3/n2 optimum rows + plain
#      n12 cliff check; cold start self-therm is fine at 16^2) —
#      upgrades the landed "FT x1.30 lower bound";
#   C) bf16 conv-dtype A/B on the FT side at 32^2/64^2 (the FT cost
#      wall at volume is the 24L flow VJP; volume convs are
#      bandwidth-bound where bf16's traffic halving should show);
#   D) 32^2 beta=8 mobility pair (does the 16^2 beta~8 FT flip survive
#      4x volume?);
#   E) cg_cost_v2: the CG cost map re-run with VALID thermalization
#      (supersedes the retracted cg_cost_light + cg_cost_b6 L>=32);
#   F) 64^2 beta=8 mobility pair (the volume x high-beta matrix
#      corner; a plain freeze-out bound is itself the answer).
# Ordered by headline value per chip-second in case of a crash.
set -u
cd /root/repo
FLOW=artifacts/flow8x8_b3_rncp24_ftb6
mkdir -p runs artifacts/round3

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 16 ==="
fi

echo "=== A) warm states ==="
# 32^2 beta=6 plain, tau=2/n16 (dt=1/8, acc ~0.98 — well above the cliff)
timeout 1800 python experiments/schwinger_tauint.py \
  --out runs/st32_plain --L 32 --beta 6 --mass 0.1 --tau 2.0 --nstep 16 \
  --chains 64 --ntraj 512 --block 128 --cg-backend fused --cg-maxiter 2000
echo "=== A1 (32^2 plain state) exit $? ==="
sleep 30
# 32^2 beta=6 FT (ftb6 flow), tau=0.5/n8 (dt=1/16 — conservative)
timeout 2400 python experiments/schwinger_tauint.py \
  --out runs/st32_ft --ckpt $FLOW --L 32 --beta 6 --mass 0.1 \
  --tau 0.5 --nstep 8 --chains 64 --ntraj 256 --block 64 \
  --cg-backend fused --cg-maxiter 2000
echo "=== A2 (32^2 FT state) exit $? ==="
sleep 30
# 64^2 beta=6 plain, tau=2/n16
timeout 2400 python experiments/schwinger_tauint.py \
  --out runs/st64_plain --L 64 --beta 6 --mass 0.1 --tau 2.0 --nstep 16 \
  --chains 64 --ntraj 512 --block 64 --cg-backend fused --cg-maxiter 2000
echo "=== A3 (64^2 plain state) exit $? ==="
sleep 30
# 64^2 beta=6 FT, tau=0.5/n16 (the production 64^2 config), 32 chains
timeout 3600 python experiments/schwinger_tauint.py \
  --out runs/st64_ft --ckpt $FLOW --L 64 --beta 6 --mass 0.1 \
  --tau 0.5 --nstep 16 --chains 32 --ntraj 96 --block 16 \
  --block-timeout 1500 --cg-backend fused --cg-maxiter 2000
echo "=== A4 (64^2 FT state) exit $? ==="
sleep 30

echo "=== B) beta=9 16^2 rung completion (cold start self-therm) ==="
timeout 3000 python experiments/schwinger_mts_scan.py \
  --out runs/schw_b9_ft_mob2 --L 16 --beta 9 --mass 0.1 \
  --chains 128 --ntraj 16384 --call-block 2048 \
  --cg-maxiter 1500 --cg-backend fused \
  --row ft:3:0:$FLOW:tau=0.5 --row ft:2:0:$FLOW:tau=0.5
echo "=== B1 (beta=9 FT n3/n2) exit $? ==="
cp runs/schw_b9_ft_mob2/scan.json \
   artifacts/round3/probe_b9_ft_n23.json 2>/dev/null
sleep 30
timeout 2400 python experiments/schwinger_mts_scan.py \
  --out runs/schw_b9_plain_mob2 --L 16 --beta 9 --mass 0.1 \
  --chains 128 --ntraj 32768 --call-block 4096 \
  --cg-maxiter 1500 --cg-backend fused \
  --row plain:12:0:tau=2.0 --row plain:10:0:tau=2.0
echo "=== B2 (beta=9 plain n12/n10) exit $? ==="
cp runs/schw_b9_plain_mob2/scan.json \
   artifacts/round3/probe_b9_plain_n12.json 2>/dev/null
sleep 30

echo "=== C) bf16 flow-VJP A/B at volume ==="
for DT in float32 bfloat16; do
  timeout 2700 python experiments/schwinger_mts_scan.py \
    --out runs/schw_L64_ft_$DT --L 64 --beta 6 --mass 0.1 \
    --chains 32 --ntraj 256 --call-block 32 \
    --cg-maxiter 2000 --cg-backend fused --conv-dtype $DT \
    --ft-state runs/st64_ft/run_state.npz \
    --row ft:16:0:$FLOW:tau=0.5
  echo "=== C L64 $DT exit $? ==="
  cp runs/schw_L64_ft_$DT/scan.json \
     artifacts/round3/bf16ab_L64_$DT.json 2>/dev/null
  sleep 30
  timeout 1500 python experiments/schwinger_mts_scan.py \
    --out runs/schw_L32_ft_$DT --L 32 --beta 6 --mass 0.1 \
    --chains 64 --ntraj 512 --call-block 128 \
    --cg-maxiter 2000 --cg-backend fused --conv-dtype $DT \
    --ft-state runs/st32_ft/run_state.npz \
    --row ft:6:0:$FLOW:tau=0.5
  echo "=== C L32 $DT exit $? ==="
  cp runs/schw_L32_ft_$DT/scan.json \
     artifacts/round3/bf16ab_L32_$DT.json 2>/dev/null
  sleep 30
done

echo "=== D) 32^2 beta=8 mobility pair ==="
timeout 2400 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L32b8_plain_mob --L 32 --beta 8 --mass 0.1 \
  --chains 64 --ntraj 8192 --call-block 1024 \
  --cg-maxiter 2000 --cg-backend fused \
  --plain-state runs/st32_plain/run_state.npz \
  --row plain:8:0:tau=2.0 --row plain:10:0:tau=2.0
echo "=== D1 exit $? ==="
cp runs/schw_L32b8_plain_mob/scan.json \
   artifacts/round3/probe_L32b8_plain.json 2>/dev/null
sleep 30
timeout 4800 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L32b8_ft_mob --L 32 --beta 8 --mass 0.1 \
  --chains 64 --ntraj 1024 --call-block 128 \
  --cg-maxiter 2000 --cg-backend fused \
  --ft-state runs/st32_ft/run_state.npz \
  --row ft:4:0:$FLOW:tau=0.5 --row ft:5:0:$FLOW:tau=0.5 \
  --row ft:6:0:$FLOW:tau=0.5
echo "=== D2 exit $? ==="
cp runs/schw_L32b8_ft_mob/scan.json \
   artifacts/round3/probe_L32b8_ft.json 2>/dev/null
sleep 30

echo "=== E) cg_cost_v2 (valid thermalization) ==="
timeout 5400 python experiments/cg_cost.py --out runs/cg_cost_v2 \
  --beta 6 --L 16 32 64 --mass 0.1 0.05 0.02 0.01 0.005 --chains 64 \
  --therm 64 --therm-tau 1.0 --therm-nstep 16 --cg-maxiter 8000 \
  --state 32:runs/st32_plain/run_state.npz \
  --state 64:runs/st64_plain/run_state.npz
echo "=== E exit $? ==="
cp runs/cg_cost_v2/cg_cost.json \
   artifacts/round3/cg_cost_v2.json 2>/dev/null
sleep 30

echo "=== F) 64^2 beta=8 mobility pair ==="
timeout 4500 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L64b8_plain_mob --L 64 --beta 8 --mass 0.1 \
  --chains 64 --ntraj 8192 --call-block 256 \
  --cg-maxiter 2000 --cg-backend fused \
  --plain-state runs/st64_plain/run_state.npz \
  --row plain:10:0:tau=2.0 --row plain:16:0:tau=2.0
echo "=== F1 exit $? ==="
cp runs/schw_L64b8_plain_mob/scan.json \
   artifacts/round3/probe_L64b8_plain.json 2>/dev/null
sleep 30
timeout 3600 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L64b8_ft_mob --L 64 --beta 8 --mass 0.1 \
  --chains 32 --ntraj 512 --call-block 32 \
  --cg-maxiter 2000 --cg-backend fused \
  --ft-state runs/st64_ft/run_state.npz \
  --row ft:12:0:$FLOW:tau=0.5 --row ft:8:0:$FLOW:tau=0.5
echo "=== F2 exit $? ==="
cp runs/schw_L64b8_ft_mob/scan.json \
   artifacts/round3/probe_L64b8_ft.json 2>/dev/null
echo "=== stage 16 done ==="
