#!/bin/bash
# Stage 8: the light-mass / large-volume dynamical regime (ROADMAP
# round-4 item 1) — where CG iterations finally dominate and the
# integrator stack (MTS / Hasenbusch) should start paying, plus the
# 64^2 plain-vs-FT equilibrium comparison the fused Dirac kernel
# unlocked. Queued behind the stage-7d beta=7 40tau chains
# (WAIT_PID=driver pid). All scans start from thermalized states; rows
# write incrementally so a worker crash loses at most one row.
set -u
cd /root/repo

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== predecessor $WAIT_PID done, starting stage 8 ==="
fi

# (a) 64^2 FT latent seed from the thermalized plain state (the complex
#     exp/angle roundtrip check crashed the axon backend; fixed to real
#     arithmetic).
timeout 1800 python experiments/seed_ft64.py \
  --plain-state runs/schw_L64_plain_therm/run_state.npz \
  --ckpt artifacts/flow8x8_b3_rncp24_ftb6 --out runs/schw_L64_ft_seed
echo "=== stage8 seed exit $? ==="
sleep 30

# (b) 64^2 beta=6 m=0.1 equilibrium scan, fused CG: plain single-scale
#     optimum hunt (tau=1 vs 2), MTS nestings, one Hasenbusch row, FT
#     nstep scan. 96 timed traj per row after 96 warm.
timeout 10800 python experiments/schwinger_mts_scan.py \
  --out runs/schw_mts_L64b6 --L 64 --beta 6 --mass 0.1 \
  --chains 64 --ntraj 96 --cg-maxiter 2000 --cg-backend fused \
  --plain-state runs/schw_L64_plain_therm/run_state.npz \
  --ft-state runs/schw_L64_ft_seed/run_state.npz \
  --row plain:16:0:tau=2.0 \
  --row plain:12:0:tau=2.0 \
  --row plain:8:0:tau=1.0 \
  --row plain:12:0:tau=1.0 \
  --row plain:4:4:tau=2.0 \
  --row plain:8:2:tau=2.0 \
  --row plain:6:2:tau=2.0:hb=0.45x2 \
  --row ft:8:0:artifacts/flow8x8_b3_rncp24_ftb6 \
  --row ft:12:0:artifacts/flow8x8_b3_rncp24_ftb6 \
  --row ft:16:0:artifacts/flow8x8_b3_rncp24_ftb6
echo "=== stage8 L64 scan exit $? ==="
cp runs/schw_mts_L64b6/scan.json artifacts/round3/schw_mts_L64b6.json 2>/dev/null
sleep 30

# (c) 32^2 beta=6 m=0.02 light-mass thermalization (hot start, fused CG)
timeout 3600 python experiments/schwinger_tauint.py \
  --L 32 --beta 6 --mass 0.02 --tau 1.0 --nstep 16 --integrator omelyan \
  --chains 64 --ntraj 1024 --block 128 --block-timeout 900 \
  --cg-maxiter 4000 --cg-backend fused \
  --start hot --out runs/schw_L32_m002_therm
echo "=== stage8 m002 therm exit $? ==="
sleep 30

# (d) 32^2 beta=6 m=0.02 integrator-stack scan: single-scale baselines,
#     MTS nestings (gauge inner / fermion outer), Hasenbusch splits
#     scaled to the light mass, and the transferred pure-gauge flow.
timeout 10800 python experiments/schwinger_mts_scan.py \
  --out runs/schw_mts_L32m002 --L 32 --beta 6 --mass 0.02 \
  --chains 64 --ntraj 128 --cg-maxiter 4000 --cg-backend fused \
  --plain-state runs/schw_L32_m002_therm/run_state.npz \
  --row plain:8:0:tau=1.0 \
  --row plain:12:0:tau=1.0 \
  --row plain:12:0:tau=2.0 \
  --row plain:16:0:tau=2.0 \
  --row plain:3:3:tau=1.0 \
  --row plain:4:4:tau=2.0 \
  --row plain:6:2:tau=2.0 \
  --row plain:4:2:tau=1.0:hb=0.2x2 \
  --row plain:6:2:tau=2.0:hb=0.2x2 \
  --row plain:6:2:tau=2.0:hb=0.45x2 \
  --row ft:8:0:artifacts/flow8x8_b3_rncp24_ftb6 \
  --row ft:12:0:artifacts/flow8x8_b3_rncp24_ftb6
echo "=== stage8 m002 scan exit $? ==="
cp runs/schw_mts_L32m002/scan.json artifacts/round3/schw_mts_L32m002.json 2>/dev/null
sleep 30

# (e) 64^2 plain mobility/tau_int chain extension (resume the therm
#     chain; fused CG; bounded budget — establishes whether plain is
#     frozen at 64^2 like the quenched case or merely slow).
mkdir -p runs/schw_L64_plain_ext
[ -f runs/schw_L64_plain_ext/run_state.npz ] || \
  cp runs/schw_L64_plain_therm/run_state.npz runs/schw_L64_plain_ext/
for i in 1 2 3; do
  timeout 3300 python experiments/schwinger_tauint.py \
    --L 64 --beta 6 --mass 0.1 --tau 2.0 --nstep 16 --integrator omelyan \
    --chains 64 --ntraj 8192 --block 256 --block-timeout 900 \
    --cg-maxiter 2000 --cg-backend fused \
    --start hot --out runs/schw_L64_plain_ext
  rc=$?
  echo "=== stage8 L64 plain ext slice $i exit $rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
cp runs/schw_L64_plain_ext/results.json artifacts/round3/schwinger_L64_b6_plain_t2n16.json 2>/dev/null
echo "=== stage 8 done ==="
