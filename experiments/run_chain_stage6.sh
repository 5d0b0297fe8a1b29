#!/bin/bash
# Serial TPU chain, stage 6: 64^2 beta=6 m=0.1 Schwinger probes.
# 1. plain mobility probe (the freeze-out bound; tau_int itself is
#    unmeasurable for plain at this volume by the 32^2/64^2 evidence)
# 2. FT nstep mini-scan (dt must shrink ~V^{1/4}: 32^2 optimum n6 -> try
#    n6/n8/n12) to pick the production point.
set -u
cd /root/repo
PREV_PID=$(cat /tmp/chain_s5.pid)
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
echo "=== stage 5 done, starting stage 6 ==="

timeout 3600 python experiments/schwinger_tauint.py \
  --L 64 --beta 6 --mass 0.1 --tau 2.0 --nstep 8 --integrator omelyan \
  --chains 64 --ntraj 768 --block 32 --block-timeout 900 --start cold \
  --out runs/schw_L64_plain_probe
echo "=== L64 plain probe exit $? ==="
sleep 30

timeout 5400 python experiments/schwinger_scan.py \
  --ckpt artifacts/flow8x8_b3_rncp24_ftb6 --L 64 --beta 6 --mass 0.1 \
  --tau 0.5 --plain-nsteps --ft-nsteps 6 8 12 \
  --warmup-traj 64 --chains 64 --ntraj 128 --block 32 \
  --out runs/schw_scan_L64b6
echo "=== L64 FT scan exit $? ==="
echo "=== stage 6 done ==="
