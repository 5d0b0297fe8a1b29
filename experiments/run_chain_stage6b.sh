#!/bin/bash
# Serial TPU chain, stage 6b (replaces the stopped stage-6 watcher):
# 1. dirac_bench: fused-Pallas vs XLA CG A/B (new kernel, measured verdict)
# 2. verify drive (library surface on TPU incl. the fused backend)
# 3. beta=7 FT extension resume 24576 -> 40960 (tau_int still rising at
#    24 tau; push the FT side to ~40 tau)
# 4. 64^2 beta=6 m=0.1 probes: plain mobility bound + FT nstep mini-scan
set -u
cd /root/repo
PREV_PID=$(cat /tmp/chain_s5.pid)
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
echo "=== stage 5 done, starting stage 6b ==="

timeout 3600 python experiments/dirac_bench.py \
  --L 32 64 --mass 0.1 0.02 --chains 64 --out runs/dirac_bench
echo "=== dirac_bench exit $? ==="
sleep 30

timeout 1800 python /tmp/verify_drive.py
echo "=== verify exit $? ==="
sleep 30

timeout 2400 python experiments/schwinger_tauint.py \
  --ckpt artifacts/flow8x8_b3_rncp24_ftb6 --L 16 --beta 7 --mass 0.1 \
  --tau 0.5 --nstep 4 --integrator omelyan --chains 128 \
  --ntraj 40960 --block 512 --start cold \
  --out runs/schw_b7_ft_ftb6_t05n4_ext
echo "=== b7 FT ext2 exit $? ==="
sleep 30

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
echo "=== stage 6b done ==="
