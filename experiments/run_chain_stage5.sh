#!/bin/bash
# Serial TPU chain, stage 5: extend the two caveated FT headline rows to
# >= 40 tau (fresh chains; the session-2 run states were cleaned up).
# 1. beta=7 16^2 FT ftb6 tau=0.5/n4: 24576 traj -> ~44 tau  (~21 min)
# 2. 32^2 beta=6 FT ftb6 tau=0.5/n6:  8192 traj -> ~46 tau  (~53 min)
# (The plain sides are conservative: short-chain bias UNDERestimates
# tau_plain, i.e. understates the FT win.)
set -u
cd /root/repo
PREV_PID=$(cat /tmp/chain_s4.pid)
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
echo "=== stage 4 done, starting stage 5 ==="

timeout 3600 python experiments/schwinger_tauint.py \
  --ckpt artifacts/flow8x8_b3_rncp24_ftb6 --L 16 --beta 7 --mass 0.1 \
  --tau 0.5 --nstep 4 --integrator omelyan --chains 128 \
  --ntraj 24576 --block 512 --start cold \
  --out runs/schw_b7_ft_ftb6_t05n4_ext
echo "=== b7 FT ext exit $? ==="
sleep 30

timeout 7200 python experiments/schwinger_tauint.py \
  --ckpt artifacts/flow8x8_b3_rncp24_ftb6 --L 32 --beta 6 --mass 0.1 \
  --tau 0.5 --nstep 6 --integrator omelyan --chains 64 \
  --ntraj 8192 --block 64 --block-timeout 600 --start cold \
  --out runs/schw_L32_ft_t05n6_ext
echo "=== L32 FT ext exit $? ==="
echo "=== stage 5 done ==="
