#!/bin/bash
# Serial TPU chain, stage 3: beta=6 production tau_int chains at the two
# grid candidates (tau=1/n8, tau=0.5/n2) with the 12L fw10 flow; extend
# the n4 chain past 40*tau; fresh plain chain for pion configs; pion
# cross-check.
set -u
cd /root/repo
GRID_PID=$(cat /tmp/chain_grid.pid)
while kill -0 "$GRID_PID" 2>/dev/null; do sleep 20; done
echo "=== stage-2 chain done, starting production chains ==="

timeout 3600 python experiments/schwinger_tauint.py \
  --ckpt artifacts/flow8x8_b3_rncp12_fw10 --out runs/schw_b6_ft12l_t1n8 \
  --L 16 --beta 6.0 --mass 0.1 --tau 1.0 --nstep 8 \
  --chains 128 --ntraj 12288 --block 128
echo "=== t1n8 exit $? ==="
sleep 20

timeout 3600 python experiments/schwinger_tauint.py \
  --ckpt artifacts/flow8x8_b3_rncp12_fw10 --out runs/schw_b6_ft12l_t05n2 \
  --L 16 --beta 6.0 --mass 0.1 --tau 0.5 --nstep 2 \
  --chains 128 --ntraj 12288 --block 128
echo "=== t05n2 exit $? ==="
sleep 20

# extend the n4 chain 12288 -> 20480 (resumes from run_state; >40 tau)
timeout 3600 python experiments/schwinger_tauint.py \
  --ckpt artifacts/flow8x8_b3_rncp12_fw10 --out runs/schw_b6_ft12l_t05n4 \
  --L 16 --beta 6.0 --mass 0.1 --tau 0.5 --nstep 4 \
  --chains 128 --ntraj 20480 --block 128
echo "=== t05n4 extend exit $? ==="
sleep 20

# plain chain at its cost-optimum (tau=2/n8), hot start: thermalized
# configs for the pion cross-check (plain tau_int rows already exist)
timeout 3600 python experiments/schwinger_tauint.py \
  --out runs/schw_b6_plain_t2n8 \
  --L 16 --beta 6.0 --mass 0.1 --tau 2.0 --nstep 8 \
  --chains 128 --ntraj 4096 --block 128 --start hot
echo "=== plain exit $? ==="
sleep 20

timeout 2400 python experiments/pion_xcheck.py --beta 6 --mass 0.1 \
  --plain-state runs/schw_b6_plain_t2n8/run_state.npz \
  --ft-state runs/schw_b6_ft12l_t05n4/run_state.npz \
  --ckpt artifacts/flow8x8_b3_rncp12_fw10 --out runs/pion_b6
echo "=== pion exit $? ==="
echo "=== chain done ==="
