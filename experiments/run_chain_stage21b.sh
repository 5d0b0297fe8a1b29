#!/bin/bash
# Stage 21b (round-3 session-11): retry the 32^2 beta=9 PLAIN mobility row.
# Stage-21A used call-block 1024 (the size the OLD VM tolerated for
# probe_L32b8_plain); this VM's worker crashed 3/3 under it. Retry at
# call-block 256 (within the CLAUDE.md 32^2 envelope), with an xla-CG
# fallback invocation if the fused-kernel program still kills the worker.
set -u
cd /root/repo
mkdir -p runs artifacts/round3

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "=== predecessor $WAIT_PID done, starting stage 21b ==="
  sleep 90
fi

# scan.json is written incrementally: a stale file from an earlier attempt
# would silently skip the xla fallback and get copied as fresh data.
rm -f runs/schw_L32b9_plain_mob/scan.json

echo "=== 32^2 beta=9 plain mobility retry (cold, n12, cb256 fused) ==="
timeout 1800 python experiments/schwinger_mts_scan.py \
  --out runs/schw_L32b9_plain_mob --L 32 --beta 9 --mass 0.1 \
  --chains 64 --ntraj 6144 --call-block 256 \
  --cg-maxiter 2000 --cg-backend fused \
  --row plain:12:0:tau=2.0
echo "=== fused exit $? ==="
if [ ! -s runs/schw_L32b9_plain_mob/scan.json ]; then
  echo "=== fused produced nothing; xla fallback ==="
  sleep 90
  timeout 1800 python experiments/schwinger_mts_scan.py \
    --out runs/schw_L32b9_plain_mob --L 32 --beta 9 --mass 0.1 \
    --chains 64 --ntraj 6144 --call-block 256 \
    --cg-maxiter 2000 --cg-backend xla \
    --row plain:12:0:tau=2.0
  echo "=== xla exit $? ==="
fi
cp runs/schw_L32b9_plain_mob/scan.json \
   artifacts/round3/probe_L32b9_plain.json 2>/dev/null
echo "=== stage 21b done ==="
