#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line with the headline metric.

Headline: plain-HMC leapfrog chain-steps/sec on one chip at 64^2, beta=6,
1024 vmapped chains, tau=1 nstep=25 - the EXACT north-star config quoted in
BENCH.md's throughput table (BASELINE.json north star). vs_baseline is
relative to the reference's CPU throughput volume-scaled to 64^2
(~9.3 chain-steps/s; derivation in fthmc_tpu/bench.py).
"""
import json
import sys


def main():
    from fthmc_tpu.bench import bench_hmc_leapfrog
    r = bench_hmc_leapfrog(L=64, chains=1024, beta=6.0, nstep=25, ntraj=20)
    print(json.dumps({
        "metric": r["metric"],
        "value": r["value"],
        "unit": r["unit"],
        "vs_baseline": r["vs_baseline"],
    }))


if __name__ == "__main__":
    sys.exit(main())
