#!/usr/bin/env python
"""Run the multi-chain flow-sampling throughput benchmark on hardware
(round 3, VERDICT #4 BENCH row) and persist the result.

Scans chain counts at fixed (L, flow) to show on-device ensemble scaling
vs the reference's host-driven single chain (samplers.py:129-259).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fthmc_tpu.bench import bench_flow_sampling


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "runs/bench_flow_sampling"
    os.makedirs(out, exist_ok=True)
    rows = []
    for k in (1, 16, 64, 256):
        r = bench_flow_sampling(L=8, n_chains=k, batch_size=64,
                                n_layers=16, num_samples=512)
        print(r, flush=True)
        rows.append(r)
    json.dump(rows, open(os.path.join(out, "results.json"), "w"), indent=1)
    print("BENCH_SAMPLING_DONE", flush=True)


if __name__ == "__main__":
    main()
