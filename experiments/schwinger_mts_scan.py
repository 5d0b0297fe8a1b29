#!/usr/bin/env python
"""Multi-timescale (Sexton-Weingarten) integrator scan for the Schwinger
model: acceptance + in-scan cost per (outer nstep, n_inner) config, for
plain HMC and FT-HMC (any flow checkpoint), warm- or cold-started force
solves.

Starts every row from a THERMALIZED state (a previous production
run_state.npz) so short scans measure equilibrium acceptance, not
thermalization. Rows are written incrementally to --out/scan.json.

Example:
  python experiments/schwinger_mts_scan.py --out runs/schw_mts_scan \
    --plain-state runs/schw_b5_plain_t1n4/run_state.npz \
    --ft-state runs/schw_b5_ft_t05n24/run_state.npz \
    --row plain:4:8 --row ft:4:6:artifacts/flow8x8_b3_rncp24 \
    --row ft:4:3:artifacts/flow8x8_b3_rncp24_ftb6
Row syntax: sampler:nstep:n_inner[:ckpt][:tau=X][:hb=DMxNMID][:cold]
(n_inner=0 -> single-scale Omelyan; 'cold' -> warm_start=False;
hb=0.45x2 -> Hasenbusch split at m+0.45 with n_mid=2).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu.checkpoint import load_checkpoint_auto
from fthmc_tpu.schwinger import (SchwingerConfig, _run_fthmc_dyn_scan,
                                 _run_hmc_dyn_scan)


def parse_row(s: str):
    parts = s.split(":")
    sampler, nstep, n_inner = parts[0], int(parts[1]), int(parts[2])
    ckpt, tau, warm, hb_dm, n_mid = None, None, True, 0.0, 1
    for p in parts[3:]:
        if p.startswith("tau="):
            tau = float(p[4:])
        elif p.startswith("hb="):          # hb=DMxNMID, e.g. hb=0.4x2
            dm, _, nm = p[3:].partition("x")
            hb_dm, n_mid = float(dm), int(nm or 1)
        elif p == "cold":
            warm = False
        else:
            ckpt = p
    return dict(sampler=sampler, nstep=nstep, n_inner=n_inner, ckpt=ckpt,
                tau=tau, warm=warm, hb_dm=hb_dm, n_mid=n_mid)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--beta", type=float, default=5.0)
    p.add_argument("--mass", type=float, default=0.1)
    p.add_argument("--tau-plain", type=float, default=1.0)
    p.add_argument("--tau-ft", type=float, default=0.5)
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--ntraj", type=int, default=192)
    p.add_argument("--cg-maxiter", type=int, default=1000)
    p.add_argument("--cg-backend", choices=["xla", "fused", "mixed"], default="xla",
                   help="fermion CG operator backend (fused = Pallas VMEM "
                        "kernel, ops/pallas_fermion.py)")
    p.add_argument("--call-block", type=int, default=64,
                   help="max trajectories per device call (the worker "
                        "crashes under multi-minute single executions)")
    p.add_argument("--plain-state", default=None,
                   help="run_state.npz with a thermalized plain chain")
    p.add_argument("--ft-state", default=None,
                   help="run_state.npz with a thermalized FT latent chain")
    p.add_argument("--conv-dtype", choices=["float32", "bfloat16"],
                   default=None,
                   help="override the flow's conv compute dtype (bf16 "
                        "A/B: the FT force is flow-VJP-bound at volume; "
                        "changing the dtype changes WHICH flow runs, but "
                        "MH exactness holds - BENCH round-2 bf16 notes)")
    p.add_argument("--therm", type=int, default=None,
                   help="untimed cold-start thermalization trajectories "
                        "(default: a full ntraj pass — the conservative "
                        "round-3 protocol; mobility is a local rate, so "
                        "shorter therm is fine once plaq has settled)")
    p.add_argument("--min-events", type=float, default=0,
                   help="statistics floor: auto-extend the timed segment "
                        "until >= this many tunneling events (BENCH.md "
                        "lesson: <50-event rows carry 20-30%% Poisson "
                        "noise and must not become verdicts)")
    p.add_argument("--max-extra-wall", type=float, default=0,
                   help="wall budget (s) for the --min-events extension, "
                        "per row")
    p.add_argument("--no-row-persist", action="store_true",
                   help="disable per-block row state persistence/resume "
                        "(round-5: on by default so worker crashes cost "
                        "one block, not the row)")
    p.add_argument("--block-pause", type=float, default=0.0,
                   help="sleep this many seconds between call-blocks "
                        "(crash avoidance: the worker dies under "
                        "SUSTAINED heavy 64^2 programs)")
    p.add_argument("--platform", default=None, choices=["cpu"],
                   help="force the JAX platform (config-level override; "
                        "JAX_PLATFORMS env is ignored on axon VMs)")
    p.add_argument("--row", action="append", required=True)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    os.makedirs(args.out, exist_ok=True)
    from fthmc_tpu import fermion
    fermion.set_cg_backend(args.cg_backend)

    states, flows = {}, {}

    # host-side caches: a TPU worker crash invalidates device buffers, so
    # every row (re-)uploads from numpy. path=None -> cold start (zeros;
    # the first, untimed call of each row thermalizes).
    def get_state(path):
        if path is None:
            return jnp.zeros((args.chains, 2, args.L, args.L), jnp.float32)
        if path not in states:
            states[path] = np.load(path)["z"][:args.chains]
        return jnp.asarray(states[path])

    def get_flow(ckpt):
        if ckpt not in flows:
            st, meta, spec, _ = load_checkpoint_auto(ckpt)
            if args.conv_dtype:
                import dataclasses
                spec = dataclasses.replace(spec,
                                           conv_dtype=args.conv_dtype)
            flows[ckpt] = (jax.device_get(st.params), spec)
        params, spec = flows[ckpt]
        return jax.device_put(params), spec

    rows = []
    for i, rs in enumerate(args.row):
        for attempt in range(3):
            try:
                _run_row(args, rs, i, rows, get_state, get_flow)
                break
            except Exception as e:
                print(f"row {rs} attempt {attempt} failed: "
                      f"{str(e)[:100]}; retrying in 45 s", flush=True)
                time.sleep(45)


def _run_row(args, rs, i, rows, get_state, get_flow):
    r = parse_row(rs)
    ft = r["sampler"] == "ft"
    tau = r["tau"] if r["tau"] is not None else (
        args.tau_ft if ft else args.tau_plain)
    cfg = SchwingerConfig(
        L=args.L, beta=args.beta, mass=args.mass, tau=tau,
        nstep=r["nstep"], n_inner=r["n_inner"], n_chains=args.chains,
        warm_start=r["warm"], hasenbusch_dm=r["hb_dm"],
        n_mid=r["n_mid"], cg_maxiter=args.cg_maxiter)
    key = jax.random.PRNGKey(7000 + i)
    # The axon worker hard-crashes under single device executions beyond
    # a few minutes (round-3 lesson; 64^2 FT rows died 3/3), so every
    # ntraj segment runs as chained calls of <= call_block trajectories
    # with a host sync between. Timing is unchanged in spirit: the first
    # (compile+advance) segment is untimed; the timed segment's wall
    # includes the per-call sync overhead, which the production chunked
    # drivers pay too (conservative).
    cb = min(args.call_block, args.ntraj)
    nseg = -(-args.ntraj // cb)
    ntherm = args.ntraj if args.therm is None else args.therm
    nseg_therm = -(-ntherm // cb) if ntherm > 0 else 0

    if ft:
        params, spec = get_flow(r["ckpt"])
        state = get_state(args.ft_state)
        if args.ft_state is None:
            from fthmc_tpu.models.flow import flow_reverse
            state, _ = flow_reverse(params, state, spec)  # f^{-1}(0): cold

        def seg(state, k):
            return _run_fthmc_dyn_scan(params, spec, k, state, cfg, cb)
    else:
        state = get_state(args.plain_state)

        def seg(state, k):
            return _run_hmc_dyn_scan(k, state, cfg, cb)

    # --- Round-5 resilience: watchdog + per-block persistence/resume ---
    # The axon worker dies SILENTLY under sustained 64^2 FT load every
    # ~15-20 min on some VMs (two kills this round, both mid-row): the
    # sync blocks forever, so neither the row retry loop nor the queue
    # timeout recovers the work. Two measures, both on by default:
    #   1. SIGALRM block watchdog — first block gets compile headroom
    #      (the 64^2 bf16 fused-CG program takes up to ~25 min to build),
    #      later blocks 10x their median wall; a hang fast-fails the
    #      PROCESS (os._exit(3)) so the queue retry relaunches after the
    #      worker's ~90 s recovery window instead of burning the stage
    #      timeout.
    #   2. Per-block row state persistence ({out}/rowN_<fp>.npz: chain
    #      state + timed histories + walls + therm progress) — a retry
    #      RESUMES the row where the worker died instead of restarting
    #      (completed rows re-reduce with zero device work). The lost
    #      in-flight block leaves one uncounted gap between persisted
    #      blocks; mobility is a rate over counted transitions, so the
    #      estimate stays unbiased.
    import hashlib
    import signal

    def _alarm(signum, frame):
        raise TimeoutError("block watchdog")

    signal.signal(signal.SIGALRM, _alarm)

    from fthmc_tpu.hmc import TrajMetrics
    fields = TrajMetrics._fields
    fp = hashlib.sha1(
        f"{rs}|{cb}|{args.chains}|{args.L}|{args.beta}|{args.mass}|"
        f"{args.cg_backend}|{args.conv_dtype}".encode()).hexdigest()[:8]
    state_path = os.path.join(args.out, f"row{i}_{fp}.npz")
    th_done = 0
    hist = {f: [] for f in fields}
    walls: list[float] = []            # per-TIMED-block walls
    bwalls: list[float] = []           # all block walls (budget calc)
    if not args.no_row_persist and os.path.exists(state_path):
        try:
            d = np.load(state_path)
            state = jnp.asarray(d["z"])
            th_done = int(d["th_done"])
            for f in fields:
                if d[f].shape[0]:
                    hist[f] = [d[f]]
            walls = [float(w) for w in d["walls"]]
            print(f"  [{rs}] RESUME: therm {th_done}/{nseg_therm} blocks, "
                  f"{len(walls)} timed blocks persisted", flush=True)
        except Exception as e:   # torn write / partial file: cold start
            print(f"  [{rs}] persisted state unreadable ({e}); "
                  "cold-starting the row", flush=True)
            th_done, hist, walls = 0, {f: [] for f in fields}, []

    def persist():
        if args.no_row_persist:
            return
        # atomic: a kill mid-write must never poison the resume file
        tmp = state_path + ".tmp.npz"
        np.savez(tmp, z=np.asarray(state), th_done=th_done,
                 walls=np.asarray(walls, np.float64),
                 **{f: (np.concatenate(hist[f]) if hist[f]
                        else np.zeros((0, args.chains), np.float32))
                    for f in fields})
        os.replace(tmp, state_path)

    def one_block(st, k, tag, j, n):
        budget = (3600 if not bwalls
                  else min(3600, int(10 * np.median(bwalls)) + 120))
        tb = time.time()
        try:
            signal.alarm(budget)
            st, h = seg(st, k)
            float(jnp.sum(st))     # sync (block_until_ready unreliable)
        except TimeoutError:
            persist()
            print(f"  [{rs}] {tag} block {j + 1}/{n} HUNG (> {budget}s): "
                  "silent worker death — fast-failing for a clean queue "
                  "retry (row state persisted)", flush=True)
            os._exit(3)
        finally:
            signal.alarm(0)        # a crash that RAISES must not leave a
            #                        stray alarm to kill the row retry
        bwalls.append(time.time() - tb)
        if args.block_pause > 0:
            time.sleep(args.block_pause)
        return st, h, bwalls[-1]

    t0 = time.time()
    k_th = jax.random.fold_in(key, 1)
    for j in range(th_done, nseg_therm):
        state, _, _ = one_block(state, jax.random.fold_in(k_th, j),
                                "therm", j, nseg_therm)
        th_done = j + 1
        if j % 4 == 3 or j == nseg_therm - 1:
            persist()
            print(f"  [{rs}] therm {j + 1}/{nseg_therm} blocks "
                  f"({time.time() - t0:.0f}s)", flush=True)

    def add_timed(k, tag, j, n):
        nonlocal state
        state, h, w = one_block(state, k, tag, j, n)
        for f in fields:
            hist[f].append(np.asarray(getattr(h, f)))
        walls.append(w)
        persist()

    def mob_events():
        q = np.concatenate(hist["q"])
        mob = float(np.mean(np.abs(np.diff(q, axis=0)) ** 2))
        # only len(q)-1 transitions exist per chain (ADVICE round-4: the
        # floor gates verdicts, so the event count must be exact)
        return mob, mob * (len(q) - 1) * q.shape[1]

    t0 = time.time()
    for j in range(len(walls), nseg):
        add_timed(jax.random.fold_in(key, 100000 + j), "timed", j, nseg)
        if j % 4 == 3 or j == nseg - 1:
            print(f"  [{rs}] timed {j + 1}/{nseg} blocks "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # statistics-floor auto-extension (round-4): keep adding timed
    # call-blocks until the tunneling-event count clears --min-events or
    # the --max-extra-wall budget is spent (per attempt; a resumed retry
    # gets a fresh extension budget, so progress accumulates toward the
    # floor across worker crashes). Low-count rows are flagged
    # valid=false either way (schwinger_table.py refuses to turn them
    # into verdicts).
    mob, nev = mob_events()
    j_ext, wall_ext = len(walls) - nseg, 0.0
    while (args.min_events > 0 and nev < args.min_events
           and wall_ext < args.max_extra_wall):
        add_timed(jax.random.fold_in(jax.random.fold_in(key, 2), j_ext),
                  f"ext({nev:.0f}/{args.min_events:.0f}ev)", j_ext, -1)
        wall_ext += walls[-1]
        j_ext += 1
        mob, nev = mob_events()
        if j_ext % 4 == 0:
            print(f"  [{rs}] ext {nev:.0f}/{args.min_events:.0f} events "
                  f"({wall_ext:.0f}s of {args.max_extra_wall:.0f}s)",
                  flush=True)

    h = TrajMetrics(**{f: np.concatenate(hist[f]) for f in fields})
    wall = float(np.sum(walls))
    ntraj = len(walls) * cb
    row = dict(**r, tau_used=tau,
               acc=float(np.asarray(h.acc).mean()),
               exp_mdh=float(np.asarray(h.exp_mdh).mean()),
               plaq=float(np.asarray(h.plaq).mean()),
               q_mobility=mob, ntraj_timed=ntraj, n_events=nev,
               valid=bool(args.min_events <= 0 or nev >= args.min_events),
               s_per_traj=wall / ntraj, wall_s=wall)
    # the timed segment starts from an equilibrated state: therm_frac=0
    from fthmc_tpu.diagnostics import sanity_report
    rep = sanity_report(h, therm_frac=0.0)
    if not rep["ok"]:
        row["sanity_flags"] = rep["flags"]
    rows.append(row)
    print(json.dumps(row), flush=True)
    with open(os.path.join(args.out, "scan.json"), "w") as f:
        json.dump({"args": vars(args), "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
