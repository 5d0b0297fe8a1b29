"""Experiment orchestration CLI.

Reference parity: fthmc/main.py (parse_configs/setup/main: HMC baseline ->
train flow -> flow-sampling eval -> FT-HMC -> volume transfer to 2L), as
subcommands:

    python -m fthmc_tpu.cli hmc      --beta 2.0 --L 8 --ntraj 256
    python -m fthmc_tpu.cli train    --beta 2.0 --L 8 --n-era 2 --n-epoch 50
    python -m fthmc_tpu.cli sample   --beta 2.0 --L 8 --ckpt <dir>
    python -m fthmc_tpu.cli fthmc    --beta 2.0 --L 8 --ckpt <dir> --nstep 64
    python -m fthmc_tpu.cli pipeline --json-file configs.json
    python -m fthmc_tpu.cli bench    --L 64 --chains 1024

`pipeline` runs the full reference flow including the transfer to a 2L
lattice (main.py:268-304).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.checkpoint import (find_and_load_checkpoint,
                                  load_checkpoint_auto, save_checkpoint,
                                  save_history)
from fthmc_tpu.config import (FlowSpec, HMCConfig, LeapfrogConfig,
                              SchedulerConfig, TrainConfig, load_json_configs)
from fthmc_tpu.hmc import run_fthmc, run_fthmc_chunked, run_hmc
from fthmc_tpu.utils.tboard import TBWriter
from fthmc_tpu.models.flow import count_parameters
from fthmc_tpu.observables import chain_stats
from fthmc_tpu.sampling import generate_ensemble
from fthmc_tpu.train import init_train_state, train
from fthmc_tpu.utils.logger import Logger, MetricsWriter

logger = Logger()


def _summarize_hmc(hist, therm_frac: float = 0.25,
                   plaq_ref: float | None = None) -> dict:
    n = hist.plaq.shape[0]
    t = int(n * therm_frac)
    cs = chain_stats(np.asarray(hist.q)[t:])
    out = {
        "acc": float(np.asarray(hist.acc)[t:].mean()),
        "plaq": float(np.asarray(hist.plaq)[t:].mean()),
        "exp_mdh": float(np.asarray(hist.exp_mdh)[t:].mean()),
        "dh_abs": float(np.abs(np.asarray(hist.dh)[t:]).mean()),
        "chi_q": cs["chi_q"],
        "chi_q_err": cs["chi_q_err"],
        "tau_int_q": cs["tau_int_q"],
        "tau_int_q_err": cs["tau_int_q_err"],
    }
    from fthmc_tpu.diagnostics import sanity_report
    rep = sanity_report(hist, plaq_ref=plaq_ref, therm_frac=therm_frac)
    if not rep["ok"]:
        out["sanity_flags"] = rep["flags"]
        for f in rep["flags"]:
            logger.log(f"SANITY: {f}")
    return out


def _maybe_mesh(args):
    """Build a chain mesh when --devices > 1 (multi-chip production path)."""
    n = getattr(args, "devices", 1) or 1
    if n <= 1:
        return None
    from fthmc_tpu.parallel.mesh import make_chain_mesh
    assert n <= jax.device_count(), (n, jax.device_count())
    return make_chain_mesh(n)


def cmd_hmc(args) -> dict:
    cfg = HMCConfig(beta=args.beta, L=args.L, tau=args.tau, nstep=args.nstep,
                    ntraj=args.ntraj, n_chains=args.chains, seed=args.seed,
                    nrun=getattr(args, "nrun", 1),
                    randinit=getattr(args, "start", "hot") != "cold")
    mesh = _maybe_mesh(args)
    rows = getattr(args, "shard_rows", 1) or 1
    logger.rule(f"HMC {cfg.L}x{cfg.L} beta={cfg.beta}"
                + (f" [{mesh.devices.size} devices]" if mesh else "")
                + (f" [rows/{rows}]" if rows > 1 else ""))
    t0 = time.time()
    if rows > 1:
        # domain decomposition: lattice ROW axis sharded, halo exchange via
        # ICI ppermute (parallel/domain.py) - for L beyond one chip's HBM
        from fthmc_tpu.hmc import TrajMetrics
        from fthmc_tpu.parallel.domain import (make_rows_mesh,
                                               run_domain_hmc_chunked)
        assert rows <= jax.device_count(), (rows, jax.device_count())
        x, hist_d = run_domain_hmc_chunked(
            make_rows_mesh(rows), cfg, block=min(cfg.ntraj, 256))
        hist = TrajMetrics(**{k: np.asarray(v) for k, v in hist_d.items()})
    elif mesh is not None:
        from fthmc_tpu.parallel.mesh import sharded_run_hmc
        x, hist = sharded_run_hmc(
            mesh, cfg, integrator=getattr(args, "integrator", "leapfrog"))
    elif cfg.nrun > 1:
        from fthmc_tpu.hmc import run_hmc_nrun
        x, runs = run_hmc_nrun(
            cfg, integrator=getattr(args, "integrator", "leapfrog"))
        # fold the independent-run axis into the chain axis for summary
        # stats; per-run scatter is reported as plaq_err
        import numpy as _np
        hist = type(runs)(*[
            _np.concatenate(list(_np.asarray(getattr(runs, f))), axis=1)
            for f in runs._fields])
    else:
        from fthmc_tpu.hmc import run_hmc_chunked

        def _cb(done, block):
            logger.print_metrics(
                {"acc": np.asarray(block.acc).mean(),
                 "plaq": np.asarray(block.plaq)[-64:].mean()},
                pre=[f"traj={done}"])

        # print cadence = cfg.nprint trajectories (reference run_hmc's
        # nprint, fthmc/hmc.py)
        x, hist = run_hmc_chunked(
            cfg, block=min(cfg.ntraj, cfg.nprint), callback=_cb,
            integrator=getattr(args, "integrator", "leapfrog"))
    jax.block_until_ready(x)
    dt = time.time() - t0
    stats = _summarize_hmc(hist, plaq_ref=lattice.PLAQ_EXACT.get(cfg.beta))
    if cfg.nrun > 1 and mesh is None:
        t = int(runs.plaq.shape[1] * 0.25)
        per_run = np.asarray(runs.plaq)[:, t:].mean(axis=(1, 2))
        stats["plaq_err"] = float(per_run.std(ddof=1)
                                  / max(1, cfg.nrun - 1) ** 0.5)
    stats["s_per_traj"] = dt / cfg.ntraj
    stats["exact_plaq"] = lattice.PLAQ_EXACT.get(cfg.beta)
    logger.print_metrics(stats)
    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)
        save_history({k: np.asarray(getattr(hist, k))
                      for k in hist._fields},
                     os.path.join(args.outdir, "hmc_history.npz"))
        # final chain states for resume (reference saves fields_arr,
        # hmc.py:172-173)
        np.savez_compressed(os.path.join(args.outdir, "hmc_fields.npz"),
                            x=np.asarray(x))
    return stats


_SPEC_ARGS = {  # CLI attr -> FlowSpec field
    "n_layers": "n_layers", "n_mixture": "n_mixture", "hidden": "hidden_sizes",
    "kernel": "kernel_size", "activation": "activation",
    "coupling": "coupling", "n_knots": "n_knots", "s_clip": "s_clip",
    "conv_dtype": "conv_dtype"}


def _cli_spec_overrides(args) -> dict:
    """FlowSpec fields explicitly set on the command line (non-None values;
    restore-mode subcommands default every flow flag to None so checkpoint
    metadata wins unless the user overrides). --s-clip with a negative value
    explicitly disables clipping (-> None)."""
    out = {}
    for attr, field in _SPEC_ARGS.items():
        v = getattr(args, attr, None)
        if v is None:
            continue
        if attr == "hidden":
            v = tuple(v)
        if attr == "s_clip" and v < 0:
            v = None
        out[field] = v
    return out


def _flow_spec(args, base: FlowSpec | None = None) -> FlowSpec:
    """FlowSpec from CLI flags layered over `base` (checkpoint metadata or
    the dataclass defaults)."""
    return dataclasses.replace(base or FlowSpec(), **_cli_spec_overrides(args))


def _load_flow_state(args):
    """Resolve (state, spec) for sample/fthmc: a self-describing --ckpt
    restores its own architecture (flags override); legacy checkpoints fall
    back to the template built from flags."""
    if args.ckpt:
        found = load_checkpoint_auto(args.ckpt,
                                     spec_overrides=_cli_spec_overrides(args))
        if found is not None:
            state, meta, spec, _ = found
            logger.log(f"restored self-describing checkpoint "
                       f"({spec.coupling}, {spec.n_layers} layers, "
                       f"era={meta.get('era')})")
            return state, spec
    spec = _flow_spec(args)
    cfg = TrainConfig(L=args.L, beta=args.beta, flow=spec)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    found = find_and_load_checkpoint(
        args.ckpt or os.path.join(cfg.logdir(), "checkpoints"), state)
    if found is None:
        raise SystemExit("no checkpoint found; pass --ckpt")
    return found[0], spec


def cmd_train(args) -> dict:
    spec = _flow_spec(args)
    cfg = TrainConfig(L=args.L, beta=args.beta, n_era=args.n_era,
                      n_epoch=args.n_epoch, batch_size=args.batch_size,
                      base_lr=args.lr, flow=spec, seed=args.seed,
                      with_force=args.with_force,
                      beta_init=getattr(args, "beta_init", None),
                      beta_anneal_frac=getattr(args, "anneal_frac", 0.7),
                      grad_clip=getattr(args, "grad_clip", None),
                      force_weight=getattr(args, "force_weight", 0.0))
    outdir = args.outdir or cfg.logdir()
    ckptdir = os.path.join(outdir, "checkpoints")
    logger.rule(f"train flow {cfg.L}x{cfg.L} beta={cfg.beta} "
                f"({spec.n_layers} layers, {spec.coupling})")

    state = init_train_state(jax.random.PRNGKey(cfg.seed), cfg)
    logger.log(f"flow parameters: {count_parameters(state.params)}")
    start_era = 0
    if cfg.restore or args.restore:
        found = find_and_load_checkpoint(ckptdir, state)
        if found is not None:
            state, meta = found
            start_era = int(meta.get("era", -1)) + 1
            logger.log(f"restored checkpoint era={meta.get('era')}; "
                       f"continuing from era {start_era}")

    writer = MetricsWriter(os.path.join(outdir, "train_metrics.jsonl"))
    sched = (SchedulerConfig(factor=args.sched_factor,
                             patience=args.sched_patience,
                             cooldown=getattr(args, "sched_cooldown", 0))
             if args.scheduler else None)

    live = None
    if getattr(args, "live_plot", False):
        from fthmc_tpu.utils.plotting import LiveJointPlot
        live = LiveJointPlot(outdir=outdir,
                             title=f"{cfg.L}x{cfg.L} beta={cfg.beta}")
    live_hist = {"loss_dkl": [], "ess": []}

    def cb(step, metrics):
        if step % cfg.log_freq == 0:
            writer.write(step, metrics, prefix="training")
        if step % cfg.print_freq == 0:
            logger.print_metrics(
                {k: metrics[k] for k in
                 ("loss_dkl", "ess", "plaq", "dq", "dq_mean", "lr_scale")
                 if k in metrics},
                pre=[f"step={step}"])
        if live is not None:
            live_hist["loss_dkl"].append(float(metrics["loss_dkl"]))
            live_hist["ess"].append(float(metrics["ess"]))
            if step % max(cfg.plot_freq, 1) == 0:
                live.update(live_hist["loss_dkl"], live_hist["ess"])

    def ckpt(era, st, history):
        save_checkpoint(ckptdir, st, era=era, epoch=cfg.n_epoch,
                        train_cfg=cfg,
                        history={k: np.asarray(v, dtype=np.float64)
                                 for k, v in history.items()
                                 if np.ndim(v[0]) == 0})

    t0 = time.time()
    state, history = train(cfg, state, scheduler=sched, callback=cb,
                           checkpoint_fn=ckpt, start_era=start_era,
                           mesh=_maybe_mesh(args))
    wall = time.time() - t0
    if live is not None:
        if live_hist["loss_dkl"]:
            live.update(live_hist["loss_dkl"], live_hist["ess"])
        live.close()
    save_history({k: np.asarray(v, dtype=np.float64)
                  for k, v in history.items() if np.ndim(v[0]) == 0},
                 os.path.join(outdir, "train_history.npz"))
    writer.close()
    if cfg.plot_freq > 0 and history.get("loss_dkl"):
        from fthmc_tpu.utils.plotting import plot_history
        plot_history({k: np.asarray(v) for k, v in history.items()
                      if np.ndim(v[0]) == 0},
                     outdir=os.path.join(outdir, "plots"))
    final = {"wall_s": wall,
             "ess": float(np.mean(history["ess"][-10:])),
             "loss_dkl": float(np.mean(history["loss_dkl"][-10:])),
             "outdir": outdir}
    logger.print_metrics({k: v for k, v in final.items() if k != "outdir"})
    return {"state": state, "cfg": cfg, "outdir": outdir, **final}


def cmd_sample(args, state=None, spec=None) -> dict:
    if state is None:
        state, spec = _load_flow_state(args)
    elif spec is None:
        spec = _flow_spec(args)
    logger.rule(f"flow sampling {args.L}x{args.L} beta={args.beta}")
    out = generate_ensemble(
        state.params, spec, beta=args.beta, L=args.L,
        ensemble_size=args.ensemble_size, batch_size=args.batch_size,
        n_chains=getattr(args, "sample_chains", 1),
        key=jax.random.PRNGKey(args.seed))
    logger.print_metrics({k: out[k] for k in
                          ("accept_rate", "suscept_mean", "suscept_err",
                           "tau_int_q", "tau_int_q_err") if k in out})
    return out


def cmd_fthmc(args, state=None, spec=None) -> dict:
    if state is None:
        state, spec = _load_flow_state(args)
    elif spec is None:
        spec = _flow_spec(args)
    lf = LeapfrogConfig(tau=args.tau, nstep=args.nstep)
    mesh = _maybe_mesh(args)
    logger.rule(f"FT-HMC {args.L}x{args.L} beta={args.beta} "
                f"tau={lf.tau} nstep={lf.nstep}"
                + (f" [{mesh.devices.size} devices]" if mesh else ""))
    key = jax.random.PRNGKey(args.seed)
    if getattr(args, "start", "hot") == "cold":
        # ordered start: z0 = f^{-1}(0) via the bisection inverse - required
        # at beta >= ~5 where hot starts take ~tau_int trajectories to reach
        # the equilibrium (ordered) phase (BENCH.md 64^2 beta=6 procedure)
        import jax.numpy as jnp
        from fthmc_tpu.models.flow import flow_reverse
        z0, _ = flow_reverse(
            state.params, jnp.zeros((args.chains, 2, args.L, args.L)), spec)
    else:
        z0 = lattice.hot_start(key, args.chains, args.L)
    tb = TBWriter(os.path.join(args.outdir, "summaries")) if (
        args.outdir and getattr(args, "tensorboard", False)) else None

    def cb(done, block):
        logger.print_metrics(
            {"acc": np.asarray(block.acc).mean(),
             "plaq": np.asarray(block.plaq)[-64:].mean()},
            pre=[f"traj={done}"])
        if tb is not None:
            tb.write({k: np.asarray(getattr(block, k)).mean()
                      for k in block._fields}, step=done, prefix="ftHMC")

    t0 = time.time()
    rows = getattr(args, "shard_rows", 1) or 1
    if rows > 1:
        # domain-decomposed FT-HMC (leapfrog; parallel/domain_flow.py)
        from fthmc_tpu.hmc import TrajMetrics
        from fthmc_tpu.parallel.domain import make_rows_mesh
        from fthmc_tpu.parallel.domain_flow import run_domain_fthmc_chunked
        assert rows <= jax.device_count(), (rows, jax.device_count())
        # the domain drivers stream history dicts; adapt to the TrajMetrics
        # callback so progress/TB logging matches the other paths
        cb_d = (lambda done, h: cb(done, TrajMetrics(
            **{k: np.asarray(v) for k, v in h.items()})))
        z, hist_d = run_domain_fthmc_chunked(
            make_rows_mesh(rows), state.params, spec, lf, beta=args.beta,
            ntraj=args.ntraj, z0=z0, key=key,
            block=min(args.ntraj, 256), callback=cb_d)
        hist = TrajMetrics(**{k: np.asarray(v) for k, v in hist_d.items()})
    elif mesh is not None:
        from fthmc_tpu.parallel.mesh import sharded_run_fthmc_chunked
        z, hist = sharded_run_fthmc_chunked(
            mesh, state.params, spec, lf, beta=args.beta, ntraj=args.ntraj,
            z0=z0, key=key, block=min(args.ntraj, 1024), callback=cb,
            integrator=getattr(args, "integrator", "leapfrog"))
    else:
        z, hist = run_fthmc_chunked(state.params, spec, lf, beta=args.beta,
                                    ntraj=args.ntraj, z0=z0, key=key,
                                    block=min(args.ntraj, 1024), callback=cb,
                                    integrator=getattr(args, "integrator",
                                                       "leapfrog"),
                                    force_backend=getattr(
                                        args, "force_backend", "auto"))
    jax.block_until_ready(z)
    dt = time.time() - t0
    if tb is not None:
        tb.close()
    stats = _summarize_hmc(hist,
                           plaq_ref=lattice.PLAQ_EXACT.get(args.beta))
    stats["s_per_traj"] = dt / args.ntraj
    logger.print_metrics(stats)
    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)
        save_history({k: np.asarray(getattr(hist, k))
                      for k in hist._fields},
                     os.path.join(args.outdir, "fthmc_history.npz"))
        np.savez_compressed(os.path.join(args.outdir, "fthmc_fields.npz"),
                            z=np.asarray(z))
    return stats


def _run_dyn_resilient(scan_fn, z0, cfg, key, args):
    """Drive a dynamical scan through the resilient block+persist+resume
    runner (fthmc_tpu/runner.py — the round-3 production pattern for the
    flaky-worker infra). scan_fn(key, z, n, cfg) -> (z, TrajMetrics);
    --state names the persistence file, crashes lose at most one block."""
    import dataclasses

    from fthmc_tpu.hmc import TrajMetrics
    from fthmc_tpu.runner import run_resilient

    # ntraj is dead inside the compiled scan (explicit n arg); zeroing it
    # keeps one compile across resumed processes (chunked-driver rule)
    cfg0 = dataclasses.replace(cfg, ntraj=0)
    z, hist_d, info = run_resilient(
        lambda k, z, n: scan_fn(k, z, n, cfg0), z0, key=key,
        ntraj=cfg.ntraj, block=min(cfg.ntraj, args.block),
        state_path=args.state, hist_fields=TrajMetrics._fields)
    logger.log(f"resilient run: {info['done']} done, "
               f"{info['retries']} retries, {info['wall_s']:.1f} s")
    return z, TrajMetrics(**hist_d)


def cmd_schwinger(args) -> dict:
    """Dynamical-fermion (two-flavor Schwinger model) sampler: plain HMC,
    or FT-HMC when --ckpt points at a flow (partial trivialization with a
    pure-gauge-trained flow; fthmc_tpu/schwinger.py). Beyond-reference
    capability — the expensive-force regime (FT-HMC wins per-trajectory
    decorrelation everywhere; wall-clock from beta~8 at 16^2 m=0.1, and
    wherever topology freezes — BENCH.md round 3)."""
    from fthmc_tpu import fermion
    from fthmc_tpu.schwinger import (SchwingerConfig, run_fthmc_dyn_chunked,
                                     run_hmc_dyn_chunked)
    fermion.set_cg_backend(args.cg_backend)
    if (getattr(args, "shard_rows", 1) or 1) > 1 and \
            args.cg_backend != "xla":
        logger.log("note: --shard-rows uses the sharded XLA-stencil CG "
                   "(the fused VMEM kernels are single-device programs); "
                   f"--cg-backend {args.cg_backend} applies only to "
                   "non-sharded stages")
    cfg = SchwingerConfig(
        L=args.L, beta=args.beta, mass=args.mass, tau=args.tau,
        nstep=args.nstep, n_chains=args.chains, ntraj=args.ntraj,
        integrator=args.integrator, warm_start=not args.no_warm_start,
        eo_precond=not args.no_eo, n_inner=args.n_inner,
        hasenbusch_dm=args.hasenbusch_dm, n_mid=args.n_mid)
    if cfg.hasenbusch_dm > 0 and args.ckpt:
        raise SystemExit("--hasenbusch-dm is implemented for plain "
                         "dynamical HMC (omit --ckpt)")
    ft = bool(args.ckpt)
    mesh = _maybe_mesh(args)
    if getattr(args, "state", None) and mesh is not None:
        raise SystemExit("--state (resilient resume) and --devices "
                         "(sharded driver) are separate paths; pick one")
    if (getattr(args, "shard_rows", 1) or 1) > 1 and (
            mesh is not None or getattr(args, "state", None)):
        raise SystemExit("--shard-rows is its own parallel path; "
                         "drop --devices/--state")
    logger.rule(f"{'FT-' if ft else ''}HMC Schwinger {cfg.L}x{cfg.L} "
                f"beta={cfg.beta} m={cfg.mass} tau={cfg.tau} "
                f"nstep={cfg.nstep}"
                + (f" [{mesh.devices.size} devices]" if mesh else ""))
    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    if ft:
        state, spec = _load_flow_state(args)
        if getattr(args, "start", "hot") == "cold":
            import jax.numpy as jnp
            from fthmc_tpu.models.flow import flow_reverse
            z0, _ = flow_reverse(state.params, jnp.zeros(
                (cfg.n_chains, 2, cfg.L, cfg.L)), spec)
        else:
            z0 = lattice.hot_start(key, cfg.n_chains, cfg.L)
        rows = getattr(args, "shard_rows", 1) or 1
        if rows > 1:
            # domain-decomposed dynamical FT-HMC: rows sharded through the
            # flow (domain_flow) AND the Dirac/CG (domain_fermion)
            from fthmc_tpu.hmc import TrajMetrics
            from fthmc_tpu.parallel.domain import make_rows_mesh
            from fthmc_tpu.parallel.domain_fermion import (
                run_domain_fthmc_dyn_chunked)
            assert rows <= jax.device_count(), (rows, jax.device_count())
            x, hist_d = run_domain_fthmc_dyn_chunked(
                make_rows_mesh(rows), state.params, spec, cfg,
                block=min(cfg.ntraj, args.block), z0=z0, key=key)
            hist = TrajMetrics(**{k: np.asarray(v)
                                  for k, v in hist_d.items()})
        elif getattr(args, "state", None):
            from fthmc_tpu.schwinger import _run_fthmc_dyn_scan
            x, hist = _run_dyn_resilient(
                lambda k, z, n, c: _run_fthmc_dyn_scan(state.params, spec,
                                                       k, z, c, n),
                z0, cfg, key, args)
        elif mesh is not None:
            from fthmc_tpu.parallel.mesh import sharded_run_fthmc_dyn_chunked
            x, hist = sharded_run_fthmc_dyn_chunked(
                mesh, state.params, spec, cfg,
                block=min(cfg.ntraj, args.block), z0=z0, key=key)
        else:
            x, hist = run_fthmc_dyn_chunked(state.params, spec, cfg,
                                            block=min(cfg.ntraj, args.block),
                                            z0=z0, key=key)
    else:
        x0 = (np.zeros((cfg.n_chains, 2, cfg.L, cfg.L), np.float32)
              if getattr(args, "start", "hot") == "cold" else None)
        x0 = None if x0 is None else jax.numpy.asarray(x0)
        rows = getattr(args, "shard_rows", 1) or 1
        if rows > 1:
            # domain-decomposed dynamical HMC: lattice rows sharded through
            # the Dirac operator + CG (parallel/domain_fermion.py) - for
            # dynamical lattices beyond one chip's HBM
            from fthmc_tpu.hmc import TrajMetrics
            from fthmc_tpu.parallel.domain import make_rows_mesh
            from fthmc_tpu.parallel.domain_fermion import (
                run_domain_hmc_dyn_chunked)
            assert rows <= jax.device_count(), (rows, jax.device_count())
            x, hist_d = run_domain_hmc_dyn_chunked(
                make_rows_mesh(rows), cfg, block=min(cfg.ntraj, args.block),
                x0=x0, key=key)
            hist = TrajMetrics(**{k: np.asarray(v)
                                  for k, v in hist_d.items()})
        elif getattr(args, "state", None):
            from fthmc_tpu.schwinger import _run_hmc_dyn_scan
            if x0 is None:
                x0 = lattice.hot_start(jax.random.fold_in(key, 7),
                                       cfg.n_chains, cfg.L)
            x, hist = _run_dyn_resilient(
                lambda k, z, n, c: _run_hmc_dyn_scan(k, z, c, n),
                x0, cfg, key, args)
        elif mesh is not None:
            from fthmc_tpu.parallel.mesh import sharded_run_hmc_dyn_chunked
            x, hist = sharded_run_hmc_dyn_chunked(
                mesh, cfg, block=min(cfg.ntraj, args.block), x0=x0, key=key)
        else:
            x, hist = run_hmc_dyn_chunked(
                cfg, block=min(cfg.ntraj, args.block), x0=x0, key=key)
    jax.block_until_ready(x)
    dt = time.time() - t0
    stats = _summarize_hmc(hist)
    stats["s_per_traj"] = dt / cfg.ntraj
    if args.condensate:
        from fthmc_tpu.fermion import chiral_condensate
        y = x
        if ft:
            from fthmc_tpu.models.flow import flow_forward
            y, _ = flow_forward(state.params, x, spec)
        cc = np.asarray(chiral_condensate(
            jax.random.fold_in(key, 99), y, cfg.mass, n_noise=8))
        stats["psibar_psi"] = float(cc.mean())
        stats["psibar_psi_err"] = float(cc.std(ddof=1) / len(cc) ** 0.5)
    logger.print_metrics(stats)
    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)
        save_history({k: np.asarray(getattr(hist, k))
                      for k in hist._fields},
                     os.path.join(args.outdir, "schwinger_history.npz"))
    return stats


def _spec_to_args(spec: FlowSpec) -> dict:
    """FlowSpec -> the CLI attr dict cmd_train expects (inverse of
    _flow_spec), so pipeline stages carry the FULL architecture - coupling
    family, s_clip, conv_dtype included."""
    return {"n_layers": spec.n_layers, "n_mixture": spec.n_mixture,
            "hidden": list(spec.hidden_sizes), "kernel": spec.kernel_size,
            "activation": spec.activation, "coupling": spec.coupling,
            "n_knots": spec.n_knots, "s_clip": spec.s_clip,
            "conv_dtype": spec.conv_dtype}


def cmd_pipeline(args) -> dict:
    """Full reference pipeline (main.py:268-304): HMC baseline -> train ->
    flow eval -> FT-HMC -> transfer to 2L (re-apply + fine-tune) -> repeat
    eval at 2L. --mode highbeta instead runs the partial-trivialization
    workflow (cmd_pipeline_highbeta)."""
    if getattr(args, "mode", "reference") == "highbeta":
        return cmd_pipeline_highbeta(args)
    if args.json_file:
        hmc_cfg, train_cfg, lf, sched = load_json_configs(args.json_file)
    else:
        hmc_cfg = HMCConfig(beta=args.beta, L=args.L, ntraj=args.ntraj,
                            n_chains=args.chains)
        train_cfg = TrainConfig(
            L=args.L, beta=args.beta, n_era=args.n_era,
            n_epoch=args.n_epoch, flow=_flow_spec(args),
            beta_init=getattr(args, "beta_init", None),
            grad_clip=getattr(args, "grad_clip", None))
        lf, sched = LeapfrogConfig(tau=args.tau, nstep=args.nstep), None

    results: dict = {}

    # 1. HMC baseline
    ns = argparse.Namespace(beta=hmc_cfg.beta, L=hmc_cfg.L, tau=hmc_cfg.tau,
                            nstep=hmc_cfg.nstep, ntraj=hmc_cfg.ntraj,
                            chains=hmc_cfg.n_chains, seed=hmc_cfg.seed,
                            outdir=None)
    results["hmc"] = cmd_hmc(ns)

    # 2. Train flow
    spec = train_cfg.flow
    tns = argparse.Namespace(
        L=train_cfg.L, beta=train_cfg.beta, n_era=train_cfg.n_era,
        n_epoch=train_cfg.n_epoch, batch_size=train_cfg.batch_size,
        lr=train_cfg.base_lr, seed=train_cfg.seed, outdir=args.outdir,
        with_force=train_cfg.with_force, restore=False,
        scheduler=sched is not None,
        sched_factor=getattr(sched, "factor", 0.5),
        sched_patience=getattr(sched, "patience", 10),
        beta_init=train_cfg.beta_init,
        anneal_frac=train_cfg.beta_anneal_frac,
        grad_clip=train_cfg.grad_clip,
        **_spec_to_args(spec))
    tr = cmd_train(tns)
    state = tr["state"]

    # 3. Flow-sampling eval
    sns = argparse.Namespace(L=train_cfg.L, beta=train_cfg.beta,
                             ensemble_size=args.ensemble_size,
                             batch_size=train_cfg.batch_size, seed=1,
                             ckpt=None)
    ens = cmd_sample(sns, state=state, spec=spec)
    results["sample"] = {k: ens[k] for k in
                         ("accept_rate", "suscept_mean", "suscept_err")}

    # 4. FT-HMC
    fns = argparse.Namespace(L=train_cfg.L, beta=train_cfg.beta, tau=lf.tau,
                             nstep=lf.nstep, ntraj=args.ntraj,
                             chains=hmc_cfg.n_chains, seed=2, ckpt=None,
                             outdir=None)
    results["fthmc"] = cmd_fthmc(fns, state=state, spec=spec)

    # 5. Volume transfer: SAME params at 2L. Reference semantics
    # (main.py:198-216): HMC baseline at 2L, fine-tune, then the full
    # train_and_evaluate eval pair (flow sampling + FT-HMC) at 2L.
    L2 = 2 * train_cfg.L
    logger.rule(f"volume transfer -> {L2}x{L2}")
    ns2 = argparse.Namespace(**{**vars(ns), "L": L2})
    results["hmc_2L"] = cmd_hmc(ns2)
    if args.transfer_epochs > 0:
        cfg2 = dataclasses.replace(train_cfg, L=L2, n_era=1,
                                   n_epoch=args.transfer_epochs,
                                   base_lr=train_cfg.base_lr / 10)
        # fine-tune continues from the transferred params (same pytree -
        # masks rebuild from the new lattice shape at trace time)
        from fthmc_tpu.train import train as _train
        state, _ = _train(cfg2, state)
    sns2 = argparse.Namespace(**{**vars(sns), "L": L2})
    ens2 = cmd_sample(sns2, state=state, spec=spec)
    results["sample_2L"] = {k: ens2[k] for k in
                            ("accept_rate", "suscept_mean", "suscept_err")}
    fns2 = argparse.Namespace(**{**vars(fns), "L": L2})
    results["fthmc_transfer"] = cmd_fthmc(fns2, state=state, spec=spec)

    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)
        with open(os.path.join(args.outdir, "pipeline_results.json"),
                  "w") as f:
            json.dump(results, f, indent=2, default=float)
    return results


def cmd_pipeline_highbeta(args) -> dict:
    """Partial-trivialization pipeline (the round-2 flagship workflow,
    BENCH.md, packaged end-to-end per round-2 review): train the SMOOTH
    rncp flow at a small lattice with beta annealed 2 -> flow_beta (~3),
    then run FT-HMC at the TARGET (L, beta) with the flow UNCHANGED - a
    partial trivializing map only needs to flatten the measure, Metropolis
    corrects the rest (cf. Luscher arXiv:0907.5491). Finishes with a
    tau_int(Q) head-to-head vs plain HMC, chain-bootstrap errors included.

        python -m fthmc_tpu.cli pipeline --mode highbeta --L 16 --beta 6 \
            [--ckpt artifacts/flow8x8_b3_rncp24]   # skip the training leg
    """
    results: dict = {"mode": "highbeta", "L": args.L, "beta": args.beta}
    logger.rule(f"partial-trivialization pipeline -> {args.L}x{args.L} "
                f"beta={args.beta}")

    # 1. the smooth flow: restore a self-describing checkpoint, or train
    #    the flagship recipe from scratch at the small lattice
    if args.ckpt:
        found = load_checkpoint_auto(
            args.ckpt, spec_overrides=_cli_spec_overrides(args))
        if found is None:
            raise SystemExit(f"--ckpt {args.ckpt}: no self-describing "
                             "checkpoint found (train one with this "
                             "pipeline, or pass architecture flags to "
                             "`fthmc` directly)")
        state, meta, spec, _ = found
        logger.log(f"flow restored: {spec.coupling} x{spec.n_layers}, "
                   f"era={meta.get('era')}")
    else:
        base = FlowSpec(n_layers=24, coupling="rncp", n_mixture=8,
                        hidden_sizes=(32, 32), s_clip=3.0)
        spec = _flow_spec(args, base)
        n_epoch = min(500, args.train_steps)
        tns = argparse.Namespace(
            L=args.flow_L, beta=args.flow_beta,
            n_era=max(1, args.train_steps // n_epoch), n_epoch=n_epoch,
            batch_size=args.flow_batch, lr=1e-3, seed=args.seed,
            outdir=os.path.join(args.outdir, "flow") if args.outdir else None,
            with_force=False, restore=False, scheduler=True,
            sched_factor=0.5, sched_patience=30, sched_cooldown=30,
            beta_init=(2.0 if args.beta_init is None else args.beta_init),
            anneal_frac=0.5,
            grad_clip=(1.0 if args.grad_clip is None else args.grad_clip),
            devices=getattr(args, "devices", 1), **_spec_to_args(spec))
        tr = cmd_train(tns)
        state = tr["state"]
        results["train"] = {k: tr[k] for k in ("ess", "loss_dkl", "wall_s")}

    # 2. FT-HMC at the target (L, beta) with the flow unchanged (volume
    #    transfer is free: params are L-independent). Omelyan + cold start
    #    by default - the production recipe at beta >= 5.
    cold = args.beta >= 5.0 if args.start == "auto" else args.start == "cold"
    fns = argparse.Namespace(
        L=args.L, beta=args.beta, tau=args.tau, nstep=args.ft_nstep,
        ntraj=args.ntraj, chains=args.ft_chains, seed=args.seed + 1,
        ckpt=None, outdir=(os.path.join(args.outdir, "fthmc")
                           if args.outdir else None),
        integrator=args.ft_integrator, start="cold" if cold else "hot",
        devices=getattr(args, "devices", 1))
    results["fthmc"] = cmd_fthmc(fns, state=state, spec=spec)

    # 3. plain-HMC baseline at the same (L, beta) - long chains (tau_int
    #    grows ~x4.5 per unit beta; BENCH.md beta-scan)
    ns = argparse.Namespace(
        beta=args.beta, L=args.L, tau=args.tau, nstep=args.plain_nstep,
        ntraj=args.plain_ntraj, chains=args.plain_chains,
        seed=args.seed + 2, start="cold" if cold else "hot",
        outdir=(os.path.join(args.outdir, "hmc") if args.outdir else None),
        devices=getattr(args, "devices", 1))
    results["hmc"] = cmd_hmc(ns)

    ft, pl = results["fthmc"], results["hmc"]
    if ft["tau_int_q"] > 0:
        s = pl["tau_int_q"] / ft["tau_int_q"]
        err = s * np.hypot(pl["tau_int_q_err"] / max(pl["tau_int_q"], 1e-12),
                           ft["tau_int_q_err"] / max(ft["tau_int_q"], 1e-12))
        results["tau_int_speedup"] = s
        results["tau_int_speedup_err"] = float(err)
    logger.rule("head-to-head")
    logger.print_metrics({
        "tau_int_plain": pl["tau_int_q"], "tau_int_ft": ft["tau_int_q"],
        "speedup": results.get("tau_int_speedup"),
        "chi_q_plain": pl["chi_q"], "chi_q_ft": ft["chi_q"],
        "exact_plaq": lattice.PLAQ_EXACT.get(args.beta)})
    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)
        with open(os.path.join(args.outdir, "pipeline_results.json"),
                  "w") as f:
            json.dump(results, f, indent=2, default=float)
    return results


def cmd_bench(args) -> dict:
    from fthmc_tpu.bench import run_benchmarks
    return run_benchmarks(L=args.L, chains=args.chains, beta=args.beta,
                          which=args.which)


def cmd_queue(args) -> dict:
    import json as _json

    from fthmc_tpu.runner import queue_status, run_queue
    res = (queue_status(args.queue) if args.status
           else run_queue(args.queue, only=args.only,
                          retry_failed=args.retry_failed))
    print(_json.dumps(res, indent=1))
    return res


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="fthmc_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--beta", type=float, default=2.0)
        sp.add_argument("--L", type=int, default=8)
        sp.add_argument("--seed", type=int, default=1331)
        sp.add_argument("--outdir", type=str, default=None)
        sp.add_argument("--devices", type=int, default=1,
                        help="shard chains/batch over this many devices "
                             "(multi-chip production drivers)")
        sp.add_argument("--shard-rows", type=int, default=1,
                        dest="shard_rows",
                        help="domain decomposition: shard the lattice ROW "
                             "axis over this many devices (halo exchange "
                             "over ICI; hmc/fthmc leapfrog + schwinger "
                             "plain/FT). For L beyond one chip's HBM; "
                             "L %% shard_rows == 0")

    def flow_args(sp, restore: bool = False):
        """Flow-architecture flags. restore=True (sample/fthmc) defaults
        everything to None so a self-describing --ckpt's stored FlowSpec
        wins; explicit flags override the metadata."""
        d = (lambda v: None) if restore else (lambda v: v)
        sp.add_argument("--n-layers", type=int, default=d(24))
        sp.add_argument("--n-mixture", type=int, default=d(2))
        sp.add_argument("--hidden", type=int, nargs="+", default=d([8, 8]))
        sp.add_argument("--kernel", type=int, default=d(3))
        sp.add_argument("--activation", type=str, default=d("silu"))
        sp.add_argument("--coupling", choices=["ncp", "rncp", "spline"],
                        default=d("ncp"))
        sp.add_argument("--n-knots", type=int, default=d(8))
        sp.add_argument("--s-clip", type=float, default=None,
                        help="smooth cap on the NCP log-slope; negative "
                             "explicitly disables clipping on restore")
        sp.add_argument("--conv-dtype", choices=["float32", "bfloat16"],
                        default=d("float32"))

    sp = sub.add_parser("hmc")
    common(sp)
    sp.add_argument("--tau", type=float, default=2.0)
    sp.add_argument("--nstep", type=int, default=10)
    sp.add_argument("--ntraj", type=int, default=256)
    sp.add_argument("--chains", type=int, default=16)
    sp.add_argument("--nrun", type=int, default=1,
                    help="independent fresh-init runs (reference nrun)")
    sp.add_argument("--integrator", choices=["leapfrog", "omelyan"],
                    default="leapfrog")
    sp.add_argument("--start", choices=["hot", "cold"], default="hot",
                    help="cold = ordered (zeros) start; use at beta >= ~5")
    sp.set_defaults(fn=cmd_hmc)

    sp = sub.add_parser("train")
    common(sp)
    flow_args(sp)
    sp.add_argument("--n-era", type=int, default=10)
    sp.add_argument("--n-epoch", type=int, default=100)
    sp.add_argument("--batch-size", type=int, default=64)
    sp.add_argument("--lr", type=float, default=1e-3)
    sp.add_argument("--with-force", action="store_true")
    sp.add_argument("--force-weight", type=float, default=0.0,
                    dest="force_weight",
                    help="smoothness-regularized joint objective: loss = "
                         "D_KL + w * mean(F_eff^2) on the training batch "
                         "(0 = off). Steers KL training toward "
                         "leapfrog-integrable flows.")
    sp.add_argument("--beta-init", type=float, default=None,
                    help="beta-annealed training: ramp beta from this value")
    sp.add_argument("--grad-clip", type=float, default=None)
    sp.add_argument("--anneal-frac", type=float, default=0.7)
    sp.add_argument("--restore", action="store_true")
    sp.add_argument("--scheduler", action="store_true")
    sp.add_argument("--sched-factor", type=float, default=0.5)
    sp.add_argument("--sched-patience", type=int, default=10)
    sp.add_argument("--sched-cooldown", type=int, default=0)
    sp.add_argument("--live-plot", action="store_true",
                    help="live twin-axis loss/ESS monitor (display-handle "
                         "updates in notebooks, throttled PNG headless)")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("sample")
    common(sp)
    flow_args(sp, restore=True)
    sp.add_argument("--ckpt", type=str, default=None)
    sp.add_argument("--ensemble-size", type=int, default=8192)
    sp.add_argument("--batch-size", type=int, default=64)
    sp.add_argument("--sample-chains", type=int, default=1,
                    help=">1 runs that many independent on-device chains "
                         "and reports cross-chain chi_Q errors + tau_int")
    sp.set_defaults(fn=cmd_sample)

    sp = sub.add_parser("fthmc")
    common(sp)
    flow_args(sp, restore=True)
    sp.add_argument("--ckpt", type=str, default=None)
    sp.add_argument("--tau", type=float, default=1.0)
    sp.add_argument("--nstep", type=int, default=64)
    sp.add_argument("--ntraj", type=int, default=1024)
    sp.add_argument("--chains", type=int, default=16)
    sp.add_argument("--tensorboard", action="store_true")
    sp.add_argument("--integrator", choices=["leapfrog", "omelyan"],
                    default="leapfrog")
    sp.add_argument("--force-backend", choices=["auto", "xla", "pallas"],
                    default="auto", dest="force_backend",
                    help="FT-HMC force: XLA autodiff or the fused Pallas "
                         "VJP kernels (ops/pallas_coupling_vjp.py)")
    sp.add_argument("--start", choices=["hot", "cold"], default="hot",
                    help="cold = chain starts at z0 = f^{-1}(0) (bisection "
                         "inverse); the production recipe at beta >= ~5")
    sp.set_defaults(fn=cmd_fthmc)

    sp = sub.add_parser(
        "schwinger",
        help="dynamical-fermion (two-flavor Schwinger) HMC; add --ckpt "
             "for FT-HMC with a (pure-gauge-trained) flow")
    common(sp)
    flow_args(sp, restore=True)
    sp.add_argument("--ckpt", type=str, default=None,
                    help="flow checkpoint -> FT-HMC; omit for plain HMC")
    sp.add_argument("--mass", type=float, default=0.1,
                    help="Wilson fermion mass m0")
    sp.add_argument("--tau", type=float, default=0.5)
    sp.add_argument("--nstep", type=int, default=16)
    sp.add_argument("--ntraj", type=int, default=256)
    sp.add_argument("--chains", type=int, default=64)
    sp.add_argument("--block", type=int, default=128)
    sp.add_argument("--integrator", choices=["leapfrog", "omelyan"],
                    default="omelyan")
    sp.add_argument("--n-inner", type=int, default=0,
                    help="multi-timescale (Sexton-Weingarten): nstep "
                         "counts OUTER fermion kicks, each drifting "
                         "through N inner gauge(-flow)-only Omelyan "
                         "steps; 0 = single-scale")
    sp.add_argument("--hasenbusch-dm", type=float, default=0.0,
                    help="Hasenbusch mass preconditioning (plain HMC): "
                         "split det at m1 = mass + dm; 3-level nested "
                         "Omelyan (nstep=ratio kicks, --n-mid heavy "
                         "steps/segment, --n-inner gauge steps/segment)")
    sp.add_argument("--n-mid", type=int, default=1,
                    help="heavy-term steps per outer drift segment "
                         "(Hasenbusch only)")
    sp.add_argument("--no-warm-start", action="store_true",
                    help="cold-start every force CG solve (exact "
                         "reversibility; ~2x more CG iterations)")
    sp.add_argument("--no-eo", action="store_true",
                    help="disable even-odd (Schur) preconditioning "
                         "(measured 2.5x fewer CG iterations when on)")
    sp.add_argument("--condensate", action="store_true",
                    help="stochastic <psibar psi> on the final configs")
    sp.add_argument("--start", choices=["hot", "cold"], default="hot")
    sp.add_argument("--state", type=str, default=None,
                    help="persistence file (npz) for the resilient "
                         "block+resume+watchdog runner: re-running the "
                         "same command resumes at the last completed "
                         "block (crashes lose at most --block "
                         "trajectories); single-device path only")
    sp.add_argument("--cg-backend", choices=["xla", "fused", "mixed"],
                    default="xla",
                    help="fermion solver backend: fused = VMEM-resident "
                         "Pallas Dirac kernel (chains-first or chains-"
                         "last layout auto-chosen by lattice size); "
                         "mixed = bf16 inner CG + f32 refinement")
    sp.set_defaults(fn=cmd_schwinger)

    sp = sub.add_parser("pipeline")
    common(sp)
    flow_args(sp, restore=True)  # None defaults: json/mode recipes win,
    #                              explicit flags override
    sp.add_argument("--mode", choices=["reference", "highbeta"],
                    default="reference",
                    help="reference = the full reference pipeline (hmc -> "
                         "train -> eval -> fthmc -> 2L transfer); highbeta "
                         "= the partial-trivialization workflow (train "
                         "smooth rncp flow at 8^2 beta~3, FT-HMC at the "
                         "target beta with it unchanged)")
    sp.add_argument("--json-file", type=str, default=None)
    sp.add_argument("--tau", type=float, default=1.0)
    sp.add_argument("--nstep", type=int, default=64)
    sp.add_argument("--ntraj", type=int, default=2048)
    sp.add_argument("--chains", type=int, default=16)
    sp.add_argument("--n-era", type=int, default=10)
    sp.add_argument("--n-epoch", type=int, default=100)
    sp.add_argument("--ensemble-size", type=int, default=8192)
    sp.add_argument("--transfer-epochs", type=int, default=100)
    sp.add_argument("--beta-init", type=float, default=None,
                    help="beta-annealed training start (highbeta: 2.0)")
    sp.add_argument("--grad-clip", type=float, default=None,
                    help="global-norm gradient clip (highbeta: 1.0)")
    # --mode highbeta knobs (flagship recipe defaults, BENCH.md round 2)
    sp.add_argument("--ckpt", type=str, default=None,
                    help="highbeta: reuse this self-describing flow "
                         "checkpoint instead of training")
    sp.add_argument("--flow-L", type=int, default=8, dest="flow_L",
                    help="highbeta: train the flow at this small lattice")
    sp.add_argument("--flow-beta", type=float, default=3.0,
                    help="highbeta: anneal the flow to this beta (NOT the "
                         "target beta - smooth flows transfer, sharp ones "
                         "don't)")
    sp.add_argument("--flow-batch", type=int, default=512)
    sp.add_argument("--train-steps", type=int, default=15000)
    sp.add_argument("--ft-nstep", type=int, default=128)
    sp.add_argument("--ft-chains", type=int, default=64)
    sp.add_argument("--ft-integrator", choices=["leapfrog", "omelyan"],
                    default="omelyan")
    sp.add_argument("--plain-nstep", type=int, default=32)
    sp.add_argument("--plain-ntraj", type=int, default=32768)
    sp.add_argument("--plain-chains", type=int, default=128)
    sp.add_argument("--start", choices=["auto", "hot", "cold"],
                    default="auto",
                    help="highbeta chain starts (auto: cold at beta >= 5)")
    sp.set_defaults(fn=cmd_pipeline)

    sp = sub.add_parser("bench")
    common(sp)
    sp.add_argument("--chains", type=int, default=1024)
    sp.add_argument("--which", type=str, default="hmc",
                    choices=["hmc", "fthmc", "train", "sample", "all"])
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser(
        "queue", help="run/inspect a declarative experiment stage queue "
                      "(fthmc_tpu.runner.run_queue: durable markers, "
                      "resumable after a VM recycle)")
    sp.add_argument("--queue", required=True, help="queue JSON file")
    sp.add_argument("--status", action="store_true")
    sp.add_argument("--only", default=None)
    sp.add_argument("--retry-failed", action="store_true",
                    help="re-attempt stages with .failed/.moot markers")
    sp.set_defaults(fn=cmd_queue)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
