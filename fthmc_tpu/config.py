"""Configuration dataclasses + JSON loading for fthmc_tpu.

Capability parity with the reference config system (fthmc/config.py:194-377:
Param / TrainConfig / lfConfig / SchedulerConfig, JSON via --json_file in
fthmc/main.py:47-64), redesigned for JAX: the specs that shape compiled
programs (lattice size, flow architecture, integrator steps) are frozen and
hashable so they can be passed as static args to jit.
"""
from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field, fields, replace
from typing import Any

__all__ = [
    "FlowSpec", "LeapfrogConfig", "HMCConfig", "TrainConfig",
    "SchedulerConfig", "load_json_configs", "make_configs", "filter_kwargs",
]


@dataclass(frozen=True)
class FlowSpec:
    """Static architecture of the gauge-equivariant flow.

    Mirrors the reference's network hyperparameters (fthmc/config.py:283-302:
    n_layers, n_s_nets, hidden_sizes, kernel_size, activation_fn). Parameters
    are lattice-size independent (3x3 CNNs), which is what makes volume
    transfer (reference train.py:434-455) a no-op here: the same params apply
    at any L.
    """
    n_layers: int = 24            # number of coupling layers in the stack
    n_mixture: int = 2            # NCP mixture components (reference n_s_nets)
    hidden_sizes: tuple[int, ...] = (8, 8)
    kernel_size: int = 3
    coupling: str = "ncp"         # 'ncp' (reference architecture) |
                                  # 'rncp' (rotated-mixture NCP: per-
                                  # component learned rotations - smooth
                                  # high-capacity family for beta >= 3;
                                  # coupling.py rncp_*) | 'spline' (circular
                                  # RQ spline, models/spline.py - analytic
                                  # inverse but a C^1 force that leapfrog
                                  # cannot integrate at scale; sampling use
                                  # only)
    n_knots: int = 8              # spline bins per site (coupling='spline')
    activation: str = "silu"      # relu | silu | swish | leaky_relu | tanh
    init: str = "reference"       # effective torch-default init (see
                                  # ops/conv.init_conv_net docstring)
    conv_dtype: str = "float32"   # 'bfloat16' runs the coupling CNNs in
                                  # bf16 (MXU-native) with fp32 accumulation;
                                  # transforms/log-Jacobians stay fp32.
                                  # Validate <exp(-dH)>~1 before production.
    s_clip: float | None = None   # smooth cap on the NCP log-slope:
                                  # s -> s_clip * tanh(s / s_clip). Bounds
                                  # the transform slope in [e^-c, e^c], hence
                                  # the FT-HMC force curvature - makes S_eff
                                  # integrable for under-trained flows at
                                  # larger beta/volume (no reference
                                  # counterpart; off by default)

    def __post_init__(self):
        object.__setattr__(self, "hidden_sizes", tuple(self.hidden_sizes))


@dataclass(frozen=True)
class LeapfrogConfig:
    """Trajectory length + step count (reference lfConfig, config.py:260-280)."""
    tau: float = 2.0
    nstep: int = 10

    @property
    def dt(self) -> float:
        return self.tau / self.nstep

    def uniquestr(self) -> str:
        return f"t{self.tau}_s{self.nstep}_dt{self.dt}"


@dataclass(frozen=True)
class HMCConfig:
    """Plain-HMC run parameters (reference Param, config.py:194-258)."""
    beta: float = 6.0
    L: int = 8
    tau: float = 2.0
    nstep: int = 10
    ntraj: int = 256
    nrun: int = 4
    n_chains: int = 1             # vmapped chains (reference is single-chain)
    nprint: int = 256
    seed: int = 11 * 13
    randinit: bool = False

    @property
    def dt(self) -> float:
        return self.tau / self.nstep

    @property
    def lat(self) -> tuple[int, int]:
        return (self.L, self.L)

    @property
    def volume(self) -> int:
        return self.L * self.L

    @property
    def lf(self) -> LeapfrogConfig:
        return LeapfrogConfig(tau=self.tau, nstep=self.nstep)

    def uniquestr(self) -> str:
        lat = "x".join(str(x) for x in self.lat)
        return f"t{lat}_b{self.beta}_n{self.ntraj}_t{self.tau}_s{self.nstep}"

    def logdir(self, basedir: str = "logs") -> str:
        lat = "x".join(str(x) for x in self.lat)
        return os.path.join(
            basedir, "hmc", f"lat{lat}", f"beta{self.beta}", self.uniquestr())


@dataclass(frozen=True)
class SchedulerConfig:
    """Reduce-LR-on-plateau settings (reference config.py:159-191)."""
    factor: float = 0.5
    patience: int = 10
    threshold: float = 1e-4
    cooldown: int = 0
    min_lr: float = 1e-5

    def uniquestr(self) -> str:
        return f"f{self.factor}_p{self.patience}_m{self.min_lr}"


@dataclass(frozen=True)
class TrainConfig:
    """Flow-training run parameters (reference TrainConfig, config.py:283-377)."""
    L: int = 8
    beta: float = 2.0
    n_era: int = 10
    n_epoch: int = 100
    batch_size: int = 64
    base_lr: float = 0.001
    flow: FlowSpec = field(default_factory=FlowSpec)
    with_force: bool = False      # add force-matching objective
    force_lr_factor: float = 0.01  # force-matching LR = base_lr * this
                                   # (prototype ipynb/ft_hmc.py:320)
    force_weight: float = 0.0     # smoothness-regularized JOINT objective:
                                   # loss = dkl_factor*D_KL + force_weight *
                                   # E[mean(F_eff^2)] on the SAME prior batch
                                   # (per-dof mean, so the scale is L- and
                                   # batch-stable). Distinct from with_force
                                   # (the reference prototype's ALTERNATING
                                   # force step at lr/100): this shapes the
                                   # KL optimum itself toward leapfrog-smooth
                                   # maps. No reference counterpart; 0 = off.
    ferm_mass: float = 0.0        # fermion-aware smoothness (round-4): with
                                   # force_weight > 0, F_eff in the
                                   # regularizer is the DYNAMICAL effective
                                   # force with the EXACT two-flavor log-det
                                   # at this Wilson mass (fermion.
                                   # logdet_mdagm, dense — train volumes
                                   # only). 0 = pure-gauge F_eff.
    dkl_factor: float = 1.0
    beta_init: float | None = None  # beta-annealed training: start from this
                                    # beta and ramp linearly to `beta` over
                                    # beta_anneal_frac of all steps (no
                                    # reference counterpart; the continuation
                                    # trick that makes beta>=3 trainable)
    beta_anneal_frac: float = 0.7
    grad_clip: float | None = None  # optax global-norm gradient clipping
                                    # (stabilizes annealed high-capacity
                                    # training; None = off)
    print_freq: int = 50
    plot_freq: int = 50
    log_freq: int = 50
    seed: int = 1331
    restore: bool = False

    @property
    def lat(self) -> tuple[int, int]:
        return (self.L, self.L)

    @property
    def volume(self) -> int:
        return self.L * self.L

    def uniquestr(self) -> str:
        hstr = "".join(str(i) for i in self.flow.hidden_sizes)
        return "_".join([
            f"L{self.L}", f"b{self.beta}", f"nb{self.batch_size}",
            f"act{self.flow.activation}", f"nh{self.flow.n_layers}",
            f"ns{self.flow.n_mixture}", f"ks{self.flow.kernel_size}",
            f"hl{hstr}", f"lr{self.base_lr}",
            f"era{self.n_era}", f"epoch{self.n_epoch}",
        ])

    def logdir(self, basedir: str = "logs") -> str:
        lat = "x".join(str(x) for x in self.lat)
        return os.path.join(
            basedir, "models", f"lat{lat}", f"beta{self.beta}",
            self.uniquestr())


def filter_kwargs(cls, d: dict[str, Any]) -> dict[str, Any]:
    """Keep only keys of ``d`` that are fields of dataclass ``cls``."""
    names = {f.name for f in fields(cls)}
    return {k: v for k, v in d.items() if k in names}


def make_configs(raw: dict[str, Any]):
    """Build (HMCConfig, TrainConfig, LeapfrogConfig, SchedulerConfig|None)
    from one flat/partially-nested JSON dict (reference main.py:230-265 setup).

    Accepted layout: either nested {"hmc": {...}, "train": {...}, "fthmc":
    {...}, "scheduler": {...}} or the reference's flat key soup; flat keys are
    routed to every config that has a field of that name.
    """
    nested = {k: raw.get(k, {}) for k in ("hmc", "train", "fthmc", "scheduler")}
    flat = {k: v for k, v in raw.items() if k not in nested}

    flow_kwargs = filter_kwargs(FlowSpec, {**flat, **nested["train"]})
    # reference spellings (fthmc/bin/configs.json)
    for src, dst in (("n_s_nets", "n_mixture"), ("activation_fn", "activation")):
        v = {**flat, **nested["train"]}.get(src)
        if v is not None:
            flow_kwargs[dst] = v
    if "hidden_sizes" in flow_kwargs:
        flow_kwargs["hidden_sizes"] = tuple(flow_kwargs["hidden_sizes"])
    flow = FlowSpec(**flow_kwargs)

    hmc = HMCConfig(**filter_kwargs(HMCConfig, {**flat, **nested["hmc"]}))
    train = TrainConfig(
        flow=flow, **filter_kwargs(
            TrainConfig, {
                k: v for k, v in {**flat, **nested["train"]}.items()
                if k != "flow"}))
    lf_raw = {**flat, **nested["fthmc"]}
    lf = LeapfrogConfig(**filter_kwargs(LeapfrogConfig, lf_raw))
    sched = None
    if nested["scheduler"]:
        sched = SchedulerConfig(
            **filter_kwargs(SchedulerConfig, nested["scheduler"]))
    return hmc, train, lf, sched


def load_json_configs(path: str):
    """Load a JSON config file (reference parse_configs, main.py:47-64)."""
    with open(path) as f:
        raw = json.load(f)
    return make_configs(raw)


def config_to_dict(cfg) -> dict:
    d = asdict(cfg)
    return d


def with_updates(cfg, **kwargs):
    """Functional update helper (dataclasses.replace re-export)."""
    return replace(cfg, **kwargs)
