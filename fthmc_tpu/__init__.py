"""fthmc_tpu: TPU-native field-transformation HMC for 2D U(1) lattice gauge
theory (JAX / XLA / Pallas), built from scratch with the capabilities of
nftqcd/fthmc (arXiv:2112.01586)."""

__version__ = "0.1.0"

from fthmc_tpu.config import (FlowSpec, HMCConfig, LeapfrogConfig,
                              SchedulerConfig, TrainConfig)

__all__ = ["FlowSpec", "HMCConfig", "LeapfrogConfig", "SchedulerConfig",
           "TrainConfig", "__version__"]
