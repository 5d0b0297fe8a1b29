from fthmc_tpu.models.flow import (count_parameters, flow_forward,
                                   flow_reverse, init_flow_params)
from fthmc_tpu.models.priors import Prior, normal_prior, uniform_link_prior

__all__ = ["count_parameters", "flow_forward", "flow_reverse",
           "init_flow_params", "Prior", "normal_prior", "uniform_link_prior"]
