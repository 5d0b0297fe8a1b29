from fthmc_tpu.ops.conv import circular_conv2d, conv_net_apply, init_conv_net

__all__ = ["circular_conv2d", "conv_net_apply", "init_conv_net"]
