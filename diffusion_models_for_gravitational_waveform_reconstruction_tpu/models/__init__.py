from .unet import UNet1D, TimeEmbedding, BottleneckAttention, build_net_input  # noqa: F401
