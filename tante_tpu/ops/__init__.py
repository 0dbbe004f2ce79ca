from tante_tpu.ops.attention import MultiheadAttention
from tante_tpu.ops.convs import RealConv2d, RealTransConv2d
from tante_tpu.ops.pooling import adaptive_avg_pool2d, resize_bilinear
from tante_tpu.ops.spectral import SpectralLayer, spectral_conv2d

__all__ = [
    "MultiheadAttention",
    "RealConv2d",
    "RealTransConv2d",
    "adaptive_avg_pool2d",
    "resize_bilinear",
    "SpectralLayer",
    "spectral_conv2d",
]
