from de_i2i_gan_tpu.nn.layers import Conv2d, Dense, avg_pool, max_pool, upsample_nearest
from de_i2i_gan_tpu.nn.normalization import (
    SPADE,
    SEAN,
    AdaIN,
    instance_norm,
    sean_label_index,
)
from de_i2i_gan_tpu.nn.blocks import (
    ConvBlock,
    DeConvBlock,
    ResBlock,
    NormConvBlock,
    NormResBlock,
    NoiseInjection,
    MaskToken,
    get_act,
)

__all__ = [
    "Conv2d", "Dense", "avg_pool", "max_pool", "upsample_nearest",
    "SPADE", "SEAN", "AdaIN", "instance_norm", "sean_label_index",
    "ConvBlock", "DeConvBlock", "ResBlock", "NormConvBlock", "NormResBlock",
    "NoiseInjection", "MaskToken", "get_act",
]
