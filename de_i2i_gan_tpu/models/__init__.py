from de_i2i_gan_tpu.models.generator import DefectGanGenerator, WGanGenerator
from de_i2i_gan_tpu.models.discriminator import (
    DefectGanDiscriminator,
    WGanDiscriminator,
    ViTClassifier,
)
from de_i2i_gan_tpu.models.extractor import StyleExtractor

__all__ = [
    "DefectGanGenerator", "WGanGenerator",
    "DefectGanDiscriminator", "WGanDiscriminator", "ViTClassifier",
    "StyleExtractor",
]
