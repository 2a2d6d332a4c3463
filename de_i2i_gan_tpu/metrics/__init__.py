from de_i2i_gan_tpu.metrics.fid import (
    ActivationStats,
    frechet_distance,
    inception_score,
    load_stats_npz,
    save_stats_npz,
)
from de_i2i_gan_tpu.metrics.inception import InceptionV3, BLOCK_INDEX_BY_DIM
from de_i2i_gan_tpu.metrics.lpips import LPIPS

__all__ = [
    "ActivationStats", "frechet_distance", "inception_score",
    "load_stats_npz", "save_stats_npz",
    "InceptionV3", "BLOCK_INDEX_BY_DIM", "LPIPS",
]
