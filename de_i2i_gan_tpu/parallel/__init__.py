from de_i2i_gan_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    make_parallel_step,
)

__all__ = ["make_mesh", "replicate", "shard_batch", "make_parallel_step"]
