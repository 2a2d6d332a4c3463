from de_i2i_gan_tpu.losses.common import (
    bce_logits,
    cce_logits,
    cal_loss,
    l1,
    l2,
    r1_penalty,
)

__all__ = ["bce_logits", "cce_logits", "cal_loss", "l1", "l2", "r1_penalty"]
