from de_i2i_gan_tpu.train.state import NetState, GANTrainState
from de_i2i_gan_tpu.train.optim import make_optimizer, lr_schedule

__all__ = ["NetState", "GANTrainState", "make_optimizer", "lr_schedule"]
