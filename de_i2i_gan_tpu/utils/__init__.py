from de_i2i_gan_tpu.utils.masks import generate_mask, generate_shifted_mask
from de_i2i_gan_tpu.utils.diffaug import diff_augment
from de_i2i_gan_tpu.utils.labels import normal_labels, multilabel_combinations

__all__ = ["generate_mask", "generate_shifted_mask", "diff_augment",
           "normal_labels", "multilabel_combinations"]
