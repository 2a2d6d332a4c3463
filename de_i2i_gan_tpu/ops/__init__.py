from de_i2i_gan_tpu.ops.fused import modulated_instance_norm

__all__ = ["modulated_instance_norm"]
