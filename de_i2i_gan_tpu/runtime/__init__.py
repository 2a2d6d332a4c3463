from de_i2i_gan_tpu.runtime.native_loader import (
    NativeDataLoader,
    build_cache,
    native_available,
)

__all__ = ["NativeDataLoader", "build_cache", "native_available"]
