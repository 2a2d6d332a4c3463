from de_i2i_gan_tpu.runtime.native_loader import (
    NativeDataLoader,
    NativeDualStreamLoader,
    NativeSuperBatchLoader,
    PairedNativeLoader,
    build_cache,
    make_native_dual_stream,
    make_native_loader,
    make_native_super_batch,
    make_paired_native_loader,
    native_available,
)

__all__ = [
    "NativeDataLoader",
    "NativeDualStreamLoader",
    "NativeSuperBatchLoader",
    "PairedNativeLoader",
    "build_cache",
    "make_native_dual_stream",
    "make_native_loader",
    "make_native_super_batch",
    "make_paired_native_loader",
    "native_available",
]
