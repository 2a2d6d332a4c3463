"""ctypes bindings + cache builder for the C++ data-loading runtime
(runtime/dataloader.cc).

Flow:
  1. ``build_cache(dataset, cache_dir)`` decodes every image ONCE (PIL on the
     host) into a flat uint8 HWC cache + binary index. Sources larger than
     ``max_side`` are pre-shrunk (the reference resizes to 1.5x crop size
     anyway, train_defectgan.py:58).
  2. ``NativeDataLoader`` drives the .so: N C++ threads mmap the cache and
     stream augmented float32 NHWC batches; Python only does one memcpy into
     a reusable numpy buffer per batch.

The .so compiles on first use (g++ -O3 -march=native); everything degrades
gracefully to the pure-Python pipeline when a toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import struct
import subprocess
from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np

_SRC = Path(__file__).parent / "dataloader.cc"
_SO = Path(__file__).parent / "libdig_loader.so"
_MAGIC = 0xD16D16D1


def _compile() -> bool:
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             "-o", str(_SO), str(_SRC), "-lpthread"],
            check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"[native_loader] compile failed: {getattr(e, 'stderr', e)}")
        return False


def native_available() -> bool:
    return _compile()


_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        assert _compile(), "native loader unavailable"
        _lib = ctypes.CDLL(str(_SO))
        _lib.dl_create.restype = ctypes.c_void_p
        _lib.dl_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_uint64, ctypes.c_int]
        _lib.dl_next.restype = ctypes.c_int
        _lib.dl_next.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.POINTER(ctypes.c_float)]
        _lib.dl_next_u8.restype = ctypes.c_int
        _lib.dl_next_u8.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.POINTER(ctypes.c_float)]
        _lib.dl_label_nc.restype = ctypes.c_int
        _lib.dl_label_nc.argtypes = [ctypes.c_void_p]
        _lib.dl_set_crop_frac.restype = None
        _lib.dl_set_crop_frac.argtypes = [ctypes.c_void_p, ctypes.c_float]
        _lib.dl_n_items.restype = ctypes.c_uint
        _lib.dl_n_items.argtypes = [ctypes.c_void_p]
        _lib.dl_destroy.argtypes = [ctypes.c_void_p]
    return _lib


def build_cache(dataset, cache_dir: Path, max_side: Optional[int] = None,
                channels: int = 3,
                value_range: Optional[str] = None) -> Tuple[Path, Path]:
    """Decode a map-style dataset (items: (img_or_array, label, path)) into
    the raw cache. Dataset items may be PIL images, uint8 or float arrays.

    ``value_range``: "pm1" (floats are in [-1,1]), "01" (floats in [0,1]) or
    None (per-image min() heuristic — ambiguous for a bright [-1,1] image
    whose minimum is >= -0.01, so callers that KNOW their range should say
    so; AlignedDataset/RawPairView/Synthetic* always emit [-1,1]).

    An existing cache is reused only when its ``meta.json`` fingerprint
    (item count, channels, first-item shape, max_side, value_range) matches;
    otherwise it is rebuilt — rerunning with the same --name but a different
    --load_size/--direction/dataset must not silently train on stale pairs.
    """
    import json as _json

    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    cache_path = cache_dir / "images.u8"
    index_path = cache_dir / "index.bin"
    meta_path = cache_dir / "meta.json"
    img0, _, _ = dataset[0]
    fingerprint = {
        "version": 2,
        "n_items": len(dataset),
        "channels": channels,
        "max_side": max_side,
        "value_range": value_range or "auto",
        "first_item_shape": list(np.asarray(img0).shape),
    }
    if cache_path.exists() and index_path.exists():
        try:
            if _json.loads(meta_path.read_text()) == fingerprint:
                return cache_path, index_path
        except (OSError, ValueError):
            pass  # unstamped/corrupt meta -> rebuild
        print(f"[native_loader] cache at {cache_dir} does not match the "
              "requested dataset (or predates fingerprinting); rebuilding")
        meta_path.unlink(missing_ok=True)

    entries = []
    with cache_path.open("wb") as f:
        offset = 0
        for i in range(len(dataset)):
            img, label, _ = dataset[i]
            arr = np.asarray(img)
            if arr.dtype != np.uint8:
                a = arr.astype(np.float32)
                vr = value_range or (
                    "pm1" if a.min() < -0.01 else "01")
                if vr == "pm1":
                    a = (a + 1.0) / 2.0
                arr = np.clip(a * 255.0, 0, 255).astype(np.uint8)
            if arr.ndim == 2:
                arr = np.repeat(arr[..., None], channels, axis=2)
            if max_side and max(arr.shape[:2]) > max_side:
                from PIL import Image
                im = Image.fromarray(arr)
                scale = max_side / max(arr.shape[:2])
                im = im.resize((max(1, round(im.width * scale)),
                                max(1, round(im.height * scale))))
                arr = np.asarray(im)
            h, w = arr.shape[:2]
            data = np.ascontiguousarray(arr[:, :, :channels]).tobytes()
            f.write(data)
            entries.append((offset, h, w, np.asarray(label, np.float32)))
            offset += len(data)

    label_nc = len(entries[0][3])
    with index_path.open("wb") as f:
        f.write(struct.pack("<IIII", _MAGIC, len(entries), label_nc,
                            channels))
        for offset, h, w, label in entries:
            f.write(struct.pack("<Qii", offset, h, w))
            f.write(label.tobytes())
    meta_path.write_text(_json.dumps(fingerprint))
    return cache_path, index_path


class NativeDataLoader:
    """Infinite augmented-batch stream backed by the C++ runtime."""

    def __init__(self, cache_path: Path, index_path: Path, image_size: int,
                 batch_size: int, num_threads: int = 2, seed: int = 123,
                 augment: bool = True, channels: int = 3,
                 output_u8: bool = False, aug_mode: Optional[int] = None,
                 crop_frac: Optional[float] = None):
        lib = _load_lib()
        self._lib = lib
        # aug modes: 0 center-crop, 1 RRC+flips+jitter (defectGAN),
        # 2 paired random-crop+hflip (pix2pix; no jitter)
        mode = aug_mode if aug_mode is not None else int(augment)
        self._handle = lib.dl_create(
            str(cache_path).encode(), str(index_path).encode(),
            image_size, batch_size, num_threads, seed, mode)
        if not self._handle:
            raise RuntimeError("failed to open native loader cache")
        if crop_frac is not None:
            lib.dl_set_crop_frac(self._handle, float(crop_frac))
        self.batch_size = batch_size
        self.image_size = image_size
        self.channels = channels
        self.output_u8 = output_u8
        self.label_nc = lib.dl_label_nc(self._handle)
        self.n_items = lib.dl_n_items(self._handle)
        shape = (batch_size, image_size, image_size, channels)
        # u8 batches quarter the host->device transfer; the jitted steps
        # normalize u8 -> [-1,1] on device (steps.py images_to_float)
        self._img_buf = np.empty(shape,
                                 np.uint8 if output_u8 else np.float32)
        self._lbl_buf = np.empty((batch_size, self.label_nc), np.float32)

    def __len__(self):
        return max(1, self.n_items // self.batch_size)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        if self.output_u8:
            rc = self._lib.dl_next_u8(
                self._handle,
                self._img_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self._lbl_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        else:
            rc = self._lib.dl_next(
                self._handle,
                self._img_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._lbl_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise StopIteration
        return self._img_buf.copy(), self._lbl_buf.copy(), []

    def next_into(self, img_out: np.ndarray, lbl_out: np.ndarray) -> None:
        """Fill caller-provided C-contiguous buffers directly — the C++
        workers write the batch in place, with no intermediate host copy
        (the hot path for the paired u8 stream on a 1-core host)."""
        assert img_out.flags.c_contiguous and lbl_out.flags.c_contiguous
        assert img_out.dtype == self._img_buf.dtype
        if self.output_u8:
            rc = self._lib.dl_next_u8(
                self._handle,
                img_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                lbl_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        else:
            rc = self._lib.dl_next(
                self._handle,
                img_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                lbl_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise StopIteration

    def close(self):
        if self._handle:
            self._lib.dl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class EpochView:
    """Finite, ``data.pipeline.DataLoader``-shaped view over the infinite
    native stream, so the epoch-based trainer loaders (DualStreamLoader,
    SuperBatchLoader) can consume the C++ runtime unchanged."""

    def __init__(self, loader: NativeDataLoader,
                 batches_per_epoch: Optional[int] = None):
        self.loader = loader
        self.batch_size = loader.batch_size
        self._n = batches_per_epoch or len(loader)

    def __len__(self):
        return self._n

    def __iter__(self) -> Iterator:
        for _ in range(self._n):
            yield next(self.loader)


class NativeDualStreamLoader:
    """Defects + background super-batches straight from the C++ runtime —
    the native counterpart of data.pipeline.DualStreamLoader (reference
    schedule: one defect batch per D sub-step, defectgan_trainer.py:96-109).

    The workers fill contiguous (num_critics, B, S, S, 3) buffers in place
    (next_into row by row) — no np.stack and no per-batch host memcpy, which
    on a 1-core host compete with step dispatch (the same fix that took the
    paired pix2pix feed to zero overlap gap)."""

    def __init__(self, df: NativeDataLoader, bg: NativeDataLoader,
                 num_critics: int):
        assert df.output_u8 and bg.output_u8, \
            "super-batch fast path is u8-only (ships 1/4 the H2D bytes)"
        self.df, self.bg = df, bg
        self.num_critics = num_critics
        self.batch_size = df.batch_size

    def __len__(self):
        return max(1, self.df.n_items // self.batch_size // self.num_critics)

    def __iter__(self) -> Iterator:
        nc, b, s = self.num_critics, self.batch_size, self.df.image_size
        bg_lbl = np.empty((b, self.bg.label_nc), np.float32)
        for _ in range(len(self)):
            # fresh buffers per launch: device_put is async, the arrays
            # must not be reused until the transfer completes
            dfs = np.empty((nc, b, s, s, 3), np.uint8)
            bgs = np.empty((nc, b, s, s, 3), np.uint8)
            lbls = np.empty((nc, b, self.df.label_nc), np.float32)
            for j in range(nc):
                self.df.next_into(dfs[j], lbls[j])
                self.bg.next_into(bgs[j], bg_lbl)
            yield {"df": dfs, "bg": bgs, "df_labels": lbls}

    def close(self):
        self.df.close()
        self.bg.close()


class NativeSuperBatchLoader:
    """Single-stream {'imgs','labels'} super-batches filled in place — the
    native counterpart of data.pipeline.SuperBatchLoader (the MAE / WGAN
    feeding shape, leading (num_critics,) axis), same no-np.stack fast path
    as NativeDualStreamLoader."""

    def __init__(self, loader: NativeDataLoader, num_critics: int,
                 key: str = "imgs"):
        assert loader.output_u8, "super-batch fast path is u8-only"
        self.loader = loader
        self.num_critics = num_critics
        self.key = key
        self.batch_size = loader.batch_size

    def __len__(self):
        return max(1, self.loader.n_items // self.batch_size
                   // self.num_critics)

    def __iter__(self) -> Iterator:
        nc, b, s = self.num_critics, self.batch_size, self.loader.image_size
        for _ in range(len(self)):
            imgs = np.empty((nc, b, s, s, self.loader.channels), np.uint8)
            lbls = np.empty((nc, b, self.loader.label_nc), np.float32)
            for j in range(nc):
                self.loader.next_into(imgs[j], lbls[j])
            yield {self.key: imgs, "labels": lbls}

    def close(self):
        self.loader.close()


class RawPairView:
    """(input, target, path) paired dataset -> (H, W, 6) channel-stacked raw
    samples for the native cache, so the C++ side's crop window and flip
    apply identically to both halves (the pix2pix 'same params for A and B'
    invariant, by construction)."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index: int):
        a, b, path = self.dataset[index]
        pair = np.concatenate([np.asarray(a), np.asarray(b)], axis=-1)
        return pair, np.zeros(1, np.float32), path


class PairedNativeLoader:
    """Paired u8 batches from the C++ runtime (aug_mode=2), with an optional
    leading (iters_per_launch,) axis for the scan super-step — the native
    counterpart of data.paired.PairedLoader.

    Default (``split_on_host=False``): yields ``{'pair': u8[..., 6]}`` —
    the C++ workers fill one freshly-allocated contiguous buffer in place
    (no host copies, one H2D transfer); the jitted steps split input/target
    on device (ops.fused.batch_images_to_float). ``split_on_host=True``
    restores ``{'input','target'}`` for consumers without that hook."""

    def __init__(self, loader: NativeDataLoader, n_pairs: int,
                 iters_per_launch: int = 1, split_on_host: bool = False):
        assert loader.channels == 6, "paired cache must be 6-channel"
        self.loader = loader
        self.iters_per_launch = iters_per_launch
        self.split_on_host = split_on_host
        self.batch_size = loader.batch_size
        self._n = max(1, n_pairs // loader.batch_size
                      // max(iters_per_launch, 1))

    def __len__(self):
        return self._n

    def __iter__(self) -> Iterator:
        ipl = max(self.iters_per_launch, 1)
        ld = self.loader
        s = ld.image_size
        lbl = np.empty((ld.batch_size, ld.label_nc), np.float32)
        for _ in range(self._n):
            # fresh buffer per launch: device_put is async, so the array
            # handed over must not be reused until the transfer completes
            group = np.empty((ipl, ld.batch_size, s, s, 6),
                             ld._img_buf.dtype)
            for j in range(ipl):
                ld.next_into(group[j], lbl)
            out = group[0] if ipl == 1 else group
            if self.split_on_host:
                yield {"input": np.ascontiguousarray(out[..., :3]),
                       "target": np.ascontiguousarray(out[..., 3:])}
            else:
                yield {"pair": out}


def make_paired_native_loader(dataset, cache_dir: Path, image_size: int,
                              batch_size: int, *, load_size: int = 286,
                              seed: int = 123, num_threads: int = 4,
                              iters_per_launch: int = 1,
                              augment: bool = True,
                              split_on_host: bool = False
                              ) -> PairedNativeLoader:
    """Cache a paired dataset (items: (input, target, path) with NO
    host-side augmentation) as 6-channel raw samples and stream augmented
    u8 {'input','target'} batches from the C++ runtime.

    crop_frac = image_size/load_size reproduces the pix2pix
    resize(load_size) -> random-crop(crop_size) schedule on the cached
    full-size pair.
    """
    # paired datasets (AlignedDataset, SyntheticPairedDataset) always emit
    # [-1,1] floats; say so instead of per-image range guessing
    cache, index = build_cache(RawPairView(dataset), Path(cache_dir),
                               channels=6, value_range="pm1")
    native = NativeDataLoader(
        cache, index, image_size, batch_size, num_threads=num_threads,
        seed=seed, channels=6, output_u8=True,
        aug_mode=2 if augment else 0,
        crop_frac=min(image_size / max(load_size, image_size), 1.0))
    return PairedNativeLoader(native, len(dataset),
                              iters_per_launch=iters_per_launch,
                              split_on_host=split_on_host)


def make_native_dual_stream(df_dataset, bg_dataset, cache_root: Path,
                            image_size: int, batch_size: int,
                            num_critics: int, seed: int = 123,
                            num_threads: int = 4,
                            value_range: str | None = None
                            ) -> NativeDualStreamLoader:
    """Cache both streams and return the in-place super-batch loader (the
    --native_loader DefectGAN feed)."""
    df_cache, df_index = build_cache(df_dataset, Path(cache_root) / "defects",
                                     max_side=image_size * 2,
                                     value_range=value_range)
    bg_cache, bg_index = build_cache(bg_dataset,
                                     Path(cache_root) / "background",
                                     max_side=image_size * 2,
                                     value_range=value_range)
    df = NativeDataLoader(df_cache, df_index, image_size, batch_size,
                          num_threads=num_threads, seed=seed, output_u8=True)
    bg = NativeDataLoader(bg_cache, bg_index, image_size, batch_size,
                          num_threads=num_threads, seed=seed + 1,
                          output_u8=True)
    return NativeDualStreamLoader(df, bg, num_critics)


def make_native_super_batch(dataset, cache_dir: Path, image_size: int,
                            batch_size: int, num_critics: int,
                            seed: int = 123, num_threads: int = 4,
                            key: str = "imgs",
                            value_range: str | None = None
                            ) -> NativeSuperBatchLoader:
    """Cache a single stream and return the in-place super-batch loader
    (the --native_loader MAE/WGAN feed)."""
    cache, index = build_cache(dataset, Path(cache_dir),
                               max_side=image_size * 2,
                               value_range=value_range)
    native = NativeDataLoader(cache, index, image_size, batch_size,
                              num_threads=num_threads, seed=seed,
                              output_u8=True)
    return NativeSuperBatchLoader(native, num_critics, key=key)


def make_native_loader(dataset, cache_dir: Path, image_size: int,
                       batch_size: int, seed: int = 123,
                       num_threads: int = 4, augment: bool = True,
                       max_side: Optional[int] = None,
                       output_u8: bool = True,
                       value_range: Optional[str] = None) -> EpochView:
    """Cache ``dataset`` (UNtransformed items — the C++ side does the random
    resized crop + flips itself) and return an epoch-shaped loader over it.

    ``max_side`` defaults to 2x the training crop, mirroring the reference's
    Resize(1.5x) pre-shrink (train_defectgan.py:58) with headroom for the
    random-crop scale range. ``output_u8`` (default on) ships quantized u8
    batches — 1/4 the host->device bytes; the jitted train steps normalize
    on device.
    """
    cache, index = build_cache(dataset, Path(cache_dir),
                               max_side=max_side or image_size * 2,
                               value_range=value_range)
    native = NativeDataLoader(cache, index, image_size, batch_size,
                              num_threads=num_threads, seed=seed,
                              augment=augment, output_u8=output_u8)
    return EpochView(native, batches_per_epoch=len(dataset) // batch_size)
