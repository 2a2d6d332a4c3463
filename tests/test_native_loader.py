"""C++ native data-loader runtime tests (compiles the .so on demand)."""
import numpy as np
import pytest

from de_i2i_gan_tpu.data.synthetic import SyntheticDefectDataset
from de_i2i_gan_tpu.runtime.native_loader import (
    NativeDataLoader, build_cache, native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no native toolchain")


def test_cache_and_batches(tmp_path):
    ds = SyntheticDefectDataset(image_size=32, label_nc=6, length=16)
    cache, index = build_cache(ds, tmp_path)
    assert cache.stat().st_size == 16 * 32 * 32 * 3
    dl = NativeDataLoader(cache, index, image_size=24, batch_size=4,
                          num_threads=1, seed=3)
    assert dl.label_nc == 6 and dl.n_items == 16
    imgs, lbls, _ = next(dl)
    assert imgs.shape == (4, 24, 24, 3)
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0
    assert lbls.shape == (4, 6)
    assert (lbls.sum(axis=1) >= 1).all()
    # augmented batches differ call to call
    imgs2, _, _ = next(dl)
    assert not np.allclose(imgs, imgs2)
    dl.close()


def test_eval_mode_center_crop_deterministic(tmp_path):
    ds = SyntheticDefectDataset(image_size=32, label_nc=6, length=8)
    cache, index = build_cache(ds, tmp_path)
    a = NativeDataLoader(cache, index, 32, 8, 1, seed=1, augment=False)
    imgs, lbls, _ = next(a)
    a.close()
    # center crop without augmentation reproduces the source image per index:
    # match each batch row to some dataset item
    src = np.stack([ds[i][0] for i in range(8)])
    for row in np.asarray(imgs):
        diffs = np.abs(src - row[None]).mean(axis=(1, 2, 3))
        assert diffs.min() < 0.02, diffs.min()


def test_epoch_view_and_factory(tmp_path):
    from de_i2i_gan_tpu.runtime.native_loader import make_native_loader
    ds = SyntheticDefectDataset(image_size=32, label_nc=6, length=16)
    view = make_native_loader(ds, tmp_path, image_size=24, batch_size=4,
                              num_threads=1, seed=7)
    assert len(view) == 4  # 16 items / batch 4
    batches = list(iter(view))
    assert len(batches) == 4  # finite per-epoch view of the infinite stream
    imgs, lbls, _ = batches[0]
    assert imgs.shape == (4, 24, 24, 3) and lbls.shape == (4, 6)
    # re-iterable (InfiniteLoader wraps it for the background stream)
    assert len(list(iter(view))) == 4
    view.loader.close()


def test_u8_output_roundtrip(tmp_path):
    """dl_next_u8 ships quantized batches; images_to_float on device must
    recover the float batch to within one u8 quantization step."""
    import jax.numpy as jnp
    from de_i2i_gan_tpu.ops.fused import images_to_float
    ds = SyntheticDefectDataset(image_size=32, label_nc=6, length=8)
    cache, index = build_cache(ds, tmp_path)
    f = NativeDataLoader(cache, index, 32, 8, 1, seed=1, augment=False)
    u = NativeDataLoader(cache, index, 32, 8, 1, seed=1, augment=False,
                         output_u8=True)
    imgs_f, lbls_f, _ = next(f)
    imgs_u, lbls_u, _ = next(u)
    assert imgs_u.dtype == np.uint8
    np.testing.assert_array_equal(lbls_f, lbls_u)
    rec = np.asarray(images_to_float(jnp.asarray(imgs_u)))
    # eval mode is deterministic -> same underlying batch; u8 step is 2/255
    assert np.abs(rec - imgs_f).max() <= (1.0 / 127.5) + 1e-6
    f.close()
    u.close()


def test_batch_images_to_float_passthrough():
    import jax.numpy as jnp
    from de_i2i_gan_tpu.ops.fused import batch_images_to_float
    b = {"bg": jnp.zeros((1, 4, 4, 3), jnp.uint8),
         "df": jnp.ones((1, 4, 4, 3), jnp.float32),
         "df_labels": jnp.ones((1, 6), jnp.float32)}
    out = batch_images_to_float(b)
    assert out["bg"].dtype == jnp.float32
    assert float(out["bg"].min()) == -1.0
    assert (out["df"] == b["df"]).all()  # floats untouched
    assert out["df_labels"].dtype == jnp.float32


def test_paired_native_loader_alignment_and_shapes(tmp_path):
    """aug_mode=2: 6-channel cache, identical crop/flip for both halves by
    construction. Default yields one contiguous u8 {'pair'} buffer per
    launch (split on device by ops.fused.batch_images_to_float);
    split_on_host=True restores {'input','target'}."""
    pytest.importorskip("PIL")
    from de_i2i_gan_tpu.data.paired import SyntheticPairedDataset
    from de_i2i_gan_tpu.ops.fused import batch_images_to_float
    from de_i2i_gan_tpu.runtime.native_loader import (
        make_paired_native_loader, native_available)
    if not native_available():
        pytest.skip("no C++ toolchain")
    ds = SyntheticPairedDataset(image_size=64, length=16, seed=0)
    ld = make_paired_native_loader(ds, tmp_path / "pairs", 48, 4,
                                   load_size=64, seed=0, iters_per_launch=2)
    b = next(iter(ld))
    assert b["pair"].shape == (2, 4, 48, 48, 6)
    assert b["pair"].dtype == np.uint8
    assert b["pair"].flags.c_contiguous
    # the device-side split restores the step's {'input','target'} view
    fb = batch_images_to_float(b)
    assert fb["input"].shape == (2, 4, 48, 48, 3)
    assert fb["target"].shape == (2, 4, 48, 48, 3)
    assert float(fb["input"].max()) <= 1.0 + 1e-6

    # host-split mode matches the device split exactly
    ld_h = make_paired_native_loader(ds, tmp_path / "pairs", 48, 4,
                                     load_size=64, seed=0,
                                     iters_per_launch=2, split_on_host=True)
    bh = next(iter(ld_h))
    assert bh["input"].shape == (2, 4, 48, 48, 3)
    assert bh["input"].dtype == np.uint8

    # augment=False round-trips one source pair within u8 quantization
    ld0 = make_paired_native_loader(ds, tmp_path / "pairs", 64, 2,
                                    load_size=64, seed=0, augment=False)
    b0 = next(iter(ld0))["pair"]
    a_ = b0[..., :3][0].astype(np.float32) / 127.5 - 1
    t_ = b0[..., 3:][0].astype(np.float32) / 127.5 - 1
    err = min(
        float(np.abs(a_ - ds[i][0]).mean() + np.abs(t_ - ds[i][1]).mean())
        for i in range(len(ds)))
    assert err < 0.02, err


def test_native_dual_stream_super_batches(tmp_path):
    """NativeDualStreamLoader fills contiguous (nc,B,S,S,3) u8 super-batches
    in place — shape/dtype contract of the --native_loader DefectGAN feed
    (data.pipeline.DualStreamLoader equivalent, no host np.stack)."""
    from de_i2i_gan_tpu.runtime.native_loader import make_native_dual_stream

    df = SyntheticDefectDataset(image_size=48, label_nc=6, length=20)
    bg = SyntheticDefectDataset(image_size=48, label_nc=6, length=12,
                                data_type="background")
    loader = make_native_dual_stream(df, bg, tmp_path, image_size=32,
                                     batch_size=2, num_critics=3, seed=0,
                                     num_threads=1)
    assert len(loader) == 20 // 2 // 3
    batches = list(loader)
    assert len(batches) == len(loader)
    b = batches[0]
    assert set(b) == {"df", "bg", "df_labels"}
    assert b["df"].shape == (3, 2, 32, 32, 3) and b["df"].dtype == np.uint8
    assert b["bg"].shape == (3, 2, 32, 32, 3) and b["bg"].dtype == np.uint8
    assert b["df_labels"].shape == (3, 2, 6)
    assert (b["df_labels"].sum(axis=-1) >= 1).all()
    # rows are distinct augmented samples, and launches reuse no buffer
    assert not np.array_equal(b["df"][0], b["df"][1])
    assert b["df"].ctypes.data != batches[1]["df"].ctypes.data


def test_native_super_batch_loader(tmp_path):
    """Single-stream in-place super-batches (the --native_loader MAE/WGAN
    feed): SuperBatchLoader's {'imgs','labels'} contract, u8, no reuse."""
    from de_i2i_gan_tpu.runtime.native_loader import make_native_super_batch

    ds = SyntheticDefectDataset(image_size=48, label_nc=6, length=24,
                                data_type="fusion")
    loader = make_native_super_batch(ds, tmp_path, image_size=32,
                                     batch_size=2, num_critics=2, seed=0,
                                     num_threads=1)
    assert len(loader) == 24 // 2 // 2
    batches = list(loader)
    assert len(batches) == len(loader)
    b = batches[0]
    assert set(b) == {"imgs", "labels"}
    assert b["imgs"].shape == (2, 2, 32, 32, 3)
    assert b["imgs"].dtype == np.uint8
    assert b["labels"].shape == (2, 2, 6)
    assert b["imgs"].ctypes.data != batches[1]["imgs"].ctypes.data
    loader.close()


def test_cache_fingerprint_rebuild(tmp_path):
    """A cache built for one dataset must not be silently reused for a
    different one (same --name, different --load_size/dataset): the
    meta.json fingerprint forces a rebuild (ADVICE r3)."""
    from de_i2i_gan_tpu.runtime.native_loader import build_cache

    ds16 = SyntheticDefectDataset(image_size=16, label_nc=6, length=8)
    c1, _ = build_cache(ds16, tmp_path)
    size16 = c1.stat().st_size
    ds24 = SyntheticDefectDataset(image_size=24, label_nc=6, length=8)
    c2, _ = build_cache(ds24, tmp_path)
    assert c2.stat().st_size != size16, "stale cache reused across datasets"
    # identical dataset -> reused without rebuilding
    mtime = c2.stat().st_mtime_ns
    build_cache(ds24, tmp_path)
    assert c2.stat().st_mtime_ns == mtime


def test_build_cache_explicit_value_range(tmp_path):
    """A bright [-1,1] image whose min is >= -0.01 is misclassified by the
    range heuristic; an explicit value_range stores it correctly."""
    from de_i2i_gan_tpu.runtime.native_loader import build_cache

    class Bright:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            img = np.full((8, 8, 3), 0.5, np.float32)  # [-1,1]-coded grey
            return img, np.ones(2, np.float32), "x"

    c, _ = build_cache(Bright(), tmp_path / "auto")  # heuristic: reads as [0,1]
    wrong = np.frombuffer(c.read_bytes(), np.uint8)[0]
    c2, _ = build_cache(Bright(), tmp_path / "pm1", value_range="pm1")
    right = np.frombuffer(c2.read_bytes(), np.uint8)[0]
    assert right == 191  # (0.5+1)/2*255
    assert wrong == 127  # the heuristic's misread (0.5*255 truncated)
