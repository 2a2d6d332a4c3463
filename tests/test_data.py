"""Data pipeline tests: synthetic dataset, loaders, super-batch shapes."""
import numpy as np

from de_i2i_gan_tpu.data.pipeline import DataLoader, DualStreamLoader, InfiniteLoader
from de_i2i_gan_tpu.data.synthetic import SyntheticDefectDataset
from de_i2i_gan_tpu.data.datasets import find_dataset_using_name


def test_synthetic_dataset_deterministic():
    ds = SyntheticDefectDataset(image_size=32, label_nc=6, length=8)
    img1, lbl1, _ = ds[3]
    img2, lbl2, _ = ds[3]
    np.testing.assert_array_equal(img1, img2)
    assert img1.shape == (32, 32, 3)
    assert img1.min() >= -1 and img1.max() <= 1
    assert lbl1.shape == (6,)
    assert lbl1[0] == 0 and lbl1.sum() >= 1  # defect labels exclude background


def test_synthetic_background_label():
    ds = SyntheticDefectDataset(image_size=16, data_type="background", length=4)
    _, lbl, _ = ds[0]
    assert lbl[0] == 1 and lbl.sum() == 1


def test_dataloader_batches_and_infinite():
    ds = SyntheticDefectDataset(image_size=16, length=10)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
    assert len(dl) == 2
    batches = list(dl)
    assert len(batches) == 2
    imgs, labels, paths = batches[0]
    assert imgs.shape == (4, 16, 16, 3) and labels.shape == (4, 6)
    inf = InfiniteLoader(DataLoader(ds, batch_size=4))
    got = [next(inf) for _ in range(5)]  # wraps over epoch end
    assert len(got) == 5


def test_dual_stream_super_batches():
    df = DataLoader(SyntheticDefectDataset(image_size=16, length=20), 2)
    bg = DataLoader(SyntheticDefectDataset(image_size=16, length=6,
                                           data_type="background"), 2)
    dual = DualStreamLoader(df, bg, num_critics=5)
    assert len(dual) == 2
    sb = next(iter(dual))
    assert sb["df"].shape == (5, 2, 16, 16, 3)
    assert sb["bg"].shape == (5, 2, 16, 16, 3)
    assert sb["df_labels"].shape == (5, 2, 6)


def test_registry():
    assert find_dataset_using_name("synthetic") is SyntheticDefectDataset
    assert find_dataset_using_name("codebrim").clf_loss_type == "bce"
    assert find_dataset_using_name("mvtec").clf_loss_type == "cce"


def test_device_prefetch_order_and_producer_exit():
    """device_prefetch must deliver batches in order, and the producer
    thread must exit when the consumer abandons the generator early
    (regression: an abandoned producer used to block forever on a full
    queue, pinning the underlying loader's threads — ADVICE round 2)."""
    import threading
    import time

    import numpy as np

    from de_i2i_gan_tpu.data.pipeline import device_prefetch

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield {"x": np.full((2, 2), i, np.float32)}

    before = threading.active_count()
    it = device_prefetch(gen(), depth=2)
    got = [int(np.asarray(next(it)["x"])[0, 0]) for _ in range(5)]
    assert got == [0, 1, 2, 3, 4]
    it.close()  # consumer walks away mid-stream
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
    assert len(produced) < 100, "producer should stop early, not drain all"


def test_device_prefetch_propagates_loader_errors():
    from de_i2i_gan_tpu.data.pipeline import device_prefetch

    def bad():
        yield {"x": 1.0}
        raise RuntimeError("decode failed")

    it = device_prefetch(bad(), depth=2)
    next(it)
    try:
        next(it)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "decode failed" in str(e)


def test_enable_compile_cache_sets_jax_config(tmp_path, monkeypatch):
    """The CLI hook points jax at a persistent compile cache (without it
    every subprocess of cli/sweep.py recompiles each program)."""
    import jax

    from de_i2i_gan_tpu import enable_compile_cache

    old = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("DE_I2I_JAX_CACHE", str(tmp_path / "cc"))
        enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
        enable_compile_cache("/tmp/explicit_wins")
        assert jax.config.jax_compilation_cache_dir == "/tmp/explicit_wins"
        monkeypatch.setenv("DE_I2I_JAX_CACHE", "")
        jax.config.update("jax_compilation_cache_dir", str(tmp_path))
        enable_compile_cache()  # empty env -> disabled, leaves config alone
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_default_cache_dir_cpu_is_boot_scoped():
    """CPU-backend cache dirs are boot-scoped (identical /proc/cpuinfo hosts
    measured disagreeing on LLVM AOT machine features — a snapshot-inherited
    CPU cache poisons every load); the TPU dir stays boot-stable so
    expensive tunnel compiles survive."""
    from de_i2i_gan_tpu import default_cache_dir

    tpu_dir = default_cache_dir(platform="tpu")
    cpu_dir = default_cache_dir(platform="cpu")
    assert cpu_dir.startswith(tpu_dir + "_cpu")
    assert cpu_dir != tpu_dir
    # conftest forces jax_platforms=cpu, so auto-detection must pick cpu
    assert default_cache_dir() == cpu_dir
