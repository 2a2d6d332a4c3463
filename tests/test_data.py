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
