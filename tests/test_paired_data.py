"""Paired (aligned) dataset + loader tests: A|B split geometry, identical
crop/flip on both halves, synthetic pair determinism, loader stacking."""
import numpy as np
import pytest

from de_i2i_gan_tpu.data.paired import (
    AlignedDataset, PairedLoader, SyntheticPairedDataset,
    write_aligned_folder)


def test_synthetic_pairs_deterministic():
    ds = SyntheticPairedDataset(image_size=32, length=8, seed=7)
    a1, b1, _ = ds[3]
    a2, b2, _ = ds[3]
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)
    assert a1.shape == b1.shape == (32, 32, 3)
    assert a1.min() >= -1 and a1.max() <= 1


def test_aligned_roundtrip(tmp_path):
    ds = SyntheticPairedDataset(image_size=24, length=6, seed=3)
    root = write_aligned_folder(ds, tmp_path / "pairs", phase="train")
    al = AlignedDataset(root, "train", load_size=24, crop_size=24,
                        flip=False)
    assert len(al) == 6
    a, b, path = al[0]
    a0, b0, _ = ds[0]
    # png round-trip is 8-bit: ~1/127 quantization
    assert np.abs(a - a0).max() < 0.02
    assert np.abs(b - b0).max() < 0.02
    assert path.endswith("00000.png")


def test_aligned_identical_crop_and_flip(tmp_path):
    ds = SyntheticPairedDataset(image_size=32, length=2, seed=5)
    # aligned pair where A == B: any crop/flip must keep them equal
    class Mirror:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            a, _, p = ds[i]
            return a, a.copy(), p

    root = write_aligned_folder(Mirror(), tmp_path / "mirror", phase="train")
    al = AlignedDataset(root, "train", load_size=40, crop_size=32, flip=True,
                        seed=11)
    for i in range(2):
        a, b, _ = al[i]
        assert a.shape == (32, 32, 3)
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_paired_loader_stacking():
    ds = SyntheticPairedDataset(image_size=16, length=32, seed=1)
    loader = PairedLoader(ds, batch_size=4, iters_per_launch=2, seed=9)
    batches = list(loader)
    assert len(batches) == len(loader) == 4
    assert batches[0]["input"].shape == (2, 4, 16, 16, 3)
    assert batches[0]["target"].shape == (2, 4, 16, 16, 3)
    # plain (no stacking) mode
    flat = PairedLoader(ds, batch_size=4, iters_per_launch=1, seed=9)
    fb = next(iter(flat))
    assert fb["input"].shape == (4, 16, 16, 3)


def test_direction_swap(tmp_path):
    ds = SyntheticPairedDataset(image_size=16, length=2, seed=2)
    root = write_aligned_folder(ds, tmp_path / "dir", phase="test")
    fwd = AlignedDataset(root, "test", load_size=16, crop_size=16,
                         direction="AtoB")
    rev = AlignedDataset(root, "test", load_size=16, crop_size=16,
                         direction="BtoA")
    fa, fb, _ = fwd[0]
    ra, rb, _ = rev[0]
    np.testing.assert_array_equal(fa, rb)
    np.testing.assert_array_equal(fb, ra)
