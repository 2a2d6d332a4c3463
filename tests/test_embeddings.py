"""SEAN embedding bank + stargan-v2 data pipeline tests."""
import numpy as np
import jax
import jax.numpy as jnp

from de_i2i_gan_tpu.data.embeddings import EmbeddingBank, attach_embeddings


def test_bank_build_sample_and_fallback(tmp_path):
    bank = EmbeddingBank(label_nc=3, embed_nc=8, capacity=4)
    bank.add((1, 0, 0), np.full(8, 1.0, np.float32))
    bank.add((1, 0, 0), np.full(8, 2.0, np.float32))
    bank.add((0, 1, 0), np.full(8, 3.0, np.float32))

    labels = jnp.asarray([[1., 0, 0], [0., 1, 0], [0., 0, 1]])
    s = bank.sample(labels, num_embeds=5, rng=jax.random.PRNGKey(0))
    assert s.shape == (3, 5, 8)
    s = np.asarray(s)
    assert set(np.unique(s[0])) <= {1.0, 2.0}  # draws from label-0 bank
    assert (s[1] == 3.0).all()
    assert (s[2] == 0.0).all()  # empty label -> zeros (SEAN latent fallback)

    bank.save(tmp_path / "b.npz")
    bank2 = EmbeddingBank.load(tmp_path / "b.npz")
    np.testing.assert_array_equal(bank.bank, bank2.bank)
    np.testing.assert_array_equal(bank.counts, bank2.counts)


def test_attach_embeddings_super_batch():
    bank = EmbeddingBank(label_nc=3, embed_nc=8, capacity=4)
    bank.add((1, 0, 0), np.ones(8, np.float32))
    bank.add((0, 1, 0), np.ones(8, np.float32) * 2)
    batch = {"df_labels": jnp.tile(jnp.asarray([[0., 1., 0.]]), (2, 4, 1))}
    out = attach_embeddings(batch, bank, num_embeds=3,
                            rng=jax.random.PRNGKey(1))
    assert out["df_embeds"].shape == (2, 4, 3, 8)
    assert out["nm_embeds"].shape == (2, 4, 3, 8)
    assert float(jnp.abs(out["df_embeds"] - 2.0).max()) == 0.0
    assert float(jnp.abs(out["nm_embeds"] - 1.0).max()) == 0.0  # bg label


def test_balanced_and_reference_loaders(tmp_path):
    # build a tiny 2-domain image folder
    from PIL import Image
    for dom, n in (("cat", 6), ("dog", 2)):
        d = tmp_path / dom
        d.mkdir(parents=True)
        for i in range(n):
            Image.new("RGB", (20, 20), (i * 20 % 255, 100, 50)).save(
                d / f"{i}.png")

    from de_i2i_gan_tpu.data.starganv2_data import (
        BalancedLoader, ImageFolderDataset, InputFetcher, ReferenceDataset,
        make_reference_loader)
    from de_i2i_gan_tpu.data.transforms import EvalTransform

    tf = EvalTransform(16)
    ds = ImageFolderDataset(tmp_path, tf)
    assert len(ds) == 8 and ds.domains == ["cat", "dog"]
    src = BalancedLoader(ds, batch_size=4, num_samples=64)
    labels = np.concatenate([b[1] for b in src])
    # balanced sampling: minority domain ~50%
    assert 0.3 < (labels == 1).mean() < 0.7

    ref = make_reference_loader(ReferenceDataset(tmp_path, tf), 4)
    (a, b), y, _ = next(iter(ref))
    assert a.shape == (4, 16, 16, 3) and b.shape == (4, 16, 16, 3)

    fetcher = InputFetcher(src, ref, latent_dim=4)
    batch = next(fetcher)
    assert batch["x_src"].shape == (4, 16, 16, 3)
    assert batch["z_ref"].shape == (4, 4)
    assert batch["y_ref"].dtype == np.int32
