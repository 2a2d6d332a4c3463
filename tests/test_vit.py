"""ViT encoder + classifier workload tests (tiny ViT to keep compiles small)."""
import jax
import jax.numpy as jnp
import numpy as np

import de_i2i_gan_tpu.models.vit as vit_mod
from de_i2i_gan_tpu.config import TrainConfig
from de_i2i_gan_tpu.train.vit_steps import ViTSteps, dump_embeddings

# register a DISTINCT size key for these tests. Overwriting the shared
# "tiny" entry at import time poisoned every later-collected test that
# relies on the real tiny config (pytest imports all modules at collection;
# test_solver_frozen saw hidden=32 embeddings against embed_nc=16 batches).
vit_mod.SIZES["test_tiny32"] = dict(hidden=32, layers=2, heads=2, mlp=64)


def test_vit_encoder_shapes():
    net = vit_mod.ViTEncoder(model_size="test_tiny32", patch=16, image_size=32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3),
                           minval=-1, maxval=1)
    v = net.init(jax.random.PRNGKey(1), x)
    h = net.apply(v, x)
    assert h.shape == (2, 1 + 4, 32)  # cls + 2x2 patches


def test_feature_extractor_multi_reference():
    net = vit_mod.ViTEncoder(model_size="test_tiny32", patch=16, image_size=32)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    fe = vit_mod.FeatureExtractor(v, model_size="test_tiny32")
    fe.net = net  # use the tiny geometry
    fe._embed = jax.jit(lambda vv, x: net.apply(vv, x)[:, 0, :])
    x5 = jax.random.uniform(jax.random.PRNGKey(1), (2, 5, 32, 32, 3))
    emb = fe.extract(x5, num_embeds=-3)
    assert emb.shape == (2, 3, 32)
    emb1 = fe.extract(x5[:, 0], num_embeds=1)
    assert emb1.shape == (2, 1, 32)


def test_vit_classifier_learns():
    tc = TrainConfig(batch_size=8, optimizer="adamw", lr=(1e-2,),
                     scheduler="cos", clf_loss_type="cce")
    steps = ViTSteps(label_nc=2, tcfg=tc, model_size="test_tiny32",
                     iters_per_epoch=10, num_epochs=5, image_size=32)
    state = steps.init_state(jax.random.PRNGKey(0))
    # two linearly separable image classes (bright vs dark)
    k = jax.random.PRNGKey(1)
    imgs = jnp.concatenate([
        jax.random.uniform(k, (8, 32, 32, 3), minval=0.3, maxval=1.0),
        jax.random.uniform(k, (8, 32, 32, 3), minval=-1.0, maxval=-0.3)])
    labels = jax.nn.one_hot(jnp.asarray([0] * 8 + [1] * 8), 2)
    accs = []
    for i in range(15):
        state, m = steps.jit_train_step(state, imgs, labels)
        accs.append(float(m["acc"]))
    assert accs[-1] >= 0.9, accs

    ev = steps.jit_eval_step(state, imgs, labels)
    assert float(ev["acc"]) >= 0.9


def test_dump_embeddings():
    tc = TrainConfig(batch_size=4, clf_loss_type="bce")
    steps = ViTSteps(label_nc=3, tcfg=tc, model_size="test_tiny32",
                     iters_per_epoch=5, num_epochs=2, image_size=32)
    steps.init_state(jax.random.PRNGKey(0))

    def loader():
        k = jax.random.PRNGKey(2)
        imgs = np.asarray(jax.random.uniform(k, (4, 32, 32, 3)))
        labels = np.eye(3, dtype=np.float32)[[0, 1, 2, 0]]
        yield imgs, labels, ["a", "b", "c", "d"]

    bank = dump_embeddings(steps, loader(), 3)
    assert set(bank) == {(1, 0, 0), (0, 1, 0), (0, 0, 1)}
    assert len(bank[(1, 0, 0)]) == 2
    assert bank[(1, 0, 0)][0].shape == (32,)


def test_scanned_encoder_matches_unrolled():
    """ViTEncoderScanned must be numerically identical to ViTEncoder given
    stack_vit_params-converted weights (it exists to shrink the lowered HLO
    ~layers-fold, e.g. under the dev tunnel's remote-compile size cap)."""
    from de_i2i_gan_tpu.models.vit import (SIZES, ViTEncoder,
                                           ViTEncoderScanned,
                                           stack_vit_params)
    SIZES["test_scan"] = dict(hidden=16, layers=3, heads=2, mlp=32)
    try:
        enc = ViTEncoder(model_size="test_scan", image_size=32, patch=16)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3),
                               minval=-1, maxval=1)
        v = enc.init(jax.random.PRNGKey(1), x)
        ref = enc.apply(v, x)
        scanned = ViTEncoderScanned(model_size="test_scan", image_size=32,
                                    patch=16)
        vs = {"params": stack_vit_params(v["params"],
                                         model_size="test_scan")}
        got = scanned.apply(vs, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
    finally:
        SIZES.pop("test_scan", None)
