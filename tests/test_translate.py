"""Translation/visualization grid tests (stargan-v2 utils parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from de_i2i_gan_tpu.train.solver import StarGANv2Config, StarGANv2Solver
from de_i2i_gan_tpu.utils.translate import (
    translate_and_reconstruct, translate_using_latent,
    translate_using_reference)
from de_i2i_gan_tpu.utils.visualize import make_grid

CFG = StarGANv2Config(img_size=64, num_domains=2, style_dim=8, latent_dim=4,
                      hidden_nc=16, embed_nc=12, w_hpf=0.0, max_conv_dim=32,
                      batch_size=2, ds_iter=10, total_iters=10)


def _setup():
    solver = StarGANv2Solver(CFG)
    state = solver.init_state(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    x_src = jax.random.uniform(k, (2, 64, 64, 3), minval=-1, maxval=1)
    x_ref = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    y_src = jnp.asarray([0, 1], jnp.int32)
    y_ref = jnp.asarray([1, 0], jnp.int32)
    return solver, state, x_src, y_src, x_ref, y_ref


def test_make_grid():
    imgs = np.zeros((6, 8, 8, 3), np.float32)
    g = make_grid(imgs, nrow=3)
    assert g.shape[0] > 16 and g.shape[2] == 3
    assert g.min() >= 0 and g.max() <= 1


def test_translate_and_reconstruct_grid():
    solver, state, x_src, y_src, x_ref, y_ref = _setup()
    grid = translate_and_reconstruct(solver, state, x_src, y_src, x_ref,
                                     y_ref)
    # 4 panel rows x 2 columns
    assert grid.ndim == 3 and grid.shape[2] == 3
    assert np.isfinite(grid).all()


def test_translate_rows():
    solver, state, x_src, y_src, x_ref, y_ref = _setup()
    z_list = [jax.random.normal(jax.random.PRNGKey(i), (4,))
              for i in range(2)]
    g1 = translate_using_latent(solver, state, x_src, [0, 1], z_list)
    assert np.isfinite(g1).all()
    g2 = translate_using_reference(solver, state, x_src, x_ref, y_ref)
    assert np.isfinite(g2).all()


def test_video_ref_frames(tmp_path):
    """video_ref port (core/utils.py:394-419): same-domain consecutive refs
    produce eased interpolation frames; without ffmpeg it returns the frame
    dir (the gated fallback)."""
    from de_i2i_gan_tpu.utils import translate as tr

    solver, state, x_src, y_src, _, _ = _setup()
    # two same-domain refs so one transition exists
    x_ref = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3),
                               minval=-1, maxval=1)
    y_ref = np.asarray([1, 1], np.int64)
    out = tr.video_ref(solver, state, x_src[:1], x_ref, y_ref,
                       tmp_path / "video_ref.mp4")
    assert out is not None
    if out.suffix == ".mp4":
        assert out.stat().st_size > 0
    else:  # ffmpeg absent: frame-dir fallback
        frames = sorted(out.glob("*.png"))
        # len(get_alphas()) per transition + 10 hold frames
        assert len(frames) == len(tr._get_alphas()) + 10
        from PIL import Image
        arr = np.asarray(Image.open(frames[0]))
        # [sliding ref panel | src over fake]: 2H tall, W+margin+n*W wide
        assert arr.shape[0] == 128 and arr.shape[1] == 64 + 32 + 64


def test_video_ref_skips_cross_domain(tmp_path):
    solver, state, x_src, _, x_ref, _ = _setup()
    y_ref = np.asarray([0, 1], np.int64)  # no same-domain pair
    out = __import__("de_i2i_gan_tpu.utils.translate",
                     fromlist=["video_ref"]).video_ref(
        solver, state, x_src[:1], x_ref, y_ref, tmp_path / "v.mp4")
    assert out is None
