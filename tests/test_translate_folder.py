"""Smoke the folder-inference CLI (BASELINE.json config #5 surface) end to
end on CPU: checkpoint on disk -> cli.translate_folder -> translated PNGs,
both single-device and with the height spatially sharded over the virtual
mesh (parallel.mesh.spatial_sharded_inference)."""
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

# long-compile module (sgv2 programs / mesh GSPMD / subprocess workers);
# deselect with -m 'not slow' (pyproject [tool.pytest.ini_options].markers)
pytestmark = pytest.mark.slow

TINY = ["--ngf", "8", "--ndf", "8", "--num_scales", "2", "--num_res", "2",
        "--hidden_nc", "16", "--num_layers", "2", "--label_nc", "4"]


def _make_ckpt_and_inputs(tmp_path: Path, size: int):
    import jax

    from de_i2i_gan_tpu.config import DefectGanConfig, TrainConfig
    from de_i2i_gan_tpu.train.checkpoint import save_checkpoint
    from de_i2i_gan_tpu.train.steps import DefectGanSteps

    cfg = DefectGanConfig(image_size=size, label_nc=4, ngf=8, ndf=8,
                          num_scales=2, num_res=2, hidden_nc=16,
                          num_layers=2)
    steps = DefectGanSteps(cfg, TrainConfig())
    state = steps.init_state(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path / "ckpt", "exp", "latest", state, epoch=1,
                    iters=1)
    ind = tmp_path / "in"
    ind.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                     dtype=np.uint8).astype(np.uint8)
                        ).save(ind / f"{i}.png")
    return ind


@pytest.mark.parametrize("spatial", [1, 2])
def test_translate_folder_cli(tmp_path, spatial):
    from de_i2i_gan_tpu.cli.translate_folder import main

    size = 32
    ind = _make_ckpt_and_inputs(tmp_path, size)
    out = tmp_path / f"out{spatial}"
    main(["--input_dir", str(ind), "--output_dir", str(out),
          "--target_label", "1", "--spatial", str(spatial),
          "--name", "exp", "--ckpt_dir", str(tmp_path / "ckpt"),
          "--image_size", str(size), "--batch_size", "2"] + TINY)
    got = sorted(p.name for p in out.iterdir())
    assert got == ["0.png", "1.png", "2.png"]
    arr = np.asarray(Image.open(out / "0.png"))
    assert arr.shape == (size, size, 3)
    assert arr.std() > 0  # not a constant image


def test_translate_folder_spatial_matches_single(tmp_path):
    """Halo-exchange spatial sharding must be numerically equivalent to the
    unsharded forward (same checkpoint, same inputs)."""
    from de_i2i_gan_tpu.cli.translate_folder import main

    size = 32
    ind = _make_ckpt_and_inputs(tmp_path, size)
    outs = {}
    for spatial in (1, 2):
        out = tmp_path / f"eq{spatial}"
        main(["--input_dir", str(ind), "--output_dir", str(out),
              "--target_label", "1", "--spatial", str(spatial),
              "--name", "exp", "--ckpt_dir", str(tmp_path / "ckpt"),
              "--image_size", str(size), "--batch_size", "2"] + TINY)
        outs[spatial] = np.stack(
            [np.asarray(Image.open(out / f"{i}.png")).astype(np.int32)
             for i in range(3)])
    # u8 round-trip: allow 1-count quantization wiggle
    assert np.abs(outs[1] - outs[2]).max() <= 1
