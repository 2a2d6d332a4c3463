"""In-training periodic sampling + metric eval, for both train loops.

Reference behaviors being mirrored:
  * DefectGAN: Inception+LPIPS built when phase=='val' and a val epoch with
    FID/IS/LPIPS every save_ckpt_freq
    (/root/reference/defectGAN/trainers/defectgan_trainer.py:32-43,124-136)
  * StarGAN v2: debug_image every sample_every and calculate_metrics every
    eval_every inside train()
    (/root/reference/stargan-v2/core/solver.py:315-349)
"""
import json
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

# long-compile module (Inception/LPIPS graphs inside training smokes);
# deselect with -m 'not slow'
pytestmark = pytest.mark.slow


def _image_tree(root: Path, n_per_domain: int = 4, size: int = 40):
    rng = np.random.default_rng(3)
    for dom in ("cat", "dog"):
        d = root / dom
        d.mkdir(parents=True)
        for i in range(n_per_domain):
            Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                         dtype=np.uint8).astype(np.uint8)
                            ).save(d / f"{i}.png")
    return root


def test_defectgan_val_metrics_mid_training(tmp_path):
    """--val_metrics: metric JSONs + TB scalars appear every save_ckpt_freq
    epoch during training (not only in the test CLI)."""
    from de_i2i_gan_tpu.cli.train_defectgan import main

    main(["--name", "valmet", "--dataset_name", "synthetic",
          "--image_size", "32", "--label_nc", "4", "--batch_size", "2",
          "--num_epochs", "1", "--num_critics", "2",
          "--ngf", "8", "--ndf", "8", "--num_res", "2", "--hidden_nc", "16",
          "--num_layers", "2", "--save_ckpt_freq", "1",
          "--ckpt_dir", str(tmp_path / "ckpt"),
          "--log_dir", str(tmp_path / "logs"),
          "--val_metrics", "fid", "is",
          "--num_imgs", "8", "--data_parallel", "off"])
    out = list((tmp_path / "ckpt" / "valmet").glob("val_metrics_*.json"))
    assert out, "no in-training val metric json written"
    res = json.loads(out[0].read_text())
    assert "fid" in res and np.isfinite(res["fid"])
    assert "is" in res and np.isfinite(res["is"])


def test_sgv2_sample_and_eval_mid_training(tmp_path):
    """--sample_every grids and --eval_every step-tagged metric JSONs appear
    inside the train loop."""
    from de_i2i_gan_tpu.cli.starganv2_main import main

    train_dir = _image_tree(tmp_path / "train")
    val_dir = _image_tree(tmp_path / "val")
    tiny = ["--img_size", "32", "--num_domains", "2", "--latent_dim", "4",
            "--hidden_dim", "32", "--hidden_nc", "16", "--style_dim", "8",
            "--embed_nc", "12", "--max_conv_dim", "32", "--w_hpf", "0",
            "--batch_size", "2", "--val_batch_size", "2",
            "--num_embeds", "2"]
    main(["--mode", "train", "--train_img_dir", str(train_dir),
          "--val_img_dir", str(val_dir),
          "--checkpoint_dir", str(tmp_path / "ckpt"),
          "--sample_dir", str(tmp_path / "samples"),
          "--eval_dir", str(tmp_path / "eval"),
          "--total_iters", "2", "--print_every", "1",
          "--sample_every", "1", "--save_every", "2",
          "--eval_every", "2", "--num_outs_per_domain", "2"] + tiny)
    grids = list((tmp_path / "samples").glob("*.png"))
    assert grids, "no in-training sample grid written"
    results = list((tmp_path / "eval").glob("results_000002_*.json"))
    assert results, "no step-tagged in-training eval json written"
    res = json.loads(results[0].read_text())
    vals = [v for v in res.values() if isinstance(v, (int, float))]
    assert vals and all(np.isfinite(v) for v in vals)
