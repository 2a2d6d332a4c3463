"""End-to-end smokes for the remaining train CLIs on the synthetic dataset
(reference scripts: defectGAN/train_wgan.py, train_vit.py, train_mtvec.py,
pretrain_mtvec.py). Tiny widths keep each under a minute warm."""
import numpy as np


def test_train_wgan_cli(tmp_path):
    from de_i2i_gan_tpu.cli.train_wgan import main

    main(["--name", "wg", "--ckpt_dir", str(tmp_path),
          "--dataset_name", "synthetic", "--image_size", "32",
          "--batch_size", "64", "--num_epochs", "1",
          "--ngf", "8", "--ndf", "8",
          "--save_latest_freq", "8", "--save_img_freq", "1000"])
    d = tmp_path / "wg"
    assert (d / "latest_state.msgpack").exists()


def test_train_vit_cli_and_embedding_dump(tmp_path):
    from de_i2i_gan_tpu.cli.train_vit import main

    base = ["--ckpt_dir", str(tmp_path), "--dataset_name", "synthetic",
            "--image_size", "32", "--batch_size", "8", "--num_epochs", "1",
            "--model_size", "tiny"]
    main(["--name", "vit"] + base)
    assert (tmp_path / "vit" / "latest_state.msgpack").exists()

    # --dump_embeddings is the offline SEAN bank path; it returns pre-train
    out = tmp_path / "embeds.npz"
    main(["--name", "vit_dump"] + base + ["--dump_embeddings", str(out)])
    assert out.exists()
    data = np.load(out, allow_pickle=True)
    assert len(data.files) > 0


def test_mtvec_alias_clis_forward(tmp_path):
    """train_mtvec / pretrain_mtvec are 1:1 aliases of the defectgan / mae
    entry points with mtvec defaults (reference train_mtvec.py:1-9)."""
    from de_i2i_gan_tpu.cli import pretrain_mtvec, train_mtvec

    # alias modules delegate to the real mains; just check the wiring
    assert callable(train_mtvec.main)
    assert callable(pretrain_mtvec.main)
