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


def test_train_mtvec_cli_on_disk_layout(tmp_path):
    """train_mtvec re-wires the DefectGAN trainer onto the MVTec on-disk
    layout (data/mtvec/<category>/<phase>/{normal,<defect>}/*.png) — also
    the only end-to-end exercise of MTVecDataset file loading."""
    import pytest
    pytest.importorskip("PIL")
    from PIL import Image

    from de_i2i_gan_tpu.cli.train_mtvec import main

    rng = np.random.default_rng(5)
    for lbl in ("normal", "scratch"):
        d = tmp_path / "data" / "mtvec" / "pill" / "train" / lbl
        d.mkdir(parents=True)
        for i in range(6):
            Image.fromarray(rng.integers(0, 255, (48, 48, 3),
                                         dtype=np.uint8).astype(np.uint8)
                            ).save(d / f"{i}.png")
    main(["--name", "mt", "--ckpt_dir", str(tmp_path / "ckpt"),
          "--data_dir", str(tmp_path / "data"),
          "--dataset_data_type", "pill", "--label_nc", "2",
          "--image_size", "32", "--batch_size", "2", "--num_epochs", "1",
          "--num_critics", "2", "--ngf", "8", "--ndf", "8",
          "--num_scales", "2", "--num_res", "2", "--hidden_nc", "16",
          "--num_layers", "2", "--save_img_freq", "1000"])
    assert (tmp_path / "ckpt" / "mt" / "latest_state.msgpack").exists()


def test_train_mae_then_test_mae_cli(tmp_path):
    """MAE pretrain -> test_mae eval from the saved checkpoint (reference
    test_mae.py: val losses + repair grids)."""
    from de_i2i_gan_tpu.cli.test_mae import main as test_main
    from de_i2i_gan_tpu.cli.train_mae import main as train_main

    tiny = ["--ckpt_dir", str(tmp_path), "--dataset_name", "synthetic",
            "--image_size", "32", "--batch_size", "8",
            "--ngf", "8", "--ndf", "8", "--num_scales", "2",
            "--num_res", "2", "--hidden_nc", "16", "--num_layers", "2"]
    train_main(["--name", "mae", "--num_epochs", "1",
                "--save_img_freq", "1000"] + tiny)
    assert (tmp_path / "mae" / "latest_state.msgpack").exists()
    test_main(["--name", "mae", "--results_dir", str(tmp_path / "res")]
              + tiny)


def test_fid_cli_two_folders(tmp_path):
    """Folder-vs-folder FID (cli/fid.py, the pytorch-fid surface): random
    Inception weights make the value meaningless but it must be finite,
    and identical folders must give ~0."""
    import pytest
    pytest.importorskip("PIL")
    from PIL import Image

    from de_i2i_gan_tpu.cli.fid import main

    rng = np.random.default_rng(9)
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    for i in range(8):
        arr = rng.integers(0, 255, (32, 32, 3), np.uint8).astype(np.uint8)
        Image.fromarray(arr).save(a / f"{i}.png")
        Image.fromarray(arr).save(b / f"{i}.png")
    main([str(a), str(b), "--dims", "64", "--image_size", "75",
          "--batch_size", "4"])


def test_train_then_test_pix2pix_cli(tmp_path):
    """Flagship paired-i2i loop through its CLIs: short synthetic training,
    then test_pix2pix from the saved checkpoint (EMA translate + L1 +
    in-memory FID and panel PNGs)."""
    from de_i2i_gan_tpu.cli.test_pix2pix import main as test_main
    from de_i2i_gan_tpu.cli.train_pix2pix import main as train_main

    tiny = ["--ckpt_dir", str(tmp_path), "--dataroot", "synthetic",
            "--crop_size", "32", "--load_size", "36", "--batch_size", "2",
            "--max_dataset_size", "16", "--dims", "64",
            "--ngf", "8", "--ndf", "8", "--num_res", "2", "--hidden_nc",
            "16"]
    train_main(["--name", "p2p", "--num_epochs", "1",
                "--save_img_freq", "1000"] + tiny)
    assert (tmp_path / "p2p" / "latest_state.msgpack").exists()

    res = tmp_path / "res"
    test_main(["--name", "p2p", "--results_dir", str(res),
               "--metrics", "fid", "--save_img"] + tiny)
    assert list(res.rglob("*.png")), "no panels written"
    vals = __import__("json").loads(
        (res / "p2p" / "results.json").read_text())
    assert vals["num_images"] == 16
    assert np.isfinite(vals["l1"]) and np.isfinite(vals["fid"])


def test_defectgan_test_cli_modes(tmp_path):
    """cli/test_defectgan beyond the sweep's --metrics fid path: image
    grids, per-class diverse samples, classifier accuracy, and the
    style-embedding scatter (reference test_defectgan.py surface)."""
    import pytest
    pytest.importorskip("PIL")

    from de_i2i_gan_tpu.cli.test_defectgan import main as test_main
    from de_i2i_gan_tpu.cli.train_defectgan import main as train_main

    tiny = ["--ckpt_dir", str(tmp_path), "--dataset_name", "synthetic",
            "--image_size", "32", "--label_nc", "4", "--batch_size", "2",
            "--ngf", "8", "--ndf", "8", "--num_scales", "2", "--num_res",
            "2", "--hidden_nc", "16", "--num_layers", "2"]
    train_main(["--name", "dg", "--num_epochs", "1", "--num_critics", "2",
                "--save_img_freq", "1000"] + tiny)

    res = tmp_path / "res"
    test_main(["--name", "dg", "--results_dir", str(res),
               "--save_img_grid", "--save_diverse_images", "--cal_clf",
               "--num_display_images", "2"] + tiny)
    assert list(res.rglob("*.png")), "no grids written"

    test_main(["--name", "dg", "--results_dir", str(res),
               "--vis_style_embeds", "hidden",
               "--num_display_images", "2"] + tiny)
    outs = [p.name for p in res.rglob("*")]
    assert any("embed" in n or "style" in n or n.endswith(".png")
               for n in outs), outs


def test_defectgan_save_stats_then_cal_mfid(tmp_path):
    """--save_stats dumps per-class Inception activations; --cal_mfid
    consumes the dump directory and reports per-class FID + mFID
    (reference defectgan_metrics.py:104-123 chain)."""
    import json

    import pytest
    pytest.importorskip("PIL")

    from de_i2i_gan_tpu.cli.test_defectgan import main as test_main
    from de_i2i_gan_tpu.cli.train_defectgan import main as train_main

    tiny = ["--ckpt_dir", str(tmp_path), "--dataset_name", "synthetic",
            "--image_size", "32", "--label_nc", "4", "--batch_size", "2",
            "--ngf", "8", "--ndf", "8", "--num_scales", "2", "--num_res",
            "2", "--hidden_nc", "16", "--num_layers", "2", "--dims", "64"]
    train_main(["--name", "dgm", "--num_epochs", "1", "--num_critics", "2",
                "--save_img_freq", "1000"] + tiny)

    res = tmp_path / "res"
    test_main(["--name", "dgm", "--results_dir", str(res), "--save_stats"]
              + tiny)
    stats = list((res / "dgm").glob("stats_*.npy"))
    assert stats, "no per-class stats written"

    mout = tmp_path / "mfid.json"
    test_main(["--name", "dgm", "--results_dir", str(res), "--cal_mfid",
               "--npy_path", str(res / "dgm"), "--num_imgs", "4",
               "--metrics_out", str(mout)] + tiny)
    vals = json.loads(mout.read_text())
    assert "mfid" in vals


def test_train_pix2pix_cli_native_loader(tmp_path):
    """--native_loader on the flagship CLI: 6-channel paired C++ cache,
    in-place u8 pair buffers, split on device inside the jitted step."""
    import pytest

    from de_i2i_gan_tpu.runtime.native_loader import native_available
    if not native_available():
        pytest.skip("no C++ toolchain")
    from de_i2i_gan_tpu.cli.train_pix2pix import main

    main(["--name", "p2pn", "--ckpt_dir", str(tmp_path),
          "--dataroot", "synthetic", "--crop_size", "32", "--load_size",
          "36", "--batch_size", "2", "--max_dataset_size", "16",
          "--ngf", "8", "--ndf", "8", "--num_res", "2", "--hidden_nc",
          "16", "--num_epochs", "1", "--native_loader",
          "--save_img_freq", "1000"])
    assert (tmp_path / "p2pn" / "latest_state.msgpack").exists()
