"""CLI option-system tests: flag surface, auto-naming, opt.json round trip."""
import json
from pathlib import Path

from de_i2i_gan_tpu.config.options import (
    Options, to_defectgan_config, to_mae_config, to_train_config,
    to_wgan_config)


def test_defaults_match_reference(tmp_path):
    opt = Options("defectgan_train").parse(
        ["--ckpt_dir", str(tmp_path), "--name", "t"], save=False)
    # reference defaults (defectgan_options.py, train_options.py)
    assert opt.image_size == 128 and opt.label_nc == 6
    assert opt.ngf == 64 and opt.num_scales == 2 and opt.num_res == 6
    assert opt.style_norm_block_type == "spade" and opt.hidden_nc == 128
    assert opt.num_layers == 5 and opt.num_critics == 5
    assert opt.lr == [2e-4] and opt.loss_weight == [2, 5, 5, 5, 1]
    assert opt.embed_nc == 768 and opt.num_embeds == 5
    cfg = to_defectgan_config(opt)
    tc = to_train_config(opt)
    assert cfg.label_nc == 6 and tc.num_critics == 5


def test_mae_overrides(tmp_path):
    opt = Options("mae_train").parse(
        ["--ckpt_dir", str(tmp_path), "--name", "m"], save=False)
    # PreTrainOptions overrides (defectgan_options.py:154-189)
    assert opt.batch_size == 32 and opt.optimizer == "adamw"
    assert opt.scheduler == "cos" and opt.lr == [1.5e-4]
    assert opt.loss_weight == [10, 3, 1] and opt.num_critics == 1
    assert opt.mask_ratio == 0.75 and opt.patch_size == 8
    assert opt.mask_token_type == "position"
    m = to_mae_config(opt)
    assert m.mask_ratio == 0.75


def test_wgan_group(tmp_path):
    opt = Options("wgan_train").parse(
        ["--ckpt_dir", str(tmp_path), "--name", "w"], save=False)
    assert opt.optimizer == "rmsprop" and opt.lr == [5e-5]
    assert opt.noise_dim == 100 and opt.clipping_limit == 0.03
    cfg = to_wgan_config(opt)
    assert cfg.num_layers == 3  # 64px -> log2-3


def test_auto_name_and_opt_roundtrip(tmp_path):
    # auto-incrementing name (base_options.py:71-79)
    (tmp_path / "exp0").mkdir(parents=True)
    opt = Options("defectgan_train").parse(["--ckpt_dir", str(tmp_path)])
    assert opt.name == "exp1"
    assert (tmp_path / "exp1" / "opt.json").exists()
    assert (tmp_path / "exp1" / "opt.txt").exists()

    # --continue_training reloads saved options as defaults
    opt1 = Options("defectgan_train").parse(
        ["--ckpt_dir", str(tmp_path), "--name", "cont", "--ngf", "32"])
    opt2 = Options("defectgan_train").parse(
        ["--ckpt_dir", str(tmp_path), "--name", "cont",
         "--continue_training"], save=False)
    assert opt2.ngf == 32
    assert opt2.load_model_name == "cont"


def test_test_phase_defaults(tmp_path):
    opt = Options("defectgan_test").parse(
        ["--ckpt_dir", str(tmp_path), "--name", "t2"], save=False)
    assert opt.phase == "test"
    assert opt.load_model_name == "t2"  # defaults to name in test mode
