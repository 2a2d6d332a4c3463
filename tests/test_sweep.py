"""Sweep driver (cli/sweep.py — the run.bat / run2.bat ablation surface)."""
from pathlib import Path

from de_i2i_gan_tpu.cli.sweep import _filter, _known_flags, build_commands
import pytest

# long-compile module (sgv2 programs / mesh GSPMD / subprocess workers);
# deselect with -m 'not slow' (pyproject [tool.pytest.ini_options].markers)
pytestmark = pytest.mark.slow


def test_filter_drops_unknown_flags_and_values():
    known = {"--a", "--b"}
    out = _filter(["--a", "1", "--zz", "x", "y", "--b", "--c=3", "--a", "2"],
                  known)
    assert out == ["--a", "1", "--b", "--a", "2"]


def test_known_flags_contains_shared_surface():
    train = _known_flags("mae_train")
    test = _known_flags("defectgan_test")
    assert "--mask_ratio" in train
    assert "--num_epochs" in train and "--num_epochs" not in test
    assert "--metrics_out" in test


def test_build_commands_reference_recipe(tmp_path):
    cmds = build_commands("mask_ratio", [0.1, 0.75],
                          ["--dataset_name", "synthetic", "--num_epochs",
                           "1"], eval_runs=True, ckpt_dir="ck",
                          out_dir=tmp_path)
    # run.bat recipe: pretrain -> warm-started train (-> eval) per value
    assert len(cmds) == 6
    mae, dg, ev = cmds[0][0], cmds[1][0], cmds[2][0]
    assert "de_i2i_gan_tpu.cli.train_mae" in mae
    assert "--mask_ratio" in mae and "0.1" in mae
    assert "de_i2i_gan_tpu.cli.train_defectgan" in dg
    i = dg.index("--load_model_name")
    assert dg[i + 1] == "mae_mask_ratio_01"
    assert "de_i2i_gan_tpu.cli.test_defectgan" in ev
    assert "--num_epochs" not in ev  # train-only flag filtered for test
    assert cmds[2][1][0] == 0.1  # (value, metrics file) meta
    assert Path(cmds[2][1][1]).name == "metrics_mask_ratio_01.json"
