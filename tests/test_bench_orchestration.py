"""bench.py suite orchestration: the round-4 failure mode was a driver
SIGKILL voiding six already-measured sections (BENCH_r04.json rc=124,
parsed:null). The suite now emits a best-so-far JSON line after EVERY
completed section and self-imposes a wall-clock budget. These tests drive
that logic with fake sections (no real workloads, no TPU)."""
import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402


def _fake_sections(results):
    return [
        ("p2p", 1, lambda: {"img_per_sec": 100.0, "tflop_per_img": 0.4,
                            "flops_per_launch": 1.0}),
        ("dg", 1, lambda: {"img_per_sec": 50.0}),
        ("inf", 1, lambda: (_ for _ in ()).throw(RuntimeError("boom"))),
        ("sgv2_adain", 1, lambda: {"img_per_sec": 25.0}),
    ]


def test_emit_after_every_section(monkeypatch):
    monkeypatch.setattr(bench, "_suite_sections",
                        lambda on_tpu, results: _fake_sections(results))
    monkeypatch.setenv("BENCH_BUDGET_S", "600")
    seen = []
    out = bench._run_suite(on_tpu=False, emit=seen.append)
    # one emit per section, each a fully-assembled best-so-far dict
    assert len(seen) == 4
    assert seen[0]["extra"]["pix2pix_256"]["img_per_sec"] == 100.0
    # not-yet-run sections are marked pending, not absent
    assert seen[0]["extra"]["defectgan_256"]["skipped"] == "pending"
    assert seen[1]["extra"]["defectgan_256"]["img_per_sec"] == 50.0
    # a raising section is recorded as an error and does NOT stop the suite
    assert "boom" in seen[2]["extra"]["generator_infer_1024"]["error"]
    assert seen[3]["extra"]["starganv2_256_adain"]["img_per_sec"] == 25.0
    # every emitted dict is JSON-serializable (the driver parses stdout)
    for o in seen + [out]:
        json.loads(json.dumps(o))
    # final return matches the last emit
    assert out["extra"] == seen[-1]["extra"]


def test_deadline_budget_skips_remaining(monkeypatch):
    import time

    def slow_sections(results):
        def slow():
            time.sleep(1.2)
            return {"img_per_sec": 10.0}
        return [("p2p", 0, slow), ("dg", 500, lambda: {"img_per_sec": 5.0}),
                ("inf", 500, lambda: {"img_per_sec": 5.0})]

    monkeypatch.setattr(bench, "_suite_sections",
                        lambda on_tpu, results: slow_sections(results))
    monkeypatch.setenv("BENCH_BUDGET_S", "1")  # exhausted after section 1
    out = bench._run_suite(on_tpu=False, emit=lambda o: None)
    assert out["extra"]["pix2pix_256"]["img_per_sec"] == 10.0
    assert out["extra"]["defectgan_256"]["skipped"] == "deadline"
    assert out["extra"]["generator_infer_1024"]["skipped"] == "deadline"


def test_assemble_annotates_sean_and_mfu():
    dev = type("D", (), {"platform": "cpu", "device_kind": "cpu"})()
    results = {"p2p": {"img_per_sec": 100.0, "tflop_per_img": 0.5},
               "sgv2_sean": {"img_per_sec": 60.0}}
    out = bench._assemble(results, dev, peak=200e12, on_tpu=True)
    # MFU computed from tflop_per_img when peak is known
    assert out["extra"]["pix2pix_256"]["mfu"] == pytest.approx(
        0.5e12 * 100.0 / 200e12, abs=1e-4)
    # the synthetic-s_ref sean number is labeled sty-inactive (the
    # reference pays a frozen-ViT embed of x_fake per step, solver.py:515)
    assert "inactive" in out["extra"]["starganv2_256_sean"]["sty_loss"]
    assert "starganv2_256_sean_frozen_vit" in out["extra"]
    assert out["vs_baseline"] == pytest.approx(100.0 / bench.REF_P2P_A100,
                                               abs=0.01)


def test_primary_metric_none_when_pending():
    dev = type("D", (), {"platform": "cpu", "device_kind": "cpu"})()
    out = bench._assemble({}, dev, peak=None, on_tpu=True)
    assert out["value"] is None
    assert out["vs_baseline"] is None
    json.loads(json.dumps(out))
