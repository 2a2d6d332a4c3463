"""A/B: DefectGAN-256 train throughput with the 2B-batched double-cycle
generator forward (``fused_g_forward``) ON vs OFF, on one real TPU chip.

Round-3 verdict item: `roofline_defectgan_256.json` diagnosed the 153.7 ms
g_step as VPU/latency-bound on SPADE mask convs + f32 instance-norm
reductions (4 sequential G forwards per step, defectgan_model.py:185-190 in
the reference). ``fused_g_forward`` halves the launch count by batching the
two directions of each cycle hop into one 2B call (train/steps.py:275-291);
it was measured a win for pix2pix (+9%, `fusedprop_ab.json`) but never for
this workload. This script measures it, writes
``benchmarks/defectgan_gstep_ab.json`` with a keep/revert verdict, and the
bench default follows the winner.

Usage:  python benchmarks/defectgan_gstep_ab.py  (needs the TPU tunnel up)
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: cache + probe + workloads)


def main():
    probed = bench._probe_with_retries()
    if probed is None or probed[0] != "tpu":
        print("[ab] TPU unreachable; refusing to write a CPU number into a "
              "TPU artifact", file=sys.stderr)
        return 1
    platform, device_kind = probed
    print(f"[ab] device: {platform}:{device_kind}")

    results = {}
    for name, fused in (("fused", True), ("alt", False)):
        # the tunnel's remote-compile can drop mid-compile ("response body
        # closed", observed round 4); the local persistent cache keeps the
        # finished programs, so a retry resumes where it died. An abandoned
        # server-side compile can block the TPU server ~5 min (CLAUDE.md),
        # so back off 60 -> 300 s rather than landing the first retry on a
        # still-blocked server.
        last = None
        for attempt, wait in enumerate((60, 300, 300)):
            try:
                r = bench.bench_defectgan(256, 8, on_tpu=True, n_iters=8,
                                          phases=True,
                                          fused_g_forward=fused)
                break
            except Exception as e:
                last = e
                print(f"[ab] {name} attempt {attempt + 1} failed: "
                      f"{type(e).__name__}: {str(e)[:120]}; retrying in "
                      f"{wait}s", file=sys.stderr)
                import time
                time.sleep(wait)
        else:
            raise last
        results[name] = r
        print(f"[ab] {name}: {r['img_per_sec']} img/s "
              f"(d {r['d_step_ms']} ms, g {r['g_step_ms']} ms)")

    speedup = results["fused"]["img_per_sec"] / results["alt"]["img_per_sec"]
    verdict = (
        "KEEP fused_g_forward for DefectGAN (bench default stays True)"
        if speedup >= 1.01 else
        "REVERT: fused_g_forward does not pay on the DefectGAN double "
        "cycle; bench default must go back to False")
    out = {
        "device": f"tpu:{device_kind}",
        "note": ("DefectGAN 256^2 batch 8 bf16 super-step (5 scanned "
                 "d_steps + 1 g_step) img/s, and standalone per-phase "
                 "step times, with the 2B-batched cycle forward "
                 "(fused_g_forward) on vs off. Targets the round-3 "
                 "roofline diagnosis: g_step 153.7 ms, hbm_frac 0.46, "
                 "VPU/latency-bound on 4 sequential G forwards."),
        "alt": results["alt"],
        "fused": results["fused"],
        "speedup": round(float(speedup), 4),
        "g_step_ms_alt": results["alt"]["g_step_ms"],
        "g_step_ms_fused": results["fused"]["g_step_ms"],
        "verdict": verdict,
    }
    # phase timing is best-effort on the tunnel (bench._try_phase_ms); if a
    # phase time was dropped, the artifact must say so itself rather than
    # silently carrying nulls (round-4 advisor finding)
    if out["g_step_ms_alt"] is None or out["g_step_ms_fused"] is None:
        out["phase_timing_skipped"] = (
            "standalone d/g step timing failed transiently on the tunnel; "
            "img/s results above are unaffected")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "defectgan_gstep_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"[ab] wrote {path}")
    print(json.dumps({k: out[k] for k in ("speedup", "verdict")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
