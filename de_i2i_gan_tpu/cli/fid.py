"""Standalone FID / statistics CLI.

Mirrors the reference's pytorch-fid style entry point
(/root/reference/defectGAN/metrics/fid_score.py:318-354): compute FID between
two image folders (or a folder and a precomputed .npz), dump .npz statistics
for later comparisons, and the per-class mFID mode over stats_*.npy files.

    python -m de_i2i_gan_tpu.cli.fid path/to/real path/to/fake --dims 2048
    python -m de_i2i_gan_tpu.cli.fid path/to/real --save_stats real_stats.npz
    python -m de_i2i_gan_tpu.cli.fid --mfid real_stats_dir fake_stats_dir
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _folder_loader(path: Path, image_size: int, batch_size: int):
    from de_i2i_gan_tpu.data.transforms import EvalTransform
    from de_i2i_gan_tpu.data.pipeline import DataLoader

    class _Folder:
        def __init__(self):
            self.files = sorted(
                f for f in Path(path).rglob("*")
                if f.suffix.lower() in (".png", ".jpg", ".jpeg"))
            self.tf = EvalTransform(image_size)
            self._rng = np.random.default_rng(0)

        def __len__(self):
            return len(self.files)

        def __getitem__(self, i):
            from PIL import Image
            img = Image.open(self.files[i])
            return self.tf(img, self._rng), np.zeros(1, np.float32), \
                str(self.files[i])

    return DataLoader(_Folder(), batch_size, shuffle=False, drop_last=False)


def main(argv=None):
    from de_i2i_gan_tpu import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("paths", nargs="*", type=Path)
    p.add_argument("--dims", type=int, default=2048)
    p.add_argument("--image_size", type=int, default=299)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_imgs", type=int, default=50000)
    p.add_argument("--save_stats", type=Path, default=None)
    p.add_argument("--inception_weights", type=Path, default=None,
                   help="pytorch-fid InceptionV3 .pth to convert")
    p.add_argument("--mfid", action="store_true")
    args = p.parse_args(argv)

    from de_i2i_gan_tpu.metrics.evaluator import Evaluator
    from de_i2i_gan_tpu.metrics.fid import (
        frechet_distance, load_stats_npz, mfid_from_class_stats,
        save_stats_npz, ActivationStats)

    if args.mfid:
        real_dir, fake_dir = args.paths
        real_stats = {}
        for f in sorted(Path(real_dir).glob("stats_*.npy")):
            acts = np.load(f)
            st = ActivationStats(acts.shape[1])
            st.update(acts)
            real_stats[f.stem[6:]] = st.finalize()
        fake_acts = {f.stem[6:]: np.load(f)
                     for f in sorted(Path(fake_dir).glob("stats_*.npy"))}
        out = mfid_from_class_stats(real_stats, fake_acts)
        print({k: round(v, 3) for k, v in out.items()})
        return

    inc_vars = None
    if args.inception_weights:
        import jax
        from de_i2i_gan_tpu.metrics.inception import (
            InceptionV3, load_torch_inception_weights)
        _, v = InceptionV3.init_variables(jax.random.PRNGKey(0))
        inc_vars = load_torch_inception_weights(str(args.inception_weights), v)
    ev = Evaluator(dims=args.dims, inception_variables=inc_vars)

    def stats_of(path: Path):
        if str(path).endswith(".npz"):
            return load_stats_npz(path)
        st = ev.dataset_statistics(
            _folder_loader(path, args.image_size, args.batch_size),
            num_imgs=args.num_imgs)
        return st.finalize()

    if args.save_stats and len(args.paths) == 1:
        mu, sigma = stats_of(args.paths[0])
        save_stats_npz(args.save_stats, mu, sigma)
        print(f"wrote statistics to {args.save_stats}")
        return

    assert len(args.paths) == 2, "need two paths (folders or .npz)"
    mu1, s1 = stats_of(args.paths[0])
    mu2, s2 = stats_of(args.paths[1])
    print(f"FID: {frechet_distance(mu1, s1, mu2, s2):.4f}")


if __name__ == "__main__":
    main(sys.argv[1:])
