"""Result visualization.

Mirrors /root/reference/defectGAN/utils/visualize.py (ablation FID figures;
the hardcoded values there are the repo's published numbers, reproduced in
BASELINE.md) and utils/util.py:122-156 (embedding PCA/t-SNE scatter).
matplotlib/sklearn are optional — functions no-op with a message if absent.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Sequence

import numpy as np

# The reference's published MAE ablation results
# (visualize.py:13,59-60,110-111,158-159)
MASK_TOKEN_TYPE_FID = {"zero": 68.99, "mean": 75.24, "scalar": 74.87,
                       "vector": 74.67, "position": 65.83, "full": 67.03}
MASK_SIZE_FID = {1: 77.73, 2: 75.24, 4: 72.52, 8: 66.20, 16: 65.83,
                 32: 68.80, 64: 68.80}
MASK_SIZE_FID_NO_SHIFT = {16: 71.25}
MASK_RATIO_FID = {0.10: 73.36, 0.25: 72.69, 0.40: 64.98, 0.50: 66.83,
                  0.60: 67.33, 0.75: 65.83, 0.90: 80.54}


def _plt():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except Exception:
        print("[visualize] matplotlib unavailable; skipping plot")
        return None


def draw_ablation(results: Dict, title: str, xlabel: str, out_path: Path,
                  log_x: bool = False) -> None:
    """Bar/line figure of an ablation sweep (visualize.py draw_mask_*)."""
    plt = _plt()
    if plt is None:
        return
    keys = list(results.keys())
    vals = [results[k] for k in keys]
    fig, ax = plt.subplots(figsize=(6, 4))
    xs = range(len(keys))
    ax.plot(xs, vals, marker="o")
    best = int(np.argmin(vals))
    ax.scatter([best], [vals[best]], color="red", zorder=3)
    ax.set_xticks(list(xs))
    ax.set_xticklabels([str(k) for k in keys])
    ax.set_xlabel(xlabel)
    ax.set_ylabel("FID")
    ax.set_title(title)
    fig.tight_layout()
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)


def draw_reference_ablations(out_dir: Path) -> None:
    draw_ablation(MASK_TOKEN_TYPE_FID, "MAE mask token type", "token type",
                  Path(out_dir) / "mask_token_type.png")
    draw_ablation(MASK_SIZE_FID, "MAE mask size", "patch size",
                  Path(out_dir) / "mask_size.png")
    draw_ablation(MASK_RATIO_FID, "MAE mask ratio", "ratio",
                  Path(out_dir) / "mask_ratio.png")


def visualize_embeddings(embeddings: Dict, out_path: Path,
                         reduction: str = "pca") -> None:
    """Per-label embedding scatter after PCA/t-SNE (util.py:122-156).
    embeddings: {label_tuple: [vectors]}"""
    plt = _plt()
    if plt is None:
        return
    all_vecs = np.concatenate(
        [np.stack(v) for v in embeddings.values()], axis=0)
    labels = [k for k, v in embeddings.items() for _ in v]
    if reduction == "pca":
        try:
            from sklearn.decomposition import PCA
            red = PCA(n_components=2, random_state=0).fit_transform(all_vecs)
        except Exception:
            # PCA via SVD (no sklearn needed)
            c = all_vecs - all_vecs.mean(0)
            _, _, vt = np.linalg.svd(c, full_matrices=False)
            red = c @ vt[:2].T
    else:
        from sklearn.manifold import TSNE
        red = TSNE(n_components=2, random_state=0).fit_transform(all_vecs)
    uniq = sorted(set(labels))
    fig, ax = plt.subplots(figsize=(8, 8))
    for i, u in enumerate(uniq):
        mask = np.asarray([l == u for l in labels])
        name = "-".join(str(j) for j, b in enumerate(u) if b == 1) \
            if isinstance(u, tuple) else str(u)
        ax.scatter(red[mask, 0], red[mask, 1], s=6, label=name)
    ax.legend(fontsize=6)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)


def make_grid(images: np.ndarray, nrow: int, pad: int = 2) -> np.ndarray:
    """(N, H, W, C) in [-1,1] -> single (H', W', C) grid image in [0,1]
    (torchvision make_grid equivalent)."""
    n, h, w, c = images.shape
    ncol = nrow
    nrow_ = (n + ncol - 1) // ncol
    grid = np.ones((nrow_ * (h + pad) + pad, ncol * (w + pad) + pad, c),
                   np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0:y0 + h, x0:x0 + w] = (images[i] + 1.0) / 2.0
    return np.clip(grid, 0, 1)
