"""LPIPS perceptual distance in flax.

Mirrors the reference's two LPIPS uses:
  * defectGAN intra-condition diversity LPIPS (torchmetrics, AlexNet backbone;
    /root/reference/defectGAN/metrics/defectgan_metrics.py:20-41)
  * stargan-v2's hand-rolled LPIPS = AlexNet features + learned 1x1 weights
    (stargan-v2/metrics/lpips.py:49-98)

Structure: AlexNet conv stack, channel-unit-normalized feature differences,
learned per-layer 1x1 weights, spatial mean, sum over layers. Weights load
from a torch checkpoint (torchvision alexnet + lpips lin weights) via
``load_torch_lpips_weights``; random init otherwise (math exercised, values
not calibrated — no weights ship in this image).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# standard LPIPS input normalization on [-1, 1] inputs
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

_ALEX = [
    # (features, kernel, stride, pad, maxpool_after)
    (64, 11, 4, 2, True),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, False),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]


class AlexNetFeatures(nn.Module):
    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        taps = []
        for i, (f, k, s, p, pool) in enumerate(_ALEX):
            x = nn.Conv(f, (k, k), (s, s), padding=[(p, p), (p, p)],
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            taps.append(x)
            if pool:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                    [(0, 0), (0, 0), (0, 0), (0, 0)])
        return taps


def _unit_normalize(x, eps=1e-10):
    # exact reference form: x * rsqrt(sum(x^2) + eps) (lpips.py:16-17)
    return x * jax.lax.rsqrt(
        jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps)


class LPIPS(nn.Module):
    """d(x, y): NHWC images in [-1, 1] -> (N,) perceptual distances."""

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        xn = (x - shift) / scale
        yn = (y - shift) / scale
        net = AlexNetFeatures(name="alex")
        fx = net(xn)
        fy = net(yn)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = jnp.square(_unit_normalize(a) - _unit_normalize(b))
            w = self.param(f"lin{i}", nn.initializers.ones_init(),
                           (d.shape[-1],), jnp.float32)
            total = total + jnp.mean(d * jnp.abs(w), axis=(1, 2)).sum(axis=-1)
        return total

    @staticmethod
    def init_variables(rng: jax.Array, image_size: int = 64):
        net = LPIPS()
        x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        return net, net.init(rng, x, x)


def load_torch_lpips_weights(alexnet_path: str, lin_path: str, variables):
    """Map torchvision alexnet.features + LPIPS lin weights into the flax
    tree. lin_path may be the stargan-v2 lpips_weights.ckpt or the official
    lpips 'alex.pth'."""
    import torch
    params = jax.tree_util.tree_map(np.array, variables["params"])
    sd = torch.load(alexnet_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    conv_ids = [0, 3, 6, 8, 10]  # torchvision alexnet.features indices
    for i, cid in enumerate(conv_ids):
        w = sd[f"features.{cid}.weight"].numpy().transpose(2, 3, 1, 0)
        b = sd[f"features.{cid}.bias"].numpy()
        params["alex"][f"conv{i}"]["kernel"] = w
        params["alex"][f"conv{i}"]["bias"] = b
    lin = torch.load(lin_path, map_location="cpu")
    if hasattr(lin, "state_dict"):
        lin = lin.state_dict()
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight",
                    f"lpips_weights.{i}.main.1.weight",  # stargan-v2 ckpt
                    str(i)):
            if key in lin:
                params[f"lin{i}"] = np.asarray(
                    lin[key].numpy().reshape(-1), np.float32)
                break
    return {"params": params}


def pairwise_lpips(lpips_apply, images: jax.Array) -> jax.Array:
    """Mean LPIPS over all unordered pairs of a batch — the reference's
    intra-condition diversity metric (defectgan_metrics.py:20-41)."""
    n = images.shape[0]
    idx_a, idx_b = np.triu_indices(n, k=1)
    a = images[idx_a]
    b = images[idx_b]
    return lpips_apply(a, b).mean()
