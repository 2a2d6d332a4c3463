"""InceptionV3 feature extractor for FID/IS, in flax (NHWC, jittable).

Functional re-implementation of the pytorch-fid Inception network the
reference vendors (/root/reference/defectGAN/metrics/inception.py): the
torchvision InceptionV3 topology with the FID-specific tweaks —
average-pool branches exclude padding (count_include_pad=False) and the last
InceptionE block (Mixed_7c) uses a max-pool branch.

Feature taps match BLOCK_INDEX_BY_DIM (inception.py:24-29):
  64 -> after maxpool1, 192 -> after maxpool2, 768 -> after Mixed_6e,
  2048 -> global average pool of Mixed_7c.

Weights: ``load_torch_inception_weights(path)`` converts a pytorch-fid /
torchvision state-dict (.pth, loaded with torch on CPU) into the flax param
tree. Without a weights file the net runs with random init — shapes/math are
exercised but FID numbers are not comparable (no weights ship in this image;
zero egress).

Inputs: NHWC float in [-1, 1] (the reference normalizes with mean/std 0.5),
resized to 299x299 bilinear inside __call__ when resize_input=True.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BLOCK_INDEX_BY_DIM = {64: 0, 192: 1, 768: 2, 2048: 3}


def _avg_pool_nopad(x, window=3):
    """3x3 stride-1 average pool with zero padding but count_include_pad=False
    (the pytorch-fid tweak): divide by the number of in-bounds taps."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    sum_ = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                 (1, window, window, 1), (1, 1, 1, 1),
                                 [(0, 0), (1, 1), (1, 1), (0, 0)])
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add,
                                (1, window, window, 1), (1, 1, 1, 1),
                                [(0, 0), (1, 1), (1, 1), (0, 0)])
    return sum_ / cnt


def _max_pool(x, window=3, stride=2, pad=0):
    padc = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, window, window, 1),
                                 (1, stride, stride, 1), padc)


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=1e-3, frozen at inference) + relu."""

    features: int
    kernel: Tuple[int, int] = (1, 1)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, self.stride,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _pad(k):  # symmetric padding tuple for kernel k
    return ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, name="branch1x1")(x)
        b5 = BasicConv2d(48, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad((5, 5)), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad((3, 3)), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad((3, 3)), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, name="branch_pool")(
            _avg_pool_nopad(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), (2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad((3, 3)), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, name="branch1x1")(x)
        b7 = BasicConv2d(c7, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_pad((1, 7)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((7, 1)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((7, 1)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_pad((1, 7)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((7, 1)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_pad((1, 7)), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, name="branch_pool")(_avg_pool_nopad(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), (2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_pad((1, 7)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((7, 1)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_type: str = "avg"  # Mixed_7b: avg (no-pad); Mixed_7c: max (FID tweak)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, name="branch1x1")(x)
        b3 = BasicConv2d(384, name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=_pad((1, 3)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=_pad((3, 1)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad((3, 3)), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=_pad((1, 3)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=_pad((3, 1)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_type == "avg":
            pooled = _avg_pool_nopad(x)
        else:
            pooled = _max_pool(x, 3, 1, 1)
        bp = BasicConv2d(192, name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns the feature maps for the requested output blocks."""

    output_blocks: Sequence[int] = (3,)
    resize_input: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[int, jax.Array]:
        # x: NHWC in [-1, 1]
        if self.resize_input:
            n = x.shape[0]
            x = jax.image.resize(x, (n, 299, 299, x.shape[-1]), "bilinear")
        outputs = {}
        last = max(self.output_blocks)

        x = BasicConv2d(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad((3, 3)), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        if 0 in self.output_blocks:
            outputs[0] = x
        if last == 0:
            return outputs

        x = BasicConv2d(80, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        if 1 in self.output_blocks:
            outputs[1] = x
        if last == 1:
            return outputs

        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        if 2 in self.output_blocks:
            outputs[2] = x
        if last == 2:
            return outputs

        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        outputs[3] = jnp.mean(x, axis=(1, 2))  # (N, 2048)
        return outputs

    @staticmethod
    def init_variables(rng: jax.Array, output_blocks=(3,)):
        net = InceptionV3(output_blocks=output_blocks)
        x = jnp.zeros((1, 299, 299, 3), jnp.float32)
        return net, net.init(rng, x)


def load_torch_inception_weights(path: str, variables):
    """Convert a pytorch-fid/torchvision InceptionV3 .pth state dict into the
    flax variable tree (params + batch_stats). Requires torch (CPU)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def put(tree, keys, value):
        node = tree
        for k in keys[:-1]:
            node = node[k]
        assert node[keys[-1]].shape == value.shape, \
            f"{keys}: {node[keys[-1]].shape} vs {value.shape}"
        node[keys[-1]] = value

    import copy
    params = copy.deepcopy(jax.tree_util.tree_map(np.array, params))
    stats = copy.deepcopy(jax.tree_util.tree_map(np.array, stats))

    for key, val in sd.items():
        parts = key.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            w = val.numpy().transpose(2, 3, 1, 0)  # OIHW -> HWIO
            put(params, parts[:-2] + ["conv", "kernel"], w)
        elif parts[-2] == "bn":
            v = val.numpy()
            if parts[-1] == "weight":
                put(params, parts[:-2] + ["bn", "scale"], v)
            elif parts[-1] == "bias":
                put(params, parts[:-2] + ["bn", "bias"], v)
            elif parts[-1] == "running_mean":
                put(stats, parts[:-2] + ["bn", "mean"], v)
            elif parts[-1] == "running_var":
                put(stats, parts[:-2] + ["bn", "var"], v)
        # fc layer (classifier) is unused for FID features
    return {"params": params, "batch_stats": stats}
