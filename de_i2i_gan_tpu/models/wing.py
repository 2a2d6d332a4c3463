"""FAN (face alignment network) port — the 'wing' module.

Mirrors /root/reference/stargan-v2/core/wing.py:
  AddCoords/CoordConv (:92-148)  coordinate (+radius, +boundary) channels
  ConvBlock           (:151-188) pre-act BN dense-ish block (1/2+1/4+1/4 cat)
  HourGlass           (:49-89)   depth-4 recursive hourglass
  FAN                 (:190-246) stem + one hourglass + heatmap head (98+1)
  get_heatmap         (:248-261) 0-1 landmark heatmaps used as high-pass
                                 masks by the generator
  heatmap preprocess  (:437-539) truncate/normalize/shift/resize pipeline
                                 producing the two hpf masks
  get_landmark + FaceAligner     offline alignment (host-side numpy)

The reference always runs FAN frozen from wing.ckpt; use
``load_torch_wing_weights`` to convert that checkpoint. BatchNorm runs with
stored statistics (inference only).
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def _coords(height: int, width: int, with_r: bool) -> np.ndarray:
    x = np.arange(height, dtype=np.float32)[:, None] * np.ones(
        (1, width), np.float32)
    y = np.ones((height, 1), np.float32) * np.arange(
        width, dtype=np.float32)[None, :]
    x = x / (height - 1) * 2 - 1
    y = y / (width - 1) * 2 - 1
    chans = [x, y]
    if with_r:
        rr = np.sqrt(x ** 2 + y ** 2)
        chans.append(rr / rr.max())
    return np.stack(chans, axis=-1)  # (H, W, 2 or 3)


class CoordConv(nn.Module):
    """wing.py:131-148 (NHWC)."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    with_r: bool = False
    with_boundary: bool = False
    first_one: bool = False

    @nn.compact
    def __call__(self, x, heatmap=None):
        h, w = x.shape[1:3]
        coords = jnp.asarray(_coords(h, w, self.with_r))
        coords = jnp.tile(coords[None], (x.shape[0], 1, 1, 1))
        if self.with_boundary and heatmap is not None:
            boundary = jnp.clip(heatmap[..., -1:], 0.0, 1.0)
            xc = coords[..., 0:1]
            yc = coords[..., 1:2]
            zero = jnp.zeros_like(xc)
            xx = jnp.where(boundary > 0.05, xc, zero)
            yy = jnp.where(boundary > 0.05, yc, zero)
            coords = jnp.concatenate([coords, xx, yy], axis=-1)
        ret = jnp.concatenate([x, coords], axis=-1)
        last_channel = ret[..., -2:]
        out = nn.Conv(self.features, (self.kernel, self.kernel),
                      (self.stride, self.stride),
                      padding=[(self.padding, self.padding)] * 2,
                      use_bias=True, name="conv")(ret)
        return out, last_channel


class WingConvBlock(nn.Module):
    """wing.py:151-188."""

    features: int

    @nn.compact
    def __call__(self, x):
        f = self.features
        residual = x
        o1 = nn.relu(nn.BatchNorm(use_running_average=True, name="bn1")(x))
        o1 = nn.Conv(f // 2, (3, 3), padding=1, use_bias=False,
                     name="conv1")(o1)
        o2 = nn.relu(nn.BatchNorm(use_running_average=True, name="bn2")(o1))
        o2 = nn.Conv(f // 4, (3, 3), padding=1, use_bias=False,
                     name="conv2")(o2)
        o3 = nn.relu(nn.BatchNorm(use_running_average=True, name="bn3")(o2))
        o3 = nn.Conv(f // 4, (3, 3), padding=1, use_bias=False,
                     name="conv3")(o3)
        out = jnp.concatenate([o1, o2, o3], axis=-1)
        if x.shape[-1] != f:
            residual = nn.relu(nn.BatchNorm(use_running_average=True,
                                            name="down_bn")(x))
            residual = nn.Conv(f, (1, 1), use_bias=False,
                               name="down_conv")(residual)
        return out + residual


def _avg_pool2(x):
    y = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID")
    return y / 4.0


def _up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class HourGlass(nn.Module):
    """wing.py:49-89 — depth-4 recursion unrolled into down/up loops."""

    depth: int = 4
    features: int = 256
    first_one: bool = False

    @nn.compact
    def __call__(self, x, heatmap=None):
        x, last_channel = CoordConv(256, with_r=True, with_boundary=True,
                                    first_one=self.first_one,
                                    name="coordconv")(x, heatmap)
        ups = {}
        inp = x
        for level in range(self.depth, 0, -1):
            ups[level] = WingConvBlock(self.features,
                                       name=f"b1_{level}")(inp)
            low = _avg_pool2(inp)
            low = WingConvBlock(self.features, name=f"b2_{level}")(low)
            inp = low
        out = WingConvBlock(self.features, name="b2_plus_1")(inp)
        for level in range(1, self.depth + 1):
            out = WingConvBlock(self.features, name=f"b3_{level}")(out)
            out = _up2(out)
            out = ups[level] + out
        return out, last_channel


class FAN(nn.Module):
    """wing.py:190-246 (num_modules=1 as the reference uses)."""

    num_landmarks: int = 98
    end_relu: bool = False

    @nn.compact
    def __call__(self, x):
        x, _ = CoordConv(64, kernel=7, stride=2, padding=3, with_r=True,
                         name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=True, name="bn1")(x))
        x = _avg_pool2(WingConvBlock(128, name="conv2")(x))
        x = WingConvBlock(128, name="conv3")(x)
        x = WingConvBlock(256, name="conv4")(x)

        ll, boundary = HourGlass(4, 256, first_one=True, name="m0")(x, None)
        ll = WingConvBlock(256, name="top_m_0")(ll)
        ll = nn.Conv(256, (1, 1), use_bias=True, name="conv_last0")(ll)
        ll = nn.relu(nn.BatchNorm(use_running_average=True,
                                  name="bn_end0")(ll))
        out = nn.Conv(self.num_landmarks + 1, (1, 1), use_bias=True,
                      name="l0")(ll)
        if self.end_relu:
            out = nn.relu(out)
        return out, boundary


# ------------------------------------------------------------ heatmap post
_INDEX_MAP = {
    "chin": (8, 25), "eyebrows": (33, 51), "eyebrowsedges": (33, 46),
    "nose": (51, 55), "nostrils": (55, 60), "eyes": (60, 76),
    "lipedges": (76, 82), "lipupper": (77, 82), "liplower": (83, 88),
    "lipinner": (88, 96),
}


def _normalize01(x, eps=1e-6):
    n, h, w, c = x.shape
    flat = x.reshape(n, h * w, c)
    mx = flat.max(axis=1, keepdims=True)
    mn = flat.min(axis=1, keepdims=True)
    return ((flat - mn) / (mx - mn + eps)).reshape(n, h, w, c)


def _shift_rows(x, n):
    """Vertical circular-ish shift (wing.py:459-477)."""
    if n == 0:
        return x
    h = x.shape[1]
    if n >= 0:
        perm = np.concatenate([np.arange(h - n) + n, np.arange(n)])
    else:
        n = -n
        perm = np.concatenate([np.arange(n) + (h - n), np.arange(h - n)])
    return x[:, perm]


def preprocess_heatmaps(hm: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """98-channel landmark heatmaps -> the two hpf masks (wing.py:494-539).
    hm: (N, H, W, 98)."""
    sw = hm.shape[1] // 256
    x = jnp.where(hm < 0.1, 0.0, hm)
    x = _normalize01(x)

    ops = {"chin": (0, 3), "eyebrows": (-7 * sw, 2), "nostrils": (8 * sw, 4),
           "lipupper": (-8 * sw, 4), "liplower": (8 * sw, 4),
           "lipinner": (-2 * sw, 3)}
    for part, (shift, power) in ops.items():
        s, e = _INDEX_MAP[part]
        x = x.at[..., s:e].set(
            _shift_rows(x[..., s:e], shift) ** power)

    zero = (list(range(0, _INDEX_MAP["chin"][0])) +
            list(range(_INDEX_MAP["chin"][1], 33)) +
            [_INDEX_MAP["eyebrowsedges"][0], _INDEX_MAP["eyebrowsedges"][1],
             _INDEX_MAP["lipedges"][0], _INDEX_MAP["lipedges"][1]])
    x = x.at[..., np.asarray(zero)].set(0.0)

    s, e = _INDEX_MAP["nose"]
    x = x.at[..., s + 1:e].set(_shift_rows(x[..., s + 1:e], 4 * sw))
    s, e = _INDEX_MAP["eyes"]
    x = x.at[..., s:e].set(
        _shift_rows(x[..., s:e], -8) ** 3 + _shift_rows(x[..., s:e], -24))

    x2 = x
    for part in ("chin", "eyebrows"):
        s, e = _INDEX_MAP[part]
        x2 = x2.at[..., s:e].set(0.0)
    x2 = x2.at[..., _INDEX_MAP["lipedges"][0]:_INDEX_MAP["lipinner"][1]].set(0.0)

    m1 = jnp.nan_to_num(x.sum(axis=-1, keepdims=True))
    m2 = jnp.nan_to_num(x2.sum(axis=-1, keepdims=True))
    return jnp.clip(m1, 0, 1), jnp.clip(m2, 0, 1)


class WingHeatmapper:
    """get_heatmap (wing.py:248-261): frozen FAN -> the two generator masks."""

    def __init__(self, variables, img_size: int = 256):
        self.net = FAN()
        self.variables = variables
        self.img_size = img_size
        self._fwd = jax.jit(self._impl)

    def _impl(self, x):
        n = x.shape[0]
        x = jax.image.resize(x, (n, 256, 256, 3), "bilinear")
        x01 = x * 0.5 + 0.5
        out, _ = self.net.apply(self.variables, x01)
        hm = out[..., :-1]  # drop boundary channel
        hm = jax.image.resize(hm, (n, 256, 256, hm.shape[-1]), "bilinear")
        return preprocess_heatmaps(hm)

    def get_heatmap(self, x) -> List[jax.Array]:
        m1, m2 = self._fwd(x)
        return [m1, m2]

    def get_landmarks(self, x) -> np.ndarray:
        """Argmax landmark decode (wing.py:27-46, host-side)."""
        n = x.shape[0]
        xr = jax.image.resize(x, (n, 256, 256, 3), "bilinear") * 0.5 + 0.5
        out, _ = self.net.apply(self.variables, xr)
        hm = np.asarray(out[..., :-1])  # (N, 64, 64, 98)
        nb, h, w, c = hm.shape
        flat = hm.reshape(nb, h * w, c)
        idx = flat.argmax(axis=1)
        ys, xs = np.divmod(idx, w)
        preds = np.stack([xs, ys], axis=-1).astype(np.float32) + 0.5
        scale = x.shape[1] // h
        return preds * scale


class FaceAligner:
    """Offline face alignment (wing.py:190-246 FaceAligner + align helpers
    :324-420): rotate/scale/translate each face so its eye/mouth landmarks
    match the CelebA mean landmarks. Host-side numpy/scipy; the warp uses
    scipy.ndimage.affine_transform in place of cv2.warpPerspective (the
    composed transform is affine)."""

    def __init__(self, heatmapper: "WingHeatmapper", celeba_mean_path: str,
                 output_size: int = 256):
        self.hm = heatmapper
        mean = np.load(celeba_mean_path)
        self.ref = np.float32(mean["mean"]) * (output_size // 256)
        self.output_size = output_size
        self.xaxis_ref = _landmarks2xaxis(self.ref)

    def _matrix(self, landmarks: np.ndarray) -> np.ndarray:
        t_origin = np.eye(3)
        t_origin[:2, 2] = -landmarks.mean(axis=0)
        xaxis_src = _landmarks2xaxis(landmarks)
        vx = xaxis_src / np.linalg.norm(xaxis_src)
        vy = self.xaxis_ref / np.linalg.norm(self.xaxis_ref)
        c = float(np.dot(vx, vy))
        s = float(np.sqrt(max(0.0, 1 - c * c)) * np.sign(np.cross(vx, vy)))
        rot = np.asarray(((c, -s, 0), (s, c, 0), (0, 0, 1)))
        scale = np.eye(3)
        scale[0, 0] = scale[1, 1] = _landmarks2scale(landmarks, self.ref)
        t_ref = np.eye(3)
        t_ref[:2, 2] = self.ref.mean(axis=0)
        return t_ref @ scale @ rot @ t_origin

    def align(self, imgs: np.ndarray) -> np.ndarray:
        """imgs: (N, H, W, 3) in [-1, 1] -> aligned images, same shape."""
        from scipy import ndimage
        lms = self.hm.get_landmarks(jnp.asarray(imgs))
        out = np.empty_like(imgs)
        s = self.output_size
        for i, (img, lm) in enumerate(zip(imgs, lms)):
            m = self._matrix(lm.astype(np.float32))
            inv = np.linalg.inv(m)
            # scipy maps output coords -> input coords via (matrix, offset);
            # image axes are (y, x) so swap the 2x2 block
            a = np.asarray([[inv[1, 1], inv[1, 0]], [inv[0, 1], inv[0, 0]]])
            off = np.asarray([inv[1, 2], inv[0, 2]])
            warped = np.stack([
                ndimage.affine_transform(img[..., c], a, offset=off,
                                         output_shape=(s, s), order=1,
                                         mode="reflect")
                for c in range(img.shape[-1])], axis=-1)
            out[i] = warped
        return out


def _landmarks2eyes(lm):
    left = lm[np.asarray(list(range(60, 68)) + [96])]
    right = lm[np.asarray(list(range(68, 76)) + [97])]
    return left.mean(axis=0), right.mean(axis=0)


def _landmarks2xaxis(lm):
    eye_l, eye_r = _landmarks2eyes(lm)
    mouth_l, mouth_r = lm[76], lm[82]
    xp = eye_r - eye_l
    yp = (eye_l + eye_r) * 0.5 - (mouth_l + mouth_r) * 0.5
    rot90 = np.asarray([yp[1], -yp[0]])
    xaxis = xp - rot90
    return xaxis / np.linalg.norm(xaxis)


def _landmarks2scale(x, y):
    xv = x - x.mean(axis=0)
    yv = y - y.mean(axis=0)
    idx = [96, 97, 76, 82]
    return float((np.linalg.norm(yv, axis=1) /
                  np.maximum(np.linalg.norm(xv, axis=1), 1e-8))[idx].mean())


def load_torch_wing_weights(path: str, variables):
    """Convert the reference wing.ckpt into the flax FAN tree."""
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)

    params = jax.tree_util.tree_map(np.array, variables["params"])
    stats = jax.tree_util.tree_map(np.array, variables["batch_stats"])

    def conv_w(v):
        return v.numpy().transpose(2, 3, 1, 0)

    def set_conv(tree, name, key):
        tree[name]["kernel"] = conv_w(sd[key + ".weight"])
        if key + ".bias" in sd:
            tree[name]["bias"] = sd[key + ".bias"].numpy()

    def set_bn(p_tree, s_tree, name, key):
        p_tree[name]["scale"] = sd[key + ".weight"].numpy()
        p_tree[name]["bias"] = sd[key + ".bias"].numpy()
        s_tree[name]["mean"] = sd[key + ".running_mean"].numpy()
        s_tree[name]["var"] = sd[key + ".running_var"].numpy()

    def set_block(p_tree, s_tree, prefix):
        for i in (1, 2, 3):
            set_bn(p_tree, s_tree, f"bn{i}", f"{prefix}.bn{i}")
            set_conv(p_tree, f"conv{i}", f"{prefix}.conv{i}")
        if f"{prefix}.downsample.0.weight" in sd:
            set_bn(p_tree, s_tree, "down_bn", f"{prefix}.downsample.0")
            set_conv(p_tree, "down_conv", f"{prefix}.downsample.2")

    set_conv(params["conv1"], "conv", "conv1.conv")
    set_bn(params, stats, "bn1", "bn1")
    for blk in ("conv2", "conv3", "conv4", "top_m_0"):
        set_block(params[blk], stats[blk], blk)
    set_conv(params, "conv_last0", "conv_last0")
    set_bn(params, stats, "bn_end0", "bn_end0")
    set_conv(params, "l0", "l0")
    hg_p, hg_s = params["m0"], stats["m0"]
    set_conv(hg_p["coordconv"], "conv", "m0.coordconv.conv")
    for level in range(1, 5):
        for b in (f"b1_{level}", f"b2_{level}", f"b3_{level}"):
            set_block(hg_p[b], hg_s[b], f"m0.{b}")
    set_block(hg_p["b2_plus_1"], hg_s["b2_plus_1"], "m0.b2_plus_1")
    return {"params": params, "batch_stats": stats}
