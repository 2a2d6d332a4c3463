"""ViT encoder in flax — the frozen feature backbone.

The reference uses HuggingFace ViTForImageClassification as (a) a frozen
style-embedding extractor (CLS token of the last hidden state,
/root/reference/defectGAN/models/vit_model.py:19-21,50-58 and
stargan-v2/core/model.py:535-572) and (b) the backbone of a trainable linear
classifier (defectGAN/models/vit_model.py + ViTClassifier).

This is a standard ViT-B/16 (or L/16) encoder: patch conv embed + CLS token +
learned position embeddings, pre-LN transformer blocks, returning the last
hidden state *before* the final layernorm — matching HF's
``output_hidden_states[-1]`` which the reference indexes for its CLS
embeddings.

Weights convert from an HF torch checkpoint via ``load_hf_vit_weights`` when
one is available on disk (zero-egress image: none ships here; with random
init, embedding extraction is exercised but not semantically meaningful).
"""
from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

SIZES = {
    "base": dict(hidden=768, layers=12, heads=12, mlp=3072),
    "large": dict(hidden=1024, layers=24, heads=16, mlp=4096),
    # test-scale config: exercises the full attention/CLS/pos-embed flow
    # (e.g. the in-graph sean style-reconstruction loss) without the
    # 86M-param compile cost
    "tiny": dict(hidden=16, layers=1, heads=2, mlp=32),
}


class ViTBlock(nn.Module):
    hidden: int
    heads: int
    mlp: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-12, name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.hidden,
            dtype=self.dtype, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-12, name="ln2")(x)
        h = nn.Dense(self.mlp, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
        return x + h


class ViTEncoder(nn.Module):
    model_size: str = "base"
    patch: int = 16
    image_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: NHWC in [-1, 1], resized to image_size.
        Returns the last hidden state (N, 1+tokens, hidden), CLS first."""
        cfg = SIZES[self.model_size]
        n = x.shape[0]
        if x.shape[1] != self.image_size:
            x = jax.image.resize(
                x, (n, self.image_size, self.image_size, x.shape[-1]),
                "bilinear")
        h = nn.Conv(cfg["hidden"], (self.patch, self.patch),
                    (self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x.astype(self.dtype))
        h = h.reshape(n, -1, cfg["hidden"])
        cls = self.param("cls_token", nn.initializers.zeros_init(),
                         (1, 1, cfg["hidden"]), jnp.float32)
        h = jnp.concatenate([jnp.tile(cls.astype(h.dtype), (n, 1, 1)), h],
                            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, h.shape[1], cfg["hidden"]), jnp.float32)
        h = h + pos.astype(h.dtype)
        for i in range(cfg["layers"]):
            h = ViTBlock(cfg["hidden"], cfg["heads"], cfg["mlp"],
                         dtype=self.dtype, name=f"block_{i}")(h)
        # HF hidden_states[-1] is pre-final-layernorm; keep that convention
        return h

    def cls_embedding(self, variables, x):
        return self.apply(variables, x)[:, 0, :]


class _ScanViTBlock(nn.Module):
    """nn.scan body: (carry, None) -> (carry, None) around one ViTBlock."""

    hidden: int
    heads: int
    mlp: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, _):
        return ViTBlock(self.hidden, self.heads, self.mlp,
                        dtype=self.dtype, name="block")(h), None


class ViTEncoderScanned(nn.Module):
    """ViTEncoder with the transformer stack under ``nn.scan`` (block params
    stacked on a leading layer axis): mathematically identical per-token
    compute, but the lowered HLO contains ONE block body instead of 12/24 —
    an order-of-magnitude smaller program. Use where program size or compile
    time dominates: the dev tunnel's remote-compile endpoint rejects the
    unrolled frozen-ViT-B sean train_step outright (HTTP 413 request-size
    cap, measured round 5), while the scanned form fits.

    Param layout differs from ViTEncoder (stacked ``blocks_scan/block/...``
    vs per-layer ``block_i/...``); ``stack_vit_params`` converts.
    """

    model_size: str = "base"
    patch: int = 16
    image_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = SIZES[self.model_size]
        n = x.shape[0]
        if x.shape[1] != self.image_size:
            x = jax.image.resize(
                x, (n, self.image_size, self.image_size, x.shape[-1]),
                "bilinear")
        h = nn.Conv(cfg["hidden"], (self.patch, self.patch),
                    (self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x.astype(self.dtype))
        h = h.reshape(n, -1, cfg["hidden"])
        cls = self.param("cls_token", nn.initializers.zeros_init(),
                         (1, 1, cfg["hidden"]), jnp.float32)
        h = jnp.concatenate([jnp.tile(cls.astype(h.dtype), (n, 1, 1)), h],
                            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, h.shape[1], cfg["hidden"]), jnp.float32)
        h = h + pos.astype(h.dtype)
        scan = nn.scan(_ScanViTBlock,
                       variable_axes={"params": 0},
                       split_rngs={"params": True},
                       length=cfg["layers"])(
            cfg["hidden"], cfg["heads"], cfg["mlp"], dtype=self.dtype,
            name="blocks_scan")
        h, _ = scan(h, None)
        # HF hidden_states[-1] is pre-final-layernorm; keep that convention
        return h

    def cls_embedding(self, variables, x):
        return self.apply(variables, x)[:, 0, :]


def stack_vit_params(params: dict, model_size: str = "base") -> dict:
    """Convert ViTEncoder params (block_0..block_{L-1}) to the stacked
    ViTEncoderScanned layout (blocks_scan/block with a leading layer axis).
    Embedding/head params pass through unchanged."""
    layers = SIZES[model_size]["layers"]
    blocks = [params[f"block_{i}"] for i in range(layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *blocks)
    out = {k: v for k, v in params.items() if not k.startswith("block_")}
    out["blocks_scan"] = {"block": stacked}
    return out


class FeatureExtractor:
    """Frozen-ViT style embedding extractor (stargan-v2 core/model.py:535-572).

    extract(x_ref, num_embeds, rng): x_ref (N, E, H, W, C) or (N, H, W, C) ->
    (N, k, embed_nc) CLS embeddings, where k is uniform in [1, num_embeds]
    when num_embeds > 0 (model.py:552-555) or exactly -num_embeds.
    """

    def __init__(self, variables, model_size: str = "base",
                 dtype=jnp.float32):
        self.net = ViTEncoder(model_size=model_size, dtype=dtype)
        self.variables = variables
        self._embed = jax.jit(
            lambda v, x: self.net.apply(v, x)[:, 0, :])

    def extract(self, x_ref: jax.Array, num_embeds: int,
                rng: Optional[jax.Array] = None) -> jax.Array:
        if x_ref.ndim == 4:
            return self._embed(self.variables, x_ref)[:, None, :]
        n, e = x_ref.shape[:2]
        if num_embeds > 0:
            assert rng is not None
            k = int(jax.random.randint(rng, (), 1, num_embeds + 1))
        else:
            k = -num_embeds
        flat = x_ref[:, :k].reshape(-1, *x_ref.shape[2:])
        emb = self._embed(self.variables, flat)
        return emb.reshape(n, k, -1)


def load_hf_vit_weights(path_or_name: str, variables,
                        model_size: str = "base"):
    """Convert an HF ViTModel/ViTForImageClassification torch state dict into
    the ViTEncoder flax tree. Accepts a local directory / .bin / safetensors
    path (no network access in this image)."""
    import torch
    from pathlib import Path
    p = Path(path_or_name)
    if p.is_dir():
        cand = list(p.glob("*.bin")) + list(p.glob("*.safetensors"))
        assert cand, f"no weights found under {p}"
        p = cand[0]
    if p.suffix == ".safetensors":
        from safetensors.torch import load_file
        sd = load_file(str(p))
    else:
        sd = torch.load(str(p), map_location="cpu")
    sd = {k.replace("vit.", ""): v for k, v in sd.items()}

    cfg = SIZES[model_size]
    params = jax.tree_util.tree_map(np.array, variables["params"])
    params["cls_token"] = sd["embeddings.cls_token"].numpy()
    params["pos_embed"] = sd["embeddings.position_embeddings"].numpy()
    params["patch_embed"]["kernel"] = sd[
        "embeddings.patch_embeddings.projection.weight"].numpy().transpose(
        2, 3, 1, 0)
    params["patch_embed"]["bias"] = sd[
        "embeddings.patch_embeddings.projection.bias"].numpy()
    h, heads = cfg["hidden"], cfg["heads"]
    hd = h // heads
    for i in range(cfg["layers"]):
        src = f"encoder.layer.{i}."
        blk = params[f"block_{i}"]
        blk["ln1"]["scale"] = sd[src + "layernorm_before.weight"].numpy()
        blk["ln1"]["bias"] = sd[src + "layernorm_before.bias"].numpy()
        blk["ln2"]["scale"] = sd[src + "layernorm_after.weight"].numpy()
        blk["ln2"]["bias"] = sd[src + "layernorm_after.bias"].numpy()
        for flax_name, hf_name in (("query", "attention.attention.query"),
                                   ("key", "attention.attention.key"),
                                   ("value", "attention.attention.value")):
            w = sd[f"{src}{hf_name}.weight"].numpy().T.reshape(h, heads, hd)
            b = sd[f"{src}{hf_name}.bias"].numpy().reshape(heads, hd)
            blk["attn"][flax_name]["kernel"] = w
            blk["attn"][flax_name]["bias"] = b
        wo = sd[src + "attention.output.dense.weight"].numpy().T
        blk["attn"]["out"]["kernel"] = wo.reshape(heads, hd, h)
        blk["attn"]["out"]["bias"] = sd[
            src + "attention.output.dense.bias"].numpy()
        blk["fc1"]["kernel"] = sd[src + "intermediate.dense.weight"].numpy().T
        blk["fc1"]["bias"] = sd[src + "intermediate.dense.bias"].numpy()
        blk["fc2"]["kernel"] = sd[src + "output.dense.weight"].numpy().T
        blk["fc2"]["bias"] = sd[src + "output.dense.bias"].numpy()
    return {"params": params}
