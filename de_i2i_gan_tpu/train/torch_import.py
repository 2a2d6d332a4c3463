"""PyTorch checkpoint importer.

Converts reference defectGAN network state dicts
({epoch}_net_{G,D}.pth raw state_dicts, models/networks/__init__.py:4-11)
into this framework's flax parameter/state trees, so reference-trained
weights can be evaluated or fine-tuned here (the FID/LPIPS-parity pathway
called out in SURVEY.md §7 'hard parts').

Name mapping (reference module tree -> flax tree):
  stem.conv_block.0              -> stem/conv            (7x7 conv)
  stem.conv_block.1              -> stem/norm            (BatchNorm)
  enc_blk.{i}.conv_block.{0,1}   -> enc_{i}/{conv,norm}
  enc_res_blk.{i}.res_block.{j}.conv_block.{0,1}
                                 -> enc_res_{i}/conv_{j}/{conv,norm}
  dec_res_blk.{i}.{norm_0,norm_1}.mlp_* -> dec_res_{i}/norm_{j}/spade|sean/mlp_*
  dec_res_blk.{i}.conv_{0,1}     -> dec_res_{i}/conv_{0,1}
  dec_blk.{i}.norm.mlp_*         -> dec_{i}/norm/spade|sean/mlp_*
  dec_blk.{i}.conv               -> dec_{i}/conv
  foreground_head.de_conv_block.0 -> foreground_head/conv
  distribution_head.de_conv_block.0 -> distribution_head/conv
  (discriminator) enc_blk.0      -> stem/conv; enc_blk.{i>0} -> enc_{i-1}/conv
  cls_clf.conv_block.0 / src_clf.conv_block.0 -> cls_clf/conv, src_clf/conv

Spectral-normalized convs store ``weight_orig`` (+u/v); we import the
original weight and let our power iteration re-estimate u/v.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv_w(sd, key):
    w = sd.get(key + ".weight_orig", sd.get(key + ".weight"))
    return np.asarray(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _linear(sd, key):
    return {"kernel": np.asarray(sd[key + ".weight"]).T,
            "bias": np.asarray(sd[key + ".bias"])}


def _conv(sd, key, bias=False):
    out = {"kernel": _conv_w(sd, key)}
    if bias or key + ".bias" in sd:
        if key + ".bias" in sd:
            out["bias"] = np.asarray(sd[key + ".bias"])
    return out


def _bn(sd, key) -> Tuple[Dict, Dict]:
    params = {"scale": np.asarray(sd[key + ".weight"]),
              "bias": np.asarray(sd[key + ".bias"])}
    stats = {"mean": np.asarray(sd[key + ".running_mean"]),
             "var": np.asarray(sd[key + ".running_var"])}
    return params, stats


def _style_norm(sd, prefix, style_type) -> Dict:
    """SPADE/SEAN/AdaIN sub-tree under a reference norm module prefix.
    Reference load remaps legacy 'spade_/sean_' prefixes and drops
    mlp_latent on cross-type loads (networks/__init__.py:14-23); here the
    names are already canonical per type."""
    if style_type == "spade":
        return {"spade": {
            "mlp_shared": _conv(sd, prefix + ".mlp_shared.0", bias=True),
            "mlp_gamma": _conv(sd, prefix + ".mlp_gamma", bias=True),
            "mlp_beta": _conv(sd, prefix + ".mlp_beta", bias=True),
        }}
    if style_type == "sean":
        return {"sean": {
            "mlp_shared": _linear(sd, prefix + ".mlp_shared.0"),
            "mlp_latent": _linear(sd, prefix + ".mlp_latent.0"),
            "mlp_gamma": _linear(sd, prefix + ".mlp_gamma"),
            "mlp_beta": _linear(sd, prefix + ".mlp_beta"),
        }}
    return {"adain": {
        "mlp_gamma": _linear(sd, prefix + ".mlp_gamma"),
        "mlp_beta": _linear(sd, prefix + ".mlp_beta"),
    }}


def convert_defectgan_generator(sd: Dict[str, Any], cfg) -> Tuple[Dict, Dict]:
    """torch state dict -> (params, batch_stats) for DefectGanGenerator."""
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    style = cfg.style_norm_block_type
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    p, s = _bn(sd, "stem.conv_block.1")
    params["stem"] = {"conv": _conv(sd, "stem.conv_block.0"), "norm": p}
    stats["stem"] = {"norm": s}

    for i in range(cfg.num_scales):
        p, s = _bn(sd, f"enc_blk.{i}.conv_block.1")
        params[f"enc_{i}"] = {"conv": _conv(sd, f"enc_blk.{i}.conv_block.0"),
                              "norm": p}
        stats[f"enc_{i}"] = {"norm": s}

    for i in range(cfg.num_res // 2):
        blk: Dict[str, Any] = {}
        sblk: Dict[str, Any] = {}
        for j in range(2):
            base = f"enc_res_blk.{i}.res_block.{j}.conv_block"
            p, s = _bn(sd, base + ".1")
            blk[f"conv_{j}"] = {"conv": _conv(sd, base + ".0"), "norm": p}
            sblk[f"conv_{j}"] = {"norm": s}
        params[f"enc_res_{i}"] = blk
        stats[f"enc_res_{i}"] = sblk

    for i in range(cfg.num_res // 2):
        base = f"dec_res_blk.{i}"
        blk = {"conv_0": _conv(sd, base + ".conv_0"),
               "conv_1": _conv(sd, base + ".conv_1"),
               "norm_0": _style_norm(sd, base + ".norm_0", style),
               "norm_1": _style_norm(sd, base + ".norm_1", style)}
        if base + ".noise_0.weight" in sd:
            blk["noise_0"] = {"weight": np.asarray(
                sd[base + ".noise_0.weight"]).reshape(-1)}
            blk["noise_1"] = {"weight": np.asarray(
                sd[base + ".noise_1.weight"]).reshape(-1)}
        params[f"dec_res_{i}"] = blk

    for i in range(cfg.num_scales):
        base = f"dec_blk.{i}"
        blk = {"conv": _conv(sd, base + ".conv"),
               "norm": _style_norm(sd, base + ".norm", style)}
        if base + ".noise.weight" in sd:
            blk["noise"] = {"weight": np.asarray(
                sd[base + ".noise.weight"]).reshape(-1)}
        params[f"dec_{i}"] = blk

    params["foreground_head"] = {
        "conv": _conv(sd, "foreground_head.de_conv_block.0")}
    params["distribution_head"] = {
        "conv": _conv(sd, "distribution_head.de_conv_block.0")}
    return params, stats


def convert_defectgan_discriminator(sd: Dict[str, Any], cfg) -> Dict:
    """torch state dict -> params for DefectGanDiscriminator (no BN)."""
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params: Dict[str, Any] = {
        "stem": {"conv": _conv(sd, "enc_blk.0.conv_block.0")}}
    for i in range(cfg.num_layers):
        params[f"enc_{i}"] = {
            "conv": _conv(sd, f"enc_blk.{i + 1}.conv_block.0")}
    params["cls_clf"] = {"conv": _conv(sd, "cls_clf.conv_block.0")}
    params["src_clf"] = {"conv": _conv(sd, "src_clf.conv_block.0")}
    return params


def import_torch_checkpoint(g_path, d_path, cfg, target_state):
    """Load reference {epoch}_net_G.pth / _net_D.pth into a GANTrainState."""
    import torch
    g_sd = torch.load(g_path, map_location="cpu")
    d_sd = torch.load(d_path, map_location="cpu")
    g_params, g_stats = convert_defectgan_generator(g_sd, cfg)
    d_params = convert_defectgan_discriminator(d_sd, cfg)
    g_state = dict(target_state.G.state)
    g_state["batch_stats"] = g_stats
    return target_state.replace(
        G=target_state.G.replace(params=g_params, state=g_state),
        D=target_state.D.replace(params=d_params))
