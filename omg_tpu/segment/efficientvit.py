"""EfficientViT-SAM image encoder (backbone + SamNeck), functional JAX.

TPU-native rebuild of the reference's live segmentation encoder
(reference: src/efficientvit/models/efficientvit/backbone.py:193-336
``EfficientViTLargeBackbone`` and sam.py:103-192 ``SamNeck`` /
``EfficientViTSamImageEncoder``; xl1 geometry at sam.py:630-653).

The forward is config-driven: a static stage descriptor tells the walker
which block function to apply to each ``op_list`` entry, while the param
tree mirrors the torch module naming for mechanical conversion of
``xl1.pt``. Data layout NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from omg_tpu.segment import evit_ops as ops

Array = jax.Array
Params = dict


@dataclasses.dataclass(frozen=True)
class EViTSamConfig:
    width_list: Sequence[int] = (32, 64, 128, 256, 512, 1024)
    depth_list: Sequence[int] = (1, 2, 2, 4, 6, 6)
    block_list: Sequence[str] = ("res", "fmb", "fmb", "fmb", "att@3", "att@3")
    expand_list: Sequence[int] = (1, 4, 4, 4, 4, 6)
    fewer_norm_list: Sequence[bool] = (False, False, False, False, True, True)
    qkv_dim: int = 32
    act: str = "gelu"
    # neck
    neck_fids: Sequence[str] = ("stage5", "stage4", "stage3")
    neck_in_channels: Sequence[int] = (1024, 512, 256)
    neck_width: int = 256
    neck_depth: int = 12
    neck_expand: int = 4
    neck_out_dim: int = 256
    neck_feature_hw: int = 64
    image_size: int = 1024
    dtype: Any = jnp.float32


def xl1_config() -> EViTSamConfig:
    """EfficientViT-SAM-XL1 (reference: sam.py:630-653)."""
    return EViTSamConfig()


def xl0_config() -> EViTSamConfig:
    """EfficientViT-SAM-XL0 (reference: sam.py:604-627)."""
    return EViTSamConfig(depth_list=(0, 1, 1, 2, 3, 3), neck_depth=6)


def _l_series(depth_list, neck_depth) -> EViTSamConfig:
    # L-backbone defaults (reference: backbone.py:193-209) + SamNeck
    # fids/channels/middle for l0-l2 (reference: sam.py:547-601)
    return EViTSamConfig(
        width_list=(32, 64, 128, 256, 512),
        depth_list=depth_list,
        block_list=("res", "fmb", "fmb", "mb", "att"),
        expand_list=(1, 4, 4, 4, 6),
        fewer_norm_list=(False, False, False, True, True),
        neck_fids=("stage4", "stage3", "stage2"),
        neck_in_channels=(512, 256, 128),
        neck_depth=neck_depth,
        neck_expand=1,
        image_size=512,
    )


def l0_config() -> EViTSamConfig:
    """EfficientViT-SAM-L0 (reference: sam.py:547-563)."""
    return _l_series((1, 1, 1, 4, 4), 4)


def l1_config() -> EViTSamConfig:
    """EfficientViT-SAM-L1 (reference: sam.py:566-582)."""
    return _l_series((1, 1, 1, 6, 6), 8)


def l2_config() -> EViTSamConfig:
    """EfficientViT-SAM-L2 (reference: sam.py:585-601)."""
    return _l_series((1, 2, 2, 8, 8), 12)


# The reference zoo (sam_model_zoo.py:26-53). Signature = per-stage
# op_list lengths (1 stem/downsample + depth), which uniquely identifies
# each geometry in a converted checkpoint tree.
ZOO = {"l0": l0_config, "l1": l1_config, "l2": l2_config,
       "xl0": xl0_config, "xl1": xl1_config}


def _signature(cfg: EViTSamConfig) -> tuple:
    return tuple(1 + d for d in cfg.depth_list)


def infer_config(params: Params):
    """Zoo config from a converted checkpoint's stage structure, or None
    if the tree matches no zoo geometry (including trees without the
    backbone/stages structure at all)."""
    try:
        sig = tuple(len(st["op_list"])
                    for st in params["backbone"]["stages"])
    except (KeyError, TypeError):
        return None
    for make in ZOO.values():
        cfg = make()
        if _signature(cfg) == sig:
            return cfg
    return None


def tiny_config() -> EViTSamConfig:
    """CPU-testable miniature exercising every block type."""
    return EViTSamConfig(
        width_list=(8, 8, 16, 16, 32, 32),
        depth_list=(1, 1, 1, 1, 1, 1),
        expand_list=(1, 2, 2, 2, 2, 2),
        qkv_dim=8,
        neck_in_channels=(32, 32, 16),
        neck_width=16,
        neck_depth=1,
        neck_out_dim=16,
        neck_feature_hw=8,
        image_size=64,
    )


def _scales(block: str) -> tuple:
    return (3,) if block == "att@3" else (5,)


# --------------------------------------------------------------------------
# Backbone
# --------------------------------------------------------------------------

def backbone_apply(p: Params, cfg: EViTSamConfig, x: Array) -> dict:
    """x [B, S, S, 3] -> {"stage0".."stage5"} feature dict."""
    a = cfg.act
    feats = {}

    # stage 0: stem conv + residual res blocks
    st = p["stages"][0]["op_list"]
    x = ops.conv_layer(st[0], x, kernel=3, stride=2, act_func=a)
    for blk in st[1:]:
        x = x + ops.res_block(blk["main"], x, act_func=a)
    feats["stage0"] = x

    for sid in range(1, len(cfg.width_list)):
        st = p["stages"][sid]["op_list"]
        block = cfg.block_list[sid]
        down_kind = block if block in ("mb", "fmb") else "mb"
        if down_kind == "fmb":
            x = ops.fused_mbconv(st[0]["main"], x, stride=2, act_func=a)
        else:
            x = ops.mbconv(st[0]["main"], x, stride=2, act_func=a)
        for blk in st[1:]:
            if block.startswith("att"):
                x = ops.evit_block(blk, x, dim=cfg.qkv_dim,
                                   scales=_scales(block), act_func=a)
            elif block == "fmb":
                x = x + ops.fused_mbconv(blk["main"], x, act_func=a)
            else:
                x = x + ops.mbconv(blk["main"], x, act_func=a)
        feats[f"stage{sid}"] = x
    return feats


# --------------------------------------------------------------------------
# Neck + encoder
# --------------------------------------------------------------------------

def neck_apply(p: Params, cfg: EViTSamConfig, feats: dict) -> Array:
    """3-scale DAG fusion -> [B, 64, 64, 256] SAM embedding
    (reference: sam.py:103-173)."""
    hw = (cfg.neck_feature_hw, cfg.neck_feature_hw)
    acc = None
    for i, fid in enumerate(cfg.neck_fids):
        h = ops.conv_layer(p["input_ops"][i]["op_list"][0], feats[fid],
                           kernel=1)
        h = ops.bicubic_resize(h, hw)
        acc = h if acc is None else acc + h
    for blk in p["middle"]["op_list"]:
        acc = acc + ops.fused_mbconv(blk["main"], acc, act_func=cfg.act)
    return ops.conv_layer(p["output_ops"][0]["op_list"][0], acc, kernel=1)


def encoder_apply(p: Params, cfg: EViTSamConfig, x: Array) -> Array:
    """Full image encoder incl. the final ln2d (reference: sam.py:176-192)."""
    feats = backbone_apply(p["backbone"], cfg, x)
    out = neck_apply(p["neck"], cfg, feats)
    return ops.layer_norm_2d(p["norm"], out)


# --------------------------------------------------------------------------
# Random init (tests / benchmarks; real weights come from xl1.pt)
# --------------------------------------------------------------------------

def _init_bn(ch, dtype):
    return {"weight": jnp.ones((ch,), dtype),
            "bias": jnp.zeros((ch,), dtype),
            "running_mean": jnp.zeros((ch,), dtype),
            "running_var": jnp.ones((ch,), dtype)}


def _init_conv_layer(key, cin, cout, k, *, norm=True, bias=False, dtype):
    ks = jax.random.split(key, 2)
    fan = cin * k * k
    p: Params = {"conv": {"weight": (jax.random.normal(
        ks[0], (k, k, cin, cout), jnp.float32) / fan ** 0.5).astype(dtype)}}
    if bias:
        p["conv"]["bias"] = jnp.zeros((cout,), dtype)
    if norm:
        p["norm"] = _init_bn(cout, dtype)
    return p


def _init_depthwise(key, ch, k, *, bias=False, dtype):
    p = {"weight": (jax.random.normal(key, (k, k, 1, ch), jnp.float32)
                    / (k * k) ** 0.5).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((ch,), dtype)
    return p


def _init_fmb(key, cin, cout, expand, *, fewer_norm, dtype):
    ks = jax.random.split(key, 2)
    mid = round(cin * expand)
    return {
        "spatial_conv": _init_conv_layer(ks[0], cin, mid, 3,
                                         norm=not fewer_norm,
                                         bias=fewer_norm, dtype=dtype),
        "point_conv": _init_conv_layer(ks[1], mid, cout, 1, norm=True,
                                       bias=False, dtype=dtype),
    }


def _init_mb(key, cin, cout, expand, *, fewer_norm, dtype):
    ks = jax.random.split(key, 3)
    mid = round(cin * expand)
    return {
        "inverted_conv": _init_conv_layer(ks[0], cin, mid, 1,
                                          norm=not fewer_norm,
                                          bias=fewer_norm, dtype=dtype),
        "depth_conv": {"conv": _init_depthwise(ks[1], mid, 3,
                                               bias=fewer_norm, dtype=dtype),
                       **({} if fewer_norm
                          else {"norm": _init_bn(mid, dtype)})},
        "point_conv": _init_conv_layer(ks[2], mid, cout, 1, norm=True,
                                       bias=False, dtype=dtype),
    }


def _init_litemla(key, ch, dim, scales, dtype):
    ks = jax.random.split(key, 4)
    heads = ch // dim
    total = heads * dim
    aggreg = []
    for i, s in enumerate(scales):
        k1, k2 = jax.random.split(ks[1 + i % 2])
        aggreg.append([
            _init_depthwise(k1, 3 * total, s, dtype=dtype),
            # grouped 1x1: groups=3*heads => in-per-group = dim
            {"weight": (jax.random.normal(
                k2, (1, 1, dim, 3 * total), jnp.float32)
                / dim ** 0.5).astype(dtype)},
        ])
    return {
        "qkv": _init_conv_layer(ks[0], ch, 3 * total, 1, norm=False,
                                bias=False, dtype=dtype),
        "aggreg": aggreg,
        "proj": _init_conv_layer(ks[3], total * (1 + len(scales)), ch, 1,
                                 norm=True, bias=False, dtype=dtype),
    }


def init_params(key: Array, cfg: EViTSamConfig) -> Params:
    dtype = cfg.dtype
    ks = iter(jax.random.split(key, 256))
    stages = []

    # stage 0
    op_list = [_init_conv_layer(next(ks), 3, cfg.width_list[0], 3,
                                dtype=dtype)]
    for _ in range(cfg.depth_list[0]):
        op_list.append({"main": {
            "conv1": _init_conv_layer(next(ks), cfg.width_list[0],
                                      cfg.width_list[0], 3, dtype=dtype),
            "conv2": _init_conv_layer(next(ks), cfg.width_list[0],
                                      cfg.width_list[0], 3, dtype=dtype),
        }})
    stages.append({"op_list": op_list})

    cin = cfg.width_list[0]
    for sid in range(1, len(cfg.width_list)):
        w = cfg.width_list[sid]
        block = cfg.block_list[sid]
        fewer = cfg.fewer_norm_list[sid]
        expand_down = cfg.expand_list[sid] * 4
        down_kind = block if block in ("mb", "fmb") else "mb"
        if down_kind == "fmb":
            down = _init_fmb(next(ks), cin, w, expand_down,
                             fewer_norm=fewer, dtype=dtype)
        else:
            down = _init_mb(next(ks), cin, w, expand_down,
                            fewer_norm=fewer, dtype=dtype)
        op_list = [{"main": down}]
        cin = w
        for _ in range(cfg.depth_list[sid]):
            if block.startswith("att"):
                op_list.append({
                    "context_module": {"main": _init_litemla(
                        next(ks), cin, cfg.qkv_dim, _scales(block), dtype)},
                    "local_module": {"main": _init_mb(
                        next(ks), cin, cin, cfg.expand_list[sid],
                        fewer_norm=True, dtype=dtype)},
                })
            elif block == "fmb":
                op_list.append({"main": _init_fmb(
                    next(ks), cin, cin, cfg.expand_list[sid],
                    fewer_norm=fewer, dtype=dtype)})
            else:
                op_list.append({"main": _init_mb(
                    next(ks), cin, cin, cfg.expand_list[sid],
                    fewer_norm=fewer, dtype=dtype)})
        stages.append({"op_list": op_list})

    neck = {
        "input_ops": [{"op_list": [_init_conv_layer(
            next(ks), c, cfg.neck_width, 1, dtype=dtype)]}
            for c in cfg.neck_in_channels],
        "middle": {"op_list": [{"main": _init_fmb(
            next(ks), cfg.neck_width, cfg.neck_width, cfg.neck_expand,
            fewer_norm=False, dtype=dtype)}
            for _ in range(cfg.neck_depth)]},
        "output_ops": [{"op_list": [_init_conv_layer(
            next(ks), cfg.neck_width, cfg.neck_out_dim, 1, norm=False,
            bias=True, dtype=dtype)]}],
    }

    return {
        "backbone": {"stages": stages},
        "neck": neck,
        "norm": {"weight": jnp.ones((cfg.neck_out_dim,), dtype),
                 "bias": jnp.zeros((cfg.neck_out_dim,), dtype)},
    }
