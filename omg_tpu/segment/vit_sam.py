"""SAM ViT-H image encoder, TPU-native (NHWC).

The reference offers two segmentation stacks (reference:
inference_lora.py:92-124): 'GroundingDINO' pairs GroundingDINO boxes
with the ORIGINAL SAM ViT-H (the segment_anything pip package's
ImageEncoderViT, whose prompt-encoder/mask-decoder halves are already
ported in segment/sam_decoder.py), while 'yoloworld' pairs YOLO-World
with EfficientViT-SAM (segment/efficientvit.py). This module completes
the pair natively: ViT-H/16 with decomposed relative-position attention
and 14x14 windowed blocks (global attention at layers 7/15/23/31),
followed by the two-conv 256-channel neck. It produces the same
[B, 64, 64, 256] embedding grid the decoder consumes, so SamPredictor /
SamMaskProvider work unchanged with either encoder.

TPU notes: everything is NHWC; the encoder runs ONCE per generated
image between the OMG stages (off the denoise hot loop), so the design
goal is clean XLA fusion, not a bespoke kernel — attention is plain
batched GEMMs the MXU tiles well, and the rel-pos tables are gathered
host-free with static indices (q_size == k_size always holds here, so
the torch implementation's interpolation path is statically dead).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = dict


@dataclasses.dataclass(frozen=True)
class VitSamConfig:
    image_size: int = 1024
    patch_size: int = 16
    dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: int = 4
    window_size: int = 14
    # segment_anything's ViT-H: global attention every 8th block
    global_attn_indexes: Sequence[int] = (7, 15, 23, 31)
    out_chans: int = 256
    dtype: Any = jnp.float32


def vit_h_config() -> VitSamConfig:
    """SAM-ViT-H/16 (sam_vit_h_4b8939.pth geometry)."""
    return VitSamConfig()


def vit_l_config() -> VitSamConfig:
    """SAM-ViT-L (sam_vit_l_0b3195.pth)."""
    return VitSamConfig(dim=1024, depth=24,
                        global_attn_indexes=(5, 11, 17, 23))


def vit_b_config() -> VitSamConfig:
    """SAM-ViT-B (sam_vit_b_01ec64.pth)."""
    return VitSamConfig(dim=768, depth=12, num_heads=12,
                        global_attn_indexes=(2, 5, 8, 11))


def config_from_params(p: Params) -> VitSamConfig:
    """Geometry derived from a converted tree, so ViT-B/L/H checkpoints
    all resolve correctly (hardcoding H would silently corrupt B/L:
    JAX's gather CLAMPS out-of-range rel-pos indices rather than
    erroring, so wrong global_attn_indexes produce wrong masks, not a
    crash)."""
    pe = p["pos_embed"]                       # [1, g, g, dim]
    g, dim = int(pe.shape[1]), int(pe.shape[-1])
    patch = int(p["patch_embed"]["proj"]["weight"].shape[0])
    blocks = p["blocks"]
    head_dim = int(blocks[0]["attn"]["rel_pos_h"].shape[-1])
    # a block is global iff its rel-pos table spans the full grid
    glb = tuple(i for i, b in enumerate(blocks)
                if int(b["attn"]["rel_pos_h"].shape[0]) == 2 * g - 1)
    windows = sorted({(int(b["attn"]["rel_pos_h"].shape[0]) + 1) // 2
                      for i, b in enumerate(blocks) if i not in glb})
    mlp_hidden = int(blocks[0]["mlp"]["lin1"]["weight"].shape[-1])
    return VitSamConfig(
        image_size=g * patch, patch_size=patch, dim=dim,
        depth=len(blocks), num_heads=dim // head_dim,
        mlp_ratio=mlp_hidden // dim,
        window_size=windows[0] if windows else 0,
        global_attn_indexes=glb,
        out_chans=int(p["neck"][0]["weight"].shape[-1]))


def tiny_config() -> VitSamConfig:
    """CPU-testable miniature: one windowed (with padding) + one global
    block at a 4x4 token grid."""
    return VitSamConfig(image_size=64, patch_size=16, dim=16, depth=2,
                        num_heads=2, window_size=3,
                        global_attn_indexes=(1,), out_chans=8)


# --------------------------------------------------------------------------
# Ops
# --------------------------------------------------------------------------

_LN_EPS = 1e-6  # segment_anything uses LayerNorm(eps=1e-6) throughout


def _layer_norm(p: Params, x: Array) -> Array:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
    return (y * p["weight"] + p["bias"]).astype(x.dtype)


def _linear(p: Params, x: Array) -> Array:
    y = x @ p["weight"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _conv(w: Array, x: Array, *, stride: int = 1, padding: int = 0) -> Array:
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _rel_pos_select(table: Array, size: int) -> Array:
    """[2*size-1, head_dim] -> [size, size, head_dim] at offsets (i - j).

    The torch get_rel_pos (segment_anything image_encoder.py) also
    handles q_size != k_size by interpolation; here q_size == k_size
    always (square windows / square global grid), so selection is a
    static gather.
    """
    idx = np.arange(size)[:, None] - np.arange(size)[None, :] + size - 1
    return table[jnp.asarray(idx)]


def _attention(p: Params, x: Array, *, num_heads: int) -> Array:
    """Decomposed-rel-pos attention over an NHWC token grid.

    Mirrors segment_anything's Attention.forward +
    add_decomposed_rel_pos: logits get per-axis relative position terms
    rel_h[b,m,q_h,q_w,k_h] and rel_w[b,m,q_h,q_w,k_w] before one softmax
    over the flattened key grid.
    """
    b, h, w, c = x.shape
    hd = c // num_heads
    scale = hd ** -0.5
    qkv = _linear(p["qkv"], x.reshape(b, h * w, c))
    qkv = qkv.reshape(b, h * w, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]          # [b, m, N, hd]

    logits = jnp.einsum("bmqc,bmkc->bmqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    rh = _rel_pos_select(p["rel_pos_h"], h)    # [h, h, hd]
    rw = _rel_pos_select(p["rel_pos_w"], w)    # [w, w, hd]
    r_q = q.reshape(b, num_heads, h, w, hd)
    rel_h = jnp.einsum("bmhwc,hkc->bmhwk", r_q, rh.astype(q.dtype))
    rel_w = jnp.einsum("bmhwc,wkc->bmhwk", r_q, rw.astype(q.dtype))
    logits = (logits.reshape(b, num_heads, h, w, h, w)
              + rel_h[..., :, None] + rel_w[..., None, :]
              ).reshape(b, num_heads, h * w, h * w)

    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bmqk,bmkc->bmqc", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
    return _linear(p["proj"], out)


def _window_partition(x: Array, ws: int) -> Tuple[Array, Tuple[int, int]]:
    """NHWC -> [B*nW, ws, ws, C] with bottom/right zero padding."""
    b, h, w, c = x.shape
    ph, pw = (-h) % ws, (-w) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def _window_unpartition(x: Array, ws: int, padded: Tuple[int, int],
                        out: Tuple[int, int]) -> Array:
    hp, wp = padded
    h, w = out
    b = x.shape[0] // ((hp // ws) * (wp // ws))
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _block(p: Params, x: Array, cfg: VitSamConfig, *, windowed: bool) -> Array:
    shortcut = x
    y = _layer_norm(p["norm1"], x)
    if windowed:
        h, w = y.shape[1:3]
        y, padded = _window_partition(y, cfg.window_size)
        y = _attention(p["attn"], y, num_heads=cfg.num_heads)
        y = _window_unpartition(y, cfg.window_size, padded, (h, w))
    else:
        y = _attention(p["attn"], y, num_heads=cfg.num_heads)
    x = shortcut + y
    y = _layer_norm(p["norm2"], x)
    y = _linear(p["mlp"]["lin1"], y)
    y = jax.nn.gelu(y, approximate=False)
    y = _linear(p["mlp"]["lin2"], y)
    return x + y


def _layer_norm_2d(p: Params, x: Array) -> Array:
    # channels-last equivalent of segment_anything's LayerNorm2d
    return _layer_norm(p, x)


def encoder_apply(p: Params, cfg: VitSamConfig, x: Array) -> Array:
    """[B, S, S, 3] normalized image -> [B, S/16, S/16, out_chans]."""
    x = _conv(p["patch_embed"]["proj"]["weight"], x,
              stride=cfg.patch_size) + p["patch_embed"]["proj"]["bias"]
    x = x + p["pos_embed"].astype(x.dtype)
    glb = frozenset(cfg.global_attn_indexes)
    for i, bp in enumerate(p["blocks"]):
        x = _block(bp, x, cfg, windowed=(cfg.window_size > 0
                                         and i not in glb))
    # neck: conv1x1 -> LN2d -> conv3x3 -> LN2d (no biases on the convs)
    x = _conv(p["neck"][0]["weight"], x)
    x = _layer_norm_2d(p["neck"][1], x)
    x = _conv(p["neck"][2]["weight"], x, padding=1)
    x = _layer_norm_2d(p["neck"][3], x)
    return x


# --------------------------------------------------------------------------
# Checkpoint conversion (sam_vit_h_4b8939.pth image_encoder.* keys)
# --------------------------------------------------------------------------

def convert_encoder(sd: dict, *, dtype: Any = jnp.float32) -> Params:
    """Flat ``image_encoder.``-stripped torch state dict -> param tree.

    Not routed through convert.state_dict_to_tree: its generic 4D rule
    (OIHW -> HWIO) would scramble ``pos_embed``, which torch already
    stores token-major [1, H, W, C], and the 2D ``rel_pos_h/w`` tables
    must stay untransposed.
    """
    from omg_tpu.convert import _insert, _listify

    tree: dict = {}
    for key, val in sd.items():
        arr = np.asarray(val)
        if arr.dtype in (np.float16, np.float64):
            arr = arr.astype(np.float32)
        if key.endswith(".weight") and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)            # conv OIHW -> HWIO
        elif key.endswith(".weight") and arr.ndim == 2:
            arr = arr.T                                # linear -> [in, out]
        path = [int(t) if t.isdigit() else t for t in key.split(".")]
        _insert(tree, path, jnp.asarray(arr, dtype))
    return _listify(tree)


# --------------------------------------------------------------------------
# Random init (tests / benchmarks)
# --------------------------------------------------------------------------

def init_params(key: Array, cfg: VitSamConfig) -> Params:
    ks = iter(jax.random.split(key, 16 + 16 * cfg.depth))
    dt = cfg.dtype

    def lin(din, dout, scale=0.02):
        return {"weight": jax.random.normal(next(ks), (din, dout), dt) * scale,
                "bias": jnp.zeros((dout,), dt)}

    def ln(d):
        return {"weight": jnp.ones((d,), dt), "bias": jnp.zeros((d,), dt)}

    g = cfg.image_size // cfg.patch_size
    d = cfg.dim
    blocks = []
    for i in range(cfg.depth):
        size = g if i in cfg.global_attn_indexes else cfg.window_size
        blocks.append({
            "norm1": ln(d), "norm2": ln(d),
            "attn": {
                "qkv": lin(d, 3 * d),
                "proj": lin(d, d),
                "rel_pos_h": jax.random.normal(
                    next(ks), (2 * size - 1, d // cfg.num_heads), dt) * 0.02,
                "rel_pos_w": jax.random.normal(
                    next(ks), (2 * size - 1, d // cfg.num_heads), dt) * 0.02,
            },
            "mlp": {"lin1": lin(d, cfg.mlp_ratio * d),
                    "lin2": lin(cfg.mlp_ratio * d, d)},
        })
    return {
        "patch_embed": {"proj": {
            "weight": jax.random.normal(
                next(ks), (cfg.patch_size, cfg.patch_size, 3, d), dt) * 0.02,
            "bias": jnp.zeros((d,), dt)}},
        "pos_embed": jax.random.normal(next(ks), (1, g, g, d), dt) * 0.02,
        "blocks": blocks,
        "neck": [
            {"weight": jax.random.normal(
                next(ks), (1, 1, d, cfg.out_chans), dt) * 0.02},
            ln(cfg.out_chans),
            {"weight": jax.random.normal(
                next(ks), (3, 3, cfg.out_chans, cfg.out_chans), dt) * 0.02},
            ln(cfg.out_chans),
        ],
    }
