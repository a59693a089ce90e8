"""EfficientViT building blocks, functional JAX (NHWC).

TPU re-design of the reference's conv/attention blocks
(reference: src/efficientvit/models/nn/ops.py): ConvLayer (conv + BN +
act), ResBlock, MBConv, FusedMBConv, and LiteMLA ReLU **linear**
attention (ops.py:335-454) — the O(N) attention that lets the SAM
encoder run 1024² images without quadratic cost. LiteMLA accumulates in
fp32 exactly like the reference's fp32-forced kernel (ops.py:404-409):
bf16 normalization around a 1e-15 epsilon denominator underflows.

Param trees mirror the torch module naming (ConvLayer -> {"conv",
"norm"}, MBConv -> {"inverted_conv", "depth_conv", "point_conv"}, ...)
so convert.state_dict_to_tree maps the reference checkpoint (xl1.pt)
mechanically. BatchNorm runs in inference form; ``fold_bn`` folds it
into the conv for the serving path.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array
Params = dict


def conv2d_raw(p: Params, x: Array, *, stride: int = 1, padding: int = 0,
               groups: int = 1) -> Array:
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def batch_norm(p: Params, x: Array, *, eps: float = 1e-5) -> Array:
    """Inference-mode BN over the channel (last) axis."""
    mean = p["running_mean"].astype(jnp.float32)
    var = p["running_var"].astype(jnp.float32)
    w = p["weight"].astype(jnp.float32)
    b = p["bias"].astype(jnp.float32)
    scale = w * jax.lax.rsqrt(var + eps)
    shift = b - mean * scale
    return (x.astype(jnp.float32) * scale + shift).astype(x.dtype)


def layer_norm_2d(p: Params, x: Array, *, eps: float = 1e-5) -> Array:
    """The reference's 'ln2d' (LayerNorm over channels of NCHW) == plain
    LayerNorm over the channel axis in NHWC (norm.py:14-20)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def act(name: Optional[str], x: Array) -> Array:
    if name is None:
        return x
    if name == "relu":
        return jax.nn.relu(x)
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if name == "hswish":
        return x * jax.nn.relu6(x + 3.0) / 6.0
    raise ValueError(name)


def conv_layer(p: Params, x: Array, *, kernel: int, stride: int = 1,
               groups: int = 1, act_func: Optional[str] = None) -> Array:
    """ConvLayer = conv (+BN if present) (+act) (ops.py:37-77)."""
    pad = kernel // 2
    y = conv2d_raw(p["conv"], x, stride=stride, padding=pad, groups=groups)
    if "norm" in p:
        y = batch_norm(p["norm"], y)
    return act(act_func, y)


def res_block(p: Params, x: Array, *, act_func: str = "gelu",
              stride: int = 1) -> Array:
    """conv3x3 act + conv3x3, used with an identity residual."""
    h = conv_layer(p["conv1"], x, kernel=3, stride=stride, act_func=act_func)
    return conv_layer(p["conv2"], h, kernel=3, act_func=None)


def fused_mbconv(p: Params, x: Array, *, stride: int = 1,
                 act_func: str = "gelu") -> Array:
    h = conv_layer(p["spatial_conv"], x, kernel=3, stride=stride,
                   act_func=act_func)
    return conv_layer(p["point_conv"], h, kernel=1, act_func=None)


def mbconv(p: Params, x: Array, *, stride: int = 1,
           act_func: str = "gelu") -> Array:
    h = conv_layer(p["inverted_conv"], x, kernel=1, act_func=act_func)
    mid = h.shape[-1]
    h = conv_layer(p["depth_conv"], h, kernel=3, stride=stride, groups=mid,
                   act_func=act_func)
    return conv_layer(p["point_conv"], h, kernel=1, act_func=None)


def lite_mla(p: Params, x: Array, *, dim: int = 32,
             scales: Sequence[int] = (3,), eps: float = 1e-15) -> Array:
    """ReLU linear attention with multi-scale token aggregation.

    q·(kᵀ·[v;1]) with a denominator channel, per head of width ``dim``
    (reference kernel: ops.py:404-441). All attention math in fp32.
    """
    b, hh, ww, c = x.shape
    qkv = conv_layer(p["qkv"], x, kernel=1)                 # [B,H,W,3D]
    total = qkv.shape[-1] // 3
    heads = total // dim

    multi = [qkv]
    for si, scale in enumerate(scales):
        agg = p["aggreg"][si]
        h1 = conv2d_raw(agg[0], qkv, padding=scale // 2, groups=3 * total)
        h1 = conv2d_raw(agg[1], h1, groups=3 * heads)
        multi.append(h1)
    stacked = jnp.concatenate(multi, axis=-1)               # [B,H,W,G*3D]

    n = hh * ww
    g = stacked.shape[-1] // (3 * dim)                      # heads * groups
    t = stacked.reshape(b, n, g, 3 * dim).astype(jnp.float32)
    t = t.transpose(0, 2, 1, 3)                             # [B, g, N, 3d]
    q, k, v = t[..., :dim], t[..., dim:2 * dim], t[..., 2 * dim:]
    q = jax.nn.relu(q)
    k = jax.nn.relu(k)
    v1 = jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)
    kv = jnp.einsum("bgnd,bgne->bgde", k, v1)               # [B,g,d,d+1]
    out = jnp.einsum("bgnd,bgde->bgne", q, kv)              # [B,g,N,d+1]
    out = out[..., :-1] / (out[..., -1:] + eps)
    out = out.transpose(0, 2, 1, 3).reshape(b, hh, ww, -1).astype(x.dtype)
    return conv_layer(p["proj"], out, kernel=1)


def evit_block(p: Params, x: Array, *, dim: int = 32,
               scales: Sequence[int] = (3,), act_func: str = "gelu") -> Array:
    """EfficientViTBlock = LiteMLA residual + MBConv residual
    (ops.py:457-493)."""
    x = x + lite_mla(p["context_module"]["main"], x, dim=dim, scales=scales)
    x = x + mbconv(p["local_module"]["main"], x, act_func=act_func)
    return x


import functools

import numpy as np


@functools.lru_cache(maxsize=64)
def _bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] interpolation matrix with torch's bicubic kernel
    (a=-0.75, align_corners=False, edge-clamped taps).

    jax.image.resize uses the Keys a=-0.5 cubic — the xl1 checkpoint was
    trained under torch semantics, so the neck must match torch exactly.
    Static sizes -> the matrix is a compile-time constant and the resize
    becomes two small matmuls.
    """
    a = -0.75

    def w(t):
        t = abs(t)
        if t <= 1.0:
            return (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
        if t < 2.0:
            return a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
        return 0.0

    m = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        base = int(np.floor(src))
        for k in range(-1, 3):
            j = base + k
            m[i, min(max(j, 0), n_in - 1)] += w(src - j)
    return m


def bicubic_resize(x: Array, size: tuple) -> Array:
    """torch-exact bicubic (align_corners=False) on NHWC via matmuls."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    mh = jnp.asarray(_bicubic_matrix(h_in, h_out))
    mw = jnp.asarray(_bicubic_matrix(w_in, w_out))
    xf = x.astype(jnp.float32)
    y = jnp.einsum("oh,bhwc->bowc", mh, xf)
    y = jnp.einsum("ow,bhwc->bhoc", mw, y)
    return y.astype(x.dtype)


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] torch-exact bilinear (align_corners=False)."""
    m = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = max((i + 0.5) * scale - 0.5, 0.0)
        j0 = int(np.floor(src))
        frac = src - j0
        j1 = min(j0 + 1, n_in - 1)
        j0 = min(j0, n_in - 1)
        m[i, j0] += 1.0 - frac
        m[i, j1] += frac
    return m


def bilinear_resize(x: Array, size: tuple) -> Array:
    """torch-exact bilinear (align_corners=False) on NHWC via matmuls."""
    mh = jnp.asarray(_bilinear_matrix(x.shape[1], size[0]))
    mw = jnp.asarray(_bilinear_matrix(x.shape[2], size[1]))
    xf = x.astype(jnp.float32)
    y = jnp.einsum("oh,bhwc->bowc", mh, xf)
    y = jnp.einsum("ow,bhwc->bhoc", mw, y)
    return y.astype(x.dtype)


@functools.lru_cache(maxsize=64)
def _bilinear_ac_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] torch-exact bilinear with align_corners=True
    (src = i * (n_in-1)/(n_out-1)); DPT's fusion/head upsampling uses
    this convention (transformers DPTFeatureFusionLayer align_corners)."""
    m = np.zeros((n_out, n_in), np.float32)
    scale = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
    for i in range(n_out):
        src = i * scale
        j0 = int(np.floor(src))
        frac = src - j0
        j1 = min(j0 + 1, n_in - 1)
        m[i, j0] += 1.0 - frac
        m[i, j1] += frac
    return m


def bilinear_resize_ac(x: Array, size: tuple) -> Array:
    """torch-exact bilinear (align_corners=True) on NHWC via matmuls."""
    mh = jnp.asarray(_bilinear_ac_matrix(x.shape[1], size[0]))
    mw = jnp.asarray(_bilinear_ac_matrix(x.shape[2], size[1]))
    xf = x.astype(jnp.float32)
    y = jnp.einsum("oh,bhwc->bowc", mh, xf)
    y = jnp.einsum("ow,bhwc->bhoc", mw, y)
    return y.astype(x.dtype)
