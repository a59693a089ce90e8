"""Core functional layers over nested-dict parameter pytrees.

Conventions (chosen so torch->JAX weight conversion is a pure reshape):
  * ``linear``:  weight [in, out]  (torch nn.Linear stores [out, in])
  * ``conv2d``:  weight [H, W, in, out] (HWIO; torch stores OIHW), NHWC data
  * norms:       weight/bias [C]
  * Activations/statistics run in fp32 and are cast back to the compute
    dtype; matmuls/convs run in the input dtype (bf16 on TPU => MXU).

LoRA: every ``linear`` accepts an optional low-rank delta
``{"down": [in, r], "up": [r, out], "scale": ()}`` applied as
``y += scale * (x @ down) @ up`` — the runtime equivalent of the
reference's PEFT adapter injection (reference: inference_lora.py:162-170,
src/pipelines/lora_pipeline.py:336-347) without weight mutation, so one
compiled UNet serves the base model and every concept model.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

Params = dict
Array = jax.Array


# --------------------------------------------------------------------------
# Initializers
# --------------------------------------------------------------------------

def _kaiming(key: Array, shape: tuple, fan_in: int, dtype: Any) -> Array:
    scale = 1.0 / math.sqrt(max(fan_in, 1))
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_linear(key: Array, in_dim: int, out_dim: int, *, bias: bool = True,
                dtype: Any = jnp.float32, zero: bool = False) -> Params:
    if zero:
        w = jnp.zeros((in_dim, out_dim), dtype)
    else:
        w = _kaiming(key, (in_dim, out_dim), in_dim, dtype)
    p = {"weight": w}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def init_conv2d(key: Array, in_ch: int, out_ch: int, kernel: int, *,
                bias: bool = True, dtype: Any = jnp.float32,
                zero: bool = False) -> Params:
    fan_in = in_ch * kernel * kernel
    if zero:
        w = jnp.zeros((kernel, kernel, in_ch, out_ch), dtype)
    else:
        w = _kaiming(key, (kernel, kernel, in_ch, out_ch), fan_in, dtype)
    p = {"weight": w}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def init_norm(dim: int, dtype: Any = jnp.float32) -> Params:
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_embedding(key: Array, num: int, dim: int, dtype: Any = jnp.float32) -> Params:
    return {"weight": (jax.random.normal(key, (num, dim), jnp.float32) * 0.02).astype(dtype)}


# --------------------------------------------------------------------------
# Forward ops
# --------------------------------------------------------------------------

def linear(p: Params, x: Array, lora: Optional[Params] = None) -> Array:
    if "weight_q" in p:
        # int8 W8A8 serving mode (ops/quant.py): quantized base matmul;
        # bias and LoRA deltas stay full-precision on top.
        from omg_tpu.ops.quant import int8_matmul
        y = int8_matmul(x, p["weight_q"], p["w_scale"])
    else:
        y = jnp.dot(x, p["weight"])
    if lora is not None:
        down = lora["down"].astype(x.dtype)
        up = lora["up"].astype(x.dtype)
        scale = lora["scale"].astype(y.dtype)
        if down.ndim == 3:
            # Per-lane LoRA: down [B, in, r], up [B, r, out], scale [B].
            # Lets one batched UNet forward serve several concepts, each
            # with its own adapter (multiconcept concept-lane batching).
            delta = jnp.matmul(jnp.matmul(x, down), up)
            scale = scale.reshape((-1,) + (1,) * (x.ndim - 1))
        else:
            delta = jnp.dot(jnp.dot(x, down), up)
        y = y + delta * scale
    if "bias" in p:
        y = y + p["bias"]
    return y


def conv2d(p: Params, x: Array, *, stride: int = 1, padding: int = 1) -> Array:
    """NHWC conv. padding is symmetric spatial padding in pixels."""
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def group_norm(p: Params, x: Array, *, num_groups: int, eps: float = 1e-5) -> Array:
    """GroupNorm over the channel (last) axis of NHWC / [..., C] data."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = xf.shape[-1]
    g = num_groups
    grouped = xf.reshape(xf.shape[:-1] + (g, c // g))
    # Reduce over all non-batch, non-group axes: spatial dims + intra-group.
    axes = tuple(range(1, grouped.ndim - 2)) + (grouped.ndim - 1,)
    mean = grouped.mean(axes, keepdims=True)
    var = grouped.var(axes, keepdims=True)
    normed = (grouped - mean) * jax.lax.rsqrt(var + eps)
    normed = normed.reshape(xf.shape)
    out = normed * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def layer_norm(p: Params, x: Array, *, eps: float = 1e-5) -> Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def silu(x: Array) -> Array:
    return jax.nn.silu(x)


def gelu(x: Array) -> Array:
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


def geglu(p: Params, x: Array, lora: Optional[Params] = None) -> Array:
    """diffusers GEGLU feed-forward gate: proj to 2*dim, gelu-gate."""
    h = linear(p, x, lora)
    h, gate = jnp.split(h, 2, axis=-1)
    return h * gelu(gate)


def timestep_embedding(timesteps: Array, dim: int, *,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> Array:
    """Sinusoidal timestep embedding, diffusers-compatible.

    SDXL uses flip_sin_to_cos=True, downscale_freq_shift=0 for both the
    timestep embedding and the add_time_ids micro-conditioning embedding.
    Always computed in fp32 (the frequencies underflow bf16).
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


def upsample_nearest_2x(x: Array) -> Array:
    """Nearest-neighbour 2x upsample on NHWC."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool_2x(x: Array) -> Array:
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def nearest_resize(x: Array, size: tuple) -> Array:
    """Nearest-neighbour resize of NHWC or HW arrays to `size` (H, W).

    Matches torch F.interpolate(mode='nearest') index arithmetic
    (floor(i * in/out)), which the reference uses to bring masks to
    latent resolution (reference: src/pipelines/lora_pipeline.py:578-580).
    """
    spatial_axes = (0, 1) if x.ndim == 2 else (1, 2)
    h_in, w_in = x.shape[spatial_axes[0]], x.shape[spatial_axes[1]]
    h_out, w_out = size
    rows = jnp.floor(jnp.arange(h_out) * (h_in / h_out)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w_out) * (w_in / w_out)).astype(jnp.int32)
    x = jnp.take(x, rows, axis=spatial_axes[0])
    x = jnp.take(x, cols, axis=spatial_axes[1])
    return x
