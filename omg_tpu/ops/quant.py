"""Int8 W8A8 quantized serving mode for the UNet's transformer GEMMs.

Motivation (measured on the bench chip, tools/tpu_probe_gemm.py): the
v5e's *achievable* bf16 GEMM rate through this environment is ~110
TFLOP/s and the bf16 UNet step already runs at ~109 TFLOP/s effective —
classic kernel/layout tuning is exhausted. The remaining single-chip
lever is the MXU's int8 path (394 TOPS peak; the probe's dynamic-W8A8
GEMM runs 1.4x the bf16 GEMM at the ff shape).

Scheme (the conservative, production-standard one):
  * weights: per-output-channel symmetric int8
    (scale = max|w_col| / 127) — exact layout the MXU consumes;
  * activations: dynamic per-token symmetric int8 (abs-max over the
    feature axis at runtime) — no calibration data needed, tracks the
    wildly step-dependent activation ranges of diffusion UNets;
  * accumulate in int32, dequantize into bf16, LoRA deltas and biases
    stay bf16 ON TOP of the quantized base matmul (adapters keep full
    precision).

Scope: the transformer-block projections + ff + proj_in/out — ~70% of
the UNet's FLOPs. Convs, norms, attention itself, time embeddings, VAE
and text encoders stay bf16/fp32. This mode is OPT-IN (approximate):
`OMG_BENCH_QUANT=int8` on the bench, `quantize="int8"` on the engine;
the default path remains exact reference-parity bf16.

The reference has no quantized mode; this is a TPU-serving addition.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

Array = jax.Array
Params = dict

# Param-tree keys under which 2-D linear weights are safe to quantize.
_QUANT_SCOPES = ("transformer_blocks", "transformer_blocks_stacked",
                 "proj_in", "proj_out")


def quantize_linear(p: Params) -> Params:
    """{"weight": [in, out], "bias"?} -> int8 weights + per-column scale.

    The returned dict REPLACES "weight" with ("weight_q", "w_scale");
    layers.linear and nn.attention.mha detect the quantized layout.
    """
    w = p["weight"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"weight_q": wq, "w_scale": scale[0]}        # scale: [out]
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def int8_matmul(x: Array, wq: Array, w_scale: Array) -> Array:
    """Dynamic per-token W8A8 matmul: x [..., in] @ wq [in, out] (or
    per-lane stacked wq [B, in, out]) -> [..., out] in x.dtype."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    if wq.ndim == 3:
        y = jax.lax.dot_general(
            xq, wq, (((xq.ndim - 1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
    else:
        y = jax.lax.dot_general(
            xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    ws = w_scale.astype(jnp.float32)
    if wq.ndim == 3 and y.ndim == 3 and ws.ndim == 2:
        ws = ws[:, None, :]   # [B, out] -> broadcast against [B, N, out]
    return (y.astype(jnp.float32) * sx * ws).astype(x.dtype)


def _is_linear(node) -> bool:
    return (isinstance(node, dict) and "weight" in node
            and getattr(node["weight"], "ndim", 0) == 2)


def quantize_unet_params(params: Params, *, min_dim: int = 16) -> Params:
    """Quantize every transformer linear with min(shape) >= min_dim.

    Works on both the unpacked tree and pack_params' scan-stacked layout
    (stacked leaves are [depth, in, out]; quantization is applied
    per-depth-slice via vmap so each block keeps its own scales).
    """
    def quantize_stacked(node):
        w = node["weight"].astype(jnp.float32)          # [D, in, out]
        scale = jnp.maximum(
            jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0, 1e-12)
        wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        out = {"weight_q": wq, "w_scale": scale[:, 0]}  # [D, out]
        if "bias" in node:
            out["bias"] = node["bias"]
        return out

    def walk(node, in_scope: bool):
        if isinstance(node, dict):
            if in_scope and _is_linear(node) \
                    and min(node["weight"].shape) >= min_dim:
                return quantize_linear(node)
            if in_scope and isinstance(node.get("weight"), jax.Array) \
                    and node["weight"].ndim == 3 \
                    and min(node["weight"].shape[1:]) >= min_dim:
                return quantize_stacked(node)
            return {k: walk(v, in_scope or k in _QUANT_SCOPES)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, in_scope) for v in node)
        return node

    return walk(params, False)
