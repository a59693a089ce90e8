"""Multi-head attention with OMG's control semantics as explicit inputs.

The torch reference implements its three attention behaviours by swapping
diffusers AttnProcessors at runtime:
  * prompt-to-prompt replace  (reference: src/prompt_attention/p2p_attention.py:124-147,
    installed by src/pipelines/lora_pipeline.py:136-152 on every layer)
  * IP-Adapter dual cross-attention (reference:
    src/ip_adapter/attention_processor.py:296-424)
  * LoRA deltas on the q/k/v/out projections (PEFT-injected).

Here they are *arguments*: ``mha`` takes an optional ``probs_transform``
(a pure function of the attention probabilities, used by the P2P
controller), optional ``ip`` params + context (dual K/V scale-add), and
optional ``lora`` deltas per projection. One function, one compiled
program, every behaviour toggled by inputs.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from omg_tpu.nn import layers

Array = jax.Array
Params = dict

# probs_transform(probs, *, is_cross) -> probs, applied to [B, H, Nq, Nk]
ProbsTransform = Callable[..., Array]


def init_mha(key: Array, query_dim: int, *, context_dim: Optional[int] = None,
             num_heads: int, head_dim: int, out_bias: bool = True,
             dtype: Any = jnp.float32, qkv_bias: bool = False) -> Params:
    """Projection params named after diffusers Attention (to_q/to_k/to_v/to_out)."""
    inner = num_heads * head_dim
    ctx = context_dim if context_dim is not None else query_dim
    ks = jax.random.split(key, 4)
    return {
        "to_q": layers.init_linear(ks[0], query_dim, inner, bias=qkv_bias, dtype=dtype),
        "to_k": layers.init_linear(ks[1], ctx, inner, bias=qkv_bias, dtype=dtype),
        "to_v": layers.init_linear(ks[2], ctx, inner, bias=qkv_bias, dtype=dtype),
        "to_out": layers.init_linear(ks[3], inner, query_dim, bias=out_bias, dtype=dtype),
    }


def init_ip_kv(key: Array, context_dim: int, inner_dim: int,
               dtype: Any = jnp.float32) -> Params:
    """IP-Adapter extra K/V projections (reference: attention_processor.py:316-317)."""
    k1, k2 = jax.random.split(key)
    return {
        "to_k_ip": layers.init_linear(k1, context_dim, inner_dim, bias=False, dtype=dtype),
        "to_v_ip": layers.init_linear(k2, context_dim, inner_dim, bias=False, dtype=dtype),
    }


def _split_heads(x: Array, num_heads: int) -> Array:
    b, n, _ = x.shape
    return x.reshape(b, n, num_heads, -1).transpose(0, 2, 1, 3)


def _merge_heads(x: Array) -> Array:
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def sdpa(q: Array, k: Array, v: Array, *, mask: Optional[Array] = None) -> Array:
    """Scaled dot-product attention on [B, H, N, D]; fp32 softmax.

    Large dense self-attention routes to the Pallas flash kernel on TPU
    (omg_tpu.ops.flash_attention) — O(N·D) HBM traffic instead of the
    O(N²) score materialization XLA would emit.
    """
    from omg_tpu.ops import flash_attention as fa
    if mask is None:
        seq = fa.seq_context()
        if seq is not None:
            # sequence-sharded self-attention (spatial stage-1 layout):
            # local query block x all-gathered K/V per chip. Cross
            # attention (nq != nk, 77-token K/V) and ineligible shapes
            # fall through to the XLA einsum, which GSPMD partitions
            # over the token axis with its own K/V gather.
            mesh, lane_ax, seq_ax, interpret = seq
            ns = fa._axis_size(mesh, seq_ax)
            nl = fa._axis_size(mesh, lane_ax)
            if (q.shape[2] == k.shape[2] and q.shape[0] % max(nl, 1) == 0
                    and q.shape[2] % ns == 0
                    and fa.use_flash(q.shape[2] // ns, k.shape[2],
                                     q.shape[3], allow_interpret=interpret,
                                     seq_local=True)):
                return fa.flash_attention_seq_sharded(
                    q, k, v, mesh=mesh, lane_axis=lane_ax,
                    seq_axis=seq_ax, interpret=interpret)
        ctx = fa.lane_context()
        if ctx is not None:
            # lane-sharded batch (multi-chip latency mode): shard_map the
            # kernel over the lane axis so each chip keeps its own lanes
            mesh, axis, interpret = ctx
            n = mesh.shape[axis]
            if (q.shape[0] % n == 0
                    and fa.use_flash(q.shape[2], k.shape[2], q.shape[3],
                                     allow_interpret=interpret)):
                return fa.flash_attention_sharded(
                    q, k, v, mesh=mesh, axis=axis, interpret=interpret)
            # batch not divisible by the lane axis: do NOT fall through
            # to the unsharded Pallas call — GSPMD cannot partition the
            # custom call and would all-gather + replicate it on every
            # chip (the round-1 silent-bypass failure mode); XLA sdpa
            # below partitions fine
        elif fa.use_flash(q.shape[2], k.shape[2], q.shape[3]):
            return fa.flash_attention(q, k, v)
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def sdpa_with_probs(q: Array, k: Array, v: Array, *,
                    probs_transform: ProbsTransform,
                    is_cross: bool,
                    mask: Optional[Array] = None) -> Array:
    """Attention with materialized, transformable probabilities.

    This is the XLA path for prompt-to-prompt control (the Pallas fused
    kernel in omg_tpu.ops is the optimized equivalent). The reference
    materializes probs on every hooked layer the same way
    (reference: src/pipelines/lora_pipeline.py:98-116).
    """
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs_transform(probs, is_cross=is_cross)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def mha(p: Params, x: Array, *, num_heads: int,
        context: Optional[Array] = None,
        mask: Optional[Array] = None,
        lora: Optional[Params] = None,
        ip: Optional[Params] = None,
        ip_context: Optional[Array] = None,
        ip_scale: float | Array = 1.0,
        ip_lora: Optional[Params] = None,
        probs_transform: Optional[ProbsTransform] = None,
        p2p=None) -> Array:
    """Multi-head attention over [B, N, C] tokens.

    context=None => self-attention. With ``ip``/``ip_context`` set, runs the
    IP-Adapter decoupled cross-attention: a second attention over the image
    tokens added with ``ip_scale`` (reference: attention_processor.py:383-409).

    ``p2p`` is a P2PStepControl: prompt-to-prompt edits applied in the
    O(N²)-free lane formulation (no materialized probabilities — the
    reference's hooks at lora_pipeline.py:98-116 materialize full prob
    matrices on every controlled layer; see control/p2p.py for why the
    lane form is mathematically identical).
    """
    is_cross = context is not None
    ctx = context if is_cross else x

    def la(name):
        return None if lora is None else lora.get(name)

    def lora_delta(name, inp):
        d = la(name)
        if d is None:
            return None
        down = d["down"].astype(inp.dtype)
        up = d["up"].astype(inp.dtype)
        scale = d["scale"].astype(inp.dtype)
        if down.ndim == 3:   # per-lane (see layers.linear)
            delta = jnp.matmul(jnp.matmul(inp, down), up)
            scale = scale.reshape((-1,) + (1,) * (inp.ndim - 1))
        else:
            delta = jnp.dot(jnp.dot(inp, down), up)
        return delta * scale

    no_bias = ("bias" not in p["to_q"] and "bias" not in p["to_k"]
               and "bias" not in p["to_v"])
    # the fused single-GEMM path requires EVERY member to share one
    # layout: quantize_unet_params' min_dim gate can leave e.g. a small
    # to_k/to_v unquantized next to a quantized to_q — mixed groups must
    # take the per-projection path (layers.linear handles either layout)
    _qkv_q = ["weight_q" in p[n] for n in ("to_q", "to_k", "to_v")]
    fusable_qkv = all(_qkv_q) or not any(_qkv_q)
    fusable_kv = (("weight_q" in p["to_k"]) == ("weight_q" in p["to_v"]))

    def fused_matmul(inp, names, splits):
        """One GEMM over the concatenated projections (bf16 or int8 —
        per-output-channel scales concatenate exactly). Callers only
        fuse groups whose members share one layout."""
        if "weight_q" in p[names[0]]:
            from omg_tpu.ops.quant import int8_matmul
            wq = jnp.concatenate([p[n]["weight_q"] for n in names], axis=1)
            ws = jnp.concatenate([p[n]["w_scale"] for n in names])
            return jnp.split(int8_matmul(inp, wq, ws), splits, axis=-1)
        w = jnp.concatenate([p[n]["weight"] for n in names], axis=1)
        return jnp.split(jnp.dot(inp, w), splits, axis=-1)

    if no_bias and not is_cross and fusable_qkv:
        # fused qkv: one [C, 3*inner] gemm (same input for q/k/v)
        q, k, v = fused_matmul(x, ("to_q", "to_k", "to_v"), 3)
        for name, ref in (("to_q", 0), ("to_k", 1), ("to_v", 2)):
            d = lora_delta(name, x)
            if d is not None:
                if ref == 0:
                    q = q + d
                elif ref == 1:
                    k = k + d
                else:
                    v = v + d
    elif no_bias and is_cross and fusable_kv:
        # fused kv over the context
        q = layers.linear(p["to_q"], x, la("to_q"))
        k, v = fused_matmul(ctx, ("to_k", "to_v"), 2)
        for name, is_k in (("to_k", True), ("to_v", False)):
            d = lora_delta(name, ctx)
            if d is not None:
                if is_k:
                    k = k + d
                else:
                    v = v + d
    else:
        q = layers.linear(p["to_q"], x, la("to_q"))
        k = layers.linear(p["to_k"], ctx, la("to_k"))
        v = layers.linear(p["to_v"], ctx, la("to_v"))

    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)

    p2p_active = p2p is not None and p2p.wants(is_cross=is_cross,
                                              num_queries=x.shape[1])
    # one-lane-per-chip latency mode: route the P2P row edits through
    # the explicit shard_map forms (ppermute exactly the src rows) —
    # GSPMD's generic lowering of the .at[lane].set edits moved ~6 full
    # q-sized tensors per controlled layer (measured, 3.8 GB/step)
    from omg_tpu.ops import flash_attention as _fa
    _lane = _fa.lane_context()
    lane_shard_p2p = (
        p2p_active and _lane is not None
        and p2p._lane_mesh_ok(_lane[0], _lane[1], x.shape[0]))
    if p2p_active and not is_cross:
        if lane_shard_p2p:
            qh, kh = p2p.self_lane_qk_sharded(qh, kh, _lane[0], _lane[1])
        else:
            qh, kh = p2p.self_lane_qk(qh, kh)

    if probs_transform is not None:
        out = sdpa_with_probs(qh, kh, vh, probs_transform=probs_transform,
                              is_cross=is_cross, mask=mask)
    else:
        out = sdpa(qh, kh, vh, mask=mask)

    if p2p_active and is_cross:
        if lane_shard_p2p:
            out = p2p.cross_lane_out_sharded(
                out, qh, kh, vh, lambda q_, k_, v_: sdpa(q_, k_, v_),
                _lane[0], _lane[1])
        else:
            out = p2p.cross_lane_out(out, qh, kh, vh,
                                     lambda q_, k_, v_: sdpa(q_, k_, v_))

    if ip is not None and ip_context is not None:
        def ipla(name):
            return None if ip_lora is None else ip_lora.get(name)
        k_ip = _split_heads(layers.linear(ip["to_k_ip"], ip_context, ipla("to_k_ip")), num_heads)
        v_ip = _split_heads(layers.linear(ip["to_v_ip"], ip_context, ipla("to_v_ip")), num_heads)
        ip_out = sdpa(qh, k_ip, v_ip)
        out = out + jnp.asarray(ip_scale, out.dtype) * ip_out

    out = _merge_heads(out)
    return layers.linear(p["to_out"], out, la("to_out"))
