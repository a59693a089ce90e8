"""Perceiver Resampler for IP-Adapter / InstantID, functional JAX.

Projects an identity embedding (InstantID: a 512-d ArcFace vector) into
``num_queries`` image-prompt tokens consumed by the UNet's decoupled IP
cross-attention (reference: src/ip_adapter/resampler.py:77-120, wired at
src/pipelines/instantid_single_pieline.py:163-184 with dim=1280, depth=4,
heads=20, 16 queries -> cross_attention_dim).

Param layout mirrors the torch checkpoint ('image_proj' half of the
InstantID .bin): learned ``latents``, proj_in/proj_out, norm_out, and
``layers[i] = [attention, feed_forward]`` where the feed-forward is a
Sequential keyed {0: LayerNorm, 1: Linear, 3: Linear} — kept as-is so
convert.convert_ip_adapter maps keys mechanically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omg_tpu.config import ResamplerConfig
from omg_tpu.nn import layers

Array = jax.Array
Params = dict


def init_params(key: Array, cfg: ResamplerConfig) -> Params:
    dtype = cfg.dtype
    inner = cfg.dim_head * cfg.heads
    ks = iter(jax.random.split(key, 8 + cfg.depth * 8))

    blocks = []
    for _ in range(cfg.depth):
        attn = {
            "norm1": layers.init_norm(cfg.dim, dtype),
            "norm2": layers.init_norm(cfg.dim, dtype),
            "to_q": layers.init_linear(next(ks), cfg.dim, inner, bias=False,
                                       dtype=dtype),
            "to_kv": layers.init_linear(next(ks), cfg.dim, inner * 2,
                                        bias=False, dtype=dtype),
            "to_out": layers.init_linear(next(ks), inner, cfg.dim, bias=False,
                                         dtype=dtype),
        }
        ff = {
            0: layers.init_norm(cfg.dim, dtype),
            1: layers.init_linear(next(ks), cfg.dim, cfg.dim * cfg.ff_mult,
                                  bias=False, dtype=dtype),
            3: layers.init_linear(next(ks), cfg.dim * cfg.ff_mult, cfg.dim,
                                  bias=False, dtype=dtype),
        }
        blocks.append([attn, ff])

    return {
        "latents": (jax.random.normal(next(ks), (1, cfg.num_queries, cfg.dim),
                                      jnp.float32) / cfg.dim ** 0.5
                    ).astype(dtype),
        "proj_in": layers.init_linear(next(ks), cfg.embedding_dim, cfg.dim,
                                      dtype=dtype),
        "proj_out": layers.init_linear(next(ks), cfg.dim, cfg.output_dim,
                                       dtype=dtype),
        "norm_out": layers.init_norm(cfg.output_dim, dtype),
        "layers": blocks,
    }


def _perceiver_attention(p: Params, x: Array, latents: Array,
                         heads: int) -> Array:
    """Cross-attention: latent queries attend over cat(x, latents)
    (reference: resampler.py:30-74 — note the kv input includes the
    latents themselves, and the softmax runs in fp32)."""
    x = layers.layer_norm(p["norm1"], x)
    latents = layers.layer_norm(p["norm2"], latents)
    b, q_len, _ = latents.shape

    q = layers.linear(p["to_q"], latents)
    kv = layers.linear(p["to_kv"], jnp.concatenate([x, latents], axis=-2))
    k, v = jnp.split(kv, 2, axis=-1)

    def split(t):
        return t.reshape(b, t.shape[1], heads, -1).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    # reference scales q and k by dim_head**-0.5 each (total 1/dim_head)
    scale = qh.shape[-1] ** -0.5
    w = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh * scale,
                   preferred_element_type=jnp.float32)
    w = jax.nn.softmax(w, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, q_len, -1)
    return layers.linear(p["to_out"], out)


def apply(p: Params, cfg: ResamplerConfig, embeds: Array) -> Array:
    """embeds [B, N, embedding_dim] -> image-prompt tokens
    [B, num_queries, output_dim]."""
    b = embeds.shape[0]
    latents = jnp.broadcast_to(p["latents"].astype(embeds.dtype),
                               (b,) + p["latents"].shape[1:])
    x = layers.linear(p["proj_in"], embeds)
    for attn, ff in p["layers"]:
        latents = _perceiver_attention(attn, x, latents, cfg.heads) + latents
        h = layers.layer_norm(ff[0], latents)
        h = layers.linear(ff[1], h)
        h = layers.gelu(h)
        h = layers.linear(ff[3], h)
        latents = h + latents
    out = layers.linear(p["proj_out"], latents)
    return layers.layer_norm(p["norm_out"], out)
