"""SDXL AutoencoderKL (VAE), functional JAX, NHWC.

The reference decodes latents with the VAE upcast to fp32
(reference: src/pipelines/lora_pipeline.py:634-654) and never encodes on
the OMG path (no img2img), but we implement both halves for completeness
and for the LPIPS parity harness. Param tree mirrors diffusers
AutoencoderKL state_dict naming.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from omg_tpu.config import VAEConfig
from omg_tpu.nn import layers
from omg_tpu.nn.attention import sdpa

Array = jax.Array
Params = dict


def _init_resnet(key: Array, in_ch: int, out_ch: int, groups: int, dtype: Any) -> Params:
    ks = jax.random.split(key, 3)
    p = {
        "norm1": layers.init_norm(in_ch, dtype),
        "conv1": layers.init_conv2d(ks[0], in_ch, out_ch, 3, dtype=dtype),
        "norm2": layers.init_norm(out_ch, dtype),
        "conv2": layers.init_conv2d(ks[1], out_ch, out_ch, 3, dtype=dtype),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = layers.init_conv2d(ks[2], in_ch, out_ch, 1, dtype=dtype)
    return p


def _init_attn(key: Array, ch: int, groups: int, dtype: Any) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "group_norm": layers.init_norm(ch, dtype),
        "to_q": layers.init_linear(ks[0], ch, ch, dtype=dtype),
        "to_k": layers.init_linear(ks[1], ch, ch, dtype=dtype),
        "to_v": layers.init_linear(ks[2], ch, ch, dtype=dtype),
        "to_out": layers.init_linear(ks[3], ch, ch, dtype=dtype),
    }


def init_params(key: Array, cfg: VAEConfig) -> Params:
    dtype = cfg.dtype
    chs = list(cfg.block_out_channels)
    n = len(chs)
    g = cfg.norm_num_groups
    ks = iter(jax.random.split(key, 128))

    # Encoder: down blocks then mid.
    enc_down = []
    out_ch = chs[0]
    for i in range(n):
        in_ch, out_ch = out_ch, chs[i]
        blk: Params = {"resnets": [
            _init_resnet(next(ks), in_ch if j == 0 else out_ch, out_ch, g, dtype)
            for j in range(cfg.layers_per_block)]}
        if i < n - 1:
            blk["downsamplers"] = [{"conv": layers.init_conv2d(
                next(ks), out_ch, out_ch, 3, dtype=dtype)}]
        enc_down.append(blk)
    mid_ch = chs[-1]

    def mid_block():
        return {
            "resnets": [_init_resnet(next(ks), mid_ch, mid_ch, g, dtype),
                        _init_resnet(next(ks), mid_ch, mid_ch, g, dtype)],
            "attentions": [_init_attn(next(ks), mid_ch, g, dtype)],
        }

    encoder = {
        "conv_in": layers.init_conv2d(next(ks), cfg.in_channels, chs[0], 3, dtype=dtype),
        "down_blocks": enc_down,
        "mid_block": mid_block(),
        "conv_norm_out": layers.init_norm(mid_ch, dtype),
        "conv_out": layers.init_conv2d(next(ks), mid_ch,
                                       2 * cfg.latent_channels, 3, dtype=dtype),
    }

    # Decoder: mid then up blocks (reversed channels).
    rev = list(reversed(chs))
    dec_up = []
    out_ch = rev[0]
    for i in range(n):
        in_ch, out_ch = out_ch, rev[i]
        blk = {"resnets": [
            _init_resnet(next(ks), in_ch if j == 0 else out_ch, out_ch, g, dtype)
            for j in range(cfg.layers_per_block + 1)]}
        if i < n - 1:
            blk["upsamplers"] = [{"conv": layers.init_conv2d(
                next(ks), out_ch, out_ch, 3, dtype=dtype)}]
        dec_up.append(blk)

    decoder = {
        "conv_in": layers.init_conv2d(next(ks), cfg.latent_channels, rev[0], 3, dtype=dtype),
        "mid_block": mid_block(),
        "up_blocks": dec_up,
        "conv_norm_out": layers.init_norm(rev[-1], dtype),
        "conv_out": layers.init_conv2d(next(ks), rev[-1], cfg.out_channels, 3, dtype=dtype),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": layers.init_conv2d(next(ks), 2 * cfg.latent_channels,
                                         2 * cfg.latent_channels, 1, dtype=dtype),
        "post_quant_conv": layers.init_conv2d(next(ks), cfg.latent_channels,
                                              cfg.latent_channels, 1, dtype=dtype),
    }


def _resnet(p: Params, x: Array, groups: int) -> Array:
    h = layers.group_norm(p["norm1"], x, num_groups=groups)
    h = layers.silu(h)
    h = layers.conv2d(p["conv1"], h)
    h = layers.group_norm(p["norm2"], h, num_groups=groups)
    h = layers.silu(h)
    h = layers.conv2d(p["conv2"], h)
    if "conv_shortcut" in p:
        x = layers.conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _attn(p: Params, x: Array, groups: int) -> Array:
    b, hh, ww, c = x.shape
    h = layers.group_norm(p["group_norm"], x, num_groups=groups)
    h = h.reshape(b, hh * ww, c)
    q = layers.linear(p["to_q"], h)[:, None]
    k = layers.linear(p["to_k"], h)[:, None]
    v = layers.linear(p["to_v"], h)[:, None]
    out = sdpa(q, k, v)[:, 0]
    out = layers.linear(p["to_out"], out)
    return x + out.reshape(b, hh, ww, c)


def _mid(p: Params, x: Array, groups: int) -> Array:
    x = _resnet(p["resnets"][0], x, groups)
    x = _attn(p["attentions"][0], x, groups)
    return _resnet(p["resnets"][1], x, groups)


def encode(p: Params, cfg: VAEConfig, images: Array,
           key: Optional[Array] = None) -> Array:
    """images: [B, H, W, 3] in [-1, 1] -> latents [B, H/8, W/8, 4] (scaled).

    Deterministic (mode) when key is None, else samples the posterior.
    """
    g = cfg.norm_num_groups
    e = p["encoder"]
    x = images.astype(cfg.dtype)
    x = layers.conv2d(e["conv_in"], x)
    for blk in e["down_blocks"]:
        for res in blk["resnets"]:
            x = _resnet(res, x, g)
        if "downsamplers" in blk:
            # diffusers pads (0,1,0,1) asymmetrically before stride-2 conv
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            y = jax.lax.conv_general_dilated(
                x, blk["downsamplers"][0]["conv"]["weight"].astype(x.dtype),
                window_strides=(2, 2), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = y + blk["downsamplers"][0]["conv"]["bias"].astype(y.dtype)
    x = _mid(e["mid_block"], x, g)
    x = layers.group_norm(e["conv_norm_out"], x, num_groups=g)
    x = layers.silu(x)
    x = layers.conv2d(e["conv_out"], x)
    moments = layers.conv2d(p["quant_conv"], x, padding=0)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if key is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    return mean * cfg.scaling_factor


def decode(p: Params, cfg: VAEConfig, latents: Array) -> Array:
    """latents (scaled) -> images [B, H, W, 3] in [-1, 1], fp32 compute."""
    g = cfg.norm_num_groups
    d = p["decoder"]
    x = (latents.astype(jnp.float32) / cfg.scaling_factor).astype(cfg.dtype)
    x = layers.conv2d(p["post_quant_conv"], x, padding=0)
    x = layers.conv2d(d["conv_in"], x)
    x = _mid(d["mid_block"], x, g)
    for blk in d["up_blocks"]:
        for res in blk["resnets"]:
            x = _resnet(res, x, g)
        if "upsamplers" in blk:
            x = layers.upsample_nearest_2x(x)
            x = layers.conv2d(blk["upsamplers"][0]["conv"], x)
    x = layers.group_norm(d["conv_norm_out"], x, num_groups=g)
    x = layers.silu(x)
    return layers.conv2d(d["conv_out"], x)
