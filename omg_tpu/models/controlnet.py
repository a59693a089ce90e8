"""ControlNet-SDXL, functional JAX (NHWC).

The reference drives spatial ControlNets (openpose/canny/depth) and
InstantID's IdentityNet through diffusers ControlNetModel
(reference: inference_lora.py:153, src/pipelines/lora_pipeline.py:519-529;
IdentityNet conditioning at src/pipelines/instantid_single_pieline.py:
688-697 where encoder_hidden_states are the image-prompt tokens).

Architecture = the UNet encoder (conv_in/time/add embeddings, down
blocks, mid block) + a conditioning embedder + zero-conv output heads.
Param names mirror diffusers ControlNetModel's state dict so
convert.convert_controlnet is mechanical. Forward returns the per-skip
residuals and the mid residual, scaled by ``conditioning_scale`` —
consumed by ``unet.apply(down_block_residuals=..., mid_block_residual=...)``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from omg_tpu.config import ControlNetConfig
from omg_tpu.models import unet as unet_lib
from omg_tpu.nn import layers

Array = jax.Array
Params = dict


def init_params(key: Array, cfg: ControlNetConfig) -> Params:
    u = cfg.unet
    dtype = u.dtype
    temb = u.time_embed_dim
    n_levels = len(u.block_out_channels)
    ks = iter(jax.random.split(key, 96))

    p: Params = {
        "conv_in": layers.init_conv2d(next(ks), u.in_channels,
                                      u.block_out_channels[0], 3, dtype=dtype),
        "time_embedding": {
            "linear_1": layers.init_linear(next(ks), u.block_out_channels[0],
                                           temb, dtype=dtype),
            "linear_2": layers.init_linear(next(ks), temb, temb, dtype=dtype),
        },
        "add_embedding": {
            "linear_1": layers.init_linear(
                next(ks), u.projection_class_embeddings_input_dim, temb,
                dtype=dtype),
            "linear_2": layers.init_linear(next(ks), temb, temb, dtype=dtype),
        },
    }

    # Conditioning embedder: image (e.g. pose render / face kps) -> latent-
    # resolution features, final conv zero-init so an untrained ControlNet
    # is a no-op (diffusers ControlNetConditioningEmbedding).
    emb_chs = list(cfg.conditioning_embedding_out_channels)
    cond = {
        "conv_in": layers.init_conv2d(next(ks), cfg.conditioning_channels,
                                      emb_chs[0], 3, dtype=dtype),
        "blocks": [],
        "conv_out": layers.init_conv2d(next(ks), emb_chs[-1],
                                       u.block_out_channels[0], 3,
                                       dtype=dtype, zero=True),
    }
    for i in range(len(emb_chs) - 1):
        cond["blocks"].append(layers.init_conv2d(
            next(ks), emb_chs[i], emb_chs[i], 3, dtype=dtype))
        cond["blocks"].append(layers.init_conv2d(
            next(ks), emb_chs[i], emb_chs[i + 1], 3, dtype=dtype))
    p["controlnet_cond_embedding"] = cond

    # Down blocks: same geometry as the UNet encoder.
    down = []
    out_ch = u.block_out_channels[0]
    for i in range(n_levels):
        in_ch, out_ch = out_ch, u.block_out_channels[i]
        depth = u.transformer_layers_per_block[i]
        blk: Params = {"resnets": [], "attentions": []} if depth else {"resnets": []}
        for j in range(u.layers_per_block):
            blk["resnets"].append(unet_lib._init_resnet(
                next(ks), in_ch if j == 0 else out_ch, out_ch, temb,
                u.norm_num_groups, dtype))
            if depth:
                blk["attentions"].append(unet_lib._init_transformer(
                    next(ks), out_ch, depth, u.cross_attention_dim,
                    u.attention_head_dim, u.norm_num_groups, dtype))
        if i < n_levels - 1:
            blk["downsamplers"] = [{"conv": layers.init_conv2d(
                next(ks), out_ch, out_ch, 3, dtype=dtype)}]
        down.append(blk)
    p["down_blocks"] = down

    mid_ch = u.block_out_channels[-1]
    mid_depth = u.transformer_layers_per_block[-1]
    p["mid_block"] = {
        "resnets": [
            unet_lib._init_resnet(next(ks), mid_ch, mid_ch, temb,
                                  u.norm_num_groups, dtype),
            unet_lib._init_resnet(next(ks), mid_ch, mid_ch, temb,
                                  u.norm_num_groups, dtype),
        ],
        "attentions": [unet_lib._init_transformer(
            next(ks), mid_ch, mid_depth, u.cross_attention_dim,
            u.attention_head_dim, u.norm_num_groups, dtype)]
        if mid_depth else [],
    }

    # Zero-conv heads: one per skip residual + one for the mid block.
    n_skips = 1 + n_levels * u.layers_per_block + (n_levels - 1)
    p["controlnet_down_blocks"] = []
    ch_iter = [u.block_out_channels[0]]
    for i in range(n_levels):
        ch_iter += [u.block_out_channels[i]] * u.layers_per_block
        if i < n_levels - 1:
            ch_iter.append(u.block_out_channels[i])
    assert len(ch_iter) == n_skips
    for ch in ch_iter:
        p["controlnet_down_blocks"].append(layers.init_conv2d(
            next(ks), ch, ch, 1, dtype=dtype, zero=True))
    p["controlnet_mid_block"] = layers.init_conv2d(
        next(ks), mid_ch, mid_ch, 1, dtype=dtype, zero=True)
    return p


def _cond_embed(p: Params, cond: Array) -> Array:
    x = layers.silu(layers.conv2d(p["conv_in"], cond))
    blocks = p["blocks"]
    for i in range(0, len(blocks), 2):
        x = layers.silu(layers.conv2d(blocks[i], x))
        x = layers.silu(layers.conv2d(blocks[i + 1], x, stride=2))
    return layers.conv2d(p["conv_out"], x)


def apply(p: Params, cfg: ControlNetConfig, sample: Array, timestep: Array,
          encoder_hidden_states: Array, cond_image: Array, *,
          text_embeds: Array, time_ids: Array,
          conditioning_scale: float | Array = 1.0,
          guess_mode: bool = False
          ) -> tuple[Sequence[Array], Array]:
    """-> (down_block_residuals, mid_block_residual), scaled.

    ``cond_image``: [B, H, W, C] conditioning image at pixel resolution
    (stride-8 reduced internally to latent resolution).
    For IdentityNet, ``encoder_hidden_states`` are the 16 image-prompt
    tokens (reference: instantid_single_pieline.py:688-697).
    ``guess_mode``: diffusers ControlNetModel guess-mode residual ramp —
    the shallowest residual is scaled by 0.1 rising log-linearly to 1.0
    at the mid block (the reference passes guess_mode through to
    diffusers, src/pipelines/lora_pipeline.py:527).
    """
    u = cfg.unet
    groups = u.norm_num_groups
    hd = u.attention_head_dim
    temb = unet_lib.time_embeddings(p, u, timestep, text_embeds, time_ids)

    ctx = unet_lib._AttnCtx(encoder_hidden_states, None, None, None, 1.0, None)

    x = layers.conv2d(p["conv_in"], sample)
    x = x + _cond_embed(p["controlnet_cond_embedding"],
                        cond_image.astype(x.dtype)).astype(x.dtype)
    residuals = [x]

    for blk in p["down_blocks"]:
        attns = blk.get("attentions")
        for ri, res in enumerate(blk["resnets"]):
            x = unet_lib._resnet(res, x, temb, groups)
            if attns:
                x = unet_lib._transformer(attns[ri], x, ctx, hd, groups, None)
            residuals.append(x)
        if "downsamplers" in blk:
            x = layers.conv2d(blk["downsamplers"][0]["conv"], x, stride=2)
            residuals.append(x)

    mid = p["mid_block"]
    x = unet_lib._resnet(mid["resnets"][0], x, temb, groups)
    if mid["attentions"]:
        x = unet_lib._transformer(mid["attentions"][0], x, ctx, hd, groups, None)
    x = unet_lib._resnet(mid["resnets"][1], x, temb, groups)

    scale = jnp.asarray(conditioning_scale, x.dtype)
    if guess_mode:
        # scales = logspace(-1, 0, n_down + 1): down residual j gets
        # 10^((j - n)/n), the mid residual gets 1.0 (diffusers
        # ControlNetModel.forward guess-mode branch)
        n = len(residuals)
        ramp = jnp.logspace(-1.0, 0.0, n + 1).astype(x.dtype)
        down_res = [layers.conv2d(zc, r, padding=0) * (scale * ramp[j])
                    for j, (zc, r) in enumerate(
                        zip(p["controlnet_down_blocks"], residuals))]
        mid_res = (layers.conv2d(p["controlnet_mid_block"], x, padding=0)
                   * (scale * ramp[n]))
        return down_res, mid_res
    down_res = [layers.conv2d(zc, r, padding=0) * scale
                for zc, r in zip(p["controlnet_down_blocks"], residuals)]
    mid_res = layers.conv2d(p["controlnet_mid_block"], x, padding=0) * scale
    return down_res, mid_res
