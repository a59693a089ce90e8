"""Load an SDXL checkpoint directory (HF layout) into the framework.

Mirrors what the reference's ``from_pretrained`` calls consume
(reference: inference_lora.py:153-155 loads
./checkpoint/stable-diffusion-xl-base-1.0 with unet/ vae/ text_encoder/
text_encoder_2/ tokenizer/ tokenizer_2/ subfolders).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any

import jax.numpy as jnp

from omg_tpu import config as cfglib
from omg_tpu import convert
from omg_tpu.pipelines import sdxl
from omg_tpu.text.tokenizer import HFCLIPTokenizer


def _load_folder_sd(folder: str) -> dict:
    """Merge all safetensors shards in a checkpoint subfolder."""
    files = sorted(glob.glob(os.path.join(folder, "*.safetensors")))
    if not files:
        files = sorted(glob.glob(os.path.join(folder, "*.bin")))
    if not files:
        raise FileNotFoundError(f"no weights in {folder}")
    sd: dict = {}
    for f in files:
        sd.update(convert.load_state_dict(f))
    return sd


def _read_json(folder: str) -> dict:
    path = os.path.join(folder, "config.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _unet_cfg(folder: str, dtype) -> cfglib.UNetConfig:
    """diffusers UNet2DConditionModel config.json -> UNetConfig.

    Geometry comes from the checkpoint (supports SDXL variants and tiny
    test checkpoints); missing fields fall back to SDXL-base defaults.
    """
    import dataclasses
    j = _read_json(folder)
    base = cfglib.sdxl_unet()
    if not j:
        return dataclasses.replace(base, dtype=dtype)
    tl = j.get("transformer_layers_per_block",
               base.transformer_layers_per_block)
    if isinstance(tl, int):
        tl = (tl,) * len(j.get("block_out_channels", base.block_out_channels))
    return cfglib.UNetConfig(
        sample_size=j.get("sample_size", base.sample_size),
        in_channels=j.get("in_channels", base.in_channels),
        out_channels=j.get("out_channels", base.out_channels),
        block_out_channels=tuple(j.get("block_out_channels",
                                       base.block_out_channels)),
        layers_per_block=j.get("layers_per_block", base.layers_per_block),
        transformer_layers_per_block=tuple(tl),
        attention_head_dim=(j["attention_head_dim"]
                            if isinstance(j.get("attention_head_dim"), int)
                            else base.attention_head_dim),
        cross_attention_dim=j.get("cross_attention_dim",
                                  base.cross_attention_dim),
        addition_time_embed_dim=j.get("addition_time_embed_dim",
                                      base.addition_time_embed_dim),
        projection_class_embeddings_input_dim=j.get(
            "projection_class_embeddings_input_dim",
            base.projection_class_embeddings_input_dim),
        norm_num_groups=j.get("norm_num_groups", base.norm_num_groups),
        dtype=dtype,
    )


def _vae_cfg(folder: str) -> cfglib.VAEConfig:
    j = _read_json(folder)
    base = cfglib.sdxl_vae()
    return cfglib.VAEConfig(
        in_channels=j.get("in_channels", base.in_channels),
        out_channels=j.get("out_channels", base.out_channels),
        latent_channels=j.get("latent_channels", base.latent_channels),
        block_out_channels=tuple(j.get("block_out_channels",
                                       base.block_out_channels)),
        layers_per_block=j.get("layers_per_block", base.layers_per_block),
        norm_num_groups=j.get("norm_num_groups", base.norm_num_groups),
        scaling_factor=j.get("scaling_factor", base.scaling_factor),
    )


def _clip_cfg(folder: str, fallback: cfglib.CLIPTextConfig,
              dtype) -> cfglib.CLIPTextConfig:
    import dataclasses
    j = _read_json(folder)
    if not j:
        return dataclasses.replace(fallback, dtype=dtype)
    arch = (j.get("architectures") or [""])[0]
    # architectures, when declared, decides; only absent does the
    # fallback's projection choice apply (the old `or` made with_proj
    # unconditionally True for text_encoder_2)
    with_proj = ("WithProjection" in arch if arch
                 else fallback.projection_dim > 0)
    return cfglib.CLIPTextConfig(
        vocab_size=j.get("vocab_size", fallback.vocab_size),
        hidden_size=j.get("hidden_size", fallback.hidden_size),
        intermediate_size=j.get("intermediate_size",
                                fallback.intermediate_size),
        num_layers=j.get("num_hidden_layers", fallback.num_layers),
        num_heads=j.get("num_attention_heads", fallback.num_heads),
        max_position_embeddings=j.get("max_position_embeddings",
                                      fallback.max_position_embeddings),
        hidden_act=j.get("hidden_act", fallback.hidden_act),
        projection_dim=(j.get("projection_dim", fallback.projection_dim)
                        if with_proj else 0),
        dtype=dtype,
    )


def load_sdxl(checkpoint_dir: str, *, dtype: Any = jnp.bfloat16,
              pack: bool = True):
    """-> (SDXLConfig, SDXLParams, tokenizer, tokenizer_2).

    Geometry is read from each subfolder's config.json (SDXL-base
    defaults when absent). ``pack`` scan-packs the UNet's deep
    transformer stacks (models/unet.py:pack_params) — same math, ~10x
    smaller HLO for the depth-10 stacks, much faster XLA compiles.
    """
    vae_dir = os.path.join(checkpoint_dir, "vae")
    cfg = sdxl.SDXLConfig(
        unet=_unet_cfg(os.path.join(checkpoint_dir, "unet"), dtype),
        vae=_vae_cfg(vae_dir),
        text_encoder=_clip_cfg(os.path.join(checkpoint_dir, "text_encoder"),
                               cfglib.sdxl_text_encoder(), dtype),
        text_encoder_2=_clip_cfg(
            os.path.join(checkpoint_dir, "text_encoder_2"),
            cfglib.sdxl_text_encoder_2(), dtype),
    )

    unet_tree = convert.convert_unet(
        _load_folder_sd(os.path.join(checkpoint_dir, "unet")), dtype=dtype)
    if pack:
        from omg_tpu.models.unet import pack_params
        unet_tree = pack_params(unet_tree)
    params = sdxl.SDXLParams(
        unet=unet_tree,
        vae=convert.convert_vae(_load_folder_sd(vae_dir), dtype=jnp.float32),
        text_encoder=convert.convert_clip(
            _load_folder_sd(os.path.join(checkpoint_dir, "text_encoder")),
            dtype=dtype),
        text_encoder_2=convert.convert_clip(
            _load_folder_sd(os.path.join(checkpoint_dir, "text_encoder_2")),
            dtype=dtype),
    )
    tok1 = HFCLIPTokenizer(os.path.join(checkpoint_dir, "tokenizer"))
    tok2 = HFCLIPTokenizer(os.path.join(checkpoint_dir, "tokenizer_2"))
    return cfg, params, tok1, tok2


def load_controlnet(checkpoint_dir: str, *, dtype: Any = jnp.bfloat16):
    """-> (ControlNetConfig, params) from a ControlNet checkpoint dir.

    Geometry (UNet trunk + conditioning embedder channels) from the
    checkpoint's config.json; SDXL defaults when absent.
    """
    folder = checkpoint_dir
    if os.path.isdir(os.path.join(checkpoint_dir, "controlnet")):
        folder = os.path.join(checkpoint_dir, "controlnet")
    j = _read_json(folder)
    base = cfglib.sdxl_controlnet()
    cfg = cfglib.ControlNetConfig(
        unet=_unet_cfg(folder, dtype),
        conditioning_channels=j.get("conditioning_channels",
                                    base.conditioning_channels),
        conditioning_embedding_out_channels=tuple(j.get(
            "conditioning_embedding_out_channels",
            base.conditioning_embedding_out_channels)),
    )
    params = convert.convert_controlnet(_load_folder_sd(folder), dtype=dtype)
    return cfg, params
