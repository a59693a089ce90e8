"""Model/architecture configs.

One dataclass per model family, with two presets each:
  * ``sdxl_*`` — the real SDXL-base geometry the reference runs
    (reference: inference_lora.py:153-155 loads SDXL-base fp16).
  * ``tiny_*`` — CPU-runnable miniatures for tests (the reference had no
    tests at all; SURVEY.md §4 sets the strategy we follow here).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SDXL UNet2DConditionModel geometry (diffusers-compatible naming)."""

    sample_size: int = 128
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280)
    # Number of resnets per down block (up blocks get +1).
    layers_per_block: int = 2
    # Transformer depth per block level; 0 => plain (no-attention) block.
    transformer_layers_per_block: Sequence[int] = (0, 2, 10)
    attention_head_dim: int = 64
    cross_attention_dim: int = 2048
    # "text_time" micro-conditioning: pooled text emb (1280) + 6 packed
    # time/size ids through a 256-dim sinusoidal embedding.
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    norm_num_groups: int = 32
    dtype: Any = jnp.bfloat16

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL geometry (SDXL VAE)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.13025
    # Reference upcasts the VAE to fp32 before decode
    # (reference: src/pipelines/lora_pipeline.py:634-654).
    dtype: Any = jnp.float32


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP text encoder geometry (covers both SDXL encoders)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    # OpenCLIP bigG uses "gelu"; CLIP-L uses "quick_gelu".
    hidden_act: str = "quick_gelu"
    projection_dim: int = 0  # >0 => has text_projection (encoder 2)
    dtype: Any = jnp.bfloat16


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP ViT image tower (transformers CLIPVisionModelWithProjection).

    Used by the open-vocabulary detector (segment/detector.py): ranks
    SAM mask proposals against class texts — the TPU-native stand-in for
    the reference's external YOLO-World / GroundingDINO detectors
    (reference: inference_lora.py:91-126, via pip packages)."""

    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    hidden_act: str = "quick_gelu"
    projection_dim: int = 512
    dtype: Any = jnp.float32


def clip_vit_b32_vision() -> CLIPVisionConfig:
    """openai/clip-vit-base-patch32 image tower."""
    return CLIPVisionConfig()


def clip_vit_b32_text() -> CLIPTextConfig:
    """openai/clip-vit-base-patch32 text tower (pairs with the vision
    config above: 512-d shared embedding space). fp32: the detector
    ranks cosine similarities, and the tower is tiny."""
    return CLIPTextConfig(hidden_size=512, intermediate_size=2048,
                          num_heads=8, projection_dim=512,
                          dtype=jnp.float32)


def clip_vit_l14_text() -> CLIPTextConfig:
    """openai/clip-vit-large-patch14 text tower WITH projection (768-d
    space; unlike SDXL's text_encoder, which drops text_projection)."""
    return CLIPTextConfig(projection_dim=768, dtype=jnp.float32)


def clip_vit_l14_vision() -> CLIPVisionConfig:
    """openai/clip-vit-large-patch14 image tower."""
    return CLIPVisionConfig(
        patch_size=14, hidden_size=1024, intermediate_size=4096,
        num_layers=24, num_heads=16, projection_dim=768)


def tiny_clip_vision() -> CLIPVisionConfig:
    return CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, projection_dim=16)


@dataclasses.dataclass(frozen=True)
class ControlNetConfig:
    """ControlNet-SDXL geometry: UNet encoder + zero-conv heads.

    Covers both the spatial ControlNets (openpose/canny/depth,
    reference: inference_lora.py:153) and InstantID's IdentityNet (same
    architecture; conditioned on face keypoint images with image-prompt
    embeddings as encoder_hidden_states, reference:
    src/pipelines/instantid_single_pieline.py:688-697).
    """

    unet: UNetConfig = dataclasses.field(default_factory=lambda: UNetConfig())
    conditioning_channels: int = 3
    conditioning_embedding_out_channels: Sequence[int] = (16, 32, 96, 256)


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    """IP-Adapter Perceiver resampler (reference: src/ip_adapter/resampler.py:77).

    InstantID preset: dim=1280, depth=4, heads=20, 16 latent tokens,
    512-d ArcFace embedding in, cross_attention_dim out
    (reference: src/pipelines/instantid_single_pieline.py:163-184).
    """

    dim: int = 1280
    depth: int = 4
    dim_head: int = 64
    heads: int = 20
    num_queries: int = 16
    embedding_dim: int = 512
    output_dim: int = 2048
    ff_mult: int = 4
    dtype: Any = jnp.bfloat16


# --------------------------------------------------------------------------
# Presets
# --------------------------------------------------------------------------

def sdxl_unet() -> UNetConfig:
    return UNetConfig()


def sdxl_vae() -> VAEConfig:
    return VAEConfig()


def sdxl_text_encoder() -> CLIPTextConfig:
    """CLIP ViT-L/14 text encoder (SDXL text_encoder)."""
    return CLIPTextConfig()


def sdxl_text_encoder_2() -> CLIPTextConfig:
    """OpenCLIP ViT-bigG text encoder (SDXL text_encoder_2)."""
    return CLIPTextConfig(
        hidden_size=1280,
        intermediate_size=5120,
        num_layers=32,
        num_heads=20,
        hidden_act="gelu",
        projection_dim=1280,
    )


def sdxl_controlnet() -> ControlNetConfig:
    return ControlNetConfig()


def instantid_resampler() -> ResamplerConfig:
    return ResamplerConfig()


# Tiny presets: shapes chosen so every code path (cross-attn blocks,
# no-attn block level, up/down sampling, dual text encoders) is exercised
# on CPU in well under a second.

def tiny_unet() -> UNetConfig:
    return UNetConfig(
        sample_size=16,
        block_out_channels=(32, 64),
        layers_per_block=1,
        transformer_layers_per_block=(0, 1),
        attention_head_dim=8,
        # = tiny_text_encoder.hidden (32) + tiny_text_encoder_2.hidden (16),
        # mirroring SDXL's 768 + 1280 = 2048 dual-encoder concat.
        cross_attention_dim=48,
        addition_time_embed_dim=8,
        # pooled (16) + 6 * 8
        projection_class_embeddings_input_dim=16 + 6 * 8,
        norm_num_groups=8,
        dtype=jnp.float32,
    )


def tiny_vae() -> VAEConfig:
    # Four levels like the real SDXL VAE so the pixel/latent ratio stays 8x
    # (3 down/upsamples) and every block depth is exercised.
    return VAEConfig(
        block_out_channels=(8, 8, 16, 16),
        layers_per_block=1,
        norm_num_groups=8,
        dtype=jnp.float32,
    )


def tiny_text_encoder(projection_dim: int = 0) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=1000,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        max_position_embeddings=77,
        projection_dim=projection_dim,
        dtype=jnp.float32,
    )


def tiny_text_encoder_2() -> CLIPTextConfig:
    """Tiny stand-in for OpenCLIP bigG (has a text projection)."""
    return CLIPTextConfig(
        vocab_size=1000,
        hidden_size=16,
        intermediate_size=32,
        num_layers=2,
        num_heads=4,
        max_position_embeddings=77,
        hidden_act="gelu",
        projection_dim=16,
        dtype=jnp.float32,
    )


def tiny_controlnet() -> ControlNetConfig:
    # Four stages -> three stride-2 convs, so the pixel-space condition
    # image reduces 8x to latent resolution exactly like the SDXL preset.
    return ControlNetConfig(
        unet=tiny_unet(),
        conditioning_embedding_out_channels=(8, 8, 16, 16),
    )


def tiny_resampler() -> ResamplerConfig:
    # output_dim == tiny_unet.cross_attention_dim so the image-prompt
    # tokens drop straight into the concept UNet's IP cross-attention.
    return ResamplerConfig(
        dim=32, depth=1, dim_head=8, heads=4, num_queries=4,
        embedding_dim=16, output_dim=48, ff_mult=2, dtype=jnp.float32,
    )
