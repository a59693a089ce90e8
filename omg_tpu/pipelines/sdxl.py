"""Plain SDXL text-to-image sampling (the minimum end-to-end slice).

Functional equivalent of the diffusers StableDiffusionXLPipeline the
reference builds its concept models from (reference: inference_lora.py:
159-160). Everything after text encoding is one jitted XLA program: the
50-step loop is a `lax.fori_loop` over pure scheduler math, CFG is a
batched forward + split, and the VAE decode runs fp32 (reference:
src/pipelines/lora_pipeline.py:634-654).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from omg_tpu import config as cfglib
from omg_tpu.diffusion import sampling, schedulers
from omg_tpu.models import clip, unet, vae

Array = jax.Array


class SDXLParams(NamedTuple):
    """Weight pytrees for the four SDXL submodels."""
    unet: dict
    vae: dict
    text_encoder: dict
    text_encoder_2: dict


class SDXLConfig(NamedTuple):
    unet: cfglib.UNetConfig
    vae: cfglib.VAEConfig
    text_encoder: cfglib.CLIPTextConfig
    text_encoder_2: cfglib.CLIPTextConfig


def sdxl_config() -> SDXLConfig:
    return SDXLConfig(cfglib.sdxl_unet(), cfglib.sdxl_vae(),
                      cfglib.sdxl_text_encoder(), cfglib.sdxl_text_encoder_2())


def tiny_config() -> SDXLConfig:
    return SDXLConfig(cfglib.tiny_unet(), cfglib.tiny_vae(),
                      cfglib.tiny_text_encoder(),
                      cfglib.tiny_text_encoder_2())


def init_params(key: Array, cfg: SDXLConfig) -> SDXLParams:
    ks = jax.random.split(key, 4)
    return SDXLParams(
        unet=unet.init_params(ks[0], cfg.unet),
        vae=vae.init_params(ks[1], cfg.vae),
        text_encoder=clip.init_params(ks[2], cfg.text_encoder),
        text_encoder_2=clip.init_params(ks[3], cfg.text_encoder_2),
    )


# --------------------------------------------------------------------------
# Text encoding
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def encode_tokens(cfg: SDXLConfig, params: SDXLParams, ids1: Array,
                  ids2: Array, lora1=None, lora2=None) -> tuple[Array, Array]:
    """Token ids [B, 77] x2 -> (embeds [B, 77, H1+H2], pooled [B, P]).

    SDXL conditioning: penultimate hidden states of both encoders
    concatenated on the feature axis; pooled = projected EOS embedding of
    encoder 2 (what diffusers encode_prompt builds for the reference at
    src/pipelines/lora_pipeline.py:315-334). ``lora1``/``lora2``: optional
    text-encoder LoRA deltas (region-prompt personalization).
    """
    out1 = clip.apply(params.text_encoder, cfg.text_encoder, ids1, lora1)
    out2 = clip.apply(params.text_encoder_2, cfg.text_encoder_2, ids2, lora2)
    embeds = jnp.concatenate(
        [out1.penultimate, out2.penultimate], axis=-1)
    return embeds, out2.projected


def add_time_ids(original_size: tuple, crops_coords_top_left: tuple,
                 target_size: tuple) -> jnp.ndarray:
    """SDXL micro-conditioning vector [1, 6]
    (reference: lora_pipeline.py:443-449 via _get_add_time_ids)."""
    ids = list(original_size) + list(crops_coords_top_left) + list(target_size)
    return jnp.asarray([ids], jnp.float32)


# --------------------------------------------------------------------------
# Sampling
# --------------------------------------------------------------------------

class DenoiseInputs(NamedTuple):
    """CFG-stacked conditioning for one denoise run ([neg; pos] rows)."""
    prompt_embeds: Array    # [2B, 77, D]
    text_embeds: Array      # [2B, P]
    time_ids: Array         # [2B, 6]
    guidance_scale: Array   # scalar


def make_inputs(embeds_pos: Array, pooled_pos: Array, embeds_neg: Array,
                pooled_neg: Array, time_ids: Array,
                guidance_scale: float) -> DenoiseInputs:
    b = embeds_pos.shape[0]
    return DenoiseInputs(
        prompt_embeds=jnp.concatenate([embeds_neg, embeds_pos]),
        text_embeds=jnp.concatenate([pooled_neg, pooled_pos]),
        time_ids=jnp.broadcast_to(time_ids, (2 * b, 6)),
        guidance_scale=jnp.asarray(guidance_scale, jnp.float32),
    )


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
def denoise(cfg: SDXLConfig, sched: schedulers.Schedule,
            unet_params: dict, latents: Array,
            inputs: DenoiseInputs, *,
            lora: Optional[dict] = None) -> Array:
    """Full CFG denoise loop; latents [B, h, w, 4] -> [B, h, w, 4]."""

    def model_fn(x, t, i):
        x2 = jnp.concatenate([x, x])
        eps = unet.apply(
            unet_params, cfg.unet, x2, t, inputs.prompt_embeds,
            text_embeds=inputs.text_embeds, time_ids=inputs.time_ids,
            lora=lora)
        return sampling.cfg_combine(eps, inputs.guidance_scale)

    return sampling.denoise_loop(sched, model_fn, latents)


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("dtype", "spatial_sharding"))
def decode_latents(cfg: SDXLConfig, vae_params: dict, latents: Array, *,
                   dtype=jnp.float32, spatial_sharding=None) -> Array:
    """Latents -> images in [0, 1].

    fp32 by default (the reference upcasts the VAE for decode,
    lora_pipeline.py:634-654). ``dtype=jnp.bfloat16`` halves decode HBM
    traffic (~433 ms vs ~470-580 ms per b=2 1024² decode on one v5e) for
    serving/throughput paths where the <1 LSB-of-uint8 pixel delta is
    acceptable.

    ``spatial_sharding``: a NamedSharding over [B, H, W, C] (e.g.
    P(None, axis)) — multi-chip decode: the VAE is convs + one
    bottleneck attention, so sharding the H axis makes it
    token-parallel with replicated weights (GSPMD inserts the conv
    halos, norm-stat psums, and the one attention K/V gather). Used by
    the engine's mesh latency mode.
    """
    if dtype != jnp.float32:
        vae_params = jax.tree.map(lambda x: x.astype(dtype), vae_params)
    if spatial_sharding is not None:
        latents = jax.lax.with_sharding_constraint(latents,
                                                   spatial_sharding)
    img = vae.decode(vae_params, cfg.vae, latents.astype(dtype))
    if spatial_sharding is not None:
        img = jax.lax.with_sharding_constraint(img, spatial_sharding)
    return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)


def prepare_latents(key: Array, batch: int, height: int, width: int,
                    sched: schedulers.Schedule,
                    dtype=jnp.float32) -> Array:
    noise = jax.random.normal(key, (batch, height // 8, width // 8, 4), dtype)
    return schedulers.scale_initial_noise(sched, noise)


def text_to_image(cfg: SDXLConfig, params: SDXLParams, *,
                  ids1_pos: Array, ids2_pos: Array,
                  ids1_neg: Array, ids2_neg: Array,
                  key: Array, height: int = 1024, width: int = 1024,
                  steps: int = 50, guidance_scale: float = 7.5,
                  scheduler: str = "euler",
                  lora: Optional[dict] = None) -> Array:
    """End-to-end single-prompt generation (BASELINE config #1)."""
    embeds_pos, pooled_pos = encode_tokens(cfg, params, ids1_pos, ids2_pos)
    embeds_neg, pooled_neg = encode_tokens(cfg, params, ids1_neg, ids2_neg)
    tids = add_time_ids((height, width), (0, 0), (height, width))
    inputs = make_inputs(embeds_pos, pooled_pos, embeds_neg, pooled_neg,
                         tids, guidance_scale)
    sched = schedulers.make_schedule(scheduler, steps)
    latents = prepare_latents(key, embeds_pos.shape[0], height, width, sched,
                              cfg.unet.dtype)
    latents = denoise(cfg, sched, params.unet, latents, inputs, lora=lora)
    return decode_latents(cfg, params.vae, latents)
