"""OMG two-stage multi-concept denoise engine (the core runtime).

TPU-native re-design of the reference's LoraMultiConceptPipeline
(reference: src/pipelines/lora_pipeline.py:211-669):

  * Stage 1: a batch of 2 identical latents is denoised with a
    prompt-to-prompt controller forcing copy B's attention to track
    copy A's (reference :397-409 + p2p hooks) -> coherent base image.
  * (host) open-vocab detection + segmentation yields per-concept masks.
  * Stage 2: the same seed re-denoises; after ``fusion_start`` steps each
    concept's masked latent region takes its noise prediction from a
    per-concept personalized UNet (reference :568-607).

Both stages run the SAME compiled XLA program: the whole 50-step loop is
one `lax.fori_loop`, the `i > 15 and stage == 2` gate is a traced
predicate, and `lax.cond` skips the concept-UNet compute when fusion is
inactive (so stage 1 pays zero extra). Concept UNets are the base UNet
weights + per-concept LoRA delta pytrees applied in-layer — the runtime
equivalent of `set_adapters` (reference :588-591) with no weight swaps,
so base and concepts share one UNet program.

Batch layout (identical to the reference): the base forward runs
[uncond_A, uncond_B, cond_A, cond_B]; region UNets run the cond-B latent
duplicated as their (uncond, cond) pair (reference :583-585); fusion
rewrites rows 1 and 3 before CFG (reference :606-612).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from omg_tpu.control import p2p, regions
from omg_tpu.diffusion import sampling, schedulers
from omg_tpu.models import unet
from omg_tpu.pipelines import sdxl

Array = jax.Array


class ConceptInputs(NamedTuple):
    """Per-concept conditioning, CFG-stacked [neg; pos] rows.

    ``ip_context`` is the InstantID image-prompt token path: 16 resampled
    face-embedding tokens consumed by the concept UNet's decoupled
    IP cross-attention (reference: instantid_pipeline.py:378-388,663).
    None for the LoRA-only path.
    """
    prompt_embeds: Array            # [2, 77, D]
    text_embeds: Array              # [2, P]
    time_ids: Array                 # [2, 6]
    ip_context: Optional[Array] = None   # [2, T_ip, D] or None


class BaseInputs(NamedTuple):
    """Global-prompt conditioning for the 4-row base forward."""
    prompt_embeds: Array    # [4, 77, D]
    text_embeds: Array      # [4, P]
    time_ids: Array         # [4, 6]
    guidance_scale: Array   # scalar


def make_base_inputs(embeds_pos: Array, pooled_pos: Array, embeds_neg: Array,
                     pooled_neg: Array, time_ids: Array,
                     guidance_scale: float) -> BaseInputs:
    """Build [neg, neg, pos, pos] rows from single-prompt encodings
    (the two latent copies share the global prompt, reference :315-334)."""

    def dup2(neg, pos):
        return jnp.concatenate([neg, neg, pos, pos], axis=0)

    return BaseInputs(
        prompt_embeds=dup2(embeds_neg, embeds_pos),
        text_embeds=dup2(pooled_neg, pooled_pos),
        time_ids=jnp.broadcast_to(time_ids, (4, 6)),
        guidance_scale=jnp.asarray(guidance_scale, jnp.float32),
    )


def make_concept_inputs(embeds_pos: Array, pooled_pos: Array,
                        embeds_neg: Array, pooled_neg: Array,
                        time_ids: Array,
                        ip_context: Optional[Array] = None) -> ConceptInputs:
    return ConceptInputs(
        prompt_embeds=jnp.concatenate([embeds_neg, embeds_pos], axis=0),
        text_embeds=jnp.concatenate([pooled_neg, pooled_pos], axis=0),
        time_ids=jnp.broadcast_to(time_ids, (2, 6)),
        ip_context=ip_context,
    )


def multiconcept_step(
        cfg: sdxl.SDXLConfig,
        sched: schedulers.Schedule,
        unet_params: dict,
        x: Array,                           # [2, h, w, 4] (copy A, copy B)
        st: schedulers.SchedulerState,
        i: Array,                           # traced step index
        base_inputs: BaseInputs,
        controller: Optional[p2p.P2PControl],
        concept_inputs: tuple,              # tuple[ConceptInputs], static len K
        concept_loras: tuple,               # tuple[dict|None], static len K
        masks: Array,                       # [K, h, w] latent-res binary
        stage2: Array,                      # scalar bool
        *,
        concept_ip_adapters: tuple = (),
        fusion_start: int = regions.FUSION_START_STEP,
        ip_scale_static: float = 1.0,
        down_block_residuals_fn=None,
) -> tuple:
    """One OMG denoise step (the flagship compiled program).

    CFG-expands the two latent copies to the 4-row base forward, applies
    the P2P controller, conditionally runs the K concept UNets and fuses
    their masked predictions (reference step body:
    src/pipelines/lora_pipeline.py:485-615), then CFG-combines and takes
    one scheduler step. Pure: (x, scheduler_state) -> (x', state').
    """
    K = len(concept_inputs)
    t = sched.timesteps[i]
    lin = jnp.concatenate([x, x])            # [4, ...] CFG expand
    lin = schedulers.scale_model_input(sched, lin, i)

    ctrl = controller.at_step(i) if controller is not None else None

    down_res = mid_res = None
    if down_block_residuals_fn is not None:
        down_res, mid_res = down_block_residuals_fn(lin, t, i)

    eps = unet.apply(
        unet_params, cfg.unet, lin, t, base_inputs.prompt_embeds,
        text_embeds=base_inputs.text_embeds,
        time_ids=base_inputs.time_ids,
        control=ctrl,
        down_block_residuals=down_res,
        mid_block_residual=mid_res)

    if K > 0:
        active = jnp.logical_and(stage2, i > fusion_start)

        def run_concepts(lin_):
            region_latent = lin_[3:4]
            rl2 = jnp.concatenate([region_latent, region_latent])
            preds = []
            for k in range(K):
                ci = concept_inputs[k]
                ipk = (concept_ip_adapters[k]
                       if k < len(concept_ip_adapters) else None)
                ek = unet.apply(
                    unet_params, cfg.unet, rl2, t, ci.prompt_embeds,
                    text_embeds=ci.text_embeds, time_ids=ci.time_ids,
                    lora=concept_loras[k],
                    ip_adapter=ipk, ip_context=ci.ip_context,
                    ip_scale=ip_scale_static)
                preds.append(ek)
            return jnp.stack(preds)          # [K, 2, h, w, 4]

        zeros = jnp.zeros((K, 2) + lin.shape[1:], eps.dtype)
        region_preds = jax.lax.cond(
            active, run_concepts, lambda _: zeros, lin)
        eps = regions.fuse_region_noise(
            eps, region_preds, masks.astype(eps.dtype), active=active)

    guided = sampling.cfg_combine(eps, base_inputs.guidance_scale)
    return schedulers.step(sched, st, guided, i, x)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "fusion_start", "ip_scale_static"),
    donate_argnums=(3,))
def denoise_multiconcept(
        cfg: sdxl.SDXLConfig,
        sched: schedulers.Schedule,
        unet_params: dict,
        latents: Array,                     # [2, h, w, 4] (copy A, copy B)
        base_inputs: BaseInputs,
        controller: Optional[p2p.P2PControl],
        concept_inputs: tuple,              # tuple[ConceptInputs], static len K
        concept_loras: tuple,               # tuple[dict|None], static len K
        masks: Array,                       # [K, h, w] latent-res binary
        stage2: Array,                      # scalar bool
        *,
        concept_ip_adapters: tuple = (),    # tuple[list[dict]] per concept
        fusion_start: int = regions.FUSION_START_STEP,
        ip_scale_static: float = 1.0,
) -> Array:
    """The two-stage OMG denoise. One compilation serves both stages."""
    state0 = schedulers.init_state(sched, (4,) + latents.shape[1:])

    def body(i, carry):
        x, st = carry
        return multiconcept_step(
            cfg, sched, unet_params, x, st, i, base_inputs, controller,
            concept_inputs, concept_loras, masks, stage2,
            concept_ip_adapters=concept_ip_adapters,
            fusion_start=fusion_start, ip_scale_static=ip_scale_static)

    x, _ = jax.lax.fori_loop(0, sched.num_steps, body, (latents, state0))
    return x


def duplicate_latents(latents_single: Array) -> Array:
    """[1, h, w, 4] -> [2, h, w, 4]: stage-1 copies (reference :409)."""
    return jnp.concatenate([latents_single, latents_single])


def sample_stage(cfg: sdxl.SDXLConfig, sched: schedulers.Schedule,
                 unet_params: dict, *, key: Array, height: int, width: int,
                 base_inputs: BaseInputs,
                 controller: Optional[p2p.P2PControl],
                 concept_inputs: Sequence[ConceptInputs] = (),
                 concept_loras: Sequence[Optional[dict]] = (),
                 masks: Optional[Array] = None,
                 stage: int = 1,
                 fusion_start: int = regions.FUSION_START_STEP,
                 concept_ip_adapters: Sequence = (),
                 ip_scale: float = 1.0) -> Array:
    """One OMG stage end-to-end: seed -> duplicated latents -> denoise.

    Stage 1 and stage 2 MUST be called with the same ``key`` so the
    stage-2 re-run regenerates identical noise (reference regenerates
    with the same torch.Generator seed, inference_lora.py:267,287).
    """
    latents1 = sdxl.prepare_latents(key, 1, height, width, sched,
                                    cfg.unet.dtype)
    latents = duplicate_latents(latents1)
    K = len(concept_inputs)
    if masks is None:
        masks = jnp.zeros((K, height // 8, width // 8), jnp.float32)
    return denoise_multiconcept(
        cfg, sched, unet_params, latents, base_inputs, controller,
        tuple(concept_inputs), tuple(concept_loras), masks,
        jnp.asarray(stage == 2),
        concept_ip_adapters=tuple(concept_ip_adapters),
        fusion_start=fusion_start, ip_scale_static=ip_scale)
