"""Ahead-of-time compilation warmup for serving.

Recompilation management (SURVEY.md §7 hard-part #4): the reference's
nine SDXL aspect buckets (gradio_demo/app.py:300-309) times
{1, 2}-concept requests would each trigger a multi-minute XLA compile on
first hit. This walks the expected (resolution, concept-count) grid and
AOT-compiles THE PROGRAMS SERVING ACTUALLY RUNS — shapes are derived
from the engine's own parameter trees (so packed/unpacked layout,
dtype, and LoRA structure all match the real jit keys), and the stage
graph mirrors sample_stage1_cached + sample_stage2_resumed:
_denoise_cfg_range prefix, _denoise_cfg_range_traj suffix, and the
3+2K-lane _denoise_mc_range_traj stage 2. With JAX's persistent
compilation cache enabled, later real requests start hot.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from omg_tpu.control import p2p
from omg_tpu.diffusion import schedulers
from omg_tpu.pipelines import multiconcept, sdxl
from omg_tpu.serving.conditions import RESOLUTIONS


def _sds(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(tuple(shape), dtype)


def _shapes_of(tree):
    return jax.tree.map(lambda x: _sds(x.shape, x.dtype), tree)


def warmup(cfg: sdxl.SDXLConfig, *, unet_params, steps: int = 50,
           buckets: Sequence = ((1024, 1024),),
           concept_counts: Sequence[int] = (2,),
           scheduler: str = "euler",
           fusion_fraction: float = 0.3,
           sample_lora: Optional[dict] = None,
           sample_ip_adapter: Optional[list] = None,
           ip_tokens: int = 16,
           ip_scale: float = 0.8,
           vae_params=None,
           cache_interval: int = 0,
           cache_schedule: str = "uniform",
           batch_sizes: Sequence[int] = (),
           log=print) -> int:
    """AOT-compile the serving programs for each (bucket, K).

    ``unet_params``: the engine's REAL weight tree (or an equal-structure
    shape tree) — packed vs unpacked layout is part of the jit key.
    ``sample_lora``: a representative concept-LoRA tree (e.g. from the
    registry cache); LoRA'd requests trace a different program than
    None-LoRA ones, so pass one to warm the path real requests take.
    ``sample_ip_adapter``: the InstantID per-layer K/V list (engine's
    InstantIDModels.ip_adapter_layers) — when given, the InstantID
    stage-2 variant (ip_context tokens + decoupled attention) is warmed
    too; without it, face requests hit a cold multi-minute compile
    despite --warmup (ADVICE round 2).
    ``vae_params``: also warm the per-bucket decode when given.
    ``batch_sizes``: microbatcher chunk widths (the server's max_batch)
    — also warm the request-stacked sample_stage1_batch /
    sample_stage2_batch programs the queue-drain and multi-prompt paths
    run (round-4 serve_bench: the first batched request paid a separate
    137 s compile despite --warmup). Size-1 batches route to the single
    path and need no extra program.
    Returns the number of compiled programs. Shapes that differ from the
    warmed ones (another LoRA rank/structure, ControlNet conditions, an
    unusual step count) still compile on first request — a note is
    logged so operators are not surprised.
    """
    dt = cfg.unet.dtype
    d = cfg.unet.cross_attention_dim
    pdim = cfg.text_encoder_2.projection_dim or cfg.text_encoder_2.hidden_size
    sched = schedulers.make_schedule(scheduler, steps)
    # resolve the DeepCache spec EXACTLY like the engine does: a
    # non-uniform cache_schedule turns the int interval into a per-step
    # bool tuple, which is a DIFFERENT static jit key — warming the int
    # form would miss every front-schedule request (round-5 review)
    if cache_interval > 1 and cache_schedule != "uniform":
        cache_interval = multiconcept.deepcache_schedule(
            steps, cache_interval, kind=cache_schedule,
            fusion_start=round(steps * fusion_fraction))
    params = _shapes_of(unet_params)
    lora_s = _shapes_of(sample_lora) if sample_lora is not None else None
    ip_layers_s = (_shapes_of(sample_ip_adapter)
                   if sample_ip_adapter is not None else None)
    n = 0
    for height, width in buckets:
        h, w = height // 8, width // 8
        base = multiconcept.BaseInputs(
            _sds((4, 77, d), dt), _sds((4, pdim), dt), _sds((4, 6)),
            _sds(()))
        lat = _sds((1, h, w, 4), dt)
        st = schedulers.SchedulerState(
            _sds((1, h, w, 4)), _sds((), jnp.int32),
            _sds((2,), jnp.uint32))
        fusion_start = round(steps * fusion_fraction)
        boundary = min(fusion_start + 1, steps)
        t0 = time.time()
        # stage 1 = prefix + trajectory-recording suffix
        # (multiconcept.sample_stage1_cached)
        multiconcept._denoise_cfg_range.lower(
            cfg, sched, params, lat, st, base, i0=0, i1=boundary,
            cache_interval=cache_interval).compile()
        multiconcept._denoise_cfg_range_traj.lower(
            cfg, sched, params, lat, st, base, i0=boundary,
            i1=steps, cache_interval=cache_interval).compile()
        n += 2
        ctl = p2p.P2PControl.build(["x", "x"], steps, width=width // 32,
                                   height=height // 32)
        ctl_s = jax.tree.map(
            lambda x: _sds(x.shape, x.dtype) if hasattr(x, "shape") else x,
            ctl)
        a_traj = _sds((max(steps - boundary, 0), 1, h, w, 4), dt)
        for K in concept_counts:
            # stage 2 = the 3+2K-lane trajectory-fed program
            # (multiconcept.sample_stage2_resumed's single-chip path)
            concept = multiconcept.ConceptInputs(
                _sds((2, 77, d), dt), _sds((2, pdim), dt), _sds((2, 6)),
                None)
            masks = _sds((K, h, w))
            multiconcept._denoise_mc_range_traj.lower(
                cfg, sched, params, lat, st, a_traj, base, ctl_s,
                tuple([concept] * K), tuple([lora_s] * K), masks,
                i0=boundary, fusion_start=fusion_start,
                cache_interval=cache_interval).compile()
            n += 1
            if ip_layers_s is not None:
                # InstantID variant: ip_context tokens + decoupled K/V
                # (a distinct program from the LoRA-only one)
                concept_ip = multiconcept.ConceptInputs(
                    _sds((2, 77, d), dt), _sds((2, pdim), dt),
                    _sds((2, 6)), _sds((2, ip_tokens, d), dt))
                multiconcept._denoise_mc_range_traj.lower(
                    cfg, sched, params, lat, st, a_traj, base, ctl_s,
                    tuple([concept_ip] * K), tuple([lora_s] * K), masks,
                    i0=boundary, fusion_start=fusion_start,
                    concept_ip_adapters=(ip_layers_s,),
                    ip_scale_static=ip_scale,
                    cache_interval=cache_interval).compile()
                n += 1
        for R in batch_sizes:
            if R <= 1:
                continue          # singleton drains run the single path
            t1 = time.time()
            base_r = multiconcept.BaseInputs(
                _sds((R, 4, 77, d), dt), _sds((R, 4, pdim), dt),
                _sds((R, 4, 6)), _sds((R,)))
            keys_r = _sds((R, 2), jnp.uint32)
            multiconcept.sample_stage1_batch.lower(
                cfg, sched, params, keys_r, base_r, height=height,
                width=width, fusion_start=fusion_start,
                cache_interval=cache_interval).compile()
            n += 1
            st_r = schedulers.SchedulerState(
                _sds((R, 1, h, w, 4)), _sds((R,), jnp.int32),
                _sds((R, 2), jnp.uint32))
            cache_r = multiconcept.StageCache(
                latents=_sds((R, 1, h, w, 4), dt), sched_state=st_r,
                a_traj=_sds((R, max(steps - boundary, 0), 1, h, w, 4), dt),
                # sample_stage1_batch stores the UNduplicated lat_end
                a_final=_sds((R, 1, h, w, 4), dt))
            for K in concept_counts:
                concept_r = multiconcept.ConceptInputs(
                    _sds((R, 2, 77, d), dt), _sds((R, 2, pdim), dt),
                    _sds((R, 2, 6)), None)
                lora_r = (jax.tree.map(
                    lambda x: _sds((R,) + tuple(x.shape), x.dtype), lora_s)
                    if lora_s is not None else None)
                multiconcept.sample_stage2_batch.lower(
                    cfg, sched, params, cache_r, base_r, ctl_s,
                    tuple([concept_r] * K), tuple([lora_r] * K),
                    _sds((R, K, h, w)), fusion_start=fusion_start,
                    cache_interval=cache_interval).compile()
                n += 1
            log(f"warmup {height}x{width} batch R={R}: "
                f"{time.time() - t1:.1f}s")
        if vae_params is not None:
            # engine._decode decodes the [2, h, w, 4] stage outputs
            sdxl.decode_latents.lower(
                cfg, _shapes_of(vae_params), _sds((2, h, w, 4), dt)
            ).compile()
            n += 1
        log(f"warmup {height}x{width}: {time.time() - t0:.1f}s "
            f"({len(concept_counts)} concept variants"
            f"{', lora' if lora_s is not None else ''}"
            f"{', instantid' if ip_layers_s is not None else ''}"
            f"{', vae' if vae_params is not None else ''})")
    cold = []
    if lora_s is not None:
        cold.append("LoRA trees with a different rank/structure than the "
                    "sample")
    else:
        cold.append("LoRA'd requests (no sample_lora given)")
    if ip_layers_s is None:
        cold.append("InstantID requests (no sample_ip_adapter given)")
    cold.append("ControlNet-conditioned requests")
    log(f"warmup note: still cold on first hit: {'; '.join(cold)}; "
        f"step counts other than {steps} also recompile")
    return n


def default_serving_warmup(cfg, *, unet_params, steps: int = 50,
                           scheduler: str = "euler",
                           sample_lora: Optional[dict] = None,
                           sample_ip_adapter: Optional[list] = None,
                           vae_params=None, cache_interval: int = 0,
                           cache_schedule: str = "uniform",
                           max_batch: int = 0,
                           log=print) -> int:
    """``max_batch``: the server's microbatch width — also warms the
    request-stacked batch programs (pass server.max_batch)."""
    return warmup(cfg, unet_params=unet_params, steps=steps,
                  buckets=RESOLUTIONS, concept_counts=(1, 2),
                  scheduler=scheduler, sample_lora=sample_lora,
                  sample_ip_adapter=sample_ip_adapter,
                  vae_params=vae_params, cache_interval=cache_interval,
                  cache_schedule=cache_schedule,
                  batch_sizes=((max_batch,) if max_batch > 1 else ()),
                  log=log)
