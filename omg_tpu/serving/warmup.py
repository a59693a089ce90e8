"""Ahead-of-time compilation warmup for serving.

Recompilation management (SURVEY.md §7 hard-part #4): the reference's
nine SDXL aspect buckets (gradio_demo/app.py:300-309) times
{1, 2}-concept requests would each trigger a multi-minute XLA compile on
first hit. This walks the expected (resolution, concept-count) grid and
AOT-compiles the stage programs from shape structs — with JAX's
persistent compilation cache enabled, later real requests start hot.
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


def warmup(cfg: sdxl.SDXLConfig, *, steps: int = 50,
           buckets: Sequence = ((1024, 1024),),
           concept_counts: Sequence[int] = (2,),
           scheduler: str = "euler",
           fusion_fraction: float = 0.3,
           log=print) -> int:
    """AOT-compile denoise programs for each (bucket, K). Returns count."""
    dt = cfg.unet.dtype
    d = cfg.unet.cross_attention_dim
    pdim = cfg.text_encoder_2.projection_dim or cfg.text_encoder_2.hidden_size
    sched = schedulers.make_schedule(scheduler, steps)
    params = jax.eval_shape(
        lambda k: __import__("omg_tpu.models.unet", fromlist=["x"])
        .init_params(k, cfg.unet), jax.random.PRNGKey(0))
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
        multiconcept._denoise_cfg_range.lower(
            cfg, sched, params, lat, st, base, i0=0, i1=boundary).compile()
        multiconcept._denoise_cfg_range.lower(
            cfg, sched, params, lat, st, base, i0=boundary,
            i1=steps).compile()
        n += 2
        ctl = p2p.P2PControl.build(["x", "x"], steps, width=width // 32,
                                   height=height // 32)
        ctl_s = jax.tree.map(
            lambda x: _sds(x.shape, x.dtype) if hasattr(x, "shape") else x,
            ctl)
        for K in concept_counts:
            concept = multiconcept.ConceptInputs(
                _sds((2, 77, d), dt), _sds((2, pdim), dt), _sds((2, 6)),
                None)
            lat2 = _sds((2, h, w, 4), dt)
            st2 = schedulers.SchedulerState(
                _sds((2, h, w, 4)), _sds((), jnp.int32),
                _sds((2,), jnp.uint32))
            masks = _sds((K, h, w))
            multiconcept._denoise_mc_range.lower(
                cfg, sched, params, lat2, st2, base, ctl_s,
                tuple([concept] * K), tuple([None] * K), masks,
                i0=boundary, fusion_start=fusion_start).compile()
            n += 1
        log(f"warmup {height}x{width}: {time.time() - t0:.1f}s "
            f"({len(concept_counts)} concept variants)")
    return n


def default_serving_warmup(cfg, steps: int = 50, log=print) -> int:
    return warmup(cfg, steps=steps, buckets=RESOLUTIONS,
                  concept_counts=(1, 2), log=log)
