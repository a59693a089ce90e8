"""Two-stage multi-concept pipeline logic on the tiny config.

CPU-runnable behavioural tests for the OMG engine (the reference had no
tests; SURVEY.md §4 defines this strategy): stage bookkeeping, fusion
gating, seed reproducibility, and LoRA-driven concept divergence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu.control import p2p
from omg_tpu.diffusion import schedulers
from omg_tpu.models import unet as unet_lib
from omg_tpu.pipelines import multiconcept, sdxl

H = W = 32  # pixel space; latent 4x4


@pytest.fixture(scope="module")
def setup():
    cfg = sdxl.tiny_config()
    key = jax.random.PRNGKey(0)
    params = unet_lib.init_params(key, cfg.unet)
    sched = schedulers.make_schedule("euler", 6)

    d = cfg.unet.cross_attention_dim
    p_dim = cfg.text_encoder_2.projection_dim
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    embeds_pos = jax.random.normal(ks[0], (1, 77, d))
    embeds_neg = jax.random.normal(ks[1], (1, 77, d))
    pooled_pos = jax.random.normal(ks[2], (1, p_dim))
    pooled_neg = jax.random.normal(ks[3], (1, p_dim))
    tids = sdxl.add_time_ids((H, W), (0, 0), (H, W))
    base = multiconcept.make_base_inputs(
        embeds_pos, pooled_pos, embeds_neg, pooled_neg, tids, 7.5)
    concept = multiconcept.make_concept_inputs(
        embeds_pos, pooled_pos, embeds_neg, pooled_neg, tids)
    ctl = p2p.P2PControl.build(["a", "a"], num_steps=6,
                               self_replace_steps=0.4, width=2, height=2)
    return cfg, params, sched, base, concept, ctl


def _masks():
    m = np.zeros((2, H // 8, W // 8), np.float32)
    m[0, :2, :] = 1.0
    m[1, 2:, :] = 1.0
    return jnp.asarray(m)


def test_stage1_copies_differ_without_control(setup):
    """Without P2P the two copies still match: identical latents+prompt."""
    cfg, params, sched, base, concept, ctl = setup
    out = multiconcept.sample_stage(
        cfg, sched, params, key=jax.random.PRNGKey(7), height=H, width=W,
        base_inputs=base, controller=None, stage=1)
    assert out.shape == (2, H // 8, W // 8, 4)
    np.testing.assert_allclose(out[0], out[1], atol=1e-5)


def test_stage1_equals_stage2_before_fusion_start(setup):
    """With fusion_start >= num_steps, stage 2 must reproduce stage 1."""
    cfg, params, sched, base, concept, ctl = setup
    kwargs = dict(cfg=cfg, sched=sched, unet_params=params,
                  key=jax.random.PRNGKey(3), height=H, width=W,
                  base_inputs=base, controller=ctl,
                  concept_inputs=[concept, concept],
                  concept_loras=[None, None], masks=_masks())
    s1 = multiconcept.sample_stage(stage=1, **kwargs)
    s2 = multiconcept.sample_stage(stage=2, fusion_start=100, **kwargs)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_stage2_fusion_changes_copy_b_only(setup):
    """Fusion with a distinct concept (LoRA delta) alters copy B;
    copy A's denoise trajectory is shared until... actually copy A is
    also affected through nothing: fusion writes rows 1,3 only => copy A
    result must be bit-identical to the no-fusion run."""
    cfg, params, sched, base, concept, ctl = setup

    rank = 2
    # Random LoRA delta on the mid-block attn2 to_q projection. (All-ones
    # matrices would be a degenerate choice: they compute the channel sum
    # of a LayerNorm output, which is identically zero.)
    lk1, lk2 = jax.random.split(jax.random.PRNGKey(42))
    lora = {"mid_block": {"attentions": [{"transformer_blocks": [{
        "attn2": {"to_q": {
            "down": jax.random.normal(lk1, (64, rank)) * 0.2,
            "up": jax.random.normal(lk2, (rank, 64)) * 0.2,
            "scale": jnp.asarray(1.0),
        }}}]}]}}

    kwargs = dict(cfg=cfg, sched=sched, unet_params=params,
                  key=jax.random.PRNGKey(5), height=H, width=W,
                  base_inputs=base, controller=ctl,
                  concept_inputs=[concept, concept], masks=_masks(),
                  fusion_start=1)
    base_run = multiconcept.sample_stage(
        stage=1, concept_loras=[None, None], **kwargs)
    fused = multiconcept.sample_stage(
        stage=2, concept_loras=[lora, lora], **kwargs)

    np.testing.assert_allclose(np.asarray(fused[0]), np.asarray(base_run[0]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(fused[1]), np.asarray(base_run[1]),
                           atol=1e-4)


def test_fast_path_matches_reference_path(setup):
    """Dedup/resume fast path == the reference-faithful 4-row program.

    Exercises both exact identities: stage-1 copies are bit-identical
    (b=2 dedup), and stage-2 steps before the fusion gate equal
    stage-1's (prefix reuse)."""
    cfg, params, sched, base, concept, ctl = setup
    lk = jax.random.split(jax.random.PRNGKey(42), 2)
    lora = {"mid_block": {"attentions": [{"transformer_blocks": [{
        "attn2": {"to_q": {
            "down": jax.random.normal(lk[0], (64, 2)) * 0.2,
            "up": jax.random.normal(lk[1], (2, 64)) * 0.2,
            "scale": jnp.asarray(1.0)}}}]}]}}
    key = jax.random.PRNGKey(17)
    masks = _masks()
    slow_kw = dict(cfg=cfg, sched=sched, unet_params=params, key=key,
                   height=H, width=W, base_inputs=base, controller=ctl,
                   concept_inputs=[concept, concept],
                   concept_loras=[lora, None], masks=masks, fusion_start=2)
    s1_slow = multiconcept.sample_stage(stage=1, **slow_kw)
    s2_slow = multiconcept.sample_stage(stage=2, **slow_kw)

    s1_fast, cache = multiconcept.sample_stage1_cached(
        cfg, sched, params, key=key, height=H, width=W, base_inputs=base,
        fusion_start=2)
    s2_fast = multiconcept.sample_stage2_resumed(
        cfg, sched, params, cache, base_inputs=base, controller=ctl,
        concept_inputs=[concept, concept], concept_loras=[lora, None],
        masks=masks, fusion_start=2)

    np.testing.assert_allclose(np.asarray(s1_fast), np.asarray(s1_slow),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(s2_fast), np.asarray(s2_slow),
                               atol=2e-4)


def test_two_stage_pure_matches_host_path(setup):
    """two_stage_latents (pure, vmappable) == the host-orchestrated
    stage1_cached + stage2_resumed path."""
    cfg, params, sched, base, concept, ctl = setup
    key = jax.random.PRNGKey(23)
    masks = _masks()
    from omg_tpu.pipelines import sdxl as sdxl_mod
    lat0 = sdxl_mod.prepare_latents(key, 1, H, W, sched, cfg.unet.dtype)
    s1p, s2p = multiconcept.two_stage_latents(
        cfg, sched, params, lat0, base, ctl, (concept, concept),
        (None, None), masks, fusion_start=2)

    s1h, cache = multiconcept.sample_stage1_cached(
        cfg, sched, params, key=key, height=H, width=W, base_inputs=base,
        fusion_start=2)
    s2h = multiconcept.sample_stage2_resumed(
        cfg, sched, params, cache, base_inputs=base, controller=ctl,
        concept_inputs=[concept, concept], concept_loras=[None, None],
        masks=masks, fusion_start=2)
    np.testing.assert_allclose(np.asarray(s1p), np.asarray(s1h), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2p), np.asarray(s2h), atol=1e-5)

    # vmapped over a request axis: each request independent
    lat0r = jnp.stack([lat0, lat0 * 0.5])
    f = jax.jit(jax.vmap(lambda l: multiconcept.two_stage_latents(
        cfg, sched, params, l, base, ctl, (concept, concept),
        (None, None), masks, fusion_start=2)))
    s1r, s2r = f(lat0r)
    assert s1r.shape == (2, 2, H // 8, W // 8, 4)
    np.testing.assert_allclose(np.asarray(s1r[0]), np.asarray(s1p),
                               atol=1e-4)
    assert not np.allclose(np.asarray(s1r[1]), np.asarray(s1r[0]))


def test_same_seed_reproducible(setup):
    cfg, params, sched, base, concept, ctl = setup
    kwargs = dict(cfg=cfg, sched=sched, unet_params=params,
                  key=jax.random.PRNGKey(11), height=H, width=W,
                  base_inputs=base, controller=ctl, stage=1)
    a = multiconcept.sample_stage(**kwargs)
    b = multiconcept.sample_stage(**kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
