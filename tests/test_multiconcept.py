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


def test_two_stage_crop_matches_resumed_crop(setup):
    """two_stage_latents(concept_crop=True) — the throughput-bench path
    for the LCM+crop serving composition — == the host-orchestrated
    stage2_resumed(concept_crop=True), and stays vmappable."""
    cfg, params, sched, base, concept, ctl = setup
    key = jax.random.PRNGKey(29)
    masks = _masks()
    from omg_tpu.pipelines import sdxl as sdxl_mod
    lat0 = sdxl_mod.prepare_latents(key, 1, H, W, sched, cfg.unet.dtype)
    s1p, s2p = multiconcept.two_stage_latents(
        cfg, sched, params, lat0, base, ctl, (concept, concept),
        (None, None), masks, fusion_start=2, concept_crop=True)

    _, cache = multiconcept.sample_stage1_cached(
        cfg, sched, params, key=key, height=H, width=W, base_inputs=base,
        fusion_start=2)
    s2h = multiconcept.sample_stage2_resumed(
        cfg, sched, params, cache, base_inputs=base, controller=ctl,
        concept_inputs=[concept, concept], concept_loras=[None, None],
        masks=masks, fusion_start=2, concept_crop=True)
    np.testing.assert_allclose(np.asarray(s2p), np.asarray(s2h), atol=1e-5)

    # differs from the exact program (live masks use strip context)
    _, s2_exact = multiconcept.two_stage_latents(
        cfg, sched, params, lat0, base, ctl, (concept, concept),
        (None, None), masks, fusion_start=2)
    assert not np.allclose(np.asarray(s2p[1]), np.asarray(s2_exact[1]))

    # vmapped over a request axis (the bench throughput program)
    lat0r = jnp.stack([lat0, lat0 * 0.5])
    f = jax.jit(jax.vmap(lambda l: multiconcept.two_stage_latents(
        cfg, sched, params, l, base, ctl, (concept, concept),
        (None, None), masks, fusion_start=2, concept_crop=True)))
    _, s2r = f(lat0r)
    np.testing.assert_allclose(np.asarray(s2r[0]), np.asarray(s2p),
                               atol=1e-4)

    # indivisible strip width rejected at trace time
    import pytest
    bad = jnp.zeros((3, H // 8, W // 8), jnp.float32)
    with pytest.raises(ValueError, match="strips"):
        multiconcept.two_stage_latents(
            cfg, sched, params, lat0, base, ctl,
            (concept, concept, concept), (None, None, None), bad,
            fusion_start=2, concept_crop=True)


def test_same_seed_reproducible(setup):
    cfg, params, sched, base, concept, ctl = setup
    kwargs = dict(cfg=cfg, sched=sched, unet_params=params,
                  key=jax.random.PRNGKey(11), height=H, width=W,
                  base_inputs=base, controller=ctl, stage=1)
    a = multiconcept.sample_stage(**kwargs)
    b = multiconcept.sample_stage(**kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Per-concept ControlNet merge semantics (_concept_cn_residuals)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cn_setup(setup):
    from omg_tpu import config as cfglib
    from omg_tpu.models import controlnet as cn_lib
    import jax.tree_util as jtu

    cfg, params, sched, base, concept, ctl = setup
    cn_cfg = cfglib.tiny_controlnet()
    cn_params = cn_lib.init_params(jax.random.PRNGKey(9), cn_cfg)
    # non-zero heads so residuals are non-trivial
    cn_params = jtu.tree_map(
        lambda x: jnp.ones_like(x) * 0.02 if x.ndim == 4 else x, cn_params)
    rl = jax.random.normal(jax.random.PRNGKey(10), (4, H // 8, W // 8, 4))
    cond = jax.random.uniform(jax.random.PRNGKey(12), (1, H, W, 3))
    t = jnp.asarray(500)
    tembeds = jnp.concatenate([concept.text_embeds, concept.text_embeds])
    tids = jnp.concatenate([concept.time_ids, concept.time_ids])
    return cn_cfg, cn_params, rl, cond, t, tembeds, tids, concept


def _make_cn(cn_params, cond, scale, ehs=None):
    return multiconcept.ControlNetInputs(
        params=cn_params, cond_image=cond, scale=jnp.asarray(scale),
        encoder_hidden_states=ehs)


def test_concept_cn_none_entry_yields_zero_rows(cn_setup):
    """A concept without a ControlNet contributes exactly-zero residual
    rows (the reference's per-concept `mask is None` skip), and the stack
    always covers all 2K lanes — a heterogeneous (cn, None) list used to
    crash in jnp.broadcast_to."""
    cn_cfg, cn_params, rl, cond, t, tembeds, tids, concept = cn_setup
    down, mid = multiconcept._concept_cn_residuals(
        (_make_cn(cn_params, cond, 0.7), None), (concept, concept),
        rl, t, tembeds, tids, cn_cfg)
    assert mid.shape[0] == 4
    for r in down:
        assert r.shape[0] == 4
        np.testing.assert_array_equal(np.asarray(r[2:]), 0.0)
        assert np.abs(np.asarray(r[:2])).max() > 0
    np.testing.assert_array_equal(np.asarray(mid[2:]), 0.0)


def test_concept_cn_distinct_scales_per_lane(cn_setup):
    """Two concepts sharing one IdentityNet but with different scales:
    each concept's residual rows scale independently (round-1 silently
    used concept 0's scale for every lane)."""
    cn_cfg, cn_params, rl, cond, t, tembeds, tids, concept = cn_setup
    # identical lane latents (as in the real pipeline, where all concept
    # lanes broadcast from the cond-B row) so rows differ only by scale
    rl_same = jnp.broadcast_to(rl[:1], rl.shape)
    down, mid = multiconcept._concept_cn_residuals(
        (_make_cn(cn_params, cond, 0.5), _make_cn(cn_params, cond, 1.0)),
        (concept, concept), rl_same, t, tembeds, tids, cn_cfg)
    # same cond/embeds/latents => rows for concept 1 are exactly 2x concept 0's
    np.testing.assert_allclose(np.asarray(mid[2:]), 2.0 * np.asarray(mid[:2]),
                               rtol=1e-5)
    for r in down:
        np.testing.assert_allclose(np.asarray(r[2:]), 2.0 * np.asarray(r[:2]),
                                   rtol=1e-5)


def test_concept_cn_matches_sequential_reference(cn_setup):
    """Merged 2K-lane call == running each concept's ControlNet
    separately at b=2 (the reference's sequential semantics)."""
    from omg_tpu.models import controlnet as cn_lib
    cn_cfg, cn_params, rl, cond, t, tembeds, tids, concept = cn_setup
    cond2 = cond * 0.3
    down, mid = multiconcept._concept_cn_residuals(
        (_make_cn(cn_params, cond, 0.5), _make_cn(cn_params, cond2, 0.9)),
        (concept, concept), rl, t, tembeds, tids, cn_cfg)
    for k, (c, s) in enumerate([(cond, 0.5), (cond2, 0.9)]):
        d_ref, m_ref = cn_lib.apply(
            cn_params, cn_cfg, rl[2 * k:2 * k + 2], t,
            concept.prompt_embeds, jnp.broadcast_to(c, (2,) + c.shape[1:]),
            text_embeds=concept.text_embeds, time_ids=concept.time_ids,
            conditioning_scale=s)
        np.testing.assert_allclose(np.asarray(mid[2 * k:2 * k + 2]),
                                   np.asarray(m_ref), rtol=1e-4, atol=1e-5)
        for a, b in zip(down, d_ref):
            np.testing.assert_allclose(np.asarray(a[2 * k:2 * k + 2]),
                                       np.asarray(b), rtol=1e-4, atol=1e-5)


def test_concept_cn_distinct_params_raise(cn_setup):
    """Host-side validation: distinct weight trees must raise (the merged
    forward would silently drop all but the first), while sharing the
    same arrays — even through a rebuilt dict — passes."""
    cn_cfg, cn_params, rl, cond, t, tembeds, tids, concept = cn_setup
    distinct = jax.tree.map(lambda x: x + 0.0, cn_params)
    with pytest.raises(ValueError, match="share one params tree"):
        multiconcept.validate_concept_controlnets(
            (_make_cn(cn_params, cond, 1.0), _make_cn(distinct, cond, 1.0)))
    # same leaves, different dict object: fine
    shallow = dict(cn_params)
    multiconcept.validate_concept_controlnets(
        (_make_cn(cn_params, cond, 1.0), _make_cn(shallow, cond, 1.0)))
    # None entries are skipped
    multiconcept.validate_concept_controlnets(
        (None, _make_cn(cn_params, cond, 1.0)))


def test_concept_cn_mixed_ehs_raise(cn_setup):
    cn_cfg, cn_params, rl, cond, t, tembeds, tids, concept = cn_setup
    d = concept.prompt_embeds.shape[-1]
    ehs = jax.random.normal(jax.random.PRNGKey(13), (2, 4, d))
    with pytest.raises(ValueError, match="consistently"):
        multiconcept._concept_cn_residuals(
            (_make_cn(cn_params, cond, 1.0, ehs),
             _make_cn(cn_params, cond, 1.0)),
            (concept, concept), rl, t, tembeds, tids, cn_cfg)


def test_traj_path_with_selfreplace_in_suffix(setup):
    """3-row trajectory-fed stage 2 == the reference-layout 4-row program
    when the P2P self-attn replace window overlaps the fusion suffix
    (SDXL defaults: self_end=20 > boundary=16). Exercises the remapped
    src_lane=0/dst_lane=2 addressing in self_lane_qk AND cross_lane_out."""
    cfg, params, sched, base, concept, ctl_unused = setup
    # self_end = int(6*0.8) = 4 > boundary 2 => steps 2,3 replace self-attn
    ctl = p2p.P2PControl.build(["a", "a"], num_steps=6,
                               self_replace_steps=0.8, width=2, height=2)
    lk = jax.random.split(jax.random.PRNGKey(43), 2)
    lora = {"mid_block": {"attentions": [{"transformer_blocks": [{
        "attn1": {"to_v": {
            "down": jax.random.normal(lk[0], (64, 2)) * 0.3,
            "up": jax.random.normal(lk[1], (2, 64)) * 0.3,
            "scale": jnp.asarray(1.0)}}}]}]}}
    key = jax.random.PRNGKey(19)
    masks = _masks()
    slow_kw = dict(cfg=cfg, sched=sched, unet_params=params, key=key,
                   height=H, width=W, base_inputs=base, controller=ctl,
                   concept_inputs=[concept, concept],
                   concept_loras=[lora, lora], masks=masks, fusion_start=1)
    s2_slow = multiconcept.sample_stage(stage=2, **slow_kw)

    _, cache = multiconcept.sample_stage1_cached(
        cfg, sched, params, key=key, height=H, width=W, base_inputs=base,
        fusion_start=1)
    assert cache.a_traj is not None and cache.a_traj.shape[0] == 4
    s2_fast = multiconcept.sample_stage2_resumed(
        cfg, sched, params, cache, base_inputs=base, controller=ctl,
        concept_inputs=[concept, concept], concept_loras=[lora, lora],
        masks=masks, fusion_start=1)
    np.testing.assert_allclose(np.asarray(s2_fast), np.asarray(s2_slow),
                               atol=2e-4)


def test_lcm_fast_path_matches_reference_path(setup):
    """Under the STOCHASTIC LCM schedule the fast-path identities must
    still hold: re-noise draws are shared across the latent copies
    (schedulers.step shared_batch_noise) and keyed off the same
    seed-derived stream in both programs (noise_key threading)."""
    cfg, params, _, base, concept, ctl = setup
    sched = schedulers.make_schedule("lcm", 4)
    key = jax.random.PRNGKey(31)
    masks = _masks()
    slow_kw = dict(cfg=cfg, sched=sched, unet_params=params, key=key,
                   height=H, width=W, base_inputs=base, controller=ctl,
                   concept_inputs=[concept, concept],
                   concept_loras=[None, None], masks=masks, fusion_start=1)
    s1_slow = multiconcept.sample_stage(stage=1, **slow_kw)
    s2_slow = multiconcept.sample_stage(stage=2, **slow_kw)
    # the OMG premise: stage-1 copies stay bit-identical (stochastic
    # draws included)
    np.testing.assert_array_equal(np.asarray(s1_slow[0]),
                                  np.asarray(s1_slow[1]))

    s1_fast, cache = multiconcept.sample_stage1_cached(
        cfg, sched, params, key=key, height=H, width=W, base_inputs=base,
        fusion_start=1)
    s2_fast = multiconcept.sample_stage2_resumed(
        cfg, sched, params, cache, base_inputs=base, controller=ctl,
        concept_inputs=[concept, concept], concept_loras=[None, None],
        masks=masks, fusion_start=1)
    np.testing.assert_allclose(np.asarray(s1_fast), np.asarray(s1_slow),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(s2_fast), np.asarray(s2_slow),
                               atol=2e-4)


def test_mixed_instantid_lora_concepts_reference_layout(setup):
    """The reference-layout program accepts concepts that MIX InstantID
    (ip_context set) and plain LoRA (ip_context None) — LoRA-only lanes
    get zero IP tokens like the fast paths."""
    import dataclasses
    cfg, params, sched, base, concept, ctl = setup
    d = cfg.unet.cross_attention_dim
    ip_tokens = jax.random.normal(jax.random.PRNGKey(3), (2, 4, d))
    concept_ip = concept._replace(ip_context=ip_tokens)
    from omg_tpu.models import unet as unet_lib
    from omg_tpu.nn.attention import init_ip_kv
    ipk = [init_ip_kv(jax.random.PRNGKey(50 + i), d, 64)
           for i in range(unet_lib.num_cross_attention_layers(cfg.unet))]
    out = multiconcept.sample_stage(
        cfg=cfg, sched=sched, unet_params=params,
        key=jax.random.PRNGKey(9), height=H, width=W, base_inputs=base,
        controller=ctl, concept_inputs=[concept_ip, concept],
        concept_loras=[None, None], masks=_masks(), stage=2,
        fusion_start=1, concept_ip_adapters=(ipk,))
    assert out.shape[0] == 2
    assert bool(jnp.isfinite(out).all())


def test_clip_masks_to_strips():
    m = jnp.ones((2, 4, 4), jnp.float32)
    out = np.asarray(multiconcept.clip_masks_to_strips(m, 2))
    assert out[0, :, :2].all() and not out[0, :, 2:].any()
    assert out[1, :, 2:].all() and not out[1, :, :2].any()


def test_concept_crop_mode(setup):
    """Opt-in cropped-concept stage 2: runs, matches the exact program
    when fusion is a no-op (zero masks), diverges (by design) when
    concept predictions are actually used."""
    cfg, params, sched, base, concept, ctl = setup
    key = jax.random.PRNGKey(77)
    _, cache = multiconcept.sample_stage1_cached(
        cfg, sched, params, key=key, height=H, width=W, base_inputs=base,
        fusion_start=1)
    kw = dict(cfg=cfg, sched=sched, unet_params=params, cache=cache,
              base_inputs=base, controller=ctl,
              concept_inputs=[concept, concept],
              concept_loras=[None, None], fusion_start=1)

    # zero masks: fusion no-op in both programs -> same trajectory
    zero = jnp.zeros((2, H // 8, W // 8), jnp.float32)
    exact = multiconcept.sample_stage2_resumed(masks=zero, **kw)
    crop = multiconcept.sample_stage2_resumed(masks=zero,
                                              concept_crop=True, **kw)
    np.testing.assert_allclose(np.asarray(crop), np.asarray(exact),
                               atol=2e-4)

    # live masks (crossing the strip boundary gets clipped): runs,
    # finite, copy A untouched, and differs from the exact program
    masks = _masks()
    exact2 = multiconcept.sample_stage2_resumed(masks=masks, **kw)
    crop2 = multiconcept.sample_stage2_resumed(masks=masks,
                                               concept_crop=True, **kw)
    assert bool(jnp.isfinite(crop2).all())
    np.testing.assert_array_equal(np.asarray(crop2[0]),
                                  np.asarray(exact2[0]))  # copy A
    assert not np.array_equal(np.asarray(crop2[1]), np.asarray(exact2[1]))


def test_concept_crop_with_base_controlnet(setup, cn_setup):
    """crop + base-row spatial ControlNet (round-3 VERDICT item 4): the
    base rows run full-frame, so the CN residuals are exactly the exact
    program's — with zero masks (fusion no-op) crop+CN == exact+CN
    end-to-end (this FAILS if the crop program drops the residuals);
    with live masks it runs finite and copy A stays untouched."""
    cfg, params, sched, base, concept, ctl = setup
    cn_cfg, cn_params, _, cond, *_ = cn_setup
    cn = (_make_cn(cn_params, cond, 0.7),)
    _, cache = multiconcept.sample_stage1_cached(
        cfg, sched, params, key=jax.random.PRNGKey(21), height=H, width=W,
        base_inputs=base, fusion_start=1, base_controlnets=cn,
        cn_cfg=cn_cfg)
    kw = dict(cfg=cfg, sched=sched, unet_params=params, cache=cache,
              base_inputs=base, controller=ctl,
              concept_inputs=[concept, concept],
              concept_loras=[None, None], fusion_start=1,
              base_controlnets=cn, cn_cfg=cn_cfg)
    zero = jnp.zeros((2, H // 8, W // 8), jnp.float32)
    exact = multiconcept.sample_stage2_resumed(masks=zero, **kw)
    crop = multiconcept.sample_stage2_resumed(masks=zero,
                                              concept_crop=True, **kw)
    np.testing.assert_allclose(np.asarray(crop), np.asarray(exact),
                               atol=2e-4)

    crop2 = multiconcept.sample_stage2_resumed(masks=_masks(),
                                               concept_crop=True, **kw)
    assert bool(jnp.isfinite(crop2).all())
    np.testing.assert_array_equal(np.asarray(crop2[0]),
                                  np.asarray(exact[0]))  # copy A

    # per-concept ControlNets still refuse the strip program
    with pytest.raises(ValueError, match="concept_crop requires"):
        multiconcept.sample_stage2_resumed(
            masks=_masks(), concept_crop=True,
            concept_controlnets=(_make_cn(cn_params, cond, 0.5), None),
            **kw)


def test_concept_crop_rejects_unsupported(setup):
    cfg, params, sched, base, concept, ctl = setup
    _, cache = multiconcept.sample_stage1_cached(
        cfg, sched, params, key=jax.random.PRNGKey(1), height=H, width=W,
        base_inputs=base, fusion_start=1)
    import pytest
    with pytest.raises(ValueError, match="concept_crop requires"):
        multiconcept.sample_stage2_resumed(
            cfg, sched, params, cache, base_inputs=base, controller=ctl,
            concept_inputs=[], concept_loras=[], masks=_masks(),
            fusion_start=1, concept_crop=True)
