"""ControlNet guidance windows + guess mode (reference parity).

The reference supports ``control_guidance_start/end`` (a per-step
``controlnet_keep`` gate, src/pipelines/lora_pipeline.py:421-427,511-517)
and ``guess_mode`` (conditional-batch-only residuals with a log-linear
depth ramp, :497-505,530-537). Behavioural tests per VERDICT round-2
item 6: the window zeroes residuals outside [start, end); guess mode
leaves uncond rows untouched and applies diffusers' logspace ramp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu.control import p2p
from omg_tpu.diffusion import schedulers
from omg_tpu.models import controlnet as cn_lib
from omg_tpu.models import unet as unet_lib
from omg_tpu.pipelines import multiconcept, sdxl

H = W = 32


@pytest.fixture(scope="module")
def setup():
    from omg_tpu import config as cfglib
    import jax.tree_util as jtu

    cfg = sdxl.tiny_config()
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg.unet)
    cn_cfg = cfglib.tiny_controlnet()
    cn_params = cn_lib.init_params(jax.random.PRNGKey(9), cn_cfg)
    # non-zero output heads so residuals are non-trivial
    cn_params = jtu.tree_map(
        lambda x: jnp.ones_like(x) * 0.02 if x.ndim == 4 else x, cn_params)

    d = cfg.unet.cross_attention_dim
    p_dim = cfg.text_encoder_2.projection_dim
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    ep = jax.random.normal(ks[0], (1, 77, d))
    en = jax.random.normal(ks[1], (1, 77, d))
    pp = jax.random.normal(ks[2], (1, p_dim))
    pn = jax.random.normal(ks[3], (1, p_dim))
    tids = sdxl.add_time_ids((H, W), (0, 0), (H, W))
    base = multiconcept.make_base_inputs(ep, pp, en, pn, tids, 7.5)
    concept = multiconcept.make_concept_inputs(ep, pp, en, pn, tids)
    cond = jax.random.uniform(jax.random.PRNGKey(12), (1, H, W, 3))
    return cfg, params, cn_cfg, cn_params, base, concept, cond


def _cn(cn_params, cond, scale=1.0, start=0.0, end=1.0, guess=False):
    return multiconcept.ControlNetInputs(
        params=cn_params, cond_image=cond, scale=jnp.asarray(scale),
        guidance_start=jnp.asarray(start, jnp.float32),
        guidance_end=jnp.asarray(end, jnp.float32), guess_mode=guess)


def _residuals(setup_t, cn, step_i, num_steps=8, cond_rows=(2, 3)):
    cfg, params, cn_cfg, cn_params, base, concept, cond = setup_t
    lin = jax.random.normal(jax.random.PRNGKey(3), (4, H // 8, W // 8, 4))
    return multiconcept._controlnet_residuals(
        (cn,), cn_cfg, lin, jnp.asarray(500), base.prompt_embeds,
        base.text_embeds, base.time_ids, step_i=jnp.asarray(step_i),
        num_steps=num_steps, cond_rows=cond_rows)


def test_window_gates_residuals(setup):
    """window (0.25, 0.75) at 8 steps: the reference keep formula
    1 - (i/S < s or (i+1)/S > e) keeps exactly steps 2..5."""
    _, _, _, cn_params, _, _, cond = setup
    cn = _cn(cn_params, cond, start=0.25, end=0.75)
    for i in range(8):
        down, mid = _residuals(setup, cn, i)
        expect_keep = not (i / 8 < 0.25 or (i + 1) / 8 > 0.75)
        assert expect_keep == (2 <= i <= 5)
        if expect_keep:
            assert np.abs(np.asarray(mid)).max() > 0
        else:
            np.testing.assert_array_equal(np.asarray(mid), 0.0)
            for r in down:
                np.testing.assert_array_equal(np.asarray(r), 0.0)


def test_default_window_matches_ungated(setup):
    """(0, 1) defaults reproduce the pre-window behavior exactly."""
    cfg, params, cn_cfg, cn_params, base, concept, cond = setup
    cn = _cn(cn_params, cond)
    lin = jax.random.normal(jax.random.PRNGKey(3), (4, H // 8, W // 8, 4))
    d0, m0 = multiconcept._controlnet_residuals(
        (cn,), cn_cfg, lin, jnp.asarray(500), base.prompt_embeds,
        base.text_embeds, base.time_ids)
    d1, m1 = _residuals(setup, cn, 3)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), atol=1e-6)
    for a, b in zip(d0, d1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_guess_mode_uncond_rows_zero(setup):
    """Guess mode: uncond CFG rows (0, 1) get exactly-zero residuals;
    cond rows (2, 3) are live (the reference zero-pads the uncond half,
    lora_pipeline.py:532-537)."""
    _, _, _, cn_params, _, _, cond = setup
    down, mid = _residuals(setup, _cn(cn_params, cond, guess=True), 3)
    np.testing.assert_array_equal(np.asarray(mid[:2]), 0.0)
    assert np.abs(np.asarray(mid[2:])).max() > 0
    for r in down:
        np.testing.assert_array_equal(np.asarray(r[:2]), 0.0)
        assert np.abs(np.asarray(r[2:])).max() > 0


def test_guess_mode_logspace_ramp(setup):
    """Guess-mode cond rows carry diffusers' logspace(-1, 0) depth ramp:
    the shallowest down residual is 0.1x the plain one, the mid residual
    is unscaled (ramp endpoint 1.0)."""
    cfg, params, cn_cfg, cn_params, base, concept, cond = setup
    # identical rows so guess (cond-embeds-only) == plain row-for-row
    lin = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(3), (1, H // 8, W // 8, 4)),
        (4, H // 8, W // 8, 4))
    ep = base.prompt_embeds[2:3]
    base_same = multiconcept.BaseInputs(
        prompt_embeds=jnp.broadcast_to(ep, (4,) + ep.shape[1:]),
        text_embeds=jnp.broadcast_to(base.text_embeds[2:3],
                                     (4,) + base.text_embeds.shape[1:]),
        time_ids=base.time_ids, guidance_scale=base.guidance_scale)

    def res(guess):
        return multiconcept._controlnet_residuals(
            (_cn(cn_params, cond, guess=guess),), cn_cfg, lin,
            jnp.asarray(500), base_same.prompt_embeds,
            base_same.text_embeds, base_same.time_ids,
            step_i=jnp.asarray(3), num_steps=8, cond_rows=(2, 3))

    d_plain, m_plain = res(False)
    d_guess, m_guess = res(True)
    n = len(d_plain)
    ramp = np.logspace(-1.0, 0.0, n + 1)
    np.testing.assert_allclose(np.asarray(m_guess[2:]),
                               np.asarray(m_plain[2:]), rtol=1e-5)
    for j, (a, b) in enumerate(zip(d_guess, d_plain)):
        np.testing.assert_allclose(np.asarray(a[2:]),
                                   ramp[j] * np.asarray(b[2:]),
                                   rtol=1e-4, atol=1e-7)


def test_concept_cn_window_and_guess(setup):
    """Per-concept ControlNets honor the window (all-zero outside) and
    guess mode (uncond lane rows zero) in the merged 2K-lane call."""
    cfg, params, cn_cfg, cn_params, base, concept, cond = setup
    rl = jax.random.normal(jax.random.PRNGKey(10), (4, H // 8, W // 8, 4))
    tembeds = jnp.concatenate([concept.text_embeds, concept.text_embeds])
    tids = jnp.concatenate([concept.time_ids, concept.time_ids])

    cn_win = _cn(cn_params, cond, start=0.5, end=1.0)
    down, mid = multiconcept._concept_cn_residuals(
        (cn_win, cn_win), (concept, concept), rl, jnp.asarray(500),
        tembeds, tids, cn_cfg, step_i=jnp.asarray(1), num_steps=8)
    np.testing.assert_array_equal(np.asarray(mid), 0.0)

    cn_g = _cn(cn_params, cond, guess=True)
    down, mid = multiconcept._concept_cn_residuals(
        (cn_g, cn_g), (concept, concept), rl, jnp.asarray(500),
        tembeds, tids, cn_cfg, step_i=jnp.asarray(6), num_steps=8)
    # lanes are (uncond, cond) pairs: even rows zero, odd rows live
    np.testing.assert_array_equal(np.asarray(mid[0::2]), 0.0)
    assert np.abs(np.asarray(mid[1::2])).max() > 0


def test_excluding_window_equals_no_controlnet(setup):
    """A window that never opens makes the full denoise bit-identical to
    running with no ControlNet at all."""
    cfg, params, cn_cfg, cn_params, base, concept, cond = setup
    sched = schedulers.make_schedule("euler", 6)
    ctl = p2p.P2PControl.build(["a", "a"], num_steps=6,
                               self_replace_steps=0.4, width=2, height=2)
    kwargs = dict(cfg=cfg, sched=sched, unet_params=params,
                  key=jax.random.PRNGKey(11), height=H, width=W,
                  base_inputs=base, controller=ctl, stage=1)
    plain = multiconcept.sample_stage(**kwargs)
    # (0.99, 1.0): i/6 < 0.99 for every i<6 -> keep == 0 at every step
    gated = multiconcept.sample_stage(
        **kwargs, base_controlnets=[
            _cn(cn_params, cond, start=0.99, end=1.0)], cn_cfg=cn_cfg)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(gated))


def test_guess_mode_end_to_end_finite(setup):
    """Guess-mode base ControlNet through the full two-stage program."""
    cfg, params, cn_cfg, cn_params, base, concept, cond = setup
    sched = schedulers.make_schedule("euler", 4)
    ctl = p2p.P2PControl.build(["a", "a"], num_steps=4,
                               self_replace_steps=0.4, width=2, height=2)
    m = np.zeros((1, H // 8, W // 8), np.float32)
    m[0, :2, :] = 1.0
    out = multiconcept.sample_stage(
        cfg, sched, params, key=jax.random.PRNGKey(11), height=H, width=W,
        base_inputs=base, controller=ctl, stage=2,
        concept_inputs=[concept], concept_loras=[None],
        masks=jnp.asarray(m), fusion_start=1,
        base_controlnets=[_cn(cn_params, cond, guess=True)], cn_cfg=cn_cfg)
    assert np.isfinite(np.asarray(out)).all()
