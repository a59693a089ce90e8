"""Golden-output regression: the tiny two-stage generation is pinned.

The reference's de-facto verification is golden-seed visual inspection
(SURVEY.md §4). Here the equivalent is numeric: a fixed-seed tiny-config
two-stage run must keep producing the same latents across refactors.
Optimizations must be *exact* rewrites (lane P2P, prefix resume, merged
lanes, fused QKV all were); anything that legitimately changes numerics
must regenerate the fixture via
``python tests/test_golden.py regenerate``.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), "golden_two_stage.npz")


def _run():
    from omg_tpu.control import p2p
    from omg_tpu.diffusion import schedulers
    from omg_tpu.models import unet as unet_lib
    from omg_tpu.pipelines import multiconcept, sdxl

    H = W = 32
    cfg = sdxl.tiny_config()
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg.unet)
    sched = schedulers.make_schedule("euler", 5)
    d = cfg.unet.cross_attention_dim
    pdim = cfg.text_encoder_2.projection_dim
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    ep = jax.random.normal(ks[0], (1, 77, d))
    en = jax.random.normal(ks[1], (1, 77, d))
    pp = jax.random.normal(ks[2], (1, pdim))
    pn = jax.random.normal(ks[3], (1, pdim))
    tids = sdxl.add_time_ids((H, W), (0, 0), (H, W))
    base = multiconcept.make_base_inputs(ep, pp, en, pn, tids, 7.5)
    concept = multiconcept.make_concept_inputs(ep, pp, en, pn, tids)
    ctl = p2p.P2PControl.build(["a", "a"], 5, self_replace_steps=0.4,
                               width=2, height=2)
    lk = jax.random.split(jax.random.PRNGKey(42), 2)
    lora = {"mid_block": {"attentions": [{"transformer_blocks": [{
        "attn2": {"to_q": {
            "down": jax.random.normal(lk[0], (64, 2)) * 0.2,
            "up": jax.random.normal(lk[1], (2, 64)) * 0.2,
            "scale": jnp.asarray(1.0)}}}]}]}}
    m = np.zeros((2, 4, 4), np.float32)
    m[0, :, :2] = 1.0
    m[1, :, 2:] = 1.0
    lat1, cache = multiconcept.sample_stage1_cached(
        cfg, sched, params, key=jax.random.PRNGKey(7), height=H, width=W,
        base_inputs=base, fusion_start=1)
    lat2 = multiconcept.sample_stage2_resumed(
        cfg, sched, params, cache, base_inputs=base, controller=ctl,
        concept_inputs=[concept, concept], concept_loras=[lora, None],
        masks=jnp.asarray(m), fusion_start=1)
    return np.asarray(lat1), np.asarray(lat2)


def test_golden_two_stage():
    if not os.path.exists(FIXTURE):
        import pytest
        pytest.skip("fixture missing; run `python tests/test_golden.py "
                    "regenerate`")
    lat1, lat2 = _run()
    ref = np.load(FIXTURE)
    np.testing.assert_allclose(lat1, ref["stage1"], atol=5e-4,
                               err_msg="stage-1 output drifted")
    np.testing.assert_allclose(lat2, ref["stage2"], atol=5e-4,
                               err_msg="stage-2 output drifted")


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        lat1, lat2 = _run()
        np.savez(FIXTURE, stage1=lat1, stage2=lat2)
        print(f"wrote {FIXTURE}")
