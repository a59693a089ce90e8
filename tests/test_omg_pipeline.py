"""High-level OMG pipeline: DSL, token gating, two-stage orchestration."""

import jax
import numpy as np
import pytest

from omg_tpu import rewrite
from omg_tpu.pipelines import omg as omg_lib
from omg_tpu.pipelines import sdxl
from omg_tpu.text.tokenizer import ToyTokenizer

H = W = 32


def test_parse_rewrite_two_field():
    r = rewrite.parse_rewrite(
        "[photo of the man]-*-[ugly]|[photo of the woman]-*-[blurry]")
    assert len(r) == 2
    assert r[0].prompt == "photo of the man"
    assert r[0].negative_prompt == "ugly"
    assert r[1].ref_image is None


def test_parse_rewrite_three_field():
    r = rewrite.parse_rewrite(
        "[a man]-*-[bad]-*-./example/chris-evans.jpg|[a woman]-*-[bad]-*-"
        "./example/TaylorSwift.png")
    assert r[0].ref_image == "./example/chris-evans.jpg"
    assert r[1].ref_image == "./example/TaylorSwift.png"


def test_parse_rewrite_trailing_empty():
    assert rewrite.parse_rewrite("") == []
    assert len(rewrite.parse_rewrite("[a]-*-[b]|")) == 1


@pytest.fixture(scope="module")
def engine():
    cfg = sdxl.tiny_config()
    params = sdxl.init_params(jax.random.PRNGKey(0), cfg)
    calls = []

    def provider(image, cls):
        calls.append(cls)
        m = np.zeros(image.shape[:2], np.float32)
        if cls == "man":
            m[:, : image.shape[1] // 2] = 1.0
        else:
            m[:, image.shape[1] // 2:] = 1.0
        return m

    eng = omg_lib.OMG(cfg=cfg, params=params,
                      tokenizer=ToyTokenizer(), tokenizer_2=ToyTokenizer(),
                      mask_provider=provider, num_steps=4)
    return eng, calls


def test_generate_two_stage(engine):
    eng, calls = engine
    calls.clear()
    res = eng.generate(
        "photo of the man and woman at the beach",
        negative_prompt="ugly",
        prompt_rewrite="[photo of the chris man]-*-[ugly]|"
                       "[photo of the taylor woman]-*-[ugly]",
        seed=7, height=H, width=W)
    assert calls == ["man", "woman"]
    assert res.stage1.shape == (2, H, W, 3)
    assert res.stage2 is not None
    assert res.image.shape == (H, W, 3)
    assert res.image.dtype == np.uint8


def test_generate_gating_skips_detection(engine):
    """No 'man'/'woman' token in the global prompt => no detection, no
    stage 2 (reference: inference_lora.py:276-285)."""
    eng, calls = engine
    calls.clear()
    res = eng.generate(
        "photo of two cats",
        prompt_rewrite="[tabby cat]-*-[ugly]|[black cat]-*-[ugly]",
        seed=3, height=H, width=W)
    assert calls == []
    assert res.stage2 is None
    assert res.image.shape == (H, W, 3)


def test_generate_instantid_path(engine):
    """InstantID stack through OMG.generate: resampler face tokens, IP
    dual attention in concept UNets, IdentityNet per-concept ControlNet."""
    import jax.numpy as jnp
    from omg_tpu import config as cfglib
    from omg_tpu import instantid
    from omg_tpu.models import controlnet as cn_lib
    from omg_tpu.models import resampler as rs_lib
    from omg_tpu.models import unet as unet_lib
    from omg_tpu.nn.attention import init_ip_kv

    eng, calls = engine
    rs_cfg = cfglib.tiny_resampler()
    rs_params = rs_lib.init_params(jax.random.PRNGKey(1), rs_cfg)
    n_layers = unet_lib.num_cross_attention_layers(eng.cfg.unet)
    ip_layers = [init_ip_kv(jax.random.PRNGKey(10 + i),
                            eng.cfg.unet.cross_attention_dim, 64)
                 for i in range(n_layers)]
    cn_cfg = cfglib.tiny_controlnet()
    idnet = cn_lib.init_params(jax.random.PRNGKey(2), cn_cfg)

    iid = omg_lib.InstantIDModels(
        resampler_cfg=rs_cfg, resampler_params=rs_params,
        ip_adapter_layers=ip_layers, identitynet_params=idnet,
        identitynet_cfg=cn_cfg)
    eng2 = omg_lib.OMG(cfg=eng.cfg, params=eng.params,
                       tokenizer=eng.tokenizer, tokenizer_2=eng.tokenizer_2,
                       mask_provider=eng.mask_provider, num_steps=4,
                       cn_cfg=cn_cfg)

    kps = [np.array([[10, 12], [22, 12], [16, 18], [12, 24], [20, 24]],
                    np.float32)]
    kps_img = instantid.draw_kps(H, W, kps)
    assert kps_img.shape == (H, W, 3) and kps_img.dtype == np.uint8
    assert kps_img.max() > 0

    embeds = [np.random.randn(16).astype(np.float32),
              np.random.randn(16).astype(np.float32)]
    res = eng2.generate(
        "the man and the woman", negative_prompt="bad",
        prompt_rewrite="[the man]-*-[bad]|[the woman]-*-[bad]",
        seed=5, height=H, width=W, guidance_scale=3.0,
        instantid=iid, face_embeddings=embeds, face_kps_image=kps_img)
    assert res.stage2 is not None
    assert res.image.shape == (H, W, 3)

    # a different identity embedding must change the stage-2 output
    embeds_b = [np.random.randn(16).astype(np.float32) + 2.0, embeds[1]]
    res_b = eng2.generate(
        "the man and the woman", negative_prompt="bad",
        prompt_rewrite="[the man]-*-[bad]|[the woman]-*-[bad]",
        seed=5, height=H, width=W, guidance_scale=3.0,
        instantid=iid, face_embeddings=embeds_b, face_kps_image=kps_img)
    assert not np.array_equal(res.stage2, res_b.stage2)
    np.testing.assert_array_equal(res.stage1, res_b.stage1)


def test_text_encoder_lora_affects_region(engine):
    """Character LoRAs carry text-encoder deltas; they must flow into the
    region-prompt encodings and change stage 2 (copy A untouched)."""
    import jax.numpy as jnp
    eng, _ = engine
    k1, k2 = jax.random.split(jax.random.PRNGKey(31))
    d = eng.cfg.text_encoder.hidden_size
    te_tree = {"text_model": {"encoder": {"layers": {0: {"self_attn": {
        "q_proj": {"down": jax.random.normal(k1, (d, 2)) * 0.3,
                   "up": jax.random.normal(k2, (2, d)) * 0.3,
                   "scale": jnp.asarray(1.0)}}}}}}}
    lora_with_te = {"text_encoder": te_tree}

    kw = dict(negative_prompt="bad",
              prompt_rewrite="[the man]-*-[bad]|[the woman]-*-[bad]",
              seed=8, height=H, width=W)
    base = eng.generate("the man and the woman",
                        concept_loras=[None, None], **kw)
    with_te = eng.generate("the man and the woman",
                           concept_loras=[lora_with_te, None], **kw)
    np.testing.assert_array_equal(base.stage1, with_te.stage1)
    assert not np.array_equal(base.stage2, with_te.stage2)


def test_generate_with_spatial_controlnet(engine):
    """BASELINE config #3: pose/canny spatial control over the 2-concept
    generation (reference: inference_lora.py --spatial_condition)."""
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from omg_tpu import config as cfglib
    from omg_tpu.models import controlnet as cn_lib

    eng, _ = engine
    cn_cfg = cfglib.tiny_controlnet()
    cn_params = cn_lib.init_params(jax.random.PRNGKey(3), cn_cfg)
    # non-zero heads so the condition actually shifts the output
    cn_params = jtu.tree_map(
        lambda x: jnp.ones_like(x) * 0.01 if x.ndim == 4 else x, cn_params)
    eng2 = omg_lib.OMG(cfg=eng.cfg, params=eng.params,
                       tokenizer=eng.tokenizer, tokenizer_2=eng.tokenizer_2,
                       mask_provider=eng.mask_provider, num_steps=3,
                       cn_cfg=cn_cfg)
    cond = (np.random.rand(H, W, 3) * 255).astype(np.uint8)
    kw = dict(negative_prompt="bad",
              prompt_rewrite="[the man]-*-[bad]|[the woman]-*-[bad]",
              seed=6, height=H, width=W)
    with_cn = eng2.generate("the man and the woman", spatial_condition=cond,
                            controlnet_params=cn_params,
                            controlnet_scale=1.0, **kw)
    without = eng2.generate("the man and the woman", **kw)
    assert with_cn.stage2 is not None
    assert not np.array_equal(with_cn.stage1, without.stage1)


def test_generate_zero_regions(engine):
    """BASELINE config #1: plain single-prompt generation — empty
    prompt_rewrite means no concepts, no detection, stage 1 only."""
    eng, calls = engine
    calls.clear()
    res = eng.generate("a mountain at sunset", prompt_rewrite="",
                       seed=2, height=H, width=W)
    assert calls == []
    assert res.stage2 is None
    assert res.image.shape == (H, W, 3)


def test_generate_single_region(engine):
    """One concept: fusion covers only that region."""
    eng, _ = engine
    res = eng.generate("the man on a hill",
                       prompt_rewrite="[the chris man]-*-[ugly]",
                       seed=4, height=H, width=W)
    assert res.stage2 is not None
    assert len(res.masks) == 1 and res.masks[0] is not None


def test_generate_deterministic(engine):
    eng, _ = engine
    kw = dict(prompt_rewrite="[the man]-*-[u]|[the woman]-*-[u]",
              seed=11, height=H, width=W)
    a = eng.generate("the man and the woman", **kw)
    b = eng.generate("the man and the woman", **kw)
    np.testing.assert_array_equal(a.stage1, b.stage1)
    np.testing.assert_array_equal(a.stage2, b.stage2)


def test_generate_batch_matches_serial(engine):
    """Two heterogeneous requests (different seeds, guidance, adapters —
    one with a LoRA, one without) batched as one vmapped program per
    stage must reproduce the serial results."""
    import jax.numpy as jnp
    eng, _ = engine
    lk = jax.random.split(jax.random.PRNGKey(77), 2)
    lora = {"unet": {"mid_block": {"attentions": [{"transformer_blocks": [{
        "attn2": {"to_q": {
            "down": jax.random.normal(lk[0], (64, 2)) * 0.2,
            "up": jax.random.normal(lk[1], (2, 64)) * 0.2,
            "scale": jnp.asarray(1.0)}}}]}]}}}
    reqs = [
        dict(prompt="the man and the woman", negative_prompt="bad",
             prompt_rewrite="[the man]-*-[b]|[the woman]-*-[b]",
             concept_loras=[lora, None], seed=3, height=H, width=W,
             guidance_scale=7.5),
        dict(prompt="the man and the woman at night", negative_prompt="ugly",
             prompt_rewrite="[the man]-*-[b]|[the woman]-*-[b]",
             concept_loras=[None, None], seed=9, height=H, width=W,
             guidance_scale=5.0),
    ]
    batched = eng.generate_batch([dict(r) for r in reqs])
    serial = [eng.generate(r.pop("prompt"), **r) for r in [dict(x) for x in reqs]]
    assert len(batched) == 2
    for b, s in zip(batched, serial):
        np.testing.assert_allclose(b.stage1.astype(np.int32),
                                   s.stage1.astype(np.int32), atol=1)
        assert (b.stage2 is None) == (s.stage2 is None)
        if b.stage2 is not None:
            np.testing.assert_allclose(b.stage2.astype(np.int32),
                                       s.stage2.astype(np.int32), atol=1)


def test_generate_batch_falls_back_serial_for_instantid(engine):
    eng, _ = engine
    reqs = [dict(prompt="two cats", prompt_rewrite="", seed=1,
                 height=H, width=W),
            dict(prompt="two dogs", prompt_rewrite="", seed=2,
                 height=H, width=W, face_embeddings=[np.zeros(16)])]
    out = eng.generate_batch(reqs)
    assert len(out) == 2 and all(r.image.shape == (H, W, 3) for r in out)


def test_generate_lcm_few_step(engine):
    """scheduler='lcm' runs the full two-stage engine in few-step mode
    (the LCM-LoRA serving configuration; no reference equivalent)."""
    eng, _ = engine
    lcm = omg_lib.OMG(cfg=eng.cfg, params=eng.params,
                      tokenizer=eng.tokenizer, tokenizer_2=eng.tokenizer_2,
                      mask_provider=eng.mask_provider,
                      scheduler="lcm", num_steps=4)
    res = lcm.generate("the man and the woman", seed=7, height=32, width=32,
                       prompt_rewrite="[the man]-*-[bad]|[the woman]-*-[bad]",
                       concept_loras=[None, None])
    img = res.image
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert np.isfinite(img.astype(np.float32)).all()


def test_engine_concept_crop_mode(engine):
    """concept_crop=True engine runs the strip-cropped stage 2."""
    eng, _ = engine
    crop_eng = omg_lib.OMG(cfg=eng.cfg, params=eng.params,
                           tokenizer=eng.tokenizer,
                           tokenizer_2=eng.tokenizer_2,
                           mask_provider=eng.mask_provider,
                           num_steps=4, concept_crop=True)
    kw = dict(prompt_rewrite="[the man]-*-[bad]|[the woman]-*-[bad]",
              concept_loras=[None, None], seed=6, height=H, width=W)
    res = crop_eng.generate("the man and the woman", **kw)
    assert res.image.shape == (H, W, 3)
    assert np.isfinite(res.image.astype(np.float32)).all()
    # stage 1 identical to the exact engine; stage 2 the approximate one
    exact = eng.generate("the man and the woman", num_steps=4, **kw)
    np.testing.assert_array_equal(res.stage1, exact.stage1)


def test_parse_rewrite_doubled_pipe():
    """A '||' typo must not silently drop the regions after it."""
    from omg_tpu import rewrite
    regions = rewrite.parse_rewrite(
        "[a man]-*-[ugly]||[a woman]-*-[ugly]")
    assert len(regions) == 2
    assert regions[1].prompt.strip("[]") == "a woman"


def _nonzero_zero_convs(cn_params):
    """Random-init ControlNets have FAITHFULLY zero zero-conv heads, so
    their residuals are exactly zero and condition changes are invisible
    at test scale; perturb the heads so conditioning has an effect."""
    import jax.numpy as jnp
    out = dict(cn_params)
    k = jax.random.PRNGKey(99)
    out["controlnet_mid_block"] = {
        "weight": jax.random.normal(
            k, cn_params["controlnet_mid_block"]["weight"].shape) * 0.2,
        "bias": cn_params["controlnet_mid_block"]["bias"]}
    return out


def test_generate_instantid_stage1_kps_provider(engine):
    """face_kps_provider is invoked with the STAGE-1 image between the
    stages (reference: face_app.get(stage1) + draw_kps_multi,
    inference_instantid.py:352-354), and its rendering conditions the
    IdentityNet; a None return degrades to no IdentityNet condition."""
    import jax.numpy as jnp
    from omg_tpu import config as cfglib
    from omg_tpu import instantid
    from omg_tpu.models import controlnet as cn_lib
    from omg_tpu.models import resampler as rs_lib
    from omg_tpu.models import unet as unet_lib
    from omg_tpu.nn.attention import init_ip_kv

    eng, _ = engine
    rs_cfg = cfglib.tiny_resampler()
    cn_cfg = cfglib.tiny_controlnet()
    iid = omg_lib.InstantIDModels(
        resampler_cfg=rs_cfg,
        resampler_params=rs_lib.init_params(jax.random.PRNGKey(1), rs_cfg),
        ip_adapter_layers=[
            init_ip_kv(jax.random.PRNGKey(10 + i),
                       eng.cfg.unet.cross_attention_dim, 64)
            for i in range(unet_lib.num_cross_attention_layers(
                eng.cfg.unet))],
        identitynet_params=_nonzero_zero_convs(
            cn_lib.init_params(jax.random.PRNGKey(2), cn_cfg)),
        identitynet_cfg=cn_cfg)
    eng2 = omg_lib.OMG(cfg=eng.cfg, params=eng.params,
                       tokenizer=eng.tokenizer,
                       tokenizer_2=eng.tokenizer_2,
                       mask_provider=eng.mask_provider, num_steps=4,
                       cn_cfg=cn_cfg)

    seen = []

    def provider(stage1_img):
        seen.append(stage1_img.shape)
        kps = [np.array([[10, 12], [22, 12], [16, 18], [12, 24],
                         [20, 24]], np.float32)]
        return instantid.draw_kps(H, W, kps)

    kw = dict(negative_prompt="bad",
              prompt_rewrite="[the man]-*-[bad]|[the woman]-*-[bad]",
              seed=5, height=H, width=W, guidance_scale=3.0,
              instantid=iid,
              face_embeddings=[np.random.randn(16).astype(np.float32)] * 2)
    res = eng2.generate("the man and the woman",
                        face_kps_provider=provider, **kw)
    assert seen == [(H, W, 3)]             # called once, stage-1 frame
    assert res.stage2 is not None

    # provider returning None -> stage 2 still runs, no IdentityNet CN
    res_none = eng2.generate("the man and the woman",
                             face_kps_provider=lambda img: None, **kw)
    assert res_none.stage2 is not None
    # the kps condition changed the output vs the unconditioned run
    assert not np.array_equal(res.stage2, res_none.stage2)


def test_generate_per_request_scheduler_override(engine):
    """generate(scheduler=...) overrides the engine default — the
    serving path for LCM few-step requests on an euler server."""
    eng, calls = engine
    kw = dict(prompt_rewrite="", seed=5, height=H, width=W)
    a = eng.generate("a hill", **kw)                      # euler default
    # NOTE: ddim(eta=0) == euler on the same grid (same integrator in a
    # different parameterization) — use the genuinely second-order
    # DPM++2M to observe the override.
    b = eng.generate("a hill", scheduler="dpmpp_2m", **kw)
    assert np.isfinite(b.image.astype(np.float32)).all()
    assert not np.array_equal(a.stage1, b.stage1)


def test_generate_batch_rejects_mixed_schedulers(engine):
    eng, calls = engine
    reqs = [{"prompt": "a hill", "seed": 1, "height": H, "width": W,
             "prompt_rewrite": "[a]-*-[b]|[c]-*-[d]"},
            {"prompt": "a hill", "seed": 2, "height": H, "width": W,
             "scheduler": "ddim",
             "prompt_rewrite": "[a]-*-[b]|[c]-*-[d]"}]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="scheduler"):
        eng.generate_batch(reqs)


def test_generate_mesh_matches_single_device(engine):
    """Engine-level multi-chip latency mode: OMG(mesh=...) .generate()
    (stage 1 spatially sharded, stage 2 lane-parallel, H-sharded decode)
    must reproduce the single-device engine's images on the virtual
    8-device mesh — the user-facing path behind the --mesh CLI flags.

    64 px (latent 8, deepest UNet level 4 rows over the 4-way seq axis)
    exercises the SHARDED stage 1; 32 px (deepest level 2 rows — not
    divisible) must take the guard's unsharded fallback: a padded H
    shard leaks garbage through the downsample->upsample reshapes
    under GSPMD (reproduced at ~0.2 latent error), so the engine only
    shards divisible geometries."""
    from omg_tpu.parallel import mesh as mesh_lib

    eng, _ = engine
    mesh_eng = omg_lib.OMG(cfg=eng.cfg, params=eng.params,
                           tokenizer=eng.tokenizer,
                           tokenizer_2=eng.tokenizer_2,
                           mask_provider=eng.mask_provider, num_steps=4,
                           mesh=mesh_lib.make_latency_mesh(8))
    # (hw, rewrite): 64 px K=2 = the sharded 8-lane layout; 32 px K=2 =
    # the guard fallback; 64 px K=1 = 6 lanes GSPMD-PADDED over 8 chips
    # with the mesh-committed weights (the pipeline-level K=1 test runs
    # uncommitted weights, which compiles differently — see the padding
    # miscompute this test's guard exists for)
    cases = [(64, "[the man]-*-[b]|[the woman]-*-[b]"),
             (32, "[the man]-*-[b]|[the woman]-*-[b]"),
             (64, "[the man]-*-[b]")]
    for hw, rw in cases:
        kw = dict(negative_prompt="bad", prompt_rewrite=rw,
                  seed=13, height=hw, width=hw)
        got = mesh_eng.generate("the man and the woman", **kw)
        want = eng.generate("the man and the woman", num_steps=4, **kw)
        np.testing.assert_allclose(got.stage1.astype(np.int32),
                                   want.stage1.astype(np.int32), atol=1,
                                   err_msg=f"stage1 at {hw}px {rw!r}")
        assert got.stage2 is not None and want.stage2 is not None
        np.testing.assert_allclose(got.stage2.astype(np.int32),
                                   want.stage2.astype(np.int32), atol=1,
                                   err_msg=f"stage2 at {hw}px {rw!r}")


def test_generate_mesh_deepcache_matches_single_device(engine):
    """mesh x cache_interval composition at the ENGINE level (the
    pipeline-level equality tests run uncommitted weights, which GSPMD
    partitions differently — see test_generate_mesh_matches_single_device's
    padding-miscompute note): OMG(mesh=..., cache_interval=2).generate()
    must reproduce the single-device DeepCache engine's images."""
    from omg_tpu.parallel import mesh as mesh_lib

    eng, _ = engine
    mesh_eng = omg_lib.OMG(cfg=eng.cfg, params=eng.params,
                           tokenizer=eng.tokenizer,
                           tokenizer_2=eng.tokenizer_2,
                           mask_provider=eng.mask_provider, num_steps=4,
                           cache_interval=2,
                           mesh=mesh_lib.make_latency_mesh(8))
    kw = dict(negative_prompt="bad",
              prompt_rewrite="[the man]-*-[b]|[the woman]-*-[b]",
              seed=13, height=64, width=64)
    got = mesh_eng.generate("the man and the woman", **kw)
    # per-request override on the exact single-device engine: the same
    # DeepCache program, unsharded
    want = eng.generate("the man and the woman", num_steps=4,
                        cache_interval=2, **kw)
    np.testing.assert_allclose(got.stage1.astype(np.int32),
                               want.stage1.astype(np.int32), atol=1)
    assert got.stage2 is not None and want.stage2 is not None
    np.testing.assert_allclose(got.stage2.astype(np.int32),
                               want.stage2.astype(np.int32), atol=1)


def test_generate_batch_matches_serial_instantid_controlnet(engine):
    """Round-3 batched serving (BASELINE config #5's full batched half):
    one InstantID request and one spatial-ControlNet request batched as
    one vmapped program per stage must reproduce the serial results —
    including the zero-token IP / zero-scale ControlNet no-op rows the
    mixed batch synthesizes."""
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from omg_tpu import config as cfglib
    from omg_tpu import instantid
    from omg_tpu.models import controlnet as cn_lib
    from omg_tpu.models import resampler as rs_lib
    from omg_tpu.models import unet as unet_lib
    from omg_tpu.nn.attention import init_ip_kv

    eng, _ = engine
    rs_cfg = cfglib.tiny_resampler()
    rs_params = rs_lib.init_params(jax.random.PRNGKey(1), rs_cfg)
    n_layers = unet_lib.num_cross_attention_layers(eng.cfg.unet)
    ip_layers = [init_ip_kv(jax.random.PRNGKey(10 + i),
                            eng.cfg.unet.cross_attention_dim, 64)
                 for i in range(n_layers)]
    cn_cfg = cfglib.tiny_controlnet()
    idnet = cn_lib.init_params(jax.random.PRNGKey(2), cn_cfg)
    iid = omg_lib.InstantIDModels(
        resampler_cfg=rs_cfg, resampler_params=rs_params,
        ip_adapter_layers=ip_layers, identitynet_params=idnet,
        identitynet_cfg=cn_cfg)
    cn_params = cn_lib.init_params(jax.random.PRNGKey(3), cn_cfg)
    cn_params = jtu.tree_map(
        lambda x: jnp.ones_like(x) * 0.02 if x.ndim == 4 else x, cn_params)
    eng2 = omg_lib.OMG(cfg=eng.cfg, params=eng.params,
                       tokenizer=eng.tokenizer, tokenizer_2=eng.tokenizer_2,
                       mask_provider=eng.mask_provider, num_steps=4,
                       cn_cfg=cn_cfg)

    kps = [np.array([[10, 12], [22, 12], [16, 18], [12, 24], [20, 24]],
                    np.float32)]
    kps_img = instantid.draw_kps(H, W, kps)
    rng = np.random.default_rng(0)
    embeds = [rng.standard_normal(16).astype(np.float32),
              rng.standard_normal(16).astype(np.float32)]
    cond = (rng.random((H, W, 3)) * 255).astype(np.uint8)

    reqs = [
        dict(prompt="the man and the woman", negative_prompt="bad",
             prompt_rewrite="[the man]-*-[b]|[the woman]-*-[b]",
             seed=3, height=H, width=W, guidance_scale=3.0,
             instantid=iid, face_embeddings=embeds,
             face_kps_image=kps_img),
        dict(prompt="the man and the woman at night",
             negative_prompt="ugly",
             prompt_rewrite="[the man]-*-[b]|[the woman]-*-[b]",
             seed=9, height=H, width=W, guidance_scale=7.5,
             spatial_condition=cond, controlnet_params=cn_params,
             controlnet_scale=0.8, control_guidance_start=0.1,
             control_guidance_end=0.9),
    ]
    batched = eng2.generate_batch([dict(r) for r in reqs])
    serial = [eng2.generate(r.pop("prompt"), **r)
              for r in [dict(x) for x in reqs]]
    assert len(batched) == 2
    for b, s in zip(batched, serial):
        np.testing.assert_allclose(b.stage1.astype(np.int32),
                                   s.stage1.astype(np.int32), atol=1)
        assert b.stage2 is not None and s.stage2 is not None
        np.testing.assert_allclose(b.stage2.astype(np.int32),
                                   s.stage2.astype(np.int32), atol=1)
