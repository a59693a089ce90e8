"""DeepCache (branch-0 feature caching) — plumbing and loop tests.

The approximation contract: ``apply_shallow`` fed the cache captured by
``apply(..., return_cache=True)`` at the SAME (sample, t) must reproduce
the full forward bit-exactly — staleness of the cache is the ONLY source
of drift (Ma et al. 2023, arXiv 2312.00858). Reference workload being
accelerated: the per-step UNet calls of
/root/reference/src/pipelines/lora_pipeline.py:485-615.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu import config as cfglib
from omg_tpu.models import unet
from omg_tpu.nn.attention import init_ip_kv
from omg_tpu.pipelines import sdxl


def _inputs(cfg, key, b=2, hw=16):
    ks = jax.random.split(key, 5)
    d = cfg.cross_attention_dim
    pdim = cfg.projection_class_embeddings_input_dim - \
        6 * cfg.addition_time_embed_dim
    return dict(
        sample=jax.random.normal(ks[0], (b, hw, hw, 4), cfg.dtype),
        timestep=jnp.asarray(499.0),
        ehs=jax.random.normal(ks[1], (b, 7, d), cfg.dtype),
        text_embeds=jax.random.normal(ks[2], (b, pdim), cfg.dtype),
        time_ids=jnp.tile(jnp.asarray([[16., 16., 0., 0., 16., 16.]]),
                          (b, 1)),
    )


def _full_and_shallow(cfg, params, inp, **kw):
    out_full, cache = unet.apply(
        params, cfg, inp["sample"], inp["timestep"], inp["ehs"],
        text_embeds=inp["text_embeds"], time_ids=inp["time_ids"],
        return_cache=True, **kw)
    out_shallow = unet.apply_shallow(
        params, cfg, inp["sample"], inp["timestep"], inp["ehs"],
        text_embeds=inp["text_embeds"], time_ids=inp["time_ids"],
        cache=cache, **kw)
    return out_full, cache, out_shallow


class TestShallowPlumbing:
    def test_same_step_cache_reproduces_full(self):
        """tiny config (attention-free level 0, like SDXL)."""
        cfg = cfglib.tiny_unet()
        params = unet.init_params(jax.random.PRNGKey(0), cfg)
        inp = _inputs(cfg, jax.random.PRNGKey(1))
        out_full, cache, out_shallow = _full_and_shallow(cfg, params, inp)
        assert cache.shape == unet.cache_shape(cfg, 2, 16, 16)
        np.testing.assert_array_equal(np.asarray(out_full),
                                      np.asarray(out_shallow))

    def test_return_cache_matches_plain_apply(self):
        cfg = cfglib.tiny_unet()
        params = unet.init_params(jax.random.PRNGKey(0), cfg)
        inp = _inputs(cfg, jax.random.PRNGKey(1))
        plain = unet.apply(
            params, cfg, inp["sample"], inp["timestep"], inp["ehs"],
            text_embeds=inp["text_embeds"], time_ids=inp["time_ids"])
        withc, _ = unet.apply(
            params, cfg, inp["sample"], inp["timestep"], inp["ehs"],
            text_embeds=inp["text_embeds"], time_ids=inp["time_ids"],
            return_cache=True)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(withc))

    def test_attentive_shallow_level_with_ip_and_lora(self):
        """Geometry with attention at the shallowest level pins the
        IP-adapter traversal-suffix indexing and the up-block LoRA path:
        a wrong ip_idx or lora subtree would break bit-equality."""
        cfg = cfglib.UNetConfig(
            sample_size=16, block_out_channels=(32, 64),
            layers_per_block=1, transformer_layers_per_block=(1, 2),
            attention_head_dim=8, cross_attention_dim=48,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=16 + 6 * 8,
            norm_num_groups=8, dtype=jnp.float32)
        params = unet.init_params(jax.random.PRNGKey(0), cfg)
        inp = _inputs(cfg, jax.random.PRNGKey(1))

        # per-layer inner dims in attn2 traversal order (down, mid, up)
        widths = []
        for lvl, d in enumerate(cfg.transformer_layers_per_block):
            widths += [cfg.block_out_channels[lvl]] * \
                (cfg.layers_per_block * d)
        widths += [cfg.block_out_channels[-1]] * \
            cfg.transformer_layers_per_block[-1]
        for lvl, d in reversed(
                list(enumerate(cfg.transformer_layers_per_block))):
            widths += [cfg.block_out_channels[lvl]] * \
                ((cfg.layers_per_block + 1) * d)
        assert len(widths) == unet.num_cross_attention_layers(cfg)
        ks = jax.random.split(jax.random.PRNGKey(2), len(widths))
        # distinct per-layer weights: index misalignment changes output
        ip = [init_ip_kv(k, cfg.cross_attention_dim, w)
              for k, w in zip(ks, widths)]
        ip_ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 48))

        kl = jax.random.split(jax.random.PRNGKey(4), 2)
        leaf = {"down": jax.random.normal(kl[0], (32, 4)) * 0.1,
                "up": jax.random.normal(kl[1], (4, 32)) * 0.1,
                "scale": jnp.asarray(1.0)}
        lora = {"down_blocks": {0: {"attentions": {0: {
                    "transformer_blocks": {0: {"attn1": {"to_q": leaf}}}}}}},
                "up_blocks": {1: {"attentions": {1: {
                    "transformer_blocks": {0: {"attn2": {"to_q": leaf}}}}}}}}

        out_full, _, out_shallow = _full_and_shallow(
            cfg, params, inp, ip_adapter=ip, ip_context=ip_ctx,
            ip_scale=0.8, lora=lora)
        np.testing.assert_array_equal(np.asarray(out_full),
                                      np.asarray(out_shallow))

    def test_stale_cache_differs(self):
        """A cache from a different latent must NOT reproduce the full
        forward — guards against apply_shallow ignoring its input."""
        cfg = cfglib.tiny_unet()
        params = unet.init_params(jax.random.PRNGKey(0), cfg)
        inp = _inputs(cfg, jax.random.PRNGKey(1))
        other = _inputs(cfg, jax.random.PRNGKey(9))
        out_full, cache, _ = _full_and_shallow(cfg, params, inp)
        stale = unet.apply_shallow(
            params, cfg, other["sample"], inp["timestep"], other["ehs"],
            text_embeds=other["text_embeds"], time_ids=other["time_ids"],
            cache=cache)
        assert not np.allclose(np.asarray(out_full), np.asarray(stale))


H = W = 32  # pixel space; latent 4x4


@pytest.fixture(scope="module")
def setup():
    from omg_tpu.control import p2p
    from omg_tpu.diffusion import schedulers
    from omg_tpu.pipelines import multiconcept
    cfg = sdxl.tiny_config()
    params = unet.init_params(jax.random.PRNGKey(0), cfg.unet)
    sched = schedulers.make_schedule("euler", 4)
    d = cfg.unet.cross_attention_dim
    p_dim = cfg.text_encoder_2.projection_dim
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    base = multiconcept.make_base_inputs(
        jax.random.normal(ks[0], (1, 77, d)),
        jax.random.normal(ks[2], (1, p_dim)),
        jax.random.normal(ks[1], (1, 77, d)),
        jax.random.normal(ks[3], (1, p_dim)),
        sdxl.add_time_ids((H, W), (0, 0), (H, W)), 7.5)
    concept = multiconcept.make_concept_inputs(
        jax.random.normal(ks[0], (1, 77, d)),
        jax.random.normal(ks[2], (1, p_dim)),
        jax.random.normal(ks[1], (1, 77, d)),
        jax.random.normal(ks[3], (1, p_dim)),
        sdxl.add_time_ids((H, W), (0, 0), (H, W)))
    ctl = p2p.P2PControl.build(["a", "a"], num_steps=4,
                               self_replace_steps=0.4, width=2, height=2)
    return cfg, params, sched, base, concept, ctl


def _masks():
    m = np.zeros((2, H // 8, W // 8), np.float32)
    m[0, :2, :] = 1.0
    m[1, 2:, :] = 1.0
    return jnp.asarray(m)


class TestLoopIntegration:
    def test_full_phase_step_matches_exact(self, setup):
        """A 1-step range starts on the full phase — the cached program
        must match the exact program bit-for-bit there."""
        from omg_tpu.diffusion import schedulers
        from omg_tpu.pipelines import multiconcept
        cfg, params, sched, base, _, _ = setup
        key = jax.random.PRNGKey(3)
        lat = sdxl.prepare_latents(key, 1, H, W, sched, cfg.unet.dtype)
        st = schedulers.init_state(sched, lat.shape,
                                   key=jax.random.fold_in(key, 777))
        exact = multiconcept._denoise_cfg_range(
            cfg, sched, params, lat, st, base, i0=0, i1=1)
        cached = multiconcept._denoise_cfg_range(
            cfg, sched, params, lat, st, base, i0=0, i1=1,
            cache_interval=3)
        np.testing.assert_array_equal(np.asarray(exact[0]),
                                      np.asarray(cached[0]))

    def test_two_step_matches_hand_computation(self, setup):
        """interval=2 over [0,2): step 0 full (capturing the cache),
        step 1 shallow from it — recomputed by hand outside the loop."""
        from omg_tpu.diffusion import sampling, schedulers
        from omg_tpu.pipelines import multiconcept
        cfg, params, sched, base, _, _ = setup
        key = jax.random.PRNGKey(4)
        lat = sdxl.prepare_latents(key, 1, H, W, sched, cfg.unet.dtype)
        st0 = schedulers.init_state(sched, lat.shape,
                                    key=jax.random.fold_in(key, 777))
        embeds2 = base.prompt_embeds[jnp.array([0, 2])]
        tembeds2 = base.text_embeds[jnp.array([0, 2])]
        tids2 = base.time_ids[jnp.array([0, 2])]

        def hand_step(x, st, i, cache):
            t = sched.timesteps[i]
            lin = schedulers.scale_model_input(
                sched, jnp.concatenate([x, x]), i)
            if cache is None:
                eps, cache = unet.apply(
                    params, cfg.unet, lin, t, embeds2,
                    text_embeds=tembeds2, time_ids=tids2,
                    return_cache=True)
            else:
                eps = unet.apply_shallow(
                    params, cfg.unet, lin, t, embeds2,
                    text_embeds=tembeds2, time_ids=tids2, cache=cache)
            guided = sampling.cfg_combine(eps, base.guidance_scale)
            x, st = schedulers.step(sched, st, guided, i, x,
                                    shared_batch_noise=True)
            return x, st, cache

        x, st, cache = hand_step(lat, st0, 0, None)
        x, st, _ = hand_step(x, st, 1, cache)

        looped = multiconcept._denoise_cfg_range(
            cfg, sched, params, lat, st0, base, i0=0, i1=2,
            cache_interval=2)
        # eager-vs-compiled fusion rounding is ~4e-5 at fp32 on this
        # geometry (measured; the exact program shows the same delta vs
        # an eager step) — a wiring error (wrong phase / stale cache)
        # would show the ~1e-1 approx-vs-exact scale instead
        np.testing.assert_allclose(np.asarray(looped[0]), np.asarray(x),
                                   atol=5e-4)

    def test_stage1_cached_interval_runs_and_differs(self, setup):
        from omg_tpu.pipelines import multiconcept
        cfg, params, sched, base, _, _ = setup
        kw = dict(key=jax.random.PRNGKey(5), height=H, width=W,
                  base_inputs=base, fusion_start=1)
        exact, _ = multiconcept.sample_stage1_cached(
            cfg, sched, params, **kw)
        approx, _ = multiconcept.sample_stage1_cached(
            cfg, sched, params, cache_interval=2, **kw)
        assert np.isfinite(np.asarray(approx, np.float32)).all()
        assert not np.allclose(np.asarray(exact), np.asarray(approx))

    def test_stage2_resumed_interval_runs_and_differs(self, setup):
        from omg_tpu.pipelines import multiconcept
        cfg, params, sched, base, concept, ctl = setup
        _, cache = multiconcept.sample_stage1_cached(
            cfg, sched, params, key=jax.random.PRNGKey(6), height=H,
            width=W, base_inputs=base, fusion_start=1)
        kw = dict(base_inputs=base, controller=ctl,
                  concept_inputs=[concept, concept],
                  concept_loras=[None, None], masks=_masks(),
                  fusion_start=1)
        exact = multiconcept.sample_stage2_resumed(
            cfg, sched, params, cache, **kw)
        approx = multiconcept.sample_stage2_resumed(
            cfg, sched, params, cache, cache_interval=2, **kw)
        assert approx.shape == exact.shape
        assert np.isfinite(np.asarray(approx, np.float32)).all()
        assert not np.allclose(np.asarray(exact), np.asarray(approx))

    def test_two_stage_latents_vmapped_interval(self, setup):
        """The throughput path: cache rides the per-request loop carry
        under vmap (R=2 batched requests)."""
        from omg_tpu.pipelines import multiconcept
        cfg, params, sched, base, concept, _ = setup
        keys = jax.random.split(jax.random.PRNGKey(8), 2)
        lat0 = jax.vmap(lambda k: sdxl.prepare_latents(
            k, 1, H, W, sched, cfg.unet.dtype))(keys)

        def run(interval):
            return jax.vmap(
                lambda l0, k: multiconcept.two_stage_latents(
                    cfg, sched, params, l0, base, None,
                    (concept, concept), (None, None), _masks(),
                    fusion_start=1, noise_key=k,
                    cache_interval=interval))(lat0, keys)[1]

        exact = run(0)
        approx = run(2)
        assert approx.shape == exact.shape
        assert np.isfinite(np.asarray(approx, np.float32)).all()
        assert not np.allclose(np.asarray(exact), np.asarray(approx))
        with pytest.raises(ValueError, match="exclusive"):
            multiconcept.two_stage_latents(
                cfg, sched, params, lat0[0], base, None,
                (concept, concept), (None, None), _masks(),
                fusion_start=1, concept_crop=True, cache_interval=2)

    def test_stage2_guards(self, setup):
        from omg_tpu.pipelines import multiconcept
        cfg, params, sched, base, concept, ctl = setup
        _, cache = multiconcept.sample_stage1_cached(
            cfg, sched, params, key=jax.random.PRNGKey(6), height=H,
            width=W, base_inputs=base, fusion_start=1)
        with pytest.raises(ValueError, match="full-frame concept program"):
            multiconcept.sample_stage2_resumed(
                cfg, sched, params, cache, base_inputs=base,
                controller=ctl, concept_inputs=[concept, concept],
                concept_loras=[None, None], masks=_masks(),
                fusion_start=1, cache_interval=2, concept_crop=True)


class TestEngine:
    def test_generate_e2e_and_exclusivity(self):
        import omg_tpu
        from omg_tpu.text.tokenizer import ToyTokenizer

        def provider(image, cls):
            m = np.zeros(image.shape[:2], np.float32)
            half = image.shape[1] // 2
            if cls == "man":
                m[:, :half] = 1.0
            else:
                m[:, half:] = 1.0
            return m

        cfg = sdxl.tiny_config()
        params = sdxl.init_params(jax.random.PRNGKey(0), cfg)
        kw = dict(cfg=cfg, params=params, tokenizer=ToyTokenizer(),
                  tokenizer_2=ToyTokenizer(), mask_provider=provider,
                  num_steps=4)
        with pytest.raises(ValueError, match="exclusive"):
            omg_tpu.OMG(cache_interval=3, concept_crop=True, **kw)
        eng = omg_tpu.OMG(cache_interval=3, **kw)
        r = eng.generate(
            "photo of the man and the woman at the beach",
            prompt_rewrite="[photo of the man]-*-[ugly]|"
                           "[photo of the woman]-*-[ugly]",
            seed=14, height=H, width=W)
        assert r.image.shape == (H, W, 3)
        assert np.isfinite(np.asarray(r.image, np.float32)).all()

    def test_per_request_interval_override(self):
        """generate(cache_interval=N) on an exact-default engine must
        run the SAME program as an engine constructed with
        cache_interval=N (the serving per-request override), and the
        exclusivity guard must hold per-request too."""
        import omg_tpu
        from omg_tpu.text.tokenizer import ToyTokenizer

        def provider(image, cls):
            m = np.zeros(image.shape[:2], np.float32)
            half = image.shape[1] // 2
            if cls == "man":
                m[:, :half] = 1.0
            else:
                m[:, half:] = 1.0
            return m

        cfg = sdxl.tiny_config()
        params = sdxl.init_params(jax.random.PRNGKey(0), cfg)
        kw = dict(cfg=cfg, params=params, tokenizer=ToyTokenizer(),
                  tokenizer_2=ToyTokenizer(), mask_provider=provider,
                  num_steps=4)
        gen = dict(prompt="the man and the woman",
                   prompt_rewrite="[the man]-*-[b]|[the woman]-*-[b]",
                   seed=7, height=H, width=W)
        via_engine = omg_tpu.OMG(cache_interval=2, **kw).generate(
            gen["prompt"], **{k: v for k, v in gen.items()
                              if k != "prompt"})
        via_request = omg_tpu.OMG(**kw).generate(
            gen["prompt"], cache_interval=2,
            **{k: v for k, v in gen.items() if k != "prompt"})
        np.testing.assert_array_equal(np.asarray(via_engine.image),
                                      np.asarray(via_request.image))
        # per-request interval on a crop engine: same guard as the ctor
        crop_eng = omg_tpu.OMG(concept_crop=True, **kw)
        with pytest.raises(ValueError, match="exclusive"):
            crop_eng.generate(gen["prompt"], cache_interval=2,
                              **{k: v for k, v in gen.items()
                                 if k != "prompt"})
        # mixed intervals cannot share one vmapped program
        eng = omg_tpu.OMG(**kw)
        reqs = [dict(gen, seed=1), dict(gen, seed=2, cache_interval=2)]
        with pytest.raises(ValueError, match="bucket"):
            eng.generate_batch(reqs)

    def test_composes_with_int8_quantize(self):
        """int8 W8A8 + DeepCache are independent opt-ins that compose:
        full steps run the quantized GEMMs, shallow steps touch only the
        attention-free shallow level (no transformer GEMMs at this
        geometry — same as SDXL's)."""
        import omg_tpu
        from omg_tpu.text.tokenizer import ToyTokenizer

        def provider(image, cls):
            m = np.zeros(image.shape[:2], np.float32)
            half = image.shape[1] // 2
            if cls == "man":
                m[:, :half] = 1.0
            else:
                m[:, half:] = 1.0
            return m

        cfg = sdxl.tiny_config()
        params = sdxl.init_params(jax.random.PRNGKey(0), cfg)
        eng = omg_tpu.OMG(cfg=cfg, params=params, tokenizer=ToyTokenizer(),
                          tokenizer_2=ToyTokenizer(), mask_provider=provider,
                          num_steps=4, quantize="int8", cache_interval=2)
        r = eng.generate("the man and the woman",
                         prompt_rewrite="[the man]-*-[b]|[the woman]-*-[b]",
                         seed=3, height=H, width=W)
        assert r.image.shape == (H, W, 3)
        assert np.isfinite(np.asarray(r.image, np.float32)).all()

    def test_generate_batch_matches_serial_with_interval(self):
        """The vmapped batch path must apply the SAME cache schedule as
        serial generate (both stages thread engine.cache_interval)."""
        import omg_tpu
        from omg_tpu.text.tokenizer import ToyTokenizer

        def provider(image, cls):
            m = np.zeros(image.shape[:2], np.float32)
            half = image.shape[1] // 2
            if cls == "man":
                m[:, :half] = 1.0
            else:
                m[:, half:] = 1.0
            return m

        cfg = sdxl.tiny_config()
        params = sdxl.init_params(jax.random.PRNGKey(0), cfg)
        eng = omg_tpu.OMG(cfg=cfg, params=params, tokenizer=ToyTokenizer(),
                          tokenizer_2=ToyTokenizer(),
                          mask_provider=provider, num_steps=4,
                          cache_interval=2)
        reqs = [dict(prompt="the man and the woman",
                     prompt_rewrite="[the man]-*-[b]|[the woman]-*-[b]",
                     seed=s, height=H, width=W) for s in (3, 9)]
        batched = eng.generate_batch([dict(r) for r in reqs])
        serial = [eng.generate(r.pop("prompt"), **r)
                  for r in [dict(x) for x in reqs]]
        for b, s in zip(batched, serial):
            np.testing.assert_allclose(b.stage1.astype(np.int32),
                                       s.stage1.astype(np.int32), atol=1)
            if b.stage2 is not None:
                np.testing.assert_allclose(b.stage2.astype(np.int32),
                                           s.stage2.astype(np.int32),
                                           atol=1)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
