"""Non-uniform DeepCache schedules (VERDICT r4 item 5).

``deepcache_schedule`` places the SAME number of full UNet forwards as a
uniform ``cache_interval`` but packs them toward the fast-moving start
of the trajectory (Ma et al. 2312.00858 §3's non-uniform sampling, with
the fusion-start step forced full). Tests pin: the builder's
invariants, bit-equality of the tuple-form uniform schedule with the
int form on a fresh range, and the engine/serving plumbing
(``cache_schedule`` request field; program bucketing).

Reference workload being accelerated: the per-step UNet calls of
/root/reference/src/pipelines/lora_pipeline.py:485-615.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu.diffusion import schedulers
from omg_tpu.pipelines import multiconcept, sdxl


# ---------------------------------------------------------------- builder


def test_schedule_full_step_count_matches_uniform():
    for steps, interval in [(50, 3), (50, 5), (8, 2), (7, 3)]:
        uni = multiconcept.deepcache_schedule(steps, interval,
                                              kind="uniform")
        fro = multiconcept.deepcache_schedule(steps, interval,
                                              kind="front")
        assert len(uni) == len(fro) == steps
        assert sum(uni) == -(-steps // interval)
        # same latency budget: identical number of full forwards
        assert sum(fro) == sum(uni)


def test_schedule_step0_always_full():
    for kind in multiconcept.DEEPCACHE_SCHEDULES:
        s = multiconcept.deepcache_schedule(50, 4, kind=kind)
        assert s[0] is True


def test_schedule_front_is_front_loaded():
    """More full steps in the first half than the last half."""
    s = multiconcept.deepcache_schedule(50, 3, kind="front")
    first, second = sum(s[:25]), sum(s[25:])
    assert first > second


def test_schedule_fusion_start_forced_full():
    s = multiconcept.deepcache_schedule(50, 5, kind="front",
                                        fusion_start=16)
    assert s[16] is True


def test_schedule_uniform_tuple_matches_modulo():
    s = multiconcept.deepcache_schedule(50, 3, kind="uniform")
    assert s == tuple(i % 3 == 0 for i in range(50))


def test_schedule_bad_args():
    with pytest.raises(ValueError, match="interval"):
        multiconcept.deepcache_schedule(50, 1)
    with pytest.raises(ValueError, match="kind"):
        multiconcept.deepcache_schedule(50, 3, kind="center")


# ------------------------------------------------------------------- loop

H = W = 32  # pixel space; latent 4x4


@pytest.fixture(scope="module")
def setup():
    from omg_tpu.models import unet
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
    return cfg, params, sched, base


def test_tuple_uniform_matches_int_interval(setup):
    """On a range starting at i0=0 the tuple form of the uniform
    schedule and the int interval dispatch the same full/shallow steps
    — the programs must agree bit-for-bit."""
    cfg, params, sched, base = setup
    key = jax.random.PRNGKey(3)
    lat = sdxl.prepare_latents(key, 1, H, W, sched, cfg.unet.dtype)
    st = schedulers.init_state(sched, lat.shape,
                               key=jax.random.fold_in(key, 777))
    via_int = multiconcept._denoise_cfg_range(
        cfg, sched, params, lat, st, base, i0=0, i1=4, cache_interval=2)
    via_tuple = multiconcept._denoise_cfg_range(
        cfg, sched, params, lat, st, base, i0=0, i1=4,
        cache_interval=multiconcept.deepcache_schedule(4, 2,
                                                       kind="uniform"))
    np.testing.assert_array_equal(np.asarray(via_int[0]),
                                  np.asarray(via_tuple[0]))


def test_tuple_schedule_changes_dispatch(setup):
    """A schedule whose full steps sit elsewhere must produce a
    different trajectory (the tuple is actually consulted)."""
    cfg, params, sched, base = setup
    key = jax.random.PRNGKey(5)
    lat = sdxl.prepare_latents(key, 1, H, W, sched, cfg.unet.dtype)
    st = schedulers.init_state(sched, lat.shape,
                               key=jax.random.fold_in(key, 777))

    def run(spec):
        return multiconcept._denoise_cfg_range(
            cfg, sched, params, lat, st, base, i0=0, i1=4,
            cache_interval=spec)[0]

    a = run((True, False, True, False))
    b = run((True, True, False, False))
    exact = multiconcept._denoise_cfg_range(
        cfg, sched, params, lat, st, base, i0=0, i1=4)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # all-full schedule == exact program
    np.testing.assert_array_equal(
        np.asarray(run((True,) * 4)), np.asarray(exact))


# ----------------------------------------------------------------- engine


def _provider(image, cls):
    m = np.zeros(image.shape[:2], np.float32)
    half = image.shape[1] // 2
    if cls == "man":
        m[:, :half] = 1.0
    else:
        m[:, half:] = 1.0
    return m


def _engine(**kw):
    import omg_tpu
    from omg_tpu.text.tokenizer import ToyTokenizer
    cfg = sdxl.tiny_config()
    params = sdxl.init_params(jax.random.PRNGKey(0), cfg)
    return omg_tpu.OMG(cfg=cfg, params=params, tokenizer=ToyTokenizer(),
                       tokenizer_2=ToyTokenizer(), mask_provider=_provider,
                       num_steps=4, **kw)


GEN = dict(prompt="the man and the woman",
           prompt_rewrite="[the man]-*-[b]|[the woman]-*-[b]",
           seed=7, height=H, width=W)


def test_engine_front_schedule_e2e_and_differs():
    eng = _engine()
    kw = {k: v for k, v in GEN.items() if k != "prompt"}
    uni = eng.generate(GEN["prompt"], cache_interval=2, **kw)
    fro = eng.generate(GEN["prompt"], cache_interval=2,
                       cache_schedule="front", **kw)
    assert fro.image.shape == (H, W, 3)
    assert np.isfinite(np.asarray(fro.image, np.float32)).all()
    # at 4 steps/interval 2 the front placement moves the second full
    # step — trajectories must differ
    assert not np.array_equal(np.asarray(uni.image), np.asarray(fro.image))
    # engine-level default (ctor field) matches the per-request form
    eng2 = _engine(cache_interval=2, cache_schedule="front")
    via_ctor = eng2.generate(GEN["prompt"], **kw)
    np.testing.assert_array_equal(np.asarray(via_ctor.image),
                                  np.asarray(fro.image))


def test_engine_schedule_validation():
    with pytest.raises(ValueError, match="cache_schedule"):
        _engine(cache_schedule="center")
    eng = _engine()
    kw = {k: v for k, v in GEN.items() if k != "prompt"}
    with pytest.raises(ValueError, match="kind"):
        eng.generate(GEN["prompt"], cache_interval=2,
                     cache_schedule="center", **kw)
    # explicit per-step tuple: length must match steps
    with pytest.raises(ValueError, match="entries"):
        eng.generate(GEN["prompt"], cache_interval=(True, False), **kw)


def test_engine_schedule_noop_without_interval():
    """cache_schedule on an exact engine is inert: same program, same
    bits (the resolver returns 0 before consulting the kind)."""
    eng = _engine(cache_schedule="front")
    kw = {k: v for k, v in GEN.items() if k != "prompt"}
    a = eng.generate(GEN["prompt"], **kw)
    b = _engine().generate(GEN["prompt"], **kw)
    np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))


def test_engine_batch_schedule_matches_serial():
    """generate_batch resolves cache_schedule per request and buckets
    by the resolved spec."""
    eng = _engine(cache_interval=2, cache_schedule="front")
    reqs = [dict(GEN, seed=s) for s in (3, 9)]
    batched = eng.generate_batch([dict(r) for r in reqs])
    serial = [eng.generate(r.pop("prompt"), **r)
              for r in [dict(x) for x in reqs]]
    for b, s in zip(batched, serial):
        np.testing.assert_allclose(b.stage1.astype(np.int32),
                                   s.stage1.astype(np.int32), atol=1)
    # mixed schedules cannot share one vmapped program
    mixed = [dict(GEN, seed=1), dict(GEN, seed=2, cache_schedule="uniform")]
    with pytest.raises(ValueError, match="bucket"):
        eng.generate_batch(mixed)


# ---------------------------------------------------------------- serving


def test_bucket_keys_on_cache_schedule():
    from omg_tpu.serving.server import OMGServer
    base = {"height": 1024, "width": 1024, "steps": 8, "cache_interval": 3}
    a = OMGServer._bucket(dict(base))
    b = OMGServer._bucket(dict(base, cache_schedule="front"))
    c = OMGServer._bucket(dict(base, cache_schedule="front"))
    assert a != b
    assert b == c
    # schedule kind is inert without DeepCache: exact requests share
    # one program regardless of the field
    exact = {"height": 1024, "width": 1024, "steps": 8}
    assert (OMGServer._bucket(dict(exact, cache_schedule="front"))
            == OMGServer._bucket(dict(exact)))
    # engine-default schedule: absent == explicit-equal
    assert OMGServer._bucket(dict(base), 0, "front") == b


def test_job_cache_schedule_passthrough_and_validation():
    from omg_tpu.serving.registry import Registry
    from omg_tpu.serving.server import OMGServer
    srv = OMGServer.__new__(OMGServer)
    srv.registry = Registry()
    srv.loras = {}
    srv.instantid = None
    srv.controlnets = {}
    req = srv._job_to_request({"prompt": "x", "cache_interval": 3,
                               "cache_schedule": "front"})
    assert req["cache_schedule"] == "front"
    assert "cache_schedule" not in srv._job_to_request({"prompt": "x"})
    with pytest.raises(ValueError, match="cache_schedule"):
        srv._job_to_request({"prompt": "x", "cache_schedule": "nope"})


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
