"""AOT warmup must compile THE programs serving actually runs."""

import jax
import jax.numpy as jnp
import numpy as np

from omg_tpu.control import p2p
from omg_tpu.diffusion import schedulers
from omg_tpu.models import unet as unet_lib
from omg_tpu.models import vae as vae_lib
from omg_tpu.pipelines import multiconcept, sdxl
from omg_tpu.serving import warmup


def _unet_shapes(cfg, packed):
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg.unet)
    if packed:
        params = unet_lib.pack_params(params)
    return params


def test_warmup_tiny_counts():
    cfg = sdxl.tiny_config()
    params = _unet_shapes(cfg, packed=False)
    vae_params = vae_lib.init_params(jax.random.PRNGKey(1), cfg.vae)
    msgs = []
    n = warmup.warmup(cfg, unet_params=params, steps=3,
                      buckets=((32, 32),), concept_counts=(1, 2),
                      vae_params=vae_params, log=msgs.append)
    assert n == 5  # prefix + traj suffix + 2 concept variants + vae
    assert len(msgs) == 2  # per-bucket line + cold-shapes note
    assert "still cold" in msgs[-1]


def test_warmup_instantid_variant():
    """sample_ip_adapter warms the InstantID stage-2 program too (ADVICE
    round 2: face requests used to hit a cold multi-minute compile
    despite --warmup)."""
    from omg_tpu.nn.attention import init_ip_kv

    cfg = sdxl.tiny_config()
    params = _unet_shapes(cfg, packed=False)
    n_layers = unet_lib.num_cross_attention_layers(cfg.unet)
    ip_layers = [init_ip_kv(jax.random.PRNGKey(10 + i),
                            cfg.unet.cross_attention_dim, 64)
                 for i in range(n_layers)]
    n = warmup.warmup(cfg, unet_params=params, steps=3,
                      buckets=((32, 32),), concept_counts=(2,),
                      sample_ip_adapter=ip_layers, ip_tokens=4,
                      log=lambda *_: None)
    # prefix + traj suffix + (plain + instantid) stage-2 variants
    assert n == 4


def test_warmup_matches_real_serving_programs():
    """The warmed stage-2 lowering must be IDENTICAL (HLO text) to what a
    real sample_stage1_cached -> sample_stage2_resumed flow lowers —
    packed params, trajectory-fed program and all. (The round-2 warmup
    compiled unpacked non-traj programs: every warmed key missed.)"""
    cfg = sdxl.tiny_config()
    steps, H, W = 3, 32, 32
    params = _unet_shapes(cfg, packed=True)   # loader default pack=True
    sched = schedulers.make_schedule("euler", steps)
    d = cfg.unet.cross_attention_dim
    pdim = cfg.text_encoder_2.projection_dim
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    base = multiconcept.make_base_inputs(
        jax.random.normal(ks[0], (1, 77, d)),
        jax.random.normal(ks[1], (1, pdim)),
        jax.random.normal(ks[2], (1, 77, d)),
        jax.random.normal(ks[3], (1, pdim)),
        sdxl.add_time_ids((H, W), (0, 0), (H, W)), 7.5)
    concept = multiconcept.make_concept_inputs(
        jax.random.normal(ks[0], (1, 77, d)),
        jax.random.normal(ks[1], (1, pdim)),
        jax.random.normal(ks[2], (1, 77, d)),
        jax.random.normal(ks[3], (1, pdim)),
        sdxl.add_time_ids((H, W), (0, 0), (H, W)))
    ctl = p2p.P2PControl.build(["x", "x"], steps, width=W // 32,
                               height=H // 32)
    fusion_start = round(steps * 0.3)
    boundary = min(fusion_start + 1, steps)
    _, cache = multiconcept.sample_stage1_cached(
        cfg, sched, params, key=jax.random.PRNGKey(3), height=H, width=W,
        base_inputs=base, fusion_start=fusion_start)
    masks = jnp.asarray(np.ones((2, H // 8, W // 8), np.float32))
    real = multiconcept._denoise_mc_range_traj.lower(
        cfg, sched, params, cache.latents, cache.sched_state,
        cache.a_traj, base, ctl, (concept, concept), (None, None), masks,
        i0=boundary, fusion_start=fusion_start).as_text()

    lowered = []
    orig = multiconcept._denoise_mc_range_traj.lower

    def spy(*a, **k):
        out = orig(*a, **k)
        lowered.append(out.as_text())
        return out

    multiconcept._denoise_mc_range_traj.lower = spy
    try:
        warmup.warmup(cfg, unet_params=params, steps=steps,
                      buckets=((H, W),), concept_counts=(2,),
                      fusion_fraction=0.3, log=lambda *_: None)
    finally:
        multiconcept._denoise_mc_range_traj.lower = orig
    assert len(lowered) == 1
    assert lowered[0] == real

def test_batch_warmup_matches_engine_generate_batch():
    """batch_sizes warmup must lower the EXACT programs the serving
    microbatcher runs (VERDICT r4 item 7: the first batched request
    paid a separate 137 s compile despite --warmup). Spy on the batch
    entry points' .lower while a REAL engine.generate_batch runs, then
    assert the warmed lowerings are byte-identical HLO."""
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
                      num_steps=3)
    reqs = [dict(prompt="the man and the woman",
                 prompt_rewrite="[the man]-*-[b]|[the woman]-*-[b]",
                 seed=s, height=32, width=32) for s in (3, 9)]

    real = {}

    def capture(name, orig_fn):
        def wrapper(*a, **k):
            real[name] = orig_fn.lower(*a, **k).as_text()
            return orig_fn(*a, **k)
        return wrapper

    orig1 = multiconcept.sample_stage1_batch
    orig2 = multiconcept.sample_stage2_batch
    multiconcept.sample_stage1_batch = capture("stage1", orig1)
    multiconcept.sample_stage2_batch = capture("stage2", orig2)
    try:
        eng.generate_batch(reqs)
    finally:
        multiconcept.sample_stage1_batch = orig1
        multiconcept.sample_stage2_batch = orig2
    assert set(real) == {"stage1", "stage2"}

    warmed = {}
    o1, o2 = orig1.lower, orig2.lower

    def spy1(*a, **k):
        out = o1(*a, **k)
        warmed["stage1"] = out.as_text()
        return out

    def spy2(*a, **k):
        out = o2(*a, **k)
        warmed["stage2"] = out.as_text()
        return out

    orig1.lower, orig2.lower = spy1, spy2
    try:
        warmup.warmup(cfg, unet_params=eng.params.unet, steps=3,
                      buckets=((32, 32),), concept_counts=(2,),
                      fusion_fraction=0.3, batch_sizes=(1, 2),
                      log=lambda *_: None)
    finally:
        orig1.lower, orig2.lower = o1, o2
    assert set(warmed) == {"stage1", "stage2"}   # R=1 skipped
    assert warmed["stage1"] == real["stage1"]
    assert warmed["stage2"] == real["stage2"]

def test_warmup_front_schedule_matches_engine_spec():
    """cache_schedule='front' turns the interval into a per-step tuple
    — a DIFFERENT static jit key than the int. Warmup must resolve it
    exactly like the engine (same deepcache_schedule call with the same
    fusion_start) or every warmed front-engine program misses (round-5
    review finding)."""
    cfg = sdxl.tiny_config()
    steps, H, W = 3, 32, 32
    params = _unet_shapes(cfg, packed=True)
    sched = schedulers.make_schedule("euler", steps)
    d = cfg.unet.cross_attention_dim
    pdim = cfg.text_encoder_2.projection_dim
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    base = multiconcept.make_base_inputs(
        jax.random.normal(ks[0], (1, 77, d)),
        jax.random.normal(ks[1], (1, pdim)),
        jax.random.normal(ks[2], (1, 77, d)),
        jax.random.normal(ks[3], (1, pdim)),
        sdxl.add_time_ids((H, W), (0, 0), (H, W)), 7.5)
    fusion_start = round(steps * 0.3)
    # the engine-resolved spec (omg.OMG._resolve_cache_spec kind='front')
    spec = multiconcept.deepcache_schedule(steps, 2, kind="front",
                                           fusion_start=fusion_start)
    lat = sdxl.prepare_latents(jax.random.PRNGKey(3), 1, H, W, sched,
                               cfg.unet.dtype)
    st = schedulers.init_state(sched, lat.shape)
    boundary = min(fusion_start + 1, steps)
    real = multiconcept._denoise_cfg_range.lower(
        cfg, sched, params, lat, st, base, i0=0, i1=boundary,
        cache_interval=spec).as_text()

    lowered = []
    orig = multiconcept._denoise_cfg_range.lower

    def spy(*a, **k):
        out = orig(*a, **k)
        lowered.append(out.as_text())
        return out

    multiconcept._denoise_cfg_range.lower = spy
    try:
        warmup.warmup(cfg, unet_params=params, steps=steps,
                      buckets=((H, W),), concept_counts=(2,),
                      fusion_fraction=0.3, cache_interval=2,
                      cache_schedule="front", log=lambda *_: None)
    finally:
        multiconcept._denoise_cfg_range.lower = orig
    assert len(lowered) == 1
    assert lowered[0] == real
