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
