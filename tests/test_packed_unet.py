"""Scan-packed transformer stacks == the unrolled UNet, bit-for-bit math.

pack_params stacks deep transformer_blocks for lax.scan (compile-time
optimization); outputs must match the unpacked forward with every
per-block mechanism engaged: LoRA deltas (different ranks per block),
IP adapter layers, and the P2P lane controller.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu import config as cfglib
from omg_tpu.control import p2p
from omg_tpu.models import unet as unet_lib
from omg_tpu.nn.attention import init_ip_kv


@pytest.fixture(scope="module")
def deep():
    # depth-4 level so pack_params (min_depth=4) engages
    cfg = dataclasses.replace(cfglib.tiny_unet(),
                              transformer_layers_per_block=(0, 4))
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg)
    packed = unet_lib.pack_params(params)
    return cfg, params, packed


def _inputs(cfg, b=4):
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    s = cfg.sample_size
    sample = jax.random.normal(ks[0], (b, s, s, 4))
    sample = sample.at[1].set(sample[0]).at[3].set(sample[2])
    ehs = jax.random.normal(ks[1], (b, 77, cfg.cross_attention_dim))
    pooled = jax.random.normal(ks[2], (b, 16))
    tids = jnp.zeros((b, 6))
    return sample, ehs, pooled, tids


def test_packed_layout(deep):
    cfg, params, packed = deep
    blk = packed["down_blocks"][1]["attentions"][0]
    assert "transformer_blocks_stacked" in blk
    assert "transformer_blocks" not in blk
    st = blk["transformer_blocks_stacked"]
    assert st["attn1"]["to_q"]["weight"].shape[0] == 4


def test_packed_matches_unpacked_plain(deep):
    cfg, params, packed = deep
    sample, ehs, pooled, tids = _inputs(cfg)
    a = unet_lib.apply(params, cfg, sample, jnp.asarray(9), ehs,
                       text_embeds=pooled, time_ids=tids)
    b = unet_lib.apply(packed, cfg, sample, jnp.asarray(9), ehs,
                       text_embeds=pooled, time_ids=tids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_packed_matches_with_lora_ip_control(deep):
    cfg, params, packed = deep
    sample, ehs, pooled, tids = _inputs(cfg)

    # LoRA with DIFFERENT ranks on blocks 0 and 2 of the deep stack
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    def leaf(k1, k2, r):
        return {"down": jax.random.normal(k1, (64, r)) * 0.1,
                "up": jax.random.normal(k2, (r, 64)) * 0.1,
                "scale": jnp.asarray(1.0)}
    lora = {"down_blocks": {1: {"attentions": {0: {"transformer_blocks": {
        0: {"attn1": {"to_q": leaf(ks[0], ks[1], 2)}},
        2: {"attn2": {"to_out": leaf(ks[2], ks[3], 3)}},
    }}}}}}

    n = unet_lib.num_cross_attention_layers(cfg)
    ip_layers = [init_ip_kv(jax.random.PRNGKey(20 + i),
                            cfg.cross_attention_dim, 64) for i in range(n)]
    ip_ctx = jax.random.normal(jax.random.PRNGKey(3), (4, 4,
                                                       cfg.cross_attention_dim))
    ctl = p2p.P2PControl.build(["x", "x"], 10, self_replace_steps=0.5,
                               width=8, height=8)
    step = ctl.at_step(jnp.int32(2))

    kw = dict(text_embeds=pooled, time_ids=tids, lora=lora,
              ip_adapter=ip_layers, ip_context=ip_ctx, ip_scale=0.7,
              control=step)
    a = unet_lib.apply(params, cfg, sample, jnp.asarray(9), ehs, **kw)
    b = unet_lib.apply(packed, cfg, sample, jnp.asarray(9), ehs, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    # and the mechanisms actually did something
    base = unet_lib.apply(params, cfg, sample, jnp.asarray(9), ehs,
                          text_embeds=pooled, time_ids=tids)
    assert not np.allclose(np.asarray(a), np.asarray(base), atol=1e-4)
