"""ControlNet + Resampler: shapes, zero-init no-op property, UNet wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu import config as cfglib
from omg_tpu.models import controlnet as cn_lib
from omg_tpu.models import resampler as rs_lib
from omg_tpu.models import unet as unet_lib


@pytest.fixture(scope="module")
def cn_setup():
    cfg = cfglib.tiny_controlnet()
    params = cn_lib.init_params(jax.random.PRNGKey(0), cfg)
    u = cfg.unet
    b, hw = 2, u.sample_size
    sample = jax.random.normal(jax.random.PRNGKey(1), (b, hw, hw, 4))
    ehs = jax.random.normal(jax.random.PRNGKey(2),
                            (b, 77, u.cross_attention_dim))
    te = jax.random.normal(jax.random.PRNGKey(3), (b, 16))
    tids = jnp.zeros((b, 6))
    cond = jax.random.normal(jax.random.PRNGKey(4), (b, hw * 8, hw * 8, 3))
    return cfg, params, sample, ehs, te, tids, cond


def test_controlnet_residual_shapes(cn_setup):
    cfg, params, sample, ehs, te, tids, cond = cn_setup
    down, mid = cn_lib.apply(params, cfg, sample, jnp.asarray(10), ehs, cond,
                             text_embeds=te, time_ids=tids)
    # skips: conv_in + 2 levels x 1 resnet + 1 downsampler = 4
    assert len(down) == 4
    assert down[0].shape == sample.shape[:3] + (32,)
    assert mid.shape[-1] == 64


def test_zero_init_is_noop(cn_setup):
    """Freshly-initialized ControlNet heads are zero convs: residuals==0,
    so injecting them must not change the UNet output."""
    cfg, params, sample, ehs, te, tids, cond = cn_setup
    down, mid = cn_lib.apply(params, cfg, sample, jnp.asarray(10), ehs, cond,
                             text_embeds=te, time_ids=tids)
    for r in down:
        np.testing.assert_array_equal(np.asarray(r), 0.0)
    np.testing.assert_array_equal(np.asarray(mid), 0.0)

    ucfg = cfg.unet
    uparams = unet_lib.init_params(jax.random.PRNGKey(9), ucfg)
    base = unet_lib.apply(uparams, ucfg, sample, jnp.asarray(10), ehs,
                          text_embeds=te, time_ids=tids)
    with_cn = unet_lib.apply(uparams, ucfg, sample, jnp.asarray(10), ehs,
                             text_embeds=te, time_ids=tids,
                             down_block_residuals=down,
                             mid_block_residual=mid)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_cn))


def test_conditioning_scale(cn_setup):
    """Residuals scale linearly with conditioning_scale."""
    cfg, params, sample, ehs, te, tids, cond = cn_setup
    # give the zero convs some weight so the scale is observable
    import jax.tree_util as jtu
    params = jtu.tree_map(
        lambda x: jnp.ones_like(x) * 0.01 if x.ndim == 4 else x, params)
    d1, m1 = cn_lib.apply(params, cfg, sample, jnp.asarray(10), ehs, cond,
                          text_embeds=te, time_ids=tids,
                          conditioning_scale=1.0)
    d2, m2 = cn_lib.apply(params, cfg, sample, jnp.asarray(10), ehs, cond,
                          text_embeds=te, time_ids=tids,
                          conditioning_scale=0.5)
    np.testing.assert_allclose(np.asarray(m2), 0.5 * np.asarray(m1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2[-1]), 0.5 * np.asarray(d1[-1]),
                               rtol=1e-5, atol=1e-6)


def test_resampler_shapes_and_determinism():
    cfg = cfglib.tiny_resampler()
    params = rs_lib.init_params(jax.random.PRNGKey(0), cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 1, cfg.embedding_dim))
    out = rs_lib.apply(params, cfg, emb)
    assert out.shape == (2, cfg.num_queries, cfg.output_dim)
    out2 = rs_lib.apply(params, cfg, emb)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # different identity embedding -> different tokens
    emb3 = jax.random.normal(jax.random.PRNGKey(2), (2, 1, cfg.embedding_dim))
    assert not np.allclose(np.asarray(rs_lib.apply(params, cfg, emb3)),
                           np.asarray(out))


def test_resampler_matches_torch_reference_math():
    """PerceiverAttention parity vs a direct torch re-implementation of
    the published IP-Adapter resampler math (q/k both scaled by
    dim_head**-0.5, kv over cat(x, latents), fp32 softmax)."""
    import torch
    cfg = cfglib.tiny_resampler()
    params = rs_lib.init_params(jax.random.PRNGKey(0), cfg)
    attn = params["layers"][0][0]
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.dim))
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.num_queries, cfg.dim))
    ours = rs_lib._perceiver_attention(attn, x, lat, cfg.heads)

    def t(a):
        return torch.from_numpy(np.asarray(a))

    def ln(p, v):
        return torch.nn.functional.layer_norm(
            v, (v.shape[-1],), t(p["weight"]), t(p["bias"]))

    xt = ln(attn["norm1"], t(x))
    lt = ln(attn["norm2"], t(lat))
    q = xt.new_zeros(0)
    q = lt @ t(attn["to_q"]["weight"])
    kv = torch.cat([xt, lt], dim=-2) @ t(attn["to_kv"]["weight"])
    k, v = kv.chunk(2, dim=-1)
    b, n, _ = q.shape
    hd = cfg.dim_head

    def split(a):
        return a.reshape(1, a.shape[1], cfg.heads, hd).permute(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    scale = 1 / (hd ** 0.5)
    w = (qh * scale) @ (kh * scale).transpose(-2, -1)
    w = torch.softmax(w.float(), dim=-1).to(vh.dtype)
    out = (w @ vh).permute(0, 2, 1, 3).reshape(1, n, -1)
    out = out @ t(attn["to_out"]["weight"])
    np.testing.assert_allclose(np.asarray(ours), out.numpy(),
                               rtol=1e-5, atol=1e-5)
