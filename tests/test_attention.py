"""Attention: SDPA vs torch, IP dual-KV semantics, probs-transform hook."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from omg_tpu.nn import attention, layers


def test_sdpa_matches_torch():
    q = torch.randn(2, 4, 9, 8)
    k = torch.randn(2, 4, 11, 8)
    v = torch.randn(2, 4, 11, 8)
    want = F.scaled_dot_product_attention(q, k, v).numpy()
    got = np.asarray(attention.sdpa(
        jnp.asarray(q.numpy()), jnp.asarray(k.numpy()), jnp.asarray(v.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mha_self_vs_cross_shapes():
    key = jax.random.PRNGKey(0)
    p = attention.init_mha(key, 32, context_dim=16, num_heads=4, head_dim=8)
    x = jax.random.normal(key, (2, 10, 32))
    ctx = jax.random.normal(key, (2, 7, 16))
    out = attention.mha(p, x, num_heads=4, context=ctx)
    assert out.shape == (2, 10, 32)


def test_ip_dual_attention_scale_add():
    """out == text_attn + scale * ip_attn (reference: attention_processor.py:409)."""
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    p = attention.init_mha(ks[0], 32, context_dim=16, num_heads=4, head_dim=8)
    ip = attention.init_ip_kv(ks[1], 16, 32)
    x = jax.random.normal(ks[2], (2, 10, 32))
    ctx = jax.random.normal(ks[3], (2, 7, 16))
    ip_ctx = jax.random.normal(ks[3], (2, 4, 16))

    text_only = attention.mha(p, x, num_heads=4, context=ctx)
    both = attention.mha(p, x, num_heads=4, context=ctx,
                         ip=ip, ip_context=ip_ctx, ip_scale=0.8)

    # Recompute the ip branch manually (before to_out) and push through to_out.
    q = attention._split_heads(layers.linear(p["to_q"], x), 4)
    k_ip = attention._split_heads(layers.linear(ip["to_k_ip"], ip_ctx), 4)
    v_ip = attention._split_heads(layers.linear(ip["to_v_ip"], ip_ctx), 4)
    ip_branch = attention._merge_heads(attention.sdpa(q, k_ip, v_ip))
    # to_out is linear => mha(text+ip) = mha(text) + W_out @ (scale*ip_branch)
    delta = 0.8 * (ip_branch @ p["to_out"]["weight"])
    np.testing.assert_allclose(np.asarray(both), np.asarray(text_only + delta),
                               atol=1e-5)


def test_probs_transform_is_applied():
    """A transform that zeros all probs must produce pure-bias output."""
    key = jax.random.PRNGKey(2)
    p = attention.init_mha(key, 16, num_heads=2, head_dim=8)
    x = jax.random.normal(key, (2, 5, 16))

    def zero_probs(probs, *, is_cross):
        assert not is_cross
        return jnp.zeros_like(probs)

    out = attention.mha(p, x, num_heads=2, probs_transform=zero_probs)
    want = jnp.broadcast_to(p["to_out"]["bias"], out.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_probs_path_matches_sdpa_when_identity():
    key = jax.random.PRNGKey(3)
    p = attention.init_mha(key, 16, num_heads=2, head_dim=8)
    x = jax.random.normal(key, (2, 5, 16))
    ident = attention.mha(p, x, num_heads=2,
                          probs_transform=lambda probs, *, is_cross: probs)
    plain = attention.mha(p, x, num_heads=2)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(plain), atol=1e-5)
