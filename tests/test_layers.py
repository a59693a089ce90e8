"""Unit tests for core layers vs. torch-CPU ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from omg_tpu.nn import layers


def t2j(t):
    return jnp.asarray(t.detach().numpy())


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def test_linear_matches_torch(rng):
    tl = torch.nn.Linear(16, 24)
    p = {"weight": t2j(tl.weight).T, "bias": t2j(tl.bias)}
    x = torch.randn(3, 5, 16)
    want = tl(x).detach().numpy()
    got = np.asarray(layers.linear(p, t2j(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_linear_lora_delta(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    p = layers.init_linear(k1, 8, 8)
    x = jax.random.normal(k2, (2, 4, 8))
    down = jax.random.normal(k3, (8, 2)) * 0.1
    up = jnp.ones((2, 8)) * 0.5
    lora = {"down": down, "up": up, "scale": jnp.asarray(0.7)}
    base = layers.linear(p, x)
    got = layers.linear(p, x, lora)
    want = base + 0.7 * (x @ down) @ up
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_conv2d_matches_torch():
    tc = torch.nn.Conv2d(6, 12, 3, stride=2, padding=1)
    p = {"weight": t2j(tc.weight).transpose(2, 3, 1, 0), "bias": t2j(tc.bias)}
    x = torch.randn(2, 6, 10, 10)
    want = tc(x).detach().numpy()  # NCHW
    got = np.asarray(layers.conv2d(p, t2j(x).transpose(0, 2, 3, 1), stride=2))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-4)


def test_group_norm_matches_torch():
    tg = torch.nn.GroupNorm(4, 16, eps=1e-5)
    with torch.no_grad():
        tg.weight.copy_(torch.randn(16))
        tg.bias.copy_(torch.randn(16))
    p = {"weight": t2j(tg.weight), "bias": t2j(tg.bias)}
    x = torch.randn(2, 16, 7, 5)
    want = tg(x).detach().numpy()
    got = np.asarray(layers.group_norm(p, t2j(x).transpose(0, 2, 3, 1), num_groups=4))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-4)


def test_layer_norm_matches_torch():
    tn = torch.nn.LayerNorm(32)
    with torch.no_grad():
        tn.weight.copy_(torch.randn(32))
        tn.bias.copy_(torch.randn(32))
    p = {"weight": t2j(tn.weight), "bias": t2j(tn.bias)}
    x = torch.randn(4, 7, 32)
    want = tn(x).detach().numpy()
    got = np.asarray(layers.layer_norm(p, t2j(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_quick_gelu_matches_torch():
    x = torch.randn(100)
    want = (x * torch.sigmoid(1.702 * x)).numpy()
    got = np.asarray(layers.quick_gelu(t2j(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_timestep_embedding_known_values():
    # dim=4, t=0 => [cos,cos,sin,sin] of 0 = [1,1,0,0] (flip_sin_to_cos).
    emb = layers.timestep_embedding(jnp.asarray([0.0]), 4)
    np.testing.assert_allclose(np.asarray(emb[0]), [1, 1, 0, 0], atol=1e-6)
    # t=1, dim=4: freqs = exp(-ln(1e4)*[0,1]/2) = [1, 1e-2]
    emb = layers.timestep_embedding(jnp.asarray([1.0]), 4)
    want = [np.cos(1.0), np.cos(1e-2), np.sin(1.0), np.sin(1e-2)]
    np.testing.assert_allclose(np.asarray(emb[0]), want, rtol=1e-5)


def test_upsample_matches_torch():
    x = torch.randn(1, 3, 4, 4)
    want = F.interpolate(x, scale_factor=2, mode="nearest").numpy()
    got = np.asarray(layers.upsample_nearest_2x(t2j(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-6)


def test_nearest_resize_matches_torch():
    x = torch.randn(1, 1, 11, 13)
    want = F.interpolate(x, size=(16, 16), mode="nearest").numpy()
    got = np.asarray(layers.nearest_resize(t2j(x).transpose(0, 2, 3, 1), (16, 16)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-6)
    # downscale too (mask -> latent path)
    want = F.interpolate(x, size=(4, 4), mode="nearest").numpy()
    got = np.asarray(layers.nearest_resize(t2j(x).transpose(0, 2, 3, 1), (4, 4)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-6)


def test_geglu_shapes(rng):
    p = layers.init_linear(rng, 8, 32)
    x = jnp.ones((2, 3, 8))
    out = layers.geglu(p, x)
    assert out.shape == (2, 3, 16)
