"""Orbax checkpoint round-trip for converted pytrees."""

import jax
import jax.numpy as jnp
import numpy as np

from omg_tpu import checkpoint
from omg_tpu.models import clip as clip_lib
from omg_tpu import config as cfglib


def test_pytree_roundtrip(tmp_path):
    cfg = cfglib.tiny_text_encoder(projection_dim=8)
    params = clip_lib.init_params(jax.random.PRNGKey(0), cfg)
    p = str(tmp_path / "clip_ckpt")
    checkpoint.save_pytree(p, params)
    back = checkpoint.load_pytree(p)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_roundtrip_with_target_dtype(tmp_path):
    tree = {"w": jnp.ones((4, 4), jnp.float32)}
    p = str(tmp_path / "t")
    checkpoint.save_pytree(p, tree)
    like = {"w": jnp.zeros((4, 4), jnp.float32)}
    back = checkpoint.load_pytree(p, like)
    np.testing.assert_array_equal(np.asarray(back["w"]), np.ones((4, 4)))
