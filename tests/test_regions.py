"""Region-fusion semantics vs. the reference (lora_pipeline.py:568-607)."""

import jax
import jax.numpy as jnp
import numpy as np

from omg_tpu.control import regions


def _setup(key, k=2, h=8, w=8, c=4):
    ks = jax.random.split(key, 3)
    noise = jax.random.normal(ks[0], (4, h, w, c))
    region = jax.random.normal(ks[1], (k, 2, h, w, c))
    masks = np.zeros((k, h, w), np.float32)
    masks[0, :4, :4] = 1.0   # concept 0: top-left
    masks[1, 4:, 4:] = 1.0   # concept 1: bottom-right
    return noise, region, jnp.asarray(masks)


def test_fusion_replaces_inside_masks():
    noise, region, masks = _setup(jax.random.PRNGKey(0))
    out = regions.fuse_region_noise(noise, region, masks,
                                    active=jnp.bool_(True))
    # inside concept-0 mask: rows 1,3 (copy B) get concept-0 eps
    np.testing.assert_allclose(out[1, :4, :4], region[0, 0, :4, :4], rtol=1e-5)
    np.testing.assert_allclose(out[3, :4, :4], region[0, 1, :4, :4], rtol=1e-5)
    # inside concept-1 mask
    np.testing.assert_allclose(out[1, 4:, 4:], region[1, 0, 4:, 4:], rtol=1e-5)
    # outside the union: base prediction preserved
    np.testing.assert_allclose(out[1, :4, 4:], noise[1, :4, 4:])
    np.testing.assert_allclose(out[3, 4:, :4], noise[3, 4:, :4])
    # copy A rows (0, 2) are never touched (reference :606-607 writes 1,3)
    np.testing.assert_allclose(out[0], noise[0])
    np.testing.assert_allclose(out[2], noise[2])


def test_fusion_gate_inactive():
    noise, region, masks = _setup(jax.random.PRNGKey(1))
    out = regions.fuse_region_noise(noise, region, masks,
                                    active=jnp.bool_(False))
    np.testing.assert_allclose(out, noise)


def test_zero_mask_is_noop_concept():
    """A zero mask row behaves like the reference's `mask is None` skip."""
    noise, region, masks = _setup(jax.random.PRNGKey(2))
    masks = masks.at[1].set(0.0)
    out = regions.fuse_region_noise(noise, region, masks,
                                    active=jnp.bool_(True))
    # concept-1's old region now falls outside the union => base is kept
    np.testing.assert_allclose(out[1, 4:, 4:], noise[1, 4:, 4:])
    np.testing.assert_allclose(out[1, :4, :4], region[0, 0, :4, :4], rtol=1e-5)


def test_partial_replace_ratio():
    noise, region, masks = _setup(jax.random.PRNGKey(3))
    r = 0.3
    out = regions.fuse_region_noise(noise, region, masks,
                                    active=jnp.bool_(True), replace_ratio=r)
    expect = (1 - r) * noise[1, :4, :4] + r * region[0, 0, :4, :4]
    np.testing.assert_allclose(out[1, :4, :4], expect, rtol=1e-5)


def test_union_mask_matches_reference():
    masks = jnp.asarray(np.array([
        [[1, 0], [0, 0]],
        [[0, 0], [0, 1]],
    ], np.float32))
    u = regions.union_mask(masks)
    np.testing.assert_array_equal(u, np.array([[1, 0], [0, 1]], np.float32))


def test_mask_stack_padding():
    stack = regions.make_concept_mask_stack(
        [np.ones((16, 16), np.float32), None], (8, 8), max_concepts=3)
    assert stack.shape == (3, 8, 8)
    np.testing.assert_array_equal(stack[0], np.ones((8, 8)))
    np.testing.assert_array_equal(stack[1], np.zeros((8, 8)))
    np.testing.assert_array_equal(stack[2], np.zeros((8, 8)))
