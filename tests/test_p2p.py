"""P2P controller semantics vs. the reference's documented behavior.

Reference behaviors verified here (src/prompt_attention/p2p_attention.py):
  * cross-attn: copy-B conditional probs become mapper-projected copy-A
    probs blended by per-step alpha (:131-134,146-147)
  * self-attn: copy-B conditional probs replaced by copy-A's only within
    [self_start, self_end) steps and only for seq <= width*height
    (:114-118,126)
  * the unconditional half and copy-A are never modified (:34,129-137)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu.control import p2p


def make_probs(key, nq, nk):
    logits = jax.random.normal(key, (4, 2, nq, nk))
    return jax.nn.softmax(logits, axis=-1)


@pytest.fixture
def ctl():
    return p2p.P2PControl.build(["a cat", "a cat"], num_steps=10,
                                cross_replace_steps=1.0,
                                self_replace_steps=0.4,
                                width=4, height=4)


def test_cross_full_replace(ctl):
    probs = make_probs(jax.random.PRNGKey(0), 16, 77)
    out = ctl.at_step(jnp.int32(3))(probs, is_cross=True)
    # identity mapper + alpha=1 => copy B == copy A (cond half)
    np.testing.assert_allclose(out[3], probs[2], atol=1e-6)
    # base and uncond rows untouched
    np.testing.assert_allclose(out[0], probs[0])
    np.testing.assert_allclose(out[1], probs[1])
    np.testing.assert_allclose(out[2], probs[2])


def test_cross_alpha_blend():
    ctl = p2p.P2PControl.build(["a cat", "a cat"], num_steps=10,
                               cross_replace_steps=0.5,
                               self_replace_steps=0.0, width=4, height=4)
    probs = make_probs(jax.random.PRNGKey(1), 16, 77)
    # steps 0..4 (alpha rows 0..4 of 11 are 1 for bounds (0, .5))
    out_early = ctl.at_step(jnp.int32(2))(probs, is_cross=True)
    np.testing.assert_allclose(out_early[3], probs[2], atol=1e-6)
    # beyond the window alpha=0 => unchanged
    out_late = ctl.at_step(jnp.int32(9))(probs, is_cross=True)
    np.testing.assert_allclose(out_late[3], probs[3], atol=1e-6)


def test_self_replace_window(ctl):
    probs = make_probs(jax.random.PRNGKey(2), 16, 16)
    # step 2 < 4 = int(10*0.4) => replace
    out = ctl.at_step(jnp.int32(2))(probs, is_cross=False)
    np.testing.assert_allclose(out[3], probs[2], atol=1e-6)
    # step 4 >= end => untouched
    out2 = ctl.at_step(jnp.int32(4))(probs, is_cross=False)
    np.testing.assert_allclose(out2[3], probs[3], atol=1e-6)


def test_self_seq_gate(ctl):
    step = ctl.at_step(jnp.int32(0))
    assert step.wants(is_cross=False, num_queries=16)
    # width*height = 16; larger layers skip the self replace
    assert not step.wants(is_cross=False, num_queries=64)
    assert step.wants(is_cross=True, num_queries=4096)


def test_jit_single_program(ctl):
    """One compiled program serves all steps (step is traced)."""
    probs = make_probs(jax.random.PRNGKey(3), 8, 77)
    calls = 0

    @jax.jit
    def run(p, i):
        nonlocal calls
        calls += 1
        return ctl.at_step(i)(p, is_cross=True)

    a = run(probs, jnp.int32(0))
    b = run(probs, jnp.int32(7))
    assert calls == 1
    assert a.shape == b.shape


def test_alpha_schedule_matches_reference_shape():
    alpha = p2p.time_words_alpha(["x", "x"], 50, 1.0)
    assert alpha.shape == (51, 1, 77)
    assert alpha.min() == 1.0  # bounds (0,1) => all ones for default key


def test_mapper_identity_for_equal_prompts():
    m = p2p.replacement_mapper(["same prompt", "same prompt"])
    np.testing.assert_array_equal(m, np.eye(77, dtype=np.float32))
