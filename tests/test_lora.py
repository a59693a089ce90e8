"""LoRA subsystem: parsing, merging, and in-layer application."""

import jax
import jax.numpy as jnp
import numpy as np

from omg_tpu import lora as lora_lib
from omg_tpu.nn import layers


def _leaf_paths(tree, prefix=()):
    if lora_lib._is_leaf(tree):
        yield prefix, tree
        return
    for k, v in tree.items():
        yield from _leaf_paths(v, prefix + (k,))


def test_parse_kohya_format():
    rank, din, dout = 4, 8, 16
    sd = {
        "lora_unet_down_blocks_1_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_down.weight": np.random.randn(rank, din).astype(np.float32),
        "lora_unet_down_blocks_1_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_up.weight": np.random.randn(dout, rank).astype(np.float32),
        "lora_unet_down_blocks_1_attentions_0_transformer_blocks_0_attn1_to_q"
        ".alpha": np.asarray(8.0, np.float32),
    }
    tree = lora_lib.lora_from_state_dict(sd)
    leaf = tree["unet"]["down_blocks"][1]["attentions"][0][
        "transformer_blocks"][0]["attn1"]["to_q"]
    assert leaf["down"].shape == (din, rank)
    assert leaf["up"].shape == (rank, dout)
    np.testing.assert_allclose(float(leaf["scale"]), 8.0 / rank)


def test_parse_peft_format_ff_path():
    rank, din, dout = 2, 8, 64
    sd = {
        "unet.up_blocks.0.attentions.1.transformer_blocks.0.ff.net.0.proj"
        ".lora_A.weight": np.random.randn(rank, din).astype(np.float32),
        "unet.up_blocks.0.attentions.1.transformer_blocks.0.ff.net.0.proj"
        ".lora_B.weight": np.random.randn(dout, rank).astype(np.float32),
    }
    tree = lora_lib.lora_from_state_dict(sd)
    leaf = tree["unet"]["up_blocks"][0]["attentions"][1][
        "transformer_blocks"][0]["ff"]["net_0_proj"]
    assert leaf["down"].shape == (din, rank)
    # PEFT default: alpha == rank => scale 1
    np.testing.assert_allclose(float(leaf["scale"]), 1.0)


def test_parse_to_out_zero():
    sd = {
        "unet.mid_block.attentions.0.transformer_blocks.0.attn2.to_out.0"
        ".lora_A.weight": np.zeros((2, 8), np.float32),
        "unet.mid_block.attentions.0.transformer_blocks.0.attn2.to_out.0"
        ".lora_B.weight": np.zeros((8, 2), np.float32),
    }
    tree = lora_lib.lora_from_state_dict(sd)
    leaf = tree["unet"]["mid_block"]["attentions"][0][
        "transformer_blocks"][0]["attn2"]["to_out"]
    assert leaf["down"].shape == (8, 2)


def test_merge_equals_weighted_sum():
    """merge_loras([a, b], [wa, wb]) applies wa*da + wb*db exactly."""
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    din, dout = 8, 8
    x = jax.random.normal(ks[0], (3, din))
    p = layers.init_linear(ks[1], din, dout)

    def mk(k1, k2, r, s):
        return {"down": jax.random.normal(k1, (din, r)),
                "up": jax.random.normal(k2, (r, dout)),
                "scale": jnp.asarray(s)}

    a = {"attn": {"to_q": mk(ks[2], ks[3], 2, 2.0)}}
    b = {"attn": {"to_q": mk(ks[4], ks[5], 3, 0.5)}}
    merged = lora_lib.merge_loras([a, b], [0.7, 0.5])

    y_merged = layers.linear(p, x, merged["attn"]["to_q"])
    base = layers.linear(p, x)
    da = layers.linear({"weight": jnp.zeros((din, dout))}, x,
                       a["attn"]["to_q"])
    db = layers.linear({"weight": jnp.zeros((din, dout))}, x,
                       b["attn"]["to_q"])
    np.testing.assert_allclose(
        np.asarray(y_merged), np.asarray(base + 0.7 * da + 0.5 * db),
        rtol=1e-5, atol=1e-5)


def test_merge_skips_none():
    a = {"m": {"down": jnp.ones((4, 2)), "up": jnp.ones((2, 4)),
               "scale": jnp.asarray(1.0)}}
    merged = lora_lib.merge_loras([a, None], [1.0, 0.5])
    assert merged["m"]["down"].shape == (4, 2)
    assert lora_lib.merge_loras([None], [1.0]) is None


def test_stack_loras_matches_sequential():
    """Per-lane stacked deltas == applying each adapter separately."""
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    din, dout = 8, 8
    x = jax.random.normal(ks[0], (4, 3, din))  # 4 lanes (2 concepts x 2)
    p = layers.init_linear(ks[1], din, dout)

    def mk(k1, k2, r, s):
        return {"m": {"down": jax.random.normal(k1, (din, r)),
                      "up": jax.random.normal(k2, (r, dout)),
                      "scale": jnp.asarray(s)}}

    a = mk(ks[2], ks[3], 2, 1.5)       # rank 2
    b = mk(ks[4], ks[5], 3, 0.7)       # rank 3 (padding exercised)
    stacked = lora_lib.stack_loras([a, b], repeat=2)
    assert stacked["m"]["down"].shape == (4, din, 3)

    y = layers.linear(p, x, stacked["m"])
    for lane, tree in [(0, a), (1, a), (2, b), (3, b)]:
        expect = layers.linear(p, x[lane], tree["m"])
        np.testing.assert_allclose(np.asarray(y[lane]), np.asarray(expect),
                                   rtol=1e-5, atol=1e-5)


def test_stack_loras_none_lane():
    a = {"m": {"down": jnp.ones((4, 2)), "up": jnp.ones((2, 4)),
               "scale": jnp.asarray(1.0)}}
    stacked = lora_lib.stack_loras([a, None], repeat=1)
    np.testing.assert_allclose(np.asarray(stacked["m"]["scale"]), [1.0, 0.0])
    assert lora_lib.stack_loras([None, None]) is None


def test_scale_lora():
    a = {"m": {"down": jnp.ones((4, 2)), "up": jnp.ones((2, 4)),
               "scale": jnp.asarray(2.0)}}
    s = lora_lib.scale_lora(a, 0.8)
    np.testing.assert_allclose(float(s["m"]["scale"]), 1.6)


def test_parse_old_style_attn_procs_format():
    """Old diffusers attn-procs export: unprefixed block-level keys with
    processor/to_q_lora wrappers must land on the param tree's to_q path
    (previously this branch produced deltas that never applied)."""
    rng = np.random.default_rng(0)
    pre = "down_blocks.1.attentions.0.transformer_blocks.0.attn1"
    sd = {
        f"{pre}.processor.to_q_lora.down.weight":
            rng.standard_normal((4, 16)).astype(np.float32),
        f"{pre}.processor.to_q_lora.up.weight":
            rng.standard_normal((16, 4)).astype(np.float32),
    }
    tree = lora_lib.lora_from_state_dict(sd)
    leaf = tree["unet"]["down_blocks"][1]["attentions"][0][
        "transformer_blocks"][0]["attn1"]["to_q"]
    assert leaf["down"].shape == (16, 4)     # [in, r]
    assert leaf["up"].shape == (4, 16)       # [r, out]


def test_parse_skips_kxk_conv_lora():
    """3x3 conv (LoCon) deltas are skipped, not corner-sliced."""
    rng = np.random.default_rng(1)
    sd = {
        "unet.down_blocks.0.resnets.0.conv1.lora_A.weight":
            rng.standard_normal((4, 16, 3, 3)).astype(np.float32),
        "unet.down_blocks.0.resnets.0.conv1.lora_B.weight":
            rng.standard_normal((16, 4, 3, 3)).astype(np.float32),
        # a normal linear delta in the same dict still parses
        "unet.mid_block.attentions.0.transformer_blocks.0.attn1."
        "to_q.lora_A.weight": rng.standard_normal((4, 8)).astype(np.float32),
        "unet.mid_block.attentions.0.transformer_blocks.0.attn1."
        "to_q.lora_B.weight": rng.standard_normal((8, 4)).astype(np.float32),
    }
    tree = lora_lib.lora_from_state_dict(sd)
    assert "resnets" not in str(
        jax.tree_util.tree_structure(tree["unet"]))
    assert "to_q" in tree["unet"]["mid_block"]["attentions"][0][
        "transformer_blocks"][0]["attn1"]
