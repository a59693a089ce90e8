"""Int8 W8A8 quantized serving mode (ops/quant.py).

Correctness bar for an *approximate* opt-in mode: the quantized matmul
must track fp math within int8 rounding error, the tree transform must
hit exactly the transformer GEMMs, and the end-to-end quantized UNet
must stay close to the bf16 UNet (it shares everything but the GEMM
precision).
"""

import jax
import jax.numpy as jnp
import numpy as np

from omg_tpu.models import unet as unet_lib
from omg_tpu.nn import layers
from omg_tpu.ops import quant
from omg_tpu.pipelines import sdxl


def test_int8_matmul_tracks_fp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    qp = quant.quantize_linear({"weight": w})
    got = quant.int8_matmul(x, qp["weight_q"], qp["w_scale"])
    want = x @ w
    # error bound: |x|_1 * (column scale) rounding — loose check at 2%
    rel = float(jnp.abs(got - want).max() / jnp.abs(want).max())
    assert rel < 0.02, rel


def test_quantized_linear_with_bias_and_lora():
    rng = np.random.default_rng(1)
    p = {"weight": jnp.asarray(rng.standard_normal((32, 16)), jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(16), jnp.float32)}
    lora = {"down": jnp.asarray(rng.standard_normal((32, 4)), jnp.float32),
            "up": jnp.asarray(rng.standard_normal((4, 16)), jnp.float32),
            "scale": jnp.asarray(0.7, jnp.float32)}
    x = jnp.asarray(rng.standard_normal((3, 32)), jnp.float32)
    qp = quant.quantize_linear(p)
    got = layers.linear(qp, x, lora)
    want = layers.linear(p, x, lora)
    assert float(jnp.abs(got - want).max() / jnp.abs(want).max()) < 0.02


def test_quantize_unet_scope():
    cfg = sdxl.tiny_config().unet
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg)
    q = quant.quantize_unet_params(params, min_dim=32)
    # transformer projections quantized
    blk = q["down_blocks"][1]["attentions"][0]["transformer_blocks"][0]
    assert "weight_q" in blk["attn1"]["to_q"]
    assert blk["attn1"]["to_q"]["weight_q"].dtype == jnp.int8
    assert "weight_q" in blk["ff"]["net_0_proj"]
    # outside scope untouched: time embedding, convs, norms
    assert "weight" in q["time_embedding"]["linear_1"]
    assert "weight" in q["conv_in"]
    assert "weight" in blk["norm1"]


def test_quantized_unet_close_to_bf16():
    cfg = sdxl.tiny_config().unet
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_unet_params(params, min_dim=32)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4), cfg.dtype)
    emb = jax.random.normal(jax.random.PRNGKey(2),
                            (2, 77, cfg.cross_attention_dim), cfg.dtype)
    te = jax.random.normal(jax.random.PRNGKey(3), (2, 16), cfg.dtype)
    tids = jnp.ones((2, 6))

    ref = unet_lib.apply(params, cfg, x, jnp.int32(500), emb,
                         text_embeds=te, time_ids=tids)
    got = unet_lib.apply(qparams, cfg, x, jnp.int32(500), emb,
                         text_embeds=te, time_ids=tids)
    ref = np.asarray(ref, np.float32).ravel()
    got = np.asarray(got, np.float32).ravel()
    cos = float(np.dot(ref, got)
                / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-12))
    assert cos > 0.995, cos
    # and it is genuinely a different program (quantization did happen)
    assert not np.array_equal(ref, got)


def test_quantize_packed_layout():
    """pack_params' scan-stacked blocks quantize per-depth-slice."""
    cfg = sdxl.tiny_config().unet
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg)
    packed = unet_lib.pack_params(params, min_depth=1)  # tiny depth == 1
    qpacked = quant.quantize_unet_params(packed, min_dim=32)

    def find_stacked(node):
        if isinstance(node, dict):
            if "transformer_blocks_stacked" in node:
                return node["transformer_blocks_stacked"]
            for v in node.values():
                r = find_stacked(v)
                if r is not None:
                    return r
        if isinstance(node, list):
            for v in node:
                r = find_stacked(v)
                if r is not None:
                    return r
        return None

    st = find_stacked(qpacked)
    assert st is not None
    assert st["attn1"]["to_q"]["weight_q"].ndim == 3           # [D, in, out]
    assert st["attn1"]["to_q"]["w_scale"].ndim == 2            # [D, out]

    # packed+quantized forward still runs and tracks the bf16 original
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4), cfg.dtype)
    emb = jax.random.normal(jax.random.PRNGKey(2),
                            (1, 77, cfg.cross_attention_dim), cfg.dtype)
    te = jax.random.normal(jax.random.PRNGKey(3), (1, 16), cfg.dtype)
    tids = jnp.ones((1, 6))
    ref = unet_lib.apply(params, cfg, x, jnp.int32(300), emb,
                         text_embeds=te, time_ids=tids)
    got = unet_lib.apply(qpacked, cfg, x, jnp.int32(300), emb,
                         text_embeds=te, time_ids=tids)
    ref = np.asarray(ref, np.float32).ravel()
    got = np.asarray(got, np.float32).ravel()
    cos = float(np.dot(ref, got)
                / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-12))
    assert cos > 0.995, cos


def test_engine_quantize_mode_generates():
    """quantize='int8' engine runs the full two-stage flow."""
    from omg_tpu.pipelines import omg as omg_lib
    from omg_tpu.text.tokenizer import ToyTokenizer

    cfg = sdxl.tiny_config()
    params = sdxl.init_params(jax.random.PRNGKey(0), cfg)

    def provider(image, cls):
        m = np.zeros(image.shape[:2], np.float32)
        m[:, : image.shape[1] // 2] = 1.0
        return m

    eng = omg_lib.OMG(cfg=cfg, params=params, tokenizer=ToyTokenizer(),
                      tokenizer_2=ToyTokenizer(), mask_provider=provider,
                      num_steps=2, quantize="int8")
    # the engine's UNet really is quantized (guards a vacuous pass: a
    # too-high min_dim once left the tiny config entirely unquantized)
    leaves = jax.tree.leaves(eng.params.unet)
    assert any(l.dtype == jnp.int8 for l in leaves)
    out = eng.generate("the man here", prompt_rewrite="[the man]-*-[bad]",
                       seed=3, height=32, width=32)
    assert out.image.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(out.stage2, np.float32)).all()


def test_int8_matmul_stacked_3d_path():
    """Per-lane stacked weights [B, in, out] with w_scale [B, out] must
    dequantize correctly for multi-token activations (w_scale broadcasts
    over the token axis, not against it)."""
    import numpy as np
    rng = np.random.default_rng(0)
    B, N, DI, DO = 3, 5, 8, 4
    x = jnp.asarray(rng.standard_normal((B, N, DI)), jnp.float32)
    w = rng.standard_normal((B, DI, DO)).astype(np.float32)
    scale = np.maximum(np.abs(w).max(axis=1, keepdims=True) / 127.0, 1e-12)
    wq = jnp.asarray(np.clip(np.round(w / scale), -127, 127), jnp.int8)
    ws = jnp.asarray(scale[:, 0])                     # [B, out]
    got = np.asarray(quant.int8_matmul(x, wq, ws))
    want = np.einsum("bni,bio->bno", np.asarray(x), w)
    assert got.shape == (B, N, DO)
    assert np.abs(got - want).max() < 0.15 * np.abs(want).max()


def test_mha_mixed_quantization_layouts():
    """min_dim gating can quantize some projections of one attention and
    not others; mha must fall back to per-projection GEMMs instead of
    fusing mixed layouts (which crashed with KeyError)."""
    import numpy as np
    from omg_tpu.nn.attention import mha

    rng = np.random.default_rng(0)
    C, ctx_d, inner = 16, 8, 16

    def lin(di, do):
        return {"weight": jnp.asarray(
            rng.standard_normal((di, do)) * 0.1, jnp.float32)}

    # cross-attention with quantized q/out but plain (small) k/v
    p = {"to_q": quant.quantize_linear(lin(C, inner)),
         "to_k": lin(ctx_d, inner),
         "to_v": lin(ctx_d, inner),
         "to_out": quant.quantize_linear(lin(inner, C))}
    x = jnp.asarray(rng.standard_normal((2, 6, C)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 4, ctx_d)), jnp.float32)
    out = mha(p, x, num_heads=2, context=ctx)
    assert out.shape == (2, 6, C)
    assert bool(jnp.isfinite(out).all())

    # self-attention with only to_q quantized
    p2 = {"to_q": quant.quantize_linear(lin(C, inner)),
          "to_k": lin(C, inner), "to_v": lin(C, inner),
          "to_out": lin(inner, C)}
    out2 = mha(p2, x, num_heads=2)
    assert bool(jnp.isfinite(out2).all())
