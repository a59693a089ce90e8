"""Segmentation stack: EfficientViT encoder, SAM decoder, mask provider."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu.segment import efficientvit as evit
from omg_tpu.segment import evit_ops as ops
from omg_tpu.segment import sam_decoder as dec
from omg_tpu.segment.sam_provider import SamMaskProvider, SamPredictor


def test_batch_norm_matches_torch():
    import torch
    c = 8
    bn = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.randn(c))
        bn.bias.copy_(torch.randn(c))
        bn.running_mean.copy_(torch.randn(c))
        bn.running_var.copy_(torch.rand(c) + 0.5)
    x = np.random.randn(2, c, 5, 5).astype(np.float32)
    with torch.no_grad():
        ref = bn(torch.from_numpy(x)).numpy()
    p = {k: jnp.asarray(getattr(bn, k).detach().numpy())
         for k in ("weight", "bias", "running_mean", "running_var")}
    ours = ops.batch_norm(p, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_lite_mla_matches_direct_math():
    """LiteMLA vs a direct numpy transcription of the published
    ReLU-linear-attention formula q·(kᵀ[v;1]) / denom (ops.py:404-441)."""
    key = jax.random.PRNGKey(0)
    ch, dim = 16, 8
    p = evit._init_litemla(key, ch, dim, (3,), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, ch))
    out = ops.lite_mla(p, x, dim=dim, scales=(3,))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()

    # direct math on the same multi-scale qkv
    qkv = ops.conv_layer(p["qkv"], x, kernel=1)
    total = qkv.shape[-1] // 3
    agg = p["aggreg"][0]
    h1 = ops.conv2d_raw(agg[0], qkv, padding=1, groups=3 * total)
    h1 = ops.conv2d_raw(agg[1], h1, groups=3 * (total // dim))
    stacked = np.asarray(jnp.concatenate([qkv, h1], axis=-1), np.float64)
    b, hh, ww, _ = stacked.shape
    n = hh * ww
    g = stacked.shape[-1] // (3 * dim)
    t = stacked.reshape(b, n, g, 3 * dim).transpose(0, 2, 1, 3)
    q, k, v = t[..., :dim], t[..., dim:2 * dim], t[..., 2 * dim:]
    q, k = np.maximum(q, 0), np.maximum(k, 0)
    v1 = np.concatenate([v, np.ones_like(v[..., :1])], -1)
    kv = np.einsum("bgnd,bgne->bgde", k, v1)
    o = np.einsum("bgnd,bgde->bgne", q, kv)
    o = o[..., :-1] / (o[..., -1:] + 1e-15)
    o = o.transpose(0, 2, 1, 3).reshape(b, hh, ww, -1)
    expect = ops.conv_layer(p["proj"], jnp.asarray(o, jnp.float32), kernel=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-5)


def test_conv_transpose_matches_torch():
    import torch
    ct = torch.nn.ConvTranspose2d(6, 4, kernel_size=2, stride=2)
    x = np.random.randn(1, 6, 5, 5).astype(np.float32)
    with torch.no_grad():
        ref = ct(torch.from_numpy(x)).numpy()
    w = ct.weight.detach().numpy().transpose(2, 3, 1, 0)  # -> [k,k,out,in]
    p = {"weight": jnp.asarray(w), "bias": jnp.asarray(ct.bias.detach().numpy())}
    ours = dec._conv_transpose_2x(p, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_sam():
    cfg = evit.tiny_config()
    enc = evit.init_params(jax.random.PRNGKey(0), cfg)
    prompt = dec.init_prompt_encoder(jax.random.PRNGKey(1))
    decoder = dec.init_mask_decoder(jax.random.PRNGKey(2))
    return cfg, {"image_encoder": enc, "prompt_encoder": prompt,
                 "mask_decoder": decoder}


def test_encoder_shapes(tiny_sam):
    cfg, params = tiny_sam
    x = jax.random.normal(jax.random.PRNGKey(3),
                          (1, cfg.image_size, cfg.image_size, 3))
    out = evit.encoder_apply(params["image_encoder"], cfg, x)
    assert out.shape == (1, cfg.neck_feature_hw, cfg.neck_feature_hw,
                         cfg.neck_out_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_decoder_shapes():
    prompt = dec.init_prompt_encoder(jax.random.PRNGKey(1))
    decoder = dec.init_mask_decoder(jax.random.PRNGKey(2))
    emb = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 256))
    sparse = dec.encode_boxes(prompt, jnp.asarray([[4., 4., 30., 30.]]), 64)
    dense = dec.no_mask_dense(prompt, 1, 16)
    masks, iou = dec.decode_masks(decoder, prompt, emb, sparse, dense)
    assert masks.shape == (1, 4, 64, 64)
    assert iou.shape == (1, 4)
    assert np.isfinite(np.asarray(masks)).all()


def test_provider_end_to_end(tiny_sam):
    cfg, params = tiny_sam
    # decoder expects 256-dim embeddings; tiny encoder emits 16 — pad via a
    # full-size neck is overkill for CPU, so test the provider against the
    # decoder's own spatial size by swapping in a 256-dim tiny encoder cfg.
    import dataclasses
    cfg256 = dataclasses.replace(cfg, neck_out_dim=256)
    enc = evit.init_params(jax.random.PRNGKey(9), cfg256)
    p = {"image_encoder": enc, "prompt_encoder": params["prompt_encoder"],
         "mask_decoder": params["mask_decoder"]}
    provider = SamMaskProvider(params=p, cfg=cfg256)
    img = (np.random.rand(48, 64, 3) * 255).astype(np.uint8)
    mask = provider(img, "man")
    assert mask is not None
    assert mask.shape == (48, 64)
    assert set(np.unique(mask)).issubset({0.0, 1.0})


def test_predictor_feature_cache(tiny_sam):
    cfg, params = tiny_sam
    import dataclasses
    cfg256 = dataclasses.replace(cfg, neck_out_dim=256)
    enc = evit.init_params(jax.random.PRNGKey(9), cfg256)
    p = {"image_encoder": enc, "prompt_encoder": params["prompt_encoder"],
         "mask_decoder": params["mask_decoder"]}
    pred = SamPredictor(p, cfg256)
    img = (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
    pred.set_image(img)
    m1, s1 = pred.predict_box(np.array([8, 8, 40, 40], np.float32))
    m2, s2 = pred.predict_box(np.array([8, 8, 40, 40], np.float32))
    np.testing.assert_array_equal(m1, m2)
    assert m1.shape == (64, 64)


def test_zoo_configs_and_inference():
    """Zoo geometries (reference sam_model_zoo.py l0-xl1) are structurally
    distinct and recoverable from a converted tree's stage signature."""
    sigs = {}
    for name, make in evit.ZOO.items():
        cfg = make()
        sigs[name] = evit._signature(cfg)
        # a structure-only tree (op_list lengths are all infer reads)
        tree = {"backbone": {"stages": [
            {"op_list": [None] * n} for n in sigs[name]]}}
        got = evit.infer_config(tree)
        assert got == cfg, name
    assert len(set(sigs.values())) == len(sigs)  # unambiguous
    # non-zoo structure -> None (predictor then falls back to xl1)
    assert evit.infer_config(
        {"backbone": {"stages": [{"op_list": [None] * 2}] * 6}}) is None


def test_l_series_miniature_forward():
    """The l0-l2 code path (5-stage mb/att backbone, stage4/3/2 neck with
    expand 1) runs and produces the SAM embedding grid."""
    import dataclasses
    cfg = dataclasses.replace(
        evit.l0_config(),
        width_list=(8, 8, 16, 16, 32),
        depth_list=(1, 1, 1, 1, 1),
        expand_list=(1, 2, 2, 2, 2),
        qkv_dim=8,
        neck_in_channels=(32, 16, 16),
        neck_width=16, neck_depth=1, neck_out_dim=16,
        neck_feature_hw=8, image_size=64,
    )
    params = evit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = evit.encoder_apply(params, cfg, x)
    assert out.shape == (1, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
