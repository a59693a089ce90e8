"""EfficientViT-SAM encoder parity vs an independent torch re-implementation
(published EfficientViT semantics: ConvLayer+BN+act, FusedMBConv/MBConv,
ReLU linear attention with multi-scale aggregation, SamNeck DAG)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu.segment import efficientvit as evit

torch = pytest.importorskip("torch")


def t(a):
    return torch.from_numpy(np.array(a, np.float32))


def conv_raw(p, x, stride=1, padding=0, groups=1):
    w = t(p["weight"]).permute(3, 2, 0, 1)
    b = t(p["bias"]) if "bias" in p else None
    return torch.nn.functional.conv2d(x, w, b, stride=stride,
                                      padding=padding, groups=groups)


def bn(p, x):
    return torch.nn.functional.batch_norm(
        x, t(p["running_mean"]), t(p["running_var"]), t(p["weight"]),
        t(p["bias"]), training=False, eps=1e-5)


def act(name, x):
    if name is None:
        return x
    if name == "gelu":
        return torch.nn.functional.gelu(x)
    if name == "relu":
        return torch.nn.functional.relu(x)
    raise ValueError(name)


def conv_layer(p, x, k, stride=1, groups=1, a=None):
    y = conv_raw(p["conv"], x, stride=stride, padding=k // 2, groups=groups)
    if "norm" in p:
        y = bn(p["norm"], y)
    return act(a, y)


def fmb(p, x, stride=1):
    h = conv_layer(p["spatial_conv"], x, 3, stride=stride, a="gelu")
    return conv_layer(p["point_conv"], h, 1)


def mb(p, x, stride=1):
    h = conv_layer(p["inverted_conv"], x, 1, a="gelu")
    mid = h.shape[1]
    h = conv_layer(p["depth_conv"], h, 3, stride=stride, groups=mid, a="gelu")
    return conv_layer(p["point_conv"], h, 1)


def lite_mla(p, x, dim, scales=(3,), eps=1e-15):
    qkv = conv_layer(p["qkv"], x, 1)
    total = qkv.shape[1] // 3
    heads = total // dim
    multi = [qkv]
    for si, s in enumerate(scales):
        agg = p["aggreg"][si]
        h1 = conv_raw(agg[0], qkv, padding=s // 2, groups=3 * total)
        h1 = conv_raw(agg[1], h1, groups=3 * heads)
        multi.append(h1)
    stacked = torch.cat(multi, dim=1)
    B, C, H, W = stacked.shape
    g = C // (3 * dim)
    ts = stacked.reshape(B, g, 3 * dim, H * W).transpose(-1, -2).double()
    q, k, v = ts[..., :dim], ts[..., dim:2 * dim], ts[..., 2 * dim:]
    q, k = torch.relu(q), torch.relu(k)
    v1 = torch.nn.functional.pad(v, (0, 1), value=1.0)
    kv = k.transpose(-1, -2) @ v1
    out = q @ kv
    out = out[..., :-1] / (out[..., -1:] + eps)
    out = out.transpose(-1, -2).reshape(B, -1, H, W).float()
    return conv_layer(p["proj"], out, 1)


def res_block(p, x):
    h = conv_layer(p["conv1"], x, 3, a="gelu")
    return conv_layer(p["conv2"], h, 3)


def backbone(p, cfg, x):
    st = p["stages"][0]["op_list"]
    x = conv_layer(st[0], x, 3, stride=2, a="gelu")
    for blk in st[1:]:
        x = x + res_block(blk["main"], x)
    feats = {"stage0": x}
    for sid in range(1, len(cfg.width_list)):
        st = p["stages"][sid]["op_list"]
        block = cfg.block_list[sid]
        down_kind = block if block in ("mb", "fmb") else "mb"
        fn = fmb if down_kind == "fmb" else mb
        x = fn(st[0]["main"], x, stride=2)
        for blk in st[1:]:
            if block.startswith("att"):
                x = x + lite_mla(blk["context_module"]["main"], x,
                                 cfg.qkv_dim,
                                 (3,) if block == "att@3" else (5,))
                x = x + mb(blk["local_module"]["main"], x)
            elif block == "fmb":
                x = x + fmb(blk["main"], x)
            else:
                x = x + mb(blk["main"], x)
        feats[f"stage{sid}"] = x
    return feats


def neck(p, cfg, feats):
    hw = (cfg.neck_feature_hw, cfg.neck_feature_hw)
    acc = None
    for i, fid in enumerate(cfg.neck_fids):
        h = conv_layer(p["input_ops"][i]["op_list"][0], feats[fid], 1)
        h = torch.nn.functional.interpolate(h, size=hw, mode="bicubic",
                                            align_corners=False)
        acc = h if acc is None else acc + h
    for blk in p["middle"]["op_list"]:
        acc = acc + fmb(blk["main"], acc)
    return conv_layer(p["output_ops"][0]["op_list"][0], acc, 1)


def test_encoder_matches_torch():
    cfg = evit.tiny_config()
    params = evit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, cfg.image_size, cfg.image_size, 3))
    ours = evit.encoder_apply(params, cfg, x)

    with torch.no_grad():
        feats = backbone(params["backbone"], cfg, t(x).permute(0, 3, 1, 2))
        out = neck(params["neck"], cfg, feats)
        out = out.permute(0, 2, 3, 1)
        ref = torch.nn.functional.layer_norm(
            out, (out.shape[-1],), t(params["norm"]["weight"]),
            t(params["norm"]["bias"]))
    # resizes are torch-exact (evit_ops bicubic a=-0.75 matrices)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=5e-4, atol=5e-4)
    # and tightly on the pre-neck backbone features (no resize involved)
    ours_feats = evit.backbone_apply(params["backbone"], cfg, x)
    np.testing.assert_allclose(
        np.asarray(ours_feats["stage5"]),
        feats["stage5"].permute(0, 2, 3, 1).numpy(), rtol=2e-4, atol=2e-4)
