"""UNet numerical parity vs an independent torch re-implementation.

The converter tests prove layer-level parity (linear/conv/norm/attention
primitives match torch). This test goes further: a from-torch-primitives
re-implementation of the SDXL block wiring (resnet -> transformer ->
up/down sampling, diffusers semantics) run against our tiny UNet with
converted weights. Catches wiring-order and transpose mistakes that
self-consistency tests cannot.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu import config as cfglib
from omg_tpu.models import unet as unet_lib

torch = pytest.importorskip("torch")


def t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def lin(p, x):
    y = x @ t(p["weight"])
    if "bias" in p:
        y = y + t(p["bias"])
    return y


def conv(p, x, stride=1, padding=1):
    w = t(p["weight"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    b = t(p["bias"]) if "bias" in p else None
    return torch.nn.functional.conv2d(x, w, b, stride=stride,
                                      padding=padding)


def gn(p, x, groups):
    return torch.nn.functional.group_norm(x, groups, t(p["weight"]),
                                          t(p["bias"]), eps=1e-5)


def ln(p, x):
    return torch.nn.functional.layer_norm(x, (x.shape[-1],),
                                          t(p["weight"]), t(p["bias"]))


def resnet(p, x, temb, groups):
    h = torch.nn.functional.silu(gn(p["norm1"], x, groups))
    h = conv(p["conv1"], h)
    tproj = lin(p["time_emb_proj"], torch.nn.functional.silu(temb))
    h = h + tproj[:, :, None, None]
    h = torch.nn.functional.silu(gn(p["norm2"], h, groups))
    h = conv(p["conv2"], h)
    if "conv_shortcut" in p:
        x = conv(p["conv_shortcut"], x, padding=0)
    return x + h


def attention(p, x, ctx, heads):
    q = lin(p["to_q"], x)
    k = lin(p["to_k"], ctx)
    v = lin(p["to_v"], ctx)
    b, n, c = q.shape
    hd = c // heads

    def split(a):
        return a.reshape(b, a.shape[1], heads, hd).transpose(1, 2)

    out = torch.nn.functional.scaled_dot_product_attention(
        split(q), split(k), split(v))
    out = out.transpose(1, 2).reshape(b, n, c)
    return lin(p["to_out"], out)


def transformer(p, x, ctx_text, head_dim, groups):
    b, c, hh, ww = x.shape
    heads = c // head_dim
    res = x
    h = gn(p["norm"], x, groups)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    h = lin(p["proj_in"], h)
    for blk in p["transformer_blocks"]:
        hb = ln(blk["norm1"], h)
        h = h + attention(blk["attn1"], hb, hb, heads)
        hb = ln(blk["norm2"], h)
        h = h + attention(blk["attn2"], hb, ctx_text, heads)
        hb = ln(blk["norm3"], h)
        ff = lin(blk["ff"]["net_0_proj"], hb)
        a, gate = ff.chunk(2, dim=-1)
        h = h + lin(blk["ff"]["net_2"],
                    a * torch.nn.functional.gelu(gate))
    h = lin(p["proj_out"], h)
    return h.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + res


def timestep_embedding(ts, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
    args = ts[:, None].float() * freqs
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def torch_unet(p, cfg, sample, timestep, ehs, pooled, time_ids):
    groups = cfg.norm_num_groups
    hd = cfg.attention_head_dim
    b = sample.shape[0]

    temb = timestep_embedding(torch.full((b,), float(timestep)),
                              cfg.block_out_channels[0])
    te = p["time_embedding"]
    temb = lin(te["linear_2"],
               torch.nn.functional.silu(lin(te["linear_1"], temb)))
    ids = time_ids.reshape(-1)
    id_emb = timestep_embedding(ids, cfg.addition_time_embed_dim)
    id_emb = id_emb.reshape(b, -1)
    add = torch.cat([pooled, id_emb], dim=-1)
    ae = p["add_embedding"]
    temb = temb + lin(ae["linear_2"],
                      torch.nn.functional.silu(lin(ae["linear_1"], add)))

    x = conv(p["conv_in"], sample)
    skips = [x]
    for blk in p["down_blocks"]:
        attns = blk.get("attentions")
        for ri, res in enumerate(blk["resnets"]):
            x = resnet(res, x, temb, groups)
            if attns:
                x = transformer(attns[ri], x, ehs, hd, groups)
            skips.append(x)
        if "downsamplers" in blk:
            x = conv(blk["downsamplers"][0]["conv"], x, stride=2)
            skips.append(x)

    mid = p["mid_block"]
    x = resnet(mid["resnets"][0], x, temb, groups)
    if mid["attentions"]:
        x = transformer(mid["attentions"][0], x, ehs, hd, groups)
    x = resnet(mid["resnets"][1], x, temb, groups)

    for blk in p["up_blocks"]:
        attns = blk.get("attentions")
        for ri, res in enumerate(blk["resnets"]):
            skip = skips.pop()
            x = torch.cat([x, skip], dim=1)
            x = resnet(res, x, temb, groups)
            if attns:
                x = transformer(attns[ri], x, ehs, hd, groups)
        if "upsamplers" in blk:
            x = torch.nn.functional.interpolate(x, scale_factor=2,
                                                mode="nearest")
            x = conv(blk["upsamplers"][0]["conv"], x)

    x = torch.nn.functional.silu(gn(p["conv_norm_out"], x, groups))
    return conv(p["conv_out"], x)


def test_unet_matches_torch_reimplementation():
    cfg = cfglib.tiny_unet()
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    s = cfg.sample_size
    sample = jax.random.normal(ks[0], (2, s, s, 4))
    ehs = jax.random.normal(ks[1], (2, 77, cfg.cross_attention_dim))
    pooled = jax.random.normal(ks[2], (2, 16))
    tids = jnp.tile(jnp.asarray([[s * 8, s * 8, 0, 0, s * 8, s * 8]],
                                jnp.float32), (2, 1))

    ours = unet_lib.apply(params, cfg, sample, jnp.asarray(123), ehs,
                          text_embeds=pooled, time_ids=tids)

    with torch.no_grad():
        ref = torch_unet(params, cfg, t(sample).permute(0, 3, 1, 2), 123,
                         t(ehs), t(pooled), t(tids))
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)
