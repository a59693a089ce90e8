"""ControlNet parity vs an independent torch re-implementation
(diffusers ControlNetModel semantics: cond embedder with stride-2 silu
convs, UNet-encoder trunk, zero-conv residual heads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu import config as cfglib
from omg_tpu.models import controlnet as cn_lib

torch = pytest.importorskip("torch")

from tests.test_unet_torch_parity import (conv, gn, lin, resnet, t,
                                          timestep_embedding, transformer)


def torch_controlnet(p, cfg, sample, timestep, ehs, pooled, time_ids,
                     cond_img, scale):
    u = cfg.unet
    groups = u.norm_num_groups
    hd = u.attention_head_dim
    b = sample.shape[0]

    temb = timestep_embedding(torch.full((b,), float(timestep)),
                              u.block_out_channels[0])
    te = p["time_embedding"]
    temb = lin(te["linear_2"],
               torch.nn.functional.silu(lin(te["linear_1"], temb)))
    ids = time_ids.reshape(-1)
    id_emb = timestep_embedding(ids, u.addition_time_embed_dim).reshape(b, -1)
    ae = p["add_embedding"]
    temb = temb + lin(ae["linear_2"], torch.nn.functional.silu(
        lin(ae["linear_1"], torch.cat([pooled, id_emb], dim=-1))))

    ce = p["controlnet_cond_embedding"]
    c = torch.nn.functional.silu(conv(ce["conv_in"], cond_img))
    blocks = ce["blocks"]
    for i in range(0, len(blocks), 2):
        c = torch.nn.functional.silu(conv(blocks[i], c))
        c = torch.nn.functional.silu(conv(blocks[i + 1], c, stride=2))
    c = conv(ce["conv_out"], c)

    x = conv(p["conv_in"], sample) + c
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

    down = [conv(zc, r, padding=0) * scale
            for zc, r in zip(p["controlnet_down_blocks"], skips)]
    mid_r = conv(p["controlnet_mid_block"], x, padding=0) * scale
    return down, mid_r


def test_controlnet_matches_torch():
    cfg = cfglib.tiny_controlnet()
    params = cn_lib.init_params(jax.random.PRNGKey(0), cfg)
    # non-zero heads so the comparison is non-trivial
    import jax.tree_util as jtu
    params = jtu.tree_map(
        lambda x: jax.random.normal(jax.random.PRNGKey(9), x.shape) * 0.02
        if x.ndim == 4 else x, params)

    u = cfg.unet
    s = u.sample_size
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    sample = jax.random.normal(ks[0], (2, s, s, 4))
    ehs = jax.random.normal(ks[1], (2, 77, u.cross_attention_dim))
    pooled = jax.random.normal(ks[2], (2, 16))
    tids = jnp.zeros((2, 6))
    cond = jax.random.normal(ks[3], (2, s * 8, s * 8, 3))

    down, mid = cn_lib.apply(params, cfg, sample, jnp.asarray(44), ehs,
                             cond, text_embeds=pooled, time_ids=tids,
                             conditioning_scale=0.8)
    with torch.no_grad():
        rd, rm = torch_controlnet(
            params, cfg, t(sample).permute(0, 3, 1, 2), 44, t(ehs),
            t(pooled), t(tids), t(cond).permute(0, 3, 1, 2), 0.8)
    for ours, ref in zip(down, rd):
        np.testing.assert_allclose(np.asarray(ours),
                                   ref.permute(0, 2, 3, 1).numpy(),
                                   rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(mid),
                               rm.permute(0, 2, 3, 1).numpy(),
                               rtol=3e-4, atol=3e-4)
