"""VAE numerical parity vs an independent torch re-implementation
(diffusers AutoencoderKL semantics: asymmetric-pad downsampling, mid
attention, nearest upsampling, quant/post-quant convs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu import config as cfglib
from omg_tpu.models import vae as vae_lib

torch = pytest.importorskip("torch")


def t(a):
    return torch.from_numpy(np.array(a, np.float32))


def conv(p, x, stride=1, padding=1):
    w = t(p["weight"]).permute(3, 2, 0, 1)
    b = t(p["bias"]) if "bias" in p else None
    return torch.nn.functional.conv2d(x, w, b, stride=stride,
                                      padding=padding)


def gn(p, x, groups):
    return torch.nn.functional.group_norm(x, groups, t(p["weight"]),
                                          t(p["bias"]), eps=1e-5)


def resnet(p, x, groups):
    h = torch.nn.functional.silu(gn(p["norm1"], x, groups))
    h = conv(p["conv1"], h)
    h = torch.nn.functional.silu(gn(p["norm2"], h, groups))
    h = conv(p["conv2"], h)
    if "conv_shortcut" in p:
        x = conv(p["conv_shortcut"], x, padding=0)
    return x + h


def lin(p, x):
    y = x @ t(p["weight"])
    if "bias" in p:
        y = y + t(p["bias"])
    return y


def mid(p, x, groups):
    x = resnet(p["resnets"][0], x, groups)
    a = p["attentions"][0]
    b, c, hh, ww = x.shape
    h = gn(a["group_norm"], x, groups)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    q, k, v = lin(a["to_q"], h), lin(a["to_k"], h), lin(a["to_v"], h)
    out = torch.nn.functional.scaled_dot_product_attention(
        q[:, None], k[:, None], v[:, None])[:, 0]
    out = lin(a["to_out"], out)
    x = x + out.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
    return resnet(p["resnets"][1], x, groups)


def torch_decode(p, cfg, lat):
    g = cfg.norm_num_groups
    d = p["decoder"]
    x = lat / cfg.scaling_factor
    x = conv(p["post_quant_conv"], x, padding=0)
    x = conv(d["conv_in"], x)
    x = mid(d["mid_block"], x, g)
    for blk in d["up_blocks"]:
        for res in blk["resnets"]:
            x = resnet(res, x, g)
        if "upsamplers" in blk:
            x = torch.nn.functional.interpolate(x, scale_factor=2,
                                                mode="nearest")
            x = conv(blk["upsamplers"][0]["conv"], x)
    x = torch.nn.functional.silu(gn(d["conv_norm_out"], x, g))
    return conv(d["conv_out"], x)


def torch_encode(p, cfg, img):
    g = cfg.norm_num_groups
    e = p["encoder"]
    x = conv(e["conv_in"], img)
    for blk in e["down_blocks"]:
        for res in blk["resnets"]:
            x = resnet(res, x, g)
        if "downsamplers" in blk:
            x = torch.nn.functional.pad(x, (0, 1, 0, 1))
            x = conv(blk["downsamplers"][0]["conv"], x, stride=2, padding=0)
    x = mid(e["mid_block"], x, g)
    x = torch.nn.functional.silu(gn(e["conv_norm_out"], x, g))
    x = conv(e["conv_out"], x)
    moments = conv(p["quant_conv"], x, padding=0)
    mean = moments.chunk(2, dim=1)[0]
    return mean * cfg.scaling_factor


def test_vae_decode_matches_torch():
    cfg = cfglib.tiny_vae()
    params = vae_lib.init_params(jax.random.PRNGKey(0), cfg)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4))
    ours = vae_lib.decode(params, cfg, lat)
    with torch.no_grad():
        ref = torch_decode(params, cfg, t(lat).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-4)


def test_vae_encode_matches_torch():
    cfg = cfglib.tiny_vae()
    params = vae_lib.init_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3)) * 0.5
    ours = vae_lib.encode(params, cfg, img)
    with torch.no_grad():
        ref = torch_encode(params, cfg, t(img).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-4)
