"""SAM ViT-H encoder parity vs an independent torch re-implementation
(published segment_anything ImageEncoderViT semantics: patch embed +
pos embed, windowed/global blocks with decomposed relative-position
attention, LayerNorm eps 1e-6, two-conv neck with LayerNorm2d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu.segment import vit_sam

torch = pytest.importorskip("torch")
F = None


def setup_module(_):
    global F
    import torch.nn.functional
    F = torch.nn.functional


def t(a):
    return torch.from_numpy(np.array(a, np.float32))


# ---------------------------------------------------------------- torch ref

def _ln(x, w, b):
    return F.layer_norm(x, (x.shape[-1],), w, b, eps=1e-6)


def _attn_torch(sd, pfx, x, num_heads):
    B, H, W, C = x.shape
    hd = C // num_heads
    scale = hd ** -0.5
    qkv = x.reshape(B, H * W, C) @ t(sd[pfx + "qkv.weight"]).T \
        + t(sd[pfx + "qkv.bias"])
    qkv = qkv.reshape(B, H * W, 3, num_heads, hd).permute(2, 0, 3, 1, 4)
    qkv = qkv.reshape(3, B * num_heads, H * W, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * scale) @ k.transpose(-2, -1)
    # decomposed rel pos (q_size == k_size -> pure table lookup)
    for name, size in (("rel_pos_h", H), ("rel_pos_w", W)):
        idx = torch.arange(size)[:, None] - torch.arange(size)[None, :] \
            + size - 1
        sel = t(sd[pfx + name])[idx]                     # [s, s, hd]
        r_q = q.reshape(B * num_heads, H, W, hd)
        if name == "rel_pos_h":
            rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, sel)
        else:
            rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, sel)
    attn = (attn.view(B * num_heads, H, W, H, W)
            + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
            ).view(B * num_heads, H * W, H * W)
    out = attn.softmax(-1) @ v
    out = out.view(B, num_heads, H * W, hd).permute(0, 2, 1, 3)
    out = out.reshape(B, H, W, C)
    return out @ t(sd[pfx + "proj.weight"]).T + t(sd[pfx + "proj.bias"])


def _window_partition_torch(x, ws):
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    x = F.pad(x, (0, 0, 0, pw, 0, ph))
    Hp, Wp = H + ph, W + pw
    x = x.view(B, Hp // ws, ws, Wp // ws, ws, C)
    return (x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C), (Hp, Wp))


def _window_unpartition_torch(x, ws, padded, hw):
    Hp, Wp = padded
    H, W = hw
    B = x.shape[0] // (Hp * Wp // ws // ws)
    x = x.view(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def torch_encoder(sd, x_nchw, cfg):
    x = F.conv2d(x_nchw, t(sd["patch_embed.proj.weight"]),
                 t(sd["patch_embed.proj.bias"]), stride=cfg.patch_size)
    x = x.permute(0, 2, 3, 1)                            # B H W C
    x = x + t(sd["pos_embed"])
    for i in range(cfg.depth):
        p = f"blocks.{i}."
        shortcut = x
        y = _ln(x, t(sd[p + "norm1.weight"]), t(sd[p + "norm1.bias"]))
        if cfg.window_size > 0 and i not in cfg.global_attn_indexes:
            H, W = y.shape[1:3]
            y, padded = _window_partition_torch(y, cfg.window_size)
            y = _attn_torch(sd, p + "attn.", y, cfg.num_heads)
            y = _window_unpartition_torch(y, cfg.window_size, padded, (H, W))
        else:
            y = _attn_torch(sd, p + "attn.", y, cfg.num_heads)
        x = shortcut + y
        y = _ln(x, t(sd[p + "norm2.weight"]), t(sd[p + "norm2.bias"]))
        y = y @ t(sd[p + "mlp.lin1.weight"]).T + t(sd[p + "mlp.lin1.bias"])
        y = F.gelu(y)
        y = y @ t(sd[p + "mlp.lin2.weight"]).T + t(sd[p + "mlp.lin2.bias"])
        x = x + y
    x = x.permute(0, 3, 1, 2)
    x = F.conv2d(x, t(sd["neck.0.weight"]))
    u = x.permute(0, 2, 3, 1)
    u = _ln(u, t(sd["neck.1.weight"]), t(sd["neck.1.bias"]))
    x = F.conv2d(u.permute(0, 3, 1, 2), t(sd["neck.2.weight"]), padding=1)
    u = x.permute(0, 2, 3, 1)
    u = _ln(u, t(sd["neck.3.weight"]), t(sd["neck.3.bias"]))
    return u                                              # B H W C


# ------------------------------------------------------------- state dict

def make_state_dict(cfg, seed=0):
    """Random torch-layout flat state dict at the tiny geometry."""
    rng = np.random.default_rng(seed)

    def r(*shape, s=0.05):
        return rng.standard_normal(shape).astype(np.float32) * s

    g = cfg.image_size // cfg.patch_size
    d = cfg.dim
    sd = {
        "patch_embed.proj.weight": r(d, 3, cfg.patch_size, cfg.patch_size),
        "patch_embed.proj.bias": r(d),
        "pos_embed": r(1, g, g, d),
        "neck.0.weight": r(cfg.out_chans, d, 1, 1),
        "neck.1.weight": 1.0 + r(cfg.out_chans),
        "neck.1.bias": r(cfg.out_chans),
        "neck.2.weight": r(cfg.out_chans, cfg.out_chans, 3, 3),
        "neck.3.weight": 1.0 + r(cfg.out_chans),
        "neck.3.bias": r(cfg.out_chans),
    }
    for i in range(cfg.depth):
        size = g if i in cfg.global_attn_indexes else cfg.window_size
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": 1.0 + r(d), p + "norm1.bias": r(d),
            p + "norm2.weight": 1.0 + r(d), p + "norm2.bias": r(d),
            p + "attn.qkv.weight": r(3 * d, d),
            p + "attn.qkv.bias": r(3 * d),
            p + "attn.proj.weight": r(d, d),
            p + "attn.proj.bias": r(d),
            p + "attn.rel_pos_h": r(2 * size - 1, d // cfg.num_heads),
            p + "attn.rel_pos_w": r(2 * size - 1, d // cfg.num_heads),
            p + "mlp.lin1.weight": r(cfg.mlp_ratio * d, d),
            p + "mlp.lin1.bias": r(cfg.mlp_ratio * d),
            p + "mlp.lin2.weight": r(d, cfg.mlp_ratio * d),
            p + "mlp.lin2.bias": r(d),
        })
    return sd


# ------------------------------------------------------------------- tests

def test_encoder_matches_torch():
    """Converted checkpoint -> encoder_apply == independent torch forward
    (exercises windowed block WITH padding: 4x4 grid, window 3 -> pad 6)."""
    cfg = vit_sam.tiny_config()
    sd = make_state_dict(cfg)
    params = vit_sam.convert_encoder(sd)
    x = np.random.default_rng(1).standard_normal(
        (2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)

    got = np.asarray(vit_sam.encoder_apply(params, cfg, jnp.asarray(x)))
    want = torch_encoder(sd, t(x).permute(0, 3, 1, 2), cfg).numpy()
    g = cfg.image_size // cfg.patch_size
    assert got.shape == (2, g, g, cfg.out_chans)
    assert np.abs(got - want).max() < 2e-4, np.abs(got - want).max()


def test_global_only_config():
    """window_size exercised off (all-global) — the unpadded path."""
    import dataclasses
    cfg = dataclasses.replace(vit_sam.tiny_config(), window_size=0,
                              global_attn_indexes=(0, 1))
    sd = make_state_dict(cfg, seed=3)
    params = vit_sam.convert_encoder(sd)
    x = np.random.default_rng(2).standard_normal(
        (1, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    got = np.asarray(vit_sam.encoder_apply(params, cfg, jnp.asarray(x)))
    want = torch_encoder(sd, t(x).permute(0, 3, 1, 2), cfg).numpy()
    assert np.abs(got - want).max() < 2e-4


def test_checkpoint_family_autodetect():
    """convert_sam_checkpoint routes ViT-family encoders (pos_embed and
    rel_pos tables survive untransposed) and SamPredictor picks the ViT
    config from the tree."""
    from omg_tpu.segment import sam_provider

    cfg = vit_sam.tiny_config()
    sd = {"image_encoder." + k: v for k, v in make_state_dict(cfg).items()}
    tree = sam_provider.convert_sam_checkpoint(sd)
    enc = tree["image_encoder"]
    g = cfg.image_size // cfg.patch_size
    assert enc["pos_embed"].shape == (1, g, g, cfg.dim)
    assert enc["blocks"][0]["attn"]["rel_pos_h"].shape == (
        2 * cfg.window_size - 1, cfg.dim // cfg.num_heads)
    # conv went OIHW -> HWIO; linears -> [in, out]
    assert enc["patch_embed"]["proj"]["weight"].shape == (
        cfg.patch_size, cfg.patch_size, 3, cfg.dim)
    assert enc["blocks"][0]["attn"]["qkv"]["weight"].shape == (
        cfg.dim, 3 * cfg.dim)
    pred = sam_provider.SamPredictor({"image_encoder": enc})
    assert isinstance(pred.cfg, vit_sam.VitSamConfig)


def test_init_params_apply():
    """Random init runs and matches converted-layout shapes."""
    cfg = vit_sam.tiny_config()
    params = vit_sam.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    out = vit_sam.encoder_apply(params, cfg, x)
    g = cfg.image_size // cfg.patch_size
    assert out.shape == (1, g, g, cfg.out_chans)
    assert bool(jnp.isfinite(out).all())


def test_config_from_params_derives_geometry():
    """Geometry is read off the tree — ViT-B/L-shaped checkpoints resolve
    their own global/window layout instead of inheriting ViT-H's."""
    import dataclasses
    for cfg in (vit_sam.tiny_config(),
                dataclasses.replace(vit_sam.tiny_config(), depth=3,
                                    global_attn_indexes=(0, 2),
                                    num_heads=4, mlp_ratio=2)):
        params = vit_sam.init_params(jax.random.PRNGKey(0), cfg)
        got = vit_sam.config_from_params(params)
        assert got == dataclasses.replace(cfg, dtype=got.dtype), cfg
    # the real zoo configs round-trip through their own init trees
    # (structure only; tiny dims would be too slow -- check H stays H)
    h = vit_sam.vit_h_config()
    assert h.global_attn_indexes == (7, 15, 23, 31)
    assert vit_sam.vit_l_config().global_attn_indexes == (5, 11, 17, 23)
    assert vit_sam.vit_b_config().global_attn_indexes == (2, 5, 8, 11)
