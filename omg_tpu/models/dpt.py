"""DPT (Dense Prediction Transformer) monocular depth — the "Depth"
condition preprocessor.

The reference's gradio app computes its depth condition with
``transformers.DPTForDepthEstimation`` on the ``dpt-hybrid-midas``
checkpoint (reference: gradio_demo/app.py:17,315-316,340-357). Here DPT
runs natively: a ViT backbone (plain-ViT variant, i.e. Intel/dpt-large
-class checkpoints) feeding the reassemble/fusion neck and the depth
head, all NHWC JAX. The param tree mirrors the transformers state-dict
key-for-key (convert.convert_dpt), and the forward is parity-tested
against DPTForDepthEstimation at a tiny random config.

Resize conventions are torch-exact (the fusion/head 2x upsample is
bilinear align_corners=True — segment.evit_ops.bilinear_resize_ac).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omg_tpu.nn import layers
from omg_tpu.nn.attention import sdpa
from omg_tpu.segment.evit_ops import bicubic_resize, bilinear_resize_ac

Array = jax.Array
Params = dict


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 384
    patch_size: int = 16
    neck_hidden_sizes: Tuple[int, ...] = (256, 512, 1024, 1024)
    fusion_hidden_size: int = 256
    backbone_out_indices: Tuple[int, ...] = (5, 11, 17, 23)
    reassemble_factors: Tuple[float, ...] = (4.0, 2.0, 1.0, 0.5)
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def tiny_config() -> DPTConfig:
    return DPTConfig(hidden_size=32, num_hidden_layers=4,
                     num_attention_heads=2, intermediate_size=64,
                     image_size=64, patch_size=16,
                     neck_hidden_sizes=(16, 16, 32, 32),
                     fusion_hidden_size=16,
                     backbone_out_indices=(0, 1, 2, 3))


# --------------------------------------------------------------------------
# Init (tree mirrors the transformers DPTForDepthEstimation state dict)
# --------------------------------------------------------------------------

def _init_vit_layer(key: Array, cfg: DPTConfig) -> Params:
    d, ff = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 6)
    dt = cfg.dtype
    return {
        "layernorm_before": layers.init_norm(d, dt),
        "attention": {
            "query": layers.init_linear(ks[0], d, d, dtype=dt),
            "key": layers.init_linear(ks[1], d, d, dtype=dt),
            "value": layers.init_linear(ks[2], d, d, dtype=dt),
            "output": layers.init_linear(ks[3], d, d, dtype=dt),
        },
        "layernorm_after": layers.init_norm(d, dt),
        "intermediate": layers.init_linear(ks[4], d, ff, dtype=dt),
        "output": layers.init_linear(ks[5], ff, d, dtype=dt),
    }


def init_params(key: Array, cfg: DPTConfig) -> Params:
    d = cfg.hidden_size
    f = cfg.fusion_hidden_size
    dt = cfg.dtype
    n_patch = (cfg.image_size // cfg.patch_size) ** 2
    ks = iter(jax.random.split(key, 64 + cfg.num_hidden_layers))

    reassemble = []
    for i, (nh, factor) in enumerate(zip(cfg.neck_hidden_sizes,
                                         cfg.reassemble_factors)):
        entry = {
            "readout": layers.init_linear(next(ks), 2 * d, d, dtype=dt),
            "projection": layers.init_conv2d(next(ks), d, nh, 1, dtype=dt),
        }
        if factor > 1:
            k = int(factor)
            entry["resize_up"] = layers.init_conv2d(next(ks), nh, nh, k,
                                                    dtype=dt)
        elif factor < 1:
            entry["resize_down"] = layers.init_conv2d(next(ks), nh, nh, 3,
                                                      dtype=dt)
        reassemble.append(entry)

    def preact_res():
        return {
            "convolution1": layers.init_conv2d(next(ks), f, f, 3, dtype=dt),
            "convolution2": layers.init_conv2d(next(ks), f, f, 3, dtype=dt),
        }

    fusion = [{
        "projection": layers.init_conv2d(next(ks), f, f, 1, dtype=dt),
        "residual_layer1": preact_res(),
        "residual_layer2": preact_res(),
    } for _ in cfg.neck_hidden_sizes]

    return {
        "embeddings": {
            "cls_token": jnp.zeros((1, 1, d), dt),
            "position_embeddings": (
                jax.random.normal(next(ks), (1, n_patch + 1, d),
                                  jnp.float32) * 0.02).astype(dt),
            "projection": layers.init_conv2d(
                next(ks), 3, d, cfg.patch_size, dtype=dt),
        },
        "encoder": [_init_vit_layer(next(ks), cfg)
                    for _ in range(cfg.num_hidden_layers)],
        "neck": {
            "reassemble": reassemble,
            "convs": [layers.init_conv2d(next(ks), nh, f, 3, bias=False,
                                         dtype=dt)
                      for nh in cfg.neck_hidden_sizes],
            "fusion": fusion,
        },
        "head": {
            "conv1": layers.init_conv2d(next(ks), f, f // 2, 3, dtype=dt),
            "conv2": layers.init_conv2d(next(ks), f // 2, 32, 3, dtype=dt),
            "conv3": layers.init_conv2d(next(ks), 32, 1, 1, dtype=dt),
        },
    }


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _vit_layer(p: Params, x: Array, cfg: DPTConfig) -> Array:
    heads = cfg.num_attention_heads
    h = layers.layer_norm(p["layernorm_before"], x, eps=cfg.layer_norm_eps)
    a = p["attention"]
    b, n, d = h.shape

    def split(t):
        return t.reshape(b, n, heads, -1).transpose(0, 2, 1, 3)

    q = split(layers.linear(a["query"], h))
    k = split(layers.linear(a["key"], h))
    v = split(layers.linear(a["value"], h))
    o = sdpa(q, k, v).transpose(0, 2, 1, 3).reshape(b, n, d)
    x = x + layers.linear(a["output"], o)
    h = layers.layer_norm(p["layernorm_after"], x, eps=cfg.layer_norm_eps)
    h = layers.gelu(layers.linear(p["intermediate"], h))
    return x + layers.linear(p["output"], h)


def _embed(p: Params, cfg: DPTConfig, pixel_values: Array) -> tuple:
    """pixel_values: [B, H, W, 3] -> (tokens [B, 1+N, D], grid (gh, gw))."""
    e = p["embeddings"]
    x = layers.conv2d(e["projection"], pixel_values,
                      stride=cfg.patch_size, padding=0)
    b, gh, gw, d = x.shape
    tokens = x.reshape(b, gh * gw, d)

    pos = e["position_embeddings"].astype(jnp.float32)
    n_old = pos.shape[1] - 1
    g_old = int(round(float(np.sqrt(n_old))))
    if (gh, gw) != (g_old, g_old):
        # resize the patch grid of position embeddings (transformers
        # DPTViTEmbeddings._resize_pos_embed, bilinear)
        grid = pos[:, 1:].reshape(1, g_old, g_old, d)
        from omg_tpu.segment.evit_ops import bilinear_resize
        grid = bilinear_resize(grid, (gh, gw)).reshape(1, gh * gw, d)
        pos = jnp.concatenate([pos[:, :1], grid], axis=1)

    cls = jnp.broadcast_to(e["cls_token"], (b, 1, d)).astype(tokens.dtype)
    tokens = jnp.concatenate([cls, tokens], axis=1)
    return tokens + pos.astype(tokens.dtype), (gh, gw)


def _reassemble(p: Params, cfg: DPTConfig, idx: int, hidden: Array,
                grid: tuple) -> Array:
    """One backbone feature [B, 1+N, D] -> spatial [B, h', w', neck_ch]."""
    gh, gw = grid
    cls_tok, tokens = hidden[:, 0], hidden[:, 1:]
    b, n, d = tokens.shape
    # readout_type="project": concat cls to every token, linear+GELU
    readout = jnp.broadcast_to(cls_tok[:, None], tokens.shape)
    tokens = layers.gelu(layers.linear(
        p["readout"], jnp.concatenate([tokens, readout], axis=-1)))
    x = tokens.reshape(b, gh, gw, d)
    x = layers.conv2d(p["projection"], x, padding=0)
    factor = cfg.reassemble_factors[idx]
    if factor > 1:
        # ConvTranspose kxk stride k: every output pixel takes exactly one
        # kernel tap, so it's an einsum + depth-to-space (exact torch
        # semantics, MXU-friendly). Weight stored [kH, kW, in, out].
        k = int(factor)
        w = p["resize_up"]["weight"].astype(x.dtype)
        b, h, ww_, c = x.shape
        x = jnp.einsum("bhwi,pqio->bhpwqo", x, w).reshape(
            b, h * k, ww_ * k, w.shape[-1])
        x = x + p["resize_up"]["bias"].astype(x.dtype)
    elif factor < 1:
        x = layers.conv2d(p["resize_down"], x, stride=2, padding=1)
    return x


def _preact_res(p: Params, x: Array) -> Array:
    h = jax.nn.relu(x)
    h = layers.conv2d(p["convolution1"], h)
    h = jax.nn.relu(h)
    h = layers.conv2d(p["convolution2"], h)
    return x + h


def _fusion(p_list: list, feats: list) -> Array:
    """DPTFeatureFusionStage: deepest-first, +residual, 2x upsample."""
    fused = None
    for p, feat in zip(p_list, feats[::-1]):
        if fused is None:
            fused = feat
        else:
            if feat.shape[1:3] != fused.shape[1:3]:
                # odd grids: align the incoming feature to the fused map
                # (transformers DPTFeatureFusionLayer, bilinear)
                from omg_tpu.segment.evit_ops import bilinear_resize
                feat = bilinear_resize(feat, fused.shape[1:3])
            fused = fused + _preact_res(p["residual_layer1"], feat)
        fused = _preact_res(p["residual_layer2"], fused)
        fused = bilinear_resize_ac(
            fused, (fused.shape[1] * 2, fused.shape[2] * 2))
        fused = layers.conv2d(p["projection"], fused, padding=0)
    return fused


def apply(p: Params, cfg: DPTConfig, pixel_values: Array) -> Array:
    """pixel_values [B, H, W, 3] (normalized) -> inverse depth [B, H, W]."""
    tokens, grid = _embed(p, cfg, pixel_values)
    feats = []
    want = set(cfg.backbone_out_indices)
    x = tokens
    for i, lp in enumerate(p["encoder"]):
        x = _vit_layer(lp, x, cfg)
        if i in want:
            feats.append(x)
    feats = [_reassemble(rp, cfg, i, f, grid)
             for i, (rp, f) in enumerate(zip(p["neck"]["reassemble"], feats))]
    feats = [layers.conv2d(cp, f)
             for cp, f in zip(p["neck"]["convs"], feats)]
    fused = _fusion(p["neck"]["fusion"], feats)

    h = layers.conv2d(p["head"]["conv1"], fused)
    h = bilinear_resize_ac(h, (h.shape[1] * 2, h.shape[2] * 2))
    h = jax.nn.relu(layers.conv2d(p["head"]["conv2"], h))
    h = jax.nn.relu(layers.conv2d(p["head"]["conv3"], h, padding=0))
    return h[..., 0]


# --------------------------------------------------------------------------
# Depth-condition provider (reference: app.py get_depth, :340-357)
# --------------------------------------------------------------------------

# DPT image-processor constants (DPTFeatureExtractor defaults).
IMAGE_MEAN = (0.5, 0.5, 0.5)
IMAGE_STD = (0.5, 0.5, 0.5)


class DepthEstimator:
    """Photo -> 3-channel min-max-normalized inverse-depth condition."""

    def __init__(self, params: Params, cfg: DPTConfig):
        self.params = params
        self.cfg = cfg
        self._apply = jax.jit(apply, static_argnums=1)

    def __call__(self, image: np.ndarray,
                 out_size: Tuple[int, int] = (1024, 1024)) -> np.ndarray:
        """image: [H, W, 3] uint8 RGB -> [out_h, out_w, 3] uint8."""
        import PIL.Image
        s = self.cfg.image_size
        resized = np.asarray(PIL.Image.fromarray(image).resize(
            (s, s), PIL.Image.BICUBIC), np.float32) / 255.0
        x = (resized - np.asarray(IMAGE_MEAN)) / np.asarray(IMAGE_STD)
        depth = self._apply(self.params, self.cfg,
                            jnp.asarray(x[None], self.cfg.dtype))
        # interpolate to target, min-max normalize, 3-channel
        # (reference: app.py:345-356, bicubic align_corners=False)
        d = bicubic_resize(depth[..., None].astype(jnp.float32), out_size)
        d = np.asarray(d[0, ..., 0])
        dmin, dmax = d.min(), d.max()
        d = (d - dmin) / max(dmax - dmin, 1e-8)
        return np.clip(np.stack([d] * 3, -1) * 255.0, 0, 255).astype(np.uint8)


def load_depth_model(path: str) -> DepthEstimator:
    """Load a transformers DPT checkpoint directory into a provider."""
    from omg_tpu import convert
    from omg_tpu.loader import _load_folder_sd, _read_json
    sd = _load_folder_sd(path)
    hf_cfg = _read_json(path)
    cfg = DPTConfig(
        hidden_size=hf_cfg.get("hidden_size", 1024),
        num_hidden_layers=hf_cfg.get("num_hidden_layers", 24),
        num_attention_heads=hf_cfg.get("num_attention_heads", 16),
        intermediate_size=hf_cfg.get("intermediate_size", 4096),
        image_size=hf_cfg.get("image_size", 384),
        patch_size=hf_cfg.get("patch_size", 16),
        neck_hidden_sizes=tuple(hf_cfg.get(
            "neck_hidden_sizes", (256, 512, 1024, 1024))),
        fusion_hidden_size=hf_cfg.get("fusion_hidden_size", 256),
        backbone_out_indices=tuple(hf_cfg.get(
            "backbone_out_indices", (5, 11, 17, 23))),
    )
    return DepthEstimator(convert.convert_dpt(sd, cfg), cfg)
