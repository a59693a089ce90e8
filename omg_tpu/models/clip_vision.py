"""CLIP ViT image encoder (transformers CLIPVisionModelWithProjection).

The open-vocabulary half of the detector: the reference delegates
open-vocab detection to external pip packages (YOLO-World via
`inference`, GroundingDINO — reference: inference_lora.py:10-27,91-126).
This framework's TPU-native equivalent ranks SAM mask proposals by
CLIP image-text similarity (segment/detector.py), which needs the image
tower that the text encoders in models/clip.py pair with.

Param tree mirrors the HF state_dict (vision_model.embeddings.*,
vision_model.encoder.layers.N.*, vision_model.pre_layrnorm [sic — HF's
own key name], vision_model.post_layernorm, visual_projection) so
convert.convert_clip_vision is the generic state-dict walk. Reuses the
text encoder's transformer layer (models/clip.py:_encoder_layer) — the
towers share the block, differing only in embeddings and pooling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from omg_tpu.config import CLIPVisionConfig
from omg_tpu.models.clip import _encoder_layer
from omg_tpu.nn import layers

Array = jax.Array
Params = dict


class CLIPVisionOutput(NamedTuple):
    last_hidden_state: Array   # [B, 1+P, H]
    pooled: Array              # [B, H] post_layernorm(CLS)
    projected: Array           # [B, proj] visual_projection(pooled)


def init_params(key: Array, cfg: CLIPVisionConfig) -> Params:
    ks = iter(jax.random.split(key, 8 + cfg.num_layers * 8))
    d, dtype = cfg.hidden_size, cfg.dtype
    n_patches = (cfg.image_size // cfg.patch_size) ** 2

    def lin(i, o, bias=True):
        return layers.init_linear(next(ks), i, o, bias=bias, dtype=dtype)

    enc_layers = []
    for _ in range(cfg.num_layers):
        enc_layers.append({
            "layer_norm1": layers.init_norm(d, dtype),
            "self_attn": {
                "q_proj": lin(d, d), "k_proj": lin(d, d),
                "v_proj": lin(d, d), "out_proj": lin(d, d),
            },
            "layer_norm2": layers.init_norm(d, dtype),
            "mlp": {"fc1": lin(d, cfg.intermediate_size),
                    "fc2": lin(cfg.intermediate_size, d)},
        })

    return {
        "vision_model": {
            "embeddings": {
                "class_embedding": jax.random.normal(next(ks), (d,), dtype) * 0.02,
                "patch_embedding": {
                    "weight": jax.random.normal(
                        next(ks), (cfg.patch_size, cfg.patch_size, 3, d),
                        dtype) * 0.02,
                },
                "position_embedding": layers.init_embedding(
                    next(ks), n_patches + 1, d, dtype),
            },
            "pre_layrnorm": layers.init_norm(d, dtype),
            "encoder": {"layers": enc_layers},
            "post_layernorm": layers.init_norm(d, dtype),
        },
        "visual_projection": lin(d, cfg.projection_dim, bias=False),
    }


def apply(p: Params, cfg: CLIPVisionConfig, pixels: Array) -> CLIPVisionOutput:
    """pixels: [B, S, S, 3] NHWC, CLIP-normalized. -> CLIPVisionOutput."""
    vm = p["vision_model"]
    emb = vm["embeddings"]
    x = jax.lax.conv_general_dilated(
        pixels.astype(cfg.dtype), emb["patch_embedding"]["weight"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, gh, gw, d = x.shape
    x = x.reshape(b, gh * gw, d)
    cls = jnp.broadcast_to(emb["class_embedding"], (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    pos = emb["position_embedding"]["weight"]
    if pos.shape[0] != x.shape[1]:
        # a prefix slice would silently apply scrambled 2D positions;
        # callers must resize inputs to cfg.image_size (preprocess does)
        raise ValueError(
            f"input grid {gh}x{gw} does not match the position table "
            f"({pos.shape[0] - 1} patches); resize to cfg.image_size")
    x = x + pos[None]

    x = layers.layer_norm(vm["pre_layrnorm"], x)
    for lp in vm["encoder"]["layers"]:
        x = _encoder_layer(lp, x, None, cfg.num_heads, cfg.hidden_act)

    pooled = layers.layer_norm(vm["post_layernorm"], x[:, 0])
    projected = layers.linear(p["visual_projection"], pooled)
    return CLIPVisionOutput(x, pooled, projected)


# CLIP pixel normalization (openai preprocessing).
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess(images_uint8, size: int):
    """[B, H, W, 3] uint8 -> [B, size, size, 3] CLIP-normalized fp32.

    Bilinear resize (host numpy path goes through PIL in the detector for
    torch-exact crops; this device path serves batched jitted scoring).
    """
    x = jnp.asarray(images_uint8, jnp.float32) / 255.0
    if x.shape[1] != size or x.shape[2] != size:
        x = jax.image.resize(x, (x.shape[0], size, size, 3), "bilinear")
    return (x - jnp.asarray(IMAGE_MEAN, jnp.float32)) \
        / jnp.asarray(IMAGE_STD, jnp.float32)
