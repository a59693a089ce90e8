"""CLIP text encoders (SDXL's text_encoder + text_encoder_2).

Functional port of the transformers CLIPTextModel /
CLIPTextModelWithProjection used by the reference (reference:
src/pipelines/lora_pipeline.py:163-171 via diffusers encode_prompt).
Param tree mirrors the HF state_dict layout so torch->JAX conversion is a
transpose-only mapping.

SDXL consumes:
  * hidden_states[-2] (penultimate layer, pre-final-norm) from both
    encoders, concatenated 768+1280=2048 as cross-attention context;
  * the projected pooled output of encoder 2 (1280) as the "text" half of
    the micro-conditioning vector.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from omg_tpu.config import CLIPTextConfig
from omg_tpu.nn import layers
from omg_tpu.nn.attention import sdpa

Array = jax.Array
Params = dict


class CLIPTextOutput(NamedTuple):
    last_hidden_state: Array    # [B, 77, H] (final_layer_norm applied)
    penultimate: Array          # [B, 77, H] hidden_states[-2]
    pooled: Array               # [B, H] EOS-token pooled (pre-projection)
    projected: Optional[Array]  # [B, P] text_projection(pooled) or None


def init_params(key: Array, cfg: CLIPTextConfig) -> Params:
    ks = iter(jax.random.split(key, 8 + cfg.num_layers * 8))
    d, dtype = cfg.hidden_size, cfg.dtype

    def lin(in_d, out_d, bias=True):
        return layers.init_linear(next(ks), in_d, out_d, bias=bias, dtype=dtype)

    clip_layers = []
    for _ in range(cfg.num_layers):
        clip_layers.append({
            "layer_norm1": layers.init_norm(d, dtype),
            "self_attn": {
                "q_proj": lin(d, d), "k_proj": lin(d, d),
                "v_proj": lin(d, d), "out_proj": lin(d, d),
            },
            "layer_norm2": layers.init_norm(d, dtype),
            "mlp": {"fc1": lin(d, cfg.intermediate_size),
                    "fc2": lin(cfg.intermediate_size, d)},
        })

    p: Params = {
        "text_model": {
            "embeddings": {
                "token_embedding": layers.init_embedding(next(ks), cfg.vocab_size, d, dtype),
                "position_embedding": layers.init_embedding(
                    next(ks), cfg.max_position_embeddings, d, dtype),
            },
            "encoder": {"layers": clip_layers},
            "final_layer_norm": layers.init_norm(d, dtype),
        }
    }
    if cfg.projection_dim:
        p["text_projection"] = lin(d, cfg.projection_dim, bias=False)
    return p


def _sub(tree, key):
    if tree is None:
        return None
    if isinstance(key, int):
        if isinstance(tree, (list, tuple)):
            return tree[key] if key < len(tree) else None
        return tree.get(key) if isinstance(tree, dict) else None
    return tree.get(key) if isinstance(tree, dict) else None


def _encoder_layer(p: Params, x: Array, mask: Array, num_heads: int,
                   act: str, lora=None) -> Array:
    h = layers.layer_norm(p["layer_norm1"], x)
    a = p["self_attn"]
    alora = _sub(lora, "self_attn")
    q = layers.linear(a["q_proj"], h, _sub(alora, "q_proj"))
    k = layers.linear(a["k_proj"], h, _sub(alora, "k_proj"))
    v = layers.linear(a["v_proj"], h, _sub(alora, "v_proj"))
    b, n, d = q.shape
    hd = d // num_heads

    def split(t):
        return t.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)

    out = sdpa(split(q), split(k), split(v), mask=mask)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    x = x + layers.linear(a["out_proj"], out, _sub(alora, "out_proj"))

    h = layers.layer_norm(p["layer_norm2"], x)
    mlora = _sub(lora, "mlp")
    h = layers.linear(p["mlp"]["fc1"], h, _sub(mlora, "fc1"))
    h = layers.quick_gelu(h) if act == "quick_gelu" else layers.gelu(h)
    h = layers.linear(p["mlp"]["fc2"], h, _sub(mlora, "fc2"))
    return x + h


def apply(p: Params, cfg: CLIPTextConfig, input_ids: Array,
          lora=None) -> CLIPTextOutput:
    """input_ids: [B, 77] int32 (BOS ... EOS pad-with-EOS, CLIP style).

    ``lora``: optional delta pytree mirroring the param tree (character
    LoRAs ship text-encoder deltas; the reference activates them for the
    region-prompt encodings via PEFT set_adapters)."""
    tm = p["text_model"]
    emb = tm["embeddings"]
    x = jnp.take(emb["token_embedding"]["weight"], input_ids, axis=0)
    x = x + emb["position_embedding"]["weight"][None, : x.shape[1]]

    n = x.shape[1]
    causal = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)[None, None]

    llora = None
    if lora is not None:
        llora = lora.get("text_model", lora)
        llora = llora.get("encoder", llora)
        llora = llora.get("layers", llora)

    penultimate = x
    for i, lp in enumerate(tm["encoder"]["layers"]):
        if i == cfg.num_layers - 1:
            penultimate = x
        x = _encoder_layer(lp, x, causal, cfg.num_heads, cfg.hidden_act,
                           _sub(llora, i))

    last = layers.layer_norm(tm["final_layer_norm"], x)

    # EOS pooling: CLIP's endoftext token is the max id in the vocab, so
    # argmax over ids finds the first EOS (transformers does the same).
    eos_idx = jnp.argmax(input_ids, axis=-1)
    pooled = jnp.take_along_axis(last, eos_idx[:, None, None], axis=1)[:, 0]

    projected = None
    if "text_projection" in p:
        projected = layers.linear(p["text_projection"], pooled)
    return CLIPTextOutput(last, penultimate, pooled, projected)
