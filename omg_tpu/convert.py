"""Checkpoint conversion: torch/diffusers/transformers state dicts -> pytrees.

The reference loads HF fp16 checkpoints with diffusers/transformers
``from_pretrained`` (reference: inference_lora.py:153-155,163-171). Our
param trees were deliberately named after those state-dict layouts
(models/unet.py, models/vae.py, models/clip.py), so conversion is a
mechanical walk: split each dotted key, canonicalize the few
name differences, transpose torch layouts to TPU-native ones:

  * Linear   ``[out, in]``      -> ``[in, out]``
  * Conv2d   ``OIHW``           -> ``HWIO`` (NHWC data layout)
  * Embedding / norms           -> unchanged

No torch import is required for safetensors checkpoints; ``.bin``
(pickle) checkpoints fall back to ``torch.load`` on CPU.
"""

from __future__ import annotations

import re
from typing import Any, Iterable, Optional

import jax.numpy as jnp
import numpy as np

# Path substrings that mark a 2-D weight as a lookup table, not a Linear.
_EMBEDDING_TABLES = ("token_embedding", "position_embedding")


def load_state_dict(path: str) -> dict:
    """Load a checkpoint file -> {key: np.ndarray}. Supports .safetensors
    and torch .bin/.pt pickles."""
    if path.endswith(".safetensors"):
        from safetensors import numpy as stnp
        return dict(stnp.load_file(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return _flatten_sd(sd)


def _flatten_sd(sd: dict, prefix: str = "") -> dict:
    """Flatten nested sub-state-dicts into dotted keys: the IP-Adapter /
    InstantID ``.bin`` format is ``{"image_proj": {...}, "ip_adapter":
    {...}}`` (two nested OrderedDicts), not a flat dict."""
    out: dict = {}
    for k, v in sd.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten_sd(v, key + "."))
        else:
            out[key] = (v.float().numpy() if hasattr(v, "numpy")
                        else np.asarray(v))
    return out


def _canon_path(parts: list) -> list:
    """Canonicalize diffusers/transformers module paths to our tree keys."""
    out: list = []
    i = 0
    while i < len(parts):
        t = parts[i]
        # ff.net.0.proj -> ff.net_0_proj ; ff.net.2 -> ff.net_2
        if t == "ff" and i + 1 < len(parts) and parts[i + 1] == "net":
            idx = parts[i + 2]
            if idx == "0":
                out += ["ff", "net_0_proj"]
                i += 4 if parts[i + 3:i + 4] == ["proj"] else 3
            else:
                out += ["ff", f"net_{idx}"]
                i += 3
            continue
        # to_out.0 -> to_out (diffusers wraps out proj + dropout in a list)
        if t == "to_out" and i + 1 < len(parts) and parts[i + 1] == "0":
            out.append("to_out")
            i += 2
            continue
        out.append(int(t) if t.isdigit() else t)
        i += 1
    return out


def _transform(path: list, arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 4:                      # conv OIHW -> HWIO
        return arr.transpose(2, 3, 1, 0)
    if arr.ndim == 2 and path[-1] == "weight":
        if any(t in _EMBEDDING_TABLES for t in path if isinstance(t, str)):
            return arr                     # lookup table
        return arr.T                       # linear [out,in] -> [in,out]
    return arr


def _insert(tree: dict, path: list, value) -> None:
    node = tree
    for tok in path[:-1]:
        node = node.setdefault(tok, {})
    node[path[-1]] = value


def _listify(node):
    """Convert {0: a, 1: b, ...} int-keyed dicts to lists, recursively.

    Sparse indices (paramless torch Sequential members, e.g. the GELU at
    index 2 of the Resampler's FeedForward -> keys {0, 1, 3}) become
    None placeholders so positional indexing still matches the torch
    module order."""
    if isinstance(node, dict):
        if node and all(isinstance(k, int) for k in node):
            return [_listify(node[i]) if i in node else None
                    for i in range(max(node) + 1)]
        return {k: _listify(v) for k, v in node.items()}
    return node


def state_dict_to_tree(sd: dict, *, dtype: Any = jnp.bfloat16,
                       strip_prefix: Optional[str] = None,
                       skip: Iterable[str] = ()) -> dict:
    """Generic conversion of a flat state dict to our nested param tree."""
    tree: dict = {}
    skip_res = [re.compile(s) for s in skip]
    for key, val in sd.items():
        if strip_prefix:
            if not key.startswith(strip_prefix):
                continue
            key = key[len(strip_prefix):]
        if any(r.search(key) for r in skip_res):
            continue
        path = _canon_path(key.split("."))
        arr = np.asarray(val)
        if arr.dtype == np.float16 or arr.dtype == np.float64:
            arr = arr.astype(np.float32)
        arr = _transform(path, arr)
        _insert(tree, path, jnp.asarray(arr, dtype))
    return _listify(tree)


# --------------------------------------------------------------------------
# Per-model entry points
# --------------------------------------------------------------------------

_UNET_SKIP = (
    # diffusers bookkeeping buffers not used by the functional model
    r"position_net", r"\.alpha", r"num_batches_tracked",
)


def convert_unet(sd_or_path, *, dtype: Any = jnp.bfloat16) -> dict:
    """diffusers UNet2DConditionModel state dict -> models/unet.py tree."""
    sd = load_state_dict(sd_or_path) if isinstance(sd_or_path, str) else sd_or_path
    return state_dict_to_tree(sd, dtype=dtype, skip=_UNET_SKIP)


def convert_vae(sd_or_path, *, dtype: Any = jnp.float32) -> dict:
    """diffusers AutoencoderKL state dict -> models/vae.py tree.

    fp32 by default: the reference upcasts the VAE before decode
    (reference: src/pipelines/lora_pipeline.py:641-646).
    """
    sd = load_state_dict(sd_or_path) if isinstance(sd_or_path, str) else sd_or_path
    return state_dict_to_tree(sd, dtype=dtype)


def convert_clip(sd_or_path, *, dtype: Any = jnp.bfloat16) -> dict:
    """transformers CLIPTextModel(WithProjection) -> models/clip.py tree."""
    sd = load_state_dict(sd_or_path) if isinstance(sd_or_path, str) else sd_or_path
    return state_dict_to_tree(
        sd, dtype=dtype,
        skip=(r"position_ids", r"logit_scale", r"embeddings\.class_embedding"))


def convert_clip_vision(sd_or_path, *, dtype: Any = jnp.float32) -> dict:
    """transformers CLIPVisionModelWithProjection -> models/clip_vision.py
    tree (the open-vocab detector's image tower). class_embedding is a
    real parameter here (unlike the text towers, which skip it)."""
    sd = load_state_dict(sd_or_path) if isinstance(sd_or_path, str) else sd_or_path
    return state_dict_to_tree(
        sd, dtype=dtype, skip=(r"position_ids", r"logit_scale"))


def convert_controlnet(sd_or_path, *, dtype: Any = jnp.bfloat16) -> dict:
    """diffusers ControlNetModel state dict -> models/controlnet.py tree."""
    sd = load_state_dict(sd_or_path) if isinstance(sd_or_path, str) else sd_or_path
    return state_dict_to_tree(sd, dtype=dtype, skip=_UNET_SKIP)


def convert_dpt(sd_or_path, cfg=None, *, dtype: Any = jnp.float32) -> dict:
    """transformers DPTForDepthEstimation (plain-ViT backbone) state dict
    -> models/dpt.py tree. ConvTranspose resize weights (torch IOHW) are
    stored [kH, kW, in, out] for the einsum depth-to-space formulation."""
    sd = load_state_dict(sd_or_path) if isinstance(sd_or_path, str) else sd_or_path
    from omg_tpu.models import dpt as dpt_lib
    if cfg is None:
        cfg = dpt_lib.DPTConfig()

    def f32(v):
        a = np.asarray(v)
        return a.astype(np.float32) if a.dtype in (np.float16, np.float64) \
            else a

    def lin(prefix):
        p = {"weight": jnp.asarray(f32(sd[prefix + ".weight"]).T, dtype)}
        if prefix + ".bias" in sd:
            p["bias"] = jnp.asarray(f32(sd[prefix + ".bias"]), dtype)
        return p

    def conv(prefix, bias=True):
        p = {"weight": jnp.asarray(
            f32(sd[prefix + ".weight"]).transpose(2, 3, 1, 0), dtype)}
        if bias and prefix + ".bias" in sd:
            p["bias"] = jnp.asarray(f32(sd[prefix + ".bias"]), dtype)
        return p

    def norm(prefix):
        return {"weight": jnp.asarray(f32(sd[prefix + ".weight"]), dtype),
                "bias": jnp.asarray(f32(sd[prefix + ".bias"]), dtype)}

    enc = []
    for i in range(cfg.num_hidden_layers):
        b = f"dpt.encoder.layer.{i}"
        enc.append({
            "layernorm_before": norm(f"{b}.layernorm_before"),
            "attention": {
                "query": lin(f"{b}.attention.attention.query"),
                "key": lin(f"{b}.attention.attention.key"),
                "value": lin(f"{b}.attention.attention.value"),
                "output": lin(f"{b}.attention.output.dense"),
            },
            "layernorm_after": norm(f"{b}.layernorm_after"),
            "intermediate": lin(f"{b}.intermediate.dense"),
            "output": lin(f"{b}.output.dense"),
        })

    reassemble = []
    for i, factor in enumerate(cfg.reassemble_factors):
        entry = {
            "readout": lin(f"neck.reassemble_stage.readout_projects.{i}.0"),
            "projection": conv(f"neck.reassemble_stage.layers.{i}.projection"),
        }
        rz = f"neck.reassemble_stage.layers.{i}.resize"
        if factor > 1:
            # torch ConvTranspose2d weight [in, out, kH, kW] -> [kH,kW,in,out]
            entry["resize_up"] = {
                "weight": jnp.asarray(
                    f32(sd[rz + ".weight"]).transpose(2, 3, 0, 1), dtype),
                "bias": jnp.asarray(f32(sd[rz + ".bias"]), dtype),
            }
        elif factor < 1:
            entry["resize_down"] = conv(rz)
        reassemble.append(entry)

    fusion = []
    for i in range(len(cfg.neck_hidden_sizes)):
        b = f"neck.fusion_stage.layers.{i}"
        fusion.append({
            "projection": conv(f"{b}.projection"),
            "residual_layer1": {
                "convolution1": conv(f"{b}.residual_layer1.convolution1"),
                "convolution2": conv(f"{b}.residual_layer1.convolution2"),
            },
            "residual_layer2": {
                "convolution1": conv(f"{b}.residual_layer2.convolution1"),
                "convolution2": conv(f"{b}.residual_layer2.convolution2"),
            },
        })

    return {
        "embeddings": {
            "cls_token": jnp.asarray(
                f32(sd["dpt.embeddings.cls_token"]), dtype),
            "position_embeddings": jnp.asarray(
                f32(sd["dpt.embeddings.position_embeddings"]), dtype),
            "projection": conv("dpt.embeddings.patch_embeddings.projection"),
        },
        "encoder": enc,
        "neck": {
            "reassemble": reassemble,
            "convs": [conv(f"neck.convs.{i}", bias=False)
                      for i in range(len(cfg.neck_hidden_sizes))],
            "fusion": fusion,
        },
        "head": {
            "conv1": conv("head.head.0"),
            "conv2": conv("head.head.2"),
            "conv3": conv("head.head.4"),
        },
    }


def convert_ip_adapter(sd_or_path, *, dtype: Any = jnp.bfloat16) -> dict:
    """InstantID / IP-Adapter ``.bin`` -> {"image_proj": resampler tree,
    "ip_adapter": [ {to_k_ip, to_v_ip} ] in attn2 traversal order}.

    The torch checkpoint splits into 'image_proj' (Resampler) and
    'ip_adapter' ({layer_idx}.to_k_ip.weight ...) halves (reference:
    src/pipelines/instantid_single_pieline.py:179-213).
    """
    sd = (load_state_dict(sd_or_path) if isinstance(sd_or_path, str)
          else _flatten_sd(sd_or_path))
    image_proj_sd = {k.split("image_proj.", 1)[1]: v for k, v in sd.items()
                     if k.startswith("image_proj.")}
    ip_sd = {k.split("ip_adapter.", 1)[1]: v for k, v in sd.items()
             if k.startswith("ip_adapter.")}
    image_proj = state_dict_to_tree(image_proj_sd, dtype=dtype)

    by_layer: dict = {}
    for key, val in ip_sd.items():
        parts = key.split(".")
        idx = int(parts[0])
        name = parts[1]
        arr = np.asarray(val)
        if arr.dtype in (np.float16, np.float64):
            arr = arr.astype(np.float32)
        by_layer.setdefault(idx, {})[name] = {
            "weight": jnp.asarray(arr.T, dtype)}
    # torch enumerates attn processors in module order with keys 1,3,5...
    # (every other processor is cross-attn); renumber densely.
    layers = [by_layer[i] for i in sorted(by_layer)]
    return {"image_proj": image_proj, "ip_adapter": layers}


def infer_resampler_cfg(sd_or_path, *, dim_head: Optional[int] = None,
                        dtype: Any = jnp.bfloat16):
    """Resampler geometry from an IP-Adapter checkpoint's own shapes —
    the same infer-from-keys policy as the UNet/VAE/CLIP/EViT loaders,
    so non-SDXL adapters load without a hand-written preset. The one
    non-inferable hyperparameter is the attention head size (the
    checkpoint stores only heads*dim_head fused): the published
    IP-Adapter/InstantID resamplers use dim_head=64 (reference:
    src/ip_adapter/resampler.py:77), so 64 is used whenever the fused
    width divides by it, with a 4-head fallback for small custom
    adapters — pass ``dim_head`` explicitly for adapters whose true
    split differs (the head grouping changes the softmax, so a wrong
    split is silently wrong, not just a shape error)."""
    from omg_tpu import config as cfglib
    if isinstance(sd_or_path, str):
        sd = load_state_dict(sd_or_path)
    else:
        sd = sd_or_path
        if "state_dict" in sd and isinstance(sd["state_dict"], dict):
            sd = sd["state_dict"]
        sd = _flatten_sd(sd)
    try:
        latents = np.asarray(sd["image_proj.latents"])
        proj_in = np.asarray(sd["image_proj.proj_in.weight"])
        proj_out = np.asarray(sd["image_proj.proj_out.weight"])
        inner = np.asarray(sd["image_proj.layers.0.0.to_q.weight"]).shape[0]
        ff_hidden = np.asarray(sd["image_proj.layers.0.1.1.weight"]).shape[0]
    except KeyError as e:
        raise ValueError(
            f"not an IP-Adapter resampler checkpoint (missing {e})") from e
    depth = 1 + max(int(k.split(".")[2]) for k in sd
                    if k.startswith("image_proj.layers."))
    dim = latents.shape[2]
    if dim_head is None:
        dim_head = 64 if inner % 64 == 0 else max(inner // 4, 1)
    if inner % dim_head != 0:
        raise ValueError(
            f"cannot factor the adapter's fused attention width {inner} "
            f"into heads x dim_head={dim_head}; pass dim_head= explicitly")
    return cfglib.ResamplerConfig(
        dim=dim, depth=depth, dim_head=dim_head, heads=inner // dim_head,
        num_queries=latents.shape[1], embedding_dim=proj_in.shape[1],
        output_dim=proj_out.shape[0], ff_mult=ff_hidden // dim,
        dtype=dtype)
