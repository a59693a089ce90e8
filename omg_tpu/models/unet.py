"""SDXL UNet2DConditionModel, functional JAX.

Re-design of the model the reference drives through diffusers
(reference: src/pipelines/lora_pipeline.py:546-566 calls
``self.unet(latent_model_input, t, encoder_hidden_states, ...)``).
The param tree mirrors the diffusers state_dict layout key-for-key so
torch->JAX conversion (omg_tpu.convert) is a mechanical rename+transpose.

OMG's three runtime behaviours are explicit arguments instead of the
reference's attention-processor monkey-patching:
  * ``control``  — prompt-to-prompt probability transform
    (reference: src/prompt_attention/p2p_attention.py:124-147 installed by
    src/pipelines/lora_pipeline.py:136-152)
  * ``lora``     — low-rank deltas mirroring the param tree (reference:
    PEFT injection via load_lora_weights, inference_lora.py:162-170)
  * ``ip_adapter``/``ip_context`` — decoupled image-prompt cross-attention
    (reference: src/ip_adapter/attention_processor.py:296-424)
  * ``down_block_residuals``/``mid_block_residual`` — ControlNet injection
    (reference: src/pipelines/lora_pipeline.py:519-529,560-563)

Data layout is NHWC (TPU-native); conversion handles NCHW->NHWC.
"""

from __future__ import annotations

from typing import Any, Optional, Protocol, Sequence

import jax
import jax.numpy as jnp

from omg_tpu.config import UNetConfig
from omg_tpu.nn import layers
from omg_tpu.nn.attention import init_mha, mha

Array = jax.Array
Params = dict


class AttnControl(Protocol):
    """Prompt-to-prompt controller in the O(N²)-free lane form
    (control/p2p.py P2PStepControl): static layer gating via ``wants``,
    self-attn lane substitution, cross-attn output rewrite."""

    def wants(self, *, is_cross: bool, num_queries: int) -> bool:
        """Static (trace-time) decision: engage control on this layer?"""
        ...

    def self_lane_qk(self, q: Array, k: Array) -> tuple:
        ...

    def cross_lane_out(self, out: Array, q: Array, k: Array, v: Array,
                       sdpa_fn) -> Array:
        ...


def _sub(tree: Optional[dict], key) -> Optional[dict]:
    """None-propagating pytree descent for parallel trees (lora)."""
    if tree is None:
        return None
    if isinstance(key, int):
        return tree[key] if isinstance(tree, (list, tuple)) and key < len(tree) else (
            tree.get(key) if isinstance(tree, dict) else None)
    return tree.get(key) if isinstance(tree, dict) else None


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------

def _init_resnet(key: Array, in_ch: int, out_ch: int, temb_ch: int,
                 groups: int, dtype: Any) -> Params:
    ks = jax.random.split(key, 4)
    p = {
        "norm1": layers.init_norm(in_ch, dtype),
        "conv1": layers.init_conv2d(ks[0], in_ch, out_ch, 3, dtype=dtype),
        "time_emb_proj": layers.init_linear(ks[1], temb_ch, out_ch, dtype=dtype),
        "norm2": layers.init_norm(out_ch, dtype),
        "conv2": layers.init_conv2d(ks[2], out_ch, out_ch, 3, dtype=dtype),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = layers.init_conv2d(ks[3], in_ch, out_ch, 1, dtype=dtype)
    return p


def _init_transformer_block(key: Array, dim: int, ctx_dim: int, head_dim: int,
                            dtype: Any) -> Params:
    ks = jax.random.split(key, 4)
    heads = dim // head_dim
    return {
        "norm1": layers.init_norm(dim, dtype),
        "attn1": init_mha(ks[0], dim, num_heads=heads, head_dim=head_dim, dtype=dtype),
        "norm2": layers.init_norm(dim, dtype),
        "attn2": init_mha(ks[1], dim, context_dim=ctx_dim, num_heads=heads,
                          head_dim=head_dim, dtype=dtype),
        "norm3": layers.init_norm(dim, dtype),
        "ff": {
            "net_0_proj": layers.init_linear(ks[2], dim, dim * 8, dtype=dtype),
            "net_2": layers.init_linear(ks[3], dim * 4, dim, dtype=dtype),
        },
    }


def _init_transformer(key: Array, dim: int, depth: int, ctx_dim: int,
                      head_dim: int, groups: int, dtype: Any) -> Params:
    ks = jax.random.split(key, depth + 2)
    return {
        "norm": layers.init_norm(dim, dtype),
        "proj_in": layers.init_linear(ks[0], dim, dim, dtype=dtype),
        "transformer_blocks": [
            _init_transformer_block(ks[2 + i], dim, ctx_dim, head_dim, dtype)
            for i in range(depth)
        ],
        "proj_out": layers.init_linear(ks[1], dim, dim, dtype=dtype),
    }


def init_params(key: Array, cfg: UNetConfig) -> Params:
    dtype = cfg.dtype
    temb = cfg.time_embed_dim
    n_levels = len(cfg.block_out_channels)
    # sized generously from the config: a handful of keys per block
    # level plus embeddings/mid (a fixed 64 overflowed for configs
    # modestly deeper than SDXL)
    n_keys = 16 + 16 * len(cfg.block_out_channels) * (
        cfg.layers_per_block + 1)
    ks = iter(jax.random.split(key, max(64, n_keys)))

    p: Params = {
        "conv_in": layers.init_conv2d(next(ks), cfg.in_channels,
                                      cfg.block_out_channels[0], 3, dtype=dtype),
        "time_embedding": {
            "linear_1": layers.init_linear(next(ks), cfg.block_out_channels[0],
                                           temb, dtype=dtype),
            "linear_2": layers.init_linear(next(ks), temb, temb, dtype=dtype),
        },
        "add_embedding": {
            "linear_1": layers.init_linear(
                next(ks), cfg.projection_class_embeddings_input_dim, temb, dtype=dtype),
            "linear_2": layers.init_linear(next(ks), temb, temb, dtype=dtype),
        },
    }

    # Down blocks.
    down = []
    out_ch = cfg.block_out_channels[0]
    for i in range(n_levels):
        in_ch, out_ch = out_ch, cfg.block_out_channels[i]
        depth = cfg.transformer_layers_per_block[i]
        blk: Params = {"resnets": [], "attentions": []} if depth else {"resnets": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(_init_resnet(
                next(ks), in_ch if j == 0 else out_ch, out_ch, temb,
                cfg.norm_num_groups, dtype))
            if depth:
                blk["attentions"].append(_init_transformer(
                    next(ks), out_ch, depth, cfg.cross_attention_dim,
                    cfg.attention_head_dim, cfg.norm_num_groups, dtype))
        if i < n_levels - 1:
            blk["downsamplers"] = [{"conv": layers.init_conv2d(
                next(ks), out_ch, out_ch, 3, dtype=dtype)}]
        down.append(blk)
    p["down_blocks"] = down

    # Mid block.
    mid_ch = cfg.block_out_channels[-1]
    mid_depth = cfg.transformer_layers_per_block[-1]
    p["mid_block"] = {
        "resnets": [
            _init_resnet(next(ks), mid_ch, mid_ch, temb, cfg.norm_num_groups, dtype),
            _init_resnet(next(ks), mid_ch, mid_ch, temb, cfg.norm_num_groups, dtype),
        ],
        "attentions": [_init_transformer(
            next(ks), mid_ch, mid_depth, cfg.cross_attention_dim,
            cfg.attention_head_dim, cfg.norm_num_groups, dtype)] if mid_depth else [],
    }

    # Up blocks (reverse order).
    rev = list(reversed(cfg.block_out_channels))
    rev_depth = list(reversed(cfg.transformer_layers_per_block))
    up = []
    out_ch = rev[0]
    for i in range(n_levels):
        prev_out, out_ch = out_ch, rev[i]
        in_ch = rev[min(i + 1, n_levels - 1)]
        depth = rev_depth[i]
        blk = {"resnets": [], "attentions": []} if depth else {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            skip_ch = in_ch if j == cfg.layers_per_block else out_ch
            res_in = prev_out if j == 0 else out_ch
            blk["resnets"].append(_init_resnet(
                next(ks), res_in + skip_ch, out_ch, temb, cfg.norm_num_groups, dtype))
            if depth:
                blk["attentions"].append(_init_transformer(
                    next(ks), out_ch, depth, cfg.cross_attention_dim,
                    cfg.attention_head_dim, cfg.norm_num_groups, dtype))
        if i < n_levels - 1:
            blk["upsamplers"] = [{"conv": layers.init_conv2d(
                next(ks), out_ch, out_ch, 3, dtype=dtype)}]
        up.append(blk)
    p["up_blocks"] = up

    p["conv_norm_out"] = layers.init_norm(cfg.block_out_channels[0], dtype)
    p["conv_out"] = layers.init_conv2d(next(ks), cfg.block_out_channels[0],
                                       cfg.out_channels, 3, dtype=dtype)
    return p


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _resnet(p: Params, x: Array, temb: Array, groups: int) -> Array:
    h = layers.group_norm(p["norm1"], x, num_groups=groups)
    h = layers.silu(h)
    h = layers.conv2d(p["conv1"], h)
    t = layers.linear(p["time_emb_proj"], layers.silu(temb))
    h = h + t[:, None, None, :].astype(h.dtype)
    h = layers.group_norm(p["norm2"], h, num_groups=groups)
    h = layers.silu(h)
    h = layers.conv2d(p["conv2"], h)
    if "conv_shortcut" in p:
        x = layers.conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


class _AttnCtx:
    """Per-call plumbing shared by every transformer block."""

    def __init__(self, context, lora, ip_list, ip_context, ip_scale, control):
        self.context = context
        self.lora = lora
        self.ip_list = ip_list      # list of {to_k_ip, to_v_ip} in attn2 order
        self.ip_context = ip_context
        self.ip_scale = ip_scale
        self.control = control
        self.ip_idx = 0             # python counter, fixed at trace time


def _transformer_block(p: Params, x: Array, ctx: _AttnCtx, head_dim: int,
                       lora: Optional[dict], *,
                       ip_override: Optional[Params] = None) -> Array:
    heads = x.shape[-1] // head_dim
    ctrl = ctx.control

    h = layers.layer_norm(p["norm1"], x)
    x = x + mha(p["attn1"], h, num_heads=heads, lora=_sub(lora, "attn1"),
                p2p=ctrl)

    h = layers.layer_norm(p["norm2"], x)
    ip = ip_override
    if ip is None and ctx.ip_list is not None:
        ip = ctx.ip_list[ctx.ip_idx]
        ctx.ip_idx += 1
    x = x + mha(p["attn2"], h, num_heads=heads, context=ctx.context,
                lora=_sub(lora, "attn2"),
                ip=ip, ip_context=ctx.ip_context, ip_scale=ctx.ip_scale,
                p2p=ctrl)

    h = layers.layer_norm(p["norm3"], x)
    ff = p["ff"]
    flora = _sub(lora, "ff")
    h = layers.geglu(ff["net_0_proj"], h, _sub(flora, "net_0_proj"))
    h = layers.linear(ff["net_2"], h, _sub(flora, "net_2"))
    return x + h


def pack_params(p: Params, min_depth: int = 4) -> Params:
    """Stack deep transformer_blocks lists into scan-able leaf stacks.

    SDXL's level-2/mid transformers are 10 identical blocks; scanning one
    traced body over stacked weights instead of unrolling shrinks the HLO
    ~10x for those stacks, cutting XLA compile time with identical math.
    Apply once after loading/converting weights; ``apply`` detects the
    packed layout. LoRA/IP trees keep the unpacked naming — they are
    depth-stacked (rank-padded) at trace time, which is loop-invariant.
    """
    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (k == "transformer_blocks" and isinstance(v, list)
                        and len(v) >= min_depth):
                    out["transformer_blocks_stacked"] = jax.tree.map(
                        lambda *xs: jnp.stack(xs), *v)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, list):
            return [walk(x) for x in node]
        return node

    return walk(p)


def _scan_blocks(p_stacked: Params, h: Array, ctx: _AttnCtx, head_dim: int,
                 lora: Optional[dict]) -> Array:
    """lax.scan over a stacked transformer-block stack."""
    from omg_tpu import lora as lora_lib
    depth = jax.tree.leaves(p_stacked)[0].shape[0]

    ip_stack = None
    if ctx.ip_list is not None:
        entries = ctx.ip_list[ctx.ip_idx:ctx.ip_idx + depth]
        ctx.ip_idx += depth
        ip_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *entries)

    lora_stack = None
    if lora is not None:
        per_block = [_sub(lora, i) for i in range(depth)]
        if any(b is not None for b in per_block):
            lora_stack = lora_lib.stack_loras(per_block, repeat=1)

    xs = {"p": p_stacked}
    if ip_stack is not None:
        xs["ip"] = ip_stack
    if lora_stack is not None:
        xs["lora"] = lora_stack

    def body(carry, per):
        out = _transformer_block(per["p"], carry, ctx, head_dim,
                                 per.get("lora"), ip_override=per.get("ip"))
        return out, None

    h, _ = jax.lax.scan(body, h, xs)
    return h


def _transformer(p: Params, x: Array, ctx: _AttnCtx, head_dim: int, groups: int,
                 lora: Optional[dict]) -> Array:
    b, hh, ww, c = x.shape
    residual = x
    h = layers.group_norm(p["norm"], x, num_groups=groups)
    h = h.reshape(b, hh * ww, c)
    h = layers.linear(p["proj_in"], h, _sub(lora, "proj_in"))
    tlora = _sub(lora, "transformer_blocks")
    if "transformer_blocks_stacked" in p:
        h = _scan_blocks(p["transformer_blocks_stacked"], h, ctx, head_dim,
                         tlora)
    else:
        for i, blk in enumerate(p["transformer_blocks"]):
            h = _transformer_block(blk, h, ctx, head_dim, _sub(tlora, i))
    h = layers.linear(p["proj_out"], h, _sub(lora, "proj_out"))
    return h.reshape(b, hh, ww, c) + residual


def time_embeddings(p: Params, cfg: UNetConfig, timestep: Array,
                    text_embeds: Array, time_ids: Array) -> Array:
    """Timestep + SDXL text_time micro-conditioning embedding -> [B, temb].

    Mirrors diffusers get_time_embed + add_embedding("text_time"): time_ids
    [B, 6] each embedded to addition_time_embed_dim, flattened, concatenated
    after the pooled text embedding (reference feeds these via
    added_cond_kwargs, src/pipelines/lora_pipeline.py:552-559).
    """
    b = text_embeds.shape[0]
    t = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32), (b,))
    t_emb = layers.timestep_embedding(t, cfg.block_out_channels[0])
    te = p["time_embedding"]
    temb = layers.linear(te["linear_2"],
                         layers.silu(layers.linear(te["linear_1"],
                                                   t_emb.astype(cfg.dtype))))

    ids = time_ids.astype(jnp.float32).reshape(-1)
    id_emb = layers.timestep_embedding(ids, cfg.addition_time_embed_dim)
    id_emb = id_emb.reshape(b, -1)
    add = jnp.concatenate([text_embeds.astype(jnp.float32), id_emb], axis=-1)
    ae = p["add_embedding"]
    aemb = layers.linear(ae["linear_2"],
                         layers.silu(layers.linear(ae["linear_1"],
                                                   add.astype(cfg.dtype))))
    return temb + aemb


def apply(p: Params, cfg: UNetConfig, sample: Array, timestep: Array,
          encoder_hidden_states: Array, *,
          text_embeds: Array, time_ids: Array,
          lora: Optional[dict] = None,
          ip_adapter: Optional[Sequence[Params]] = None,
          ip_context: Optional[Array] = None,
          ip_scale: float | Array = 1.0,
          control: Optional[AttnControl] = None,
          down_block_residuals: Optional[Sequence[Array]] = None,
          mid_block_residual: Optional[Array] = None,
          return_cache: bool = False) -> Array:
    """UNet forward. sample: [B, H, W, 4] NHWC latents; returns eps pred.

    ``return_cache=True`` additionally returns the feature entering the
    LAST up block — the DeepCache branch-0 cache point (Ma et al. 2023,
    arXiv 2312.00858): everything deeper than the shallowest level can
    be skipped on nearby steps by resuming ``apply_shallow`` from it.
    """
    groups = cfg.norm_num_groups
    hd = cfg.attention_head_dim
    temb = time_embeddings(p, cfg, timestep, text_embeds, time_ids)

    ctx = _AttnCtx(encoder_hidden_states, lora,
                   list(ip_adapter) if ip_adapter is not None else None,
                   ip_context, ip_scale, control)

    x = layers.conv2d(p["conv_in"], sample)
    residuals = [x]

    dlora = _sub(lora, "down_blocks")
    for bi, blk in enumerate(p["down_blocks"]):
        blora = _sub(dlora, bi)
        attns = blk.get("attentions")
        for ri, res in enumerate(blk["resnets"]):
            x = _resnet(res, x, temb, groups)
            if attns:
                x = _transformer(attns[ri], x, ctx, hd, groups,
                                 _sub(_sub(blora, "attentions"), ri))
            residuals.append(x)
        if "downsamplers" in blk:
            x = layers.conv2d(blk["downsamplers"][0]["conv"], x, stride=2)
            residuals.append(x)

    if down_block_residuals is not None:
        residuals = [r + c.astype(r.dtype)
                     for r, c in zip(residuals, down_block_residuals)]

    mid = p["mid_block"]
    mlora = _sub(lora, "mid_block")
    x = _resnet(mid["resnets"][0], x, temb, groups)
    if mid["attentions"]:
        x = _transformer(mid["attentions"][0], x, ctx, hd, groups,
                         _sub(_sub(mlora, "attentions"), 0))
    x = _resnet(mid["resnets"][1], x, temb, groups)
    if mid_block_residual is not None:
        x = x + mid_block_residual.astype(x.dtype)

    ulora = _sub(lora, "up_blocks")
    cache = None
    for bi, blk in enumerate(p["up_blocks"]):
        if return_cache and bi == len(p["up_blocks"]) - 1:
            cache = x
        blora = _sub(ulora, bi)
        attns = blk.get("attentions")
        for ri, res in enumerate(blk["resnets"]):
            skip = residuals.pop()
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = _resnet(res, x, temb, groups)
            if attns:
                x = _transformer(attns[ri], x, ctx, hd, groups,
                                 _sub(_sub(blora, "attentions"), ri))
        if "upsamplers" in blk:
            x = layers.upsample_nearest_2x(x)
            x = layers.conv2d(blk["upsamplers"][0]["conv"], x)

    x = layers.group_norm(p["conv_norm_out"], x, num_groups=groups)
    x = layers.silu(x)
    out = layers.conv2d(p["conv_out"], x)
    return (out, cache) if return_cache else out


def cache_shape(cfg: UNetConfig, batch: int, h: int, w: int) -> tuple:
    """Shape of the DeepCache branch-0 feature for an [batch, h, w, 4]
    latent: the input to the last up block — full latent resolution,
    channels of the second-shallowest level (every upsampler conv
    preserves its block's channel count, so reversed_channels[-2] ==
    block_out_channels[1])."""
    return (batch, h, w, cfg.block_out_channels[1])


def _transformer_depth(attn_p: Params) -> int:
    """Number of transformer blocks (== attn2 layers) in one attention."""
    if "transformer_blocks_stacked" in attn_p:
        return jax.tree.leaves(
            attn_p["transformer_blocks_stacked"])[0].shape[0]
    return len(attn_p["transformer_blocks"])


def apply_shallow(p: Params, cfg: UNetConfig, sample: Array, timestep: Array,
                  encoder_hidden_states: Array, *,
                  text_embeds: Array, time_ids: Array, cache: Array,
                  lora: Optional[dict] = None,
                  ip_adapter: Optional[Sequence[Params]] = None,
                  ip_context: Optional[Array] = None,
                  ip_scale: float | Array = 1.0,
                  control: Optional[AttnControl] = None) -> Array:
    """DeepCache shallow forward (branch 0, Ma et al. 2023).

    Recomputes only the shallowest level — conv_in + down_blocks[0]
    for fresh skip features — then resumes from ``cache`` (the feature
    that entered the last up block on the most recent full forward,
    ``apply(..., return_cache=True)``) through the last up block and
    the output head. With SDXL's geometry the shallowest level is
    attention-free (transformer_layers_per_block[0] == 0), so this path
    runs NO attention at all: LoRA/IP-adapter/P2P edits happen only on
    full steps. General geometries are still correct: the IP-adapter
    counter consumes the traversal-order prefix in the down block and
    jumps to the traversal-order suffix for the last up block.

    Plumbing invariant (unit-tested): feeding the cache captured from a
    full forward at the SAME (sample, t) reproduces that full forward's
    output bit-exactly — the approximation is entirely "the cache is a
    few steps stale", never a layout/skip-order error.
    """
    groups = cfg.norm_num_groups
    hd = cfg.attention_head_dim
    temb = time_embeddings(p, cfg, timestep, text_embeds, time_ids)
    ctx = _AttnCtx(encoder_hidden_states, lora,
                   list(ip_adapter) if ip_adapter is not None else None,
                   ip_context, ip_scale, control)

    x = layers.conv2d(p["conv_in"], sample)
    residuals = [x]
    blk = p["down_blocks"][0]
    blora = _sub(_sub(_sub(lora, "down_blocks"), 0), "attentions")
    attns = blk.get("attentions")
    for ri, res in enumerate(blk["resnets"]):
        x = _resnet(res, x, temb, groups)
        if attns:
            x = _transformer(attns[ri], x, ctx, hd, groups, _sub(blora, ri))
        residuals.append(x)

    n_up = len(p["up_blocks"])
    blk = p["up_blocks"][n_up - 1]
    attns = blk.get("attentions")
    if ctx.ip_list is not None and attns:
        # the last up block's attn2 layers are the traversal-order tail
        ctx.ip_idx = len(ctx.ip_list) - sum(
            _transformer_depth(a) for a in attns)
    ulora = _sub(_sub(lora, "up_blocks"), n_up - 1)
    x = cache
    for ri, res in enumerate(blk["resnets"]):
        skip = residuals.pop()
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = _resnet(res, x, temb, groups)
        if attns:
            x = _transformer(attns[ri], x, ctx, hd, groups,
                             _sub(_sub(ulora, "attentions"), ri))

    x = layers.group_norm(p["conv_norm_out"], x, num_groups=groups)
    x = layers.silu(x)
    return layers.conv2d(p["conv_out"], x)


def num_cross_attention_layers(cfg: UNetConfig) -> int:
    """Count of attn2 layers (= IP-adapter K/V pair count), traversal order."""
    n = 0
    depths = list(cfg.transformer_layers_per_block)
    for i, d in enumerate(depths):
        n += cfg.layers_per_block * d
    n += depths[-1]  # mid
    for i, d in enumerate(reversed(depths)):
        n += (cfg.layers_per_block + 1) * d
    return n
