"""SAM prompt encoder + mask decoder, functional JAX.

The reference's EfficientViT-SAM checkpoints bundle the original SAM
PromptEncoder/MaskDecoder weights and call them through the
segment_anything package (reference:
src/efficientvit/models/efficientvit/sam.py:436-449 and the zoo build at
:520-544). This is a from-scratch functional port of those modules'
published architecture: random-Fourier positional encoding, box/point
prompts, and the two-way transformer decoder with hypernetwork mask
heads. Param names mirror the torch state dict (``prompt_encoder.*``,
``mask_decoder.*`` inside ``xl1.pt``).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp

from omg_tpu.nn import layers as nn_layers
from omg_tpu.segment import evit_ops as ops

Array = jax.Array
Params = dict

EMBED_DIM = 256
FEAT_HW = 64
NUM_MASK_TOKENS = 4


# --------------------------------------------------------------------------
# Positional encoding (PositionEmbeddingRandom)
# --------------------------------------------------------------------------

def _pe_encode(gauss: Array, coords01: Array) -> Array:
    """coords in [0,1] -> [.., 2*F] Fourier features."""
    c = 2.0 * coords01 - 1.0
    c = c @ gauss.astype(c.dtype)
    c = 2.0 * math.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def dense_pe(p: Params, hw: int = FEAT_HW) -> Array:
    """[hw, hw, 256] positional grid for the image embedding."""
    gauss = p["pe_layer"]["positional_encoding_gaussian_matrix"]
    ys = (jnp.arange(hw, dtype=jnp.float32) + 0.5) / hw
    xs = (jnp.arange(hw, dtype=jnp.float32) + 0.5) / hw
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    return _pe_encode(gauss, grid)


def encode_boxes(p: Params, boxes: Array, input_size: int) -> Array:
    """boxes [B, 4] xyxy in pixels -> sparse embeddings [B, 2, 256]."""
    coords = boxes.reshape(-1, 2, 2) + 0.5
    coords = coords / input_size
    emb = _pe_encode(p["pe_layer"]["positional_encoding_gaussian_matrix"],
                     coords)
    emb = emb.at[:, 0, :].add(p["point_embeddings"][2]["weight"][0])
    emb = emb.at[:, 1, :].add(p["point_embeddings"][3]["weight"][0])
    return emb


def encode_points(p: Params, points: Array, labels: Array,
                  input_size: int, *, pad: bool = True) -> Array:
    """points [B, N, 2] pixel xy + labels [B, N] -> sparse [B, N(+1), 256].

    SAM PromptEncoder._embed_points semantics: +0.5 pixel-center shift,
    Fourier PE, then label embeddings (1 -> point_embeddings[1],
    0 -> point_embeddings[0], -1 -> not_a_point_embed with zeroed PE).
    With no box prompt SAM appends one (0,0)/-1 padding point.
    """
    if pad:
        b = points.shape[0]
        points = jnp.concatenate(
            [points, jnp.zeros((b, 1, 2), points.dtype)], axis=1)
        labels = jnp.concatenate(
            [labels, -jnp.ones((b, 1), labels.dtype)], axis=1)
    coords = (points + 0.5) / input_size
    emb = _pe_encode(p["pe_layer"]["positional_encoding_gaussian_matrix"],
                     coords)
    lab = labels[..., None]
    emb = jnp.where(lab == -1,
                    p["not_a_point_embed"]["weight"][0],
                    emb
                    + jnp.where(lab == 1,
                                p["point_embeddings"][1]["weight"][0],
                                p["point_embeddings"][0]["weight"][0]))
    return emb


def no_mask_dense(p: Params, batch: int, hw: int = FEAT_HW) -> Array:
    """Dense embedding when no mask prompt is given."""
    w = p["no_mask_embed"]["weight"][0]
    return jnp.broadcast_to(w, (batch, hw, hw, EMBED_DIM))


# --------------------------------------------------------------------------
# Two-way transformer
# --------------------------------------------------------------------------

def _attn(p: Params, q: Array, k: Array, v: Array, num_heads: int = 8) -> Array:
    """SAM decoder attention with internal downsampling in the projs."""
    q = nn_layers.linear(p["q_proj"], q)
    k = nn_layers.linear(p["k_proj"], k)
    v = nn_layers.linear(p["v_proj"], v)
    b, nq, c = q.shape
    hd = c // num_heads

    def split(t):
        return t.reshape(b, t.shape[1], num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) / hd ** 0.5
    probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, nq, c)
    return nn_layers.linear(p["out_proj"], out)


def _two_way_block(p: Params, queries: Array, keys: Array, query_pe: Array,
                   key_pe: Array, *, skip_first_layer_pe: bool) -> tuple:
    if skip_first_layer_pe:
        queries = _attn(p["self_attn"], queries, queries, queries)
    else:
        q = queries + query_pe
        queries = queries + _attn(p["self_attn"], q, q, queries)
    queries = nn_layers.layer_norm(p["norm1"], queries)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _attn(p["cross_attn_token_to_image"], q, k, keys)
    queries = nn_layers.layer_norm(p["norm2"], queries)

    h = nn_layers.linear(p["mlp"]["lin1"], queries)
    h = jax.nn.relu(h)
    queries = queries + nn_layers.linear(p["mlp"]["lin2"], h)
    queries = nn_layers.layer_norm(p["norm3"], queries)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _attn(p["cross_attn_image_to_token"], k, q, queries)
    keys = nn_layers.layer_norm(p["norm4"], keys)
    return queries, keys


def two_way_transformer(p: Params, image_emb: Array, image_pe: Array,
                        tokens: Array) -> tuple:
    """image_emb [B, H, W, C] + tokens [B, T, C] -> (tokens', src')."""
    b, h, w, c = image_emb.shape
    keys = image_emb.reshape(b, h * w, c)
    key_pe = image_pe.reshape(1, h * w, c).astype(keys.dtype)
    queries = tokens
    for i, blk in enumerate(p["layers"]):
        queries, keys = _two_way_block(blk, queries, keys, tokens, key_pe,
                                       skip_first_layer_pe=(i == 0))
    q = queries + tokens
    k = keys + key_pe
    queries = queries + _attn(p["final_attn_token_to_image"], q, k, keys)
    queries = nn_layers.layer_norm(p["norm_final_attn"], queries)
    return queries, keys


# --------------------------------------------------------------------------
# Mask decoder
# --------------------------------------------------------------------------

def _mlp3(p: Params, x: Array, *, sigmoid_out: bool = False) -> Array:
    n = len(p["layers"])
    for i in range(n):
        x = nn_layers.linear(p["layers"][i], x)
        if i < n - 1:
            x = jax.nn.relu(x)
    if sigmoid_out:
        x = jax.nn.sigmoid(x)
    return x


def _conv_transpose_2x(p: Params, x: Array) -> Array:
    """ConvTranspose2d(k=2, s=2) on NHWC.

    Weight stored [k, k, out, in] (torch [in, out, k, k] transposed
    (2,3,1,0)); transpose_kernel=True reproduces torch's gradient-of-conv
    semantics exactly (verified against torch in tests/test_segment.py).
    """
    y = jax.lax.conv_transpose(
        x, p["weight"].astype(x.dtype), strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def decode_masks(decoder: Params, prompt: Params, image_emb: Array,
                 sparse: Array, dense: Array) -> tuple:
    """-> (masks [B, 4, 256, 256], iou_pred [B, 4]).

    Row 0 is the single-mask output; rows 1:4 are the multimask outputs
    the predictor selects from by IoU score.
    """
    b = sparse.shape[0]
    iou_tok = decoder["iou_token"]["weight"]          # [1, C]
    mask_tok = decoder["mask_tokens"]["weight"]       # [4, C]
    base = jnp.concatenate([iou_tok, mask_tok], axis=0)
    tokens = jnp.broadcast_to(base, (b,) + base.shape)
    tokens = jnp.concatenate([tokens, sparse.astype(base.dtype)], axis=1)

    src = image_emb + dense.astype(image_emb.dtype)
    pe = dense_pe(prompt, image_emb.shape[1])

    hs, src_out = two_way_transformer(decoder["transformer"], src, pe, tokens)
    iou_out = hs[:, 0]
    mask_out = hs[:, 1:1 + NUM_MASK_TOKENS]

    h = w = image_emb.shape[1]
    up = src_out.reshape(b, h, w, EMBED_DIM)
    u = decoder["output_upscaling"]
    up = _conv_transpose_2x(u[0], up)
    up = ops.layer_norm_2d(u[1], up)
    up = jax.nn.gelu(up, approximate=False)
    up = _conv_transpose_2x(u[3], up)
    up = jax.nn.gelu(up, approximate=False)           # [B, 4h, 4w, 32]

    hyper = jnp.stack([
        _mlp3(decoder["output_hypernetworks_mlps"][i], mask_out[:, i])
        for i in range(NUM_MASK_TOKENS)], axis=1)      # [B, 4, 32]
    masks = jnp.einsum("bkc,bhwc->bkhw", hyper, up)
    iou_pred = _mlp3(decoder["iou_prediction_head"], iou_out)
    return masks, iou_pred


# --------------------------------------------------------------------------
# Random init (tests; real weights from xl1.pt / sam_vit_h checkpoints)
# --------------------------------------------------------------------------

def init_prompt_encoder(key: Array, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 8)
    return {
        "pe_layer": {"positional_encoding_gaussian_matrix":
                     jax.random.normal(ks[0], (2, EMBED_DIM // 2))},
        "point_embeddings": [
            {"weight": jax.random.normal(ks[1 + i], (1, EMBED_DIM)) * 0.02}
            for i in range(4)],
        "not_a_point_embed": {"weight":
                              jax.random.normal(ks[5], (1, EMBED_DIM)) * 0.02},
        "no_mask_embed": {"weight":
                          jax.random.normal(ks[6], (1, EMBED_DIM)) * 0.02},
    }


def init_mask_decoder(key: Array, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 64))

    def lin(i, o):
        return nn_layers.init_linear(next(ks), i, o, dtype=dtype)

    def attn_p(down=1):
        d = EMBED_DIM // down
        return {"q_proj": lin(EMBED_DIM, d), "k_proj": lin(EMBED_DIM, d),
                "v_proj": lin(EMBED_DIM, d), "out_proj": lin(d, EMBED_DIM)}

    def block():
        return {
            "self_attn": attn_p(1),
            "norm1": nn_layers.init_norm(EMBED_DIM, dtype),
            "cross_attn_token_to_image": attn_p(2),
            "norm2": nn_layers.init_norm(EMBED_DIM, dtype),
            "mlp": {"lin1": lin(EMBED_DIM, 2048),
                    "lin2": lin(2048, EMBED_DIM)},
            "norm3": nn_layers.init_norm(EMBED_DIM, dtype),
            "cross_attn_image_to_token": attn_p(2),
            "norm4": nn_layers.init_norm(EMBED_DIM, dtype),
        }

    def mlp3(i, h, o):
        return {"layers": [lin(i, h), lin(h, h), lin(h, o)]}

    k = next(ks)
    return {
        "iou_token": {"weight": jax.random.normal(k, (1, EMBED_DIM)) * 0.02},
        "mask_tokens": {"weight": jax.random.normal(
            next(ks), (NUM_MASK_TOKENS, EMBED_DIM)) * 0.02},
        "transformer": {
            "layers": [block(), block()],
            "final_attn_token_to_image": attn_p(2),
            "norm_final_attn": nn_layers.init_norm(EMBED_DIM, dtype),
        },
        "output_upscaling": {
            0: {"weight": jax.random.normal(
                next(ks), (2, 2, 64, EMBED_DIM)) * 0.02,
                "bias": jnp.zeros((64,))},
            1: nn_layers.init_norm(64, dtype),
            3: {"weight": jax.random.normal(next(ks), (2, 2, 32, 64)) * 0.02,
                "bias": jnp.zeros((32,))},
        },
        "output_hypernetworks_mlps": [
            mlp3(EMBED_DIM, EMBED_DIM, 32) for _ in range(NUM_MASK_TOKENS)],
        "iou_prediction_head": mlp3(EMBED_DIM, EMBED_DIM, NUM_MASK_TOKENS),
    }
