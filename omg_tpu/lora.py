"""LoRA adapters as low-rank delta pytrees.

The reference personalizes concept UNets by PEFT-injecting LoRA weights
into diffusers modules and hot-swapping them per region with
``set_adapters`` (reference: inference_lora.py:162-170,
src/pipelines/lora_pipeline.py:336-347,588-591, gradio_demo/app.py:216-237).
Weight mutation like that breaks XLA's compile-once model, so here an
adapter is *data*: a pytree parallel to the model's param tree whose
leaves are ``{"down": [in, r], "up": [r, out], "scale": ()}``, consumed
inside ``layers.linear`` as ``y += scale * (x @ down) @ up``.

``set_adapters([char, style], [0.7, 0.5])`` becomes ``merge_loras``:
rank-concatenation of the deltas with the per-adapter weight folded into
``up`` — mathematically identical to summing the scaled deltas, still a
single pair of matmuls per layer, and shape-stable across requests with
the same total rank.

Supported checkpoint formats (both in the wild for SDXL character LoRAs,
e.g. the reference's registry gradio_demo/character_template.py):
  * diffusers/PEFT:  ``unet.<path>.lora_A.weight`` / ``lora_B.weight``
  * kohya-ss:        ``lora_unet_<path>.lora_down.weight`` /
                     ``lora_up.weight`` + ``alpha``
"""

from __future__ import annotations

import re
import jax
from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np

Params = dict


# --------------------------------------------------------------------------
# State-dict parsing
# --------------------------------------------------------------------------

def load_safetensors(path: str) -> dict:
    from safetensors import numpy as stnp
    return dict(stnp.load_file(path))


_KOHYA_RE = re.compile(r"^lora_(unet|te1|te2|te)_(.+)$")

# kohya flattens module paths with "_"; these tokens are multi-word module
# names that must be re-joined before splitting on "_".
_MULTIWORD = [
    "down_blocks", "up_blocks", "mid_block", "transformer_blocks",
    "attentions", "resnets", "to_q", "to_k", "to_v", "to_out",
    "proj_in", "proj_out", "ff_net", "time_emb_proj", "conv_shortcut",
    "text_model", "self_attn", "q_proj", "k_proj", "v_proj", "out_proj",
]


def _kohya_path_tokens(flat: str) -> list:
    """'down_blocks_1_attentions_0_...' -> ['down_blocks', 1, ...]."""
    # Protect multi-word tokens, longest first.
    s = flat
    for tok in sorted(_MULTIWORD, key=len, reverse=True):
        s = s.replace(tok, tok.replace("_", "\x00"))
    parts = []
    for piece in s.split("_"):
        piece = piece.replace("\x00", "_")
        if piece.isdigit():
            parts.append(int(piece))
        elif piece:
            parts.append(piece)
    return parts


def _canon_tokens(tokens: list) -> list:
    """Map diffusers module names onto our param-tree keys."""
    out = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        # ff.net.0.proj -> ff.net_0_proj ; ff.net.2 -> ff.net_2
        if t == "ff" and i + 1 < len(tokens) and tokens[i + 1] in ("net", "ff_net"):
            out.append("ff")
            rest = tokens[i + 2:]
            if rest and rest[0] == 0:
                out.append("net_0_proj")
                i += 3
                if i < len(tokens) and tokens[i] == "proj":
                    i += 1
            elif rest and rest[0] == 2:
                out.append("net_2")
                i += 3
            else:
                i += 2
            continue
        if t == "ff_net":
            # kohya: ff_net_0_proj / ff_net_2
            rest = tokens[i + 1:]
            out.append("ff")
            if rest and rest[0] == 0:
                out.append("net_0_proj")
                i += 2
                if i < len(tokens) and tokens[i] == "proj":
                    i += 1
            elif rest and rest[0] == 2:
                out.append("net_2")
                i += 2
            else:
                i += 1
            continue
        # to_out.0 -> to_out
        if t == "to_out":
            out.append("to_out")
            if i + 1 < len(tokens) and tokens[i + 1] == 0:
                i += 2
            else:
                i += 1
            continue
        out.append(t)
        i += 1
    return out


def _insert(tree: dict, path: list, leaf: dict) -> None:
    node = tree
    for tok in path[:-1]:
        node = node.setdefault(tok, {})
    node[path[-1]] = leaf


def lora_from_state_dict(sd: dict, *, weight: float = 1.0,
                         dtype: Any = jnp.float32) -> dict:
    """Parse a LoRA state dict -> {"unet": tree, "text_encoder": tree,
    "text_encoder_2": tree} of delta leaves aligned with our param trees.

    Orientation: torch lora_down/lora_A is [r, in], lora_up/lora_B is
    [out, r]; ours is down [in, r], up [r, out] (transpose on load).
    scale = weight * alpha / rank (kohya) or weight (PEFT, alpha folded).
    """
    groups: dict = {}
    for key, val in sd.items():
        arr = np.asarray(val)
        m = _KOHYA_RE.match(key)
        if m:
            prefix, rest = m.groups()
            model = {"unet": "unet", "te": "text_encoder",
                     "te1": "text_encoder", "te2": "text_encoder_2"}[prefix]
            # rest = '<flatpath>.lora_down.weight' | '.lora_up.weight' | '.alpha'
            flat, _, tail = rest.partition(".")
            tokens = _kohya_path_tokens(flat)
            role = ("down" if "lora_down" in tail else
                    "up" if "lora_up" in tail else
                    "alpha" if tail == "alpha" else None)
        else:
            parts = key.split(".")
            if parts[0] in ("unet",):
                model = "unet"
            elif parts[0] in ("text_encoder",):
                model = "text_encoder"
            elif parts[0] in ("text_encoder_2",):
                model = "text_encoder_2"
            elif (parts[0] in ("down_blocks", "up_blocks", "mid_block")
                  and "lora" in key):
                # unprefixed attn-procs export (old diffusers
                # save_attn_procs): keys start at the block level
                model = "unet"
                parts = ["unet"] + parts
            else:
                continue
            if "lora_A" in parts or "lora_A.weight" in key:
                role = "down"
                mod_parts = parts[1:parts.index("lora_A")]
            elif "lora_B" in parts:
                role = "up"
                mod_parts = parts[1:parts.index("lora_B")]
            elif parts[-1] == "alpha":
                role = "alpha"
                mod_parts = parts[1:-1]
            elif "lora" in key and ("down" in parts or "up" in parts):
                # diffusers old-style: ...processor.to_q_lora.down.weight
                role = "down" if "down" in parts else "up"
                idx = parts.index("down" if role == "down" else "up")
                # drop the processor wrapper and the _lora suffix so the
                # path lands on the param tree's module names (to_q ...)
                mod_parts = [t[:-5] if t.endswith("_lora") else t
                             for t in parts[1:idx] if t != "processor"]
            else:
                continue
            tokens = []
            for t in mod_parts:
                tokens.append(int(t) if t.isdigit() else t)
        if role is None:
            continue
        gkey = (model, tuple(tokens))
        groups.setdefault(gkey, {})[role] = arr

    out: dict = {"unet": {}, "text_encoder": {}, "text_encoder_2": {}}
    for (model, tokens), parts in groups.items():
        if "down" not in parts or "up" not in parts:
            continue
        down = parts["down"]
        up = parts["up"]
        rank = down.shape[0]
        alpha = float(parts["alpha"]) if "alpha" in parts else float(rank)
        scale = weight * alpha / rank
        if down.ndim == 4:
            if down.shape[2:] != (1, 1) or up.shape[2:] != (1, 1):
                # kxk conv LoRA (LoCon-style) is not applied by the
                # attention-delta runtime; skipping the delta degrades
                # gracefully, whereas slicing a 3x3 kernel to its corner
                # tap would silently corrupt the adapter
                continue
            down = down[:, :, 0, 0]  # conv LoRA (1x1): [r, in, 1, 1]
            up = up[:, :, 0, 0]
        leaf = {
            "down": jnp.asarray(down.T.astype(np.float32), dtype),
            "up": jnp.asarray(up.T.astype(np.float32), dtype),
            "scale": jnp.asarray(scale, jnp.float32),
        }
        path = _canon_tokens(list(tokens))
        _insert(out[model], path, leaf)
    return out


def load_lora(path: str, *, weight: float = 1.0,
              dtype: Any = jnp.float32) -> dict:
    return lora_from_state_dict(load_safetensors(path), weight=weight,
                                dtype=dtype)


# --------------------------------------------------------------------------
# Adapter algebra
# --------------------------------------------------------------------------

def _is_leaf(node) -> bool:
    return isinstance(node, dict) and "down" in node and "up" in node


def scale_lora(tree: Optional[dict], s: float) -> Optional[dict]:
    """Multiply every delta's scale — the runtime analogue of the
    reference's ``cross_attention_kwargs={'scale': 0.8}`` on concept
    UNet calls (reference: lora_pipeline.py:592-599)."""
    if tree is None:
        return None
    if _is_leaf(tree):
        return {**tree, "scale": tree["scale"] * s}
    if isinstance(tree, (list, tuple)):
        return [scale_lora(v, s) for v in tree]
    return {k: scale_lora(v, s) for k, v in tree.items()}


def stack_loras(trees: Sequence[Optional[dict]], *,
                repeat: int = 1) -> Optional[dict]:
    """Stack adapters into per-lane batched deltas for one fused forward.

    Produces leaves ``{"down": [L*repeat, in, r], "up": [L*repeat, r, out],
    "scale": [L*repeat]}`` where L = len(trees); lane ``i*repeat + j`` runs
    tree i (``repeat=2`` gives each concept its CFG [uncond, cond] lane
    pair). Ranks are zero-padded to the max across trees, and paths
    missing from a tree contribute zero deltas — so concepts with
    different adapters (char-only vs char+style) batch into one UNet call.
    """
    if all(t is None for t in trees):
        return None
    L = len(trees)

    def rec(nodes):
        # nodes: list of Optional[subtree], length L. Leaves may be plain
        # [in, r]/[r, out] or already lane-stacked [B, in, r]/[B, r, out]
        # (this function also depth-stacks for the scan-packed UNet) —
        # the rank axis is down[..., -1] / up[..., -2].
        leaves = [n for n in nodes if n is not None and _is_leaf(n)]
        if leaves:
            d0, u0 = leaves[0]["down"], leaves[0]["up"]
            s0 = leaves[0]["scale"]
            rmax = max(n["down"].shape[-1] for n in leaves)

            def pad_rank(arr, axis, r):
                pads = [(0, 0)] * arr.ndim
                pads[axis] = (0, rmax - r)
                return jnp.pad(arr, pads)

            downs, ups, scales = [], [], []
            for n in nodes:
                if n is None or not _is_leaf(n):
                    d = jnp.zeros(d0.shape[:-1] + (rmax,), d0.dtype)
                    u = jnp.zeros(u0.shape[:-2] + (rmax,) + u0.shape[-1:],
                                  u0.dtype)
                    s = jnp.zeros(s0.shape, jnp.float32)
                else:
                    r = n["down"].shape[-1]
                    d = pad_rank(n["down"], -1, r)
                    u = pad_rank(n["up"], -2, r)
                    s = n["scale"].astype(jnp.float32)
                downs += [d] * repeat
                ups += [u] * repeat
                scales += [s] * repeat
            return {"down": jnp.stack(downs), "up": jnp.stack(ups),
                    "scale": jnp.stack(scales)}
        def norm(n):
            if isinstance(n, (list, tuple)):
                return {i: v for i, v in enumerate(n)}
            return n

        nodes = [norm(n) for n in nodes]
        keys = set()
        for n in nodes:
            if isinstance(n, dict):
                keys.update(n.keys())
        out = {}
        for k in keys:
            out[k] = rec([n.get(k) if isinstance(n, dict) else None
                          for n in nodes])
        return out

    return rec(list(trees))


def merge_loras(trees: Sequence[Optional[dict]],
                weights: Sequence[float]) -> Optional[dict]:
    """Combine adapters by rank concatenation with weights folded into up.

    Equivalent to ``set_adapters([...], adapter_weights=[...])``
    (reference: lora_pipeline.py:588-591 mixes char+style at [0.7, 0.5]):
    sum_i w_i * s_i * x @ d_i @ u_i == x @ [d_1|..|d_n] @ [w_1 s_1 u_1; ...].
    """
    live = [(t, w) for t, w in zip(trees, weights) if t is not None]
    if not live:
        return None

    def rec(nodes):
        # nodes: list of (subtree, weight)
        leaves = [(n, w) for n, w in nodes if _is_leaf(n)]
        if leaves:
            down = jnp.concatenate([n["down"] for n, _ in leaves], axis=1)
            up = jnp.concatenate(
                [n["up"] * (n["scale"].astype(n["up"].dtype) * w)
                 for n, w in leaves], axis=0)
            return {"down": down, "up": up, "scale": jnp.asarray(1.0, jnp.float32)}
        keys = set()
        for n, _ in nodes:
            keys.update(n.keys())
        out = {}
        for k in keys:
            sub = [(n[k], w) for n, w in nodes if k in n]
            out[k] = rec(sub)
        return out

    return rec(live)


def align_loras(trees: Sequence[Optional[dict]]) -> list:
    """Make adapter trees structurally identical (union of paths,
    zero-filled gaps, ranks zero-padded to the max).

    Enables request-axis vmapping over heterogeneous adapters (serving
    microbatching): after alignment, jax.tree.map(stack, *trees) is
    valid. Built on stack_loras' union walk — stack then unstack keeps
    one source of truth for the padding rules.
    """
    if all(t is None for t in trees):
        return [None] * len(trees)
    stacked = stack_loras(trees, repeat=1)
    out = []
    for i in range(len(trees)):
        out.append(jax.tree.map(lambda x: x[i], stacked))
    return out
