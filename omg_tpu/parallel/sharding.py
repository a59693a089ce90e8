"""Sharding rules: how OMG's weight pytrees map onto the mesh.

Tensor parallelism for the UNet follows the standard column/row split:
q/k/v (and IP k/v) projections column-sharded over MODEL_AXIS, the out
projection row-sharded, so each attention layer needs exactly one psum —
inserted by GSPMD from these annotations, never written by hand
(scaling-book recipe: annotate, let XLA place collectives over ICI).

Feed-forward and conv weights stay replicated in v1: SDXL fp16/bf16
weights (~7 GB) fit a single v5e chip, so TP here is a latency tool for
the attention-heavy blocks, not a capacity requirement. The serving axis
is DATA_AXIS over independent requests (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from omg_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# Param-tree keys whose linear weight [in, out] is column-sharded (out
# over MODEL_AXIS) / row-sharded (in over MODEL_AXIS).
_COL_KEYS = {"to_q", "to_k", "to_v", "to_k_ip", "to_v_ip"}
_ROW_KEYS = {"to_out"}


def unet_tp_sharding(params: dict, mesh: Mesh) -> Any:
    """NamedSharding tree matching a UNet param tree (TP over attention)."""
    rep = NamedSharding(mesh, P())
    col_w = NamedSharding(mesh, P(None, MODEL_AXIS))
    col_b = NamedSharding(mesh, P(MODEL_AXIS))
    row_w = NamedSharding(mesh, P(MODEL_AXIS, None))

    # scan-packed (pack_params) stacked leaves carry a leading depth
    # axis: [depth, in, out] — shard the same logical dims, depth
    # replicated
    col_w3 = NamedSharding(mesh, P(None, None, MODEL_AXIS))
    col_b2 = NamedSharding(mesh, P(None, MODEL_AXIS))
    row_w3 = NamedSharding(mesh, P(None, MODEL_AXIS, None))

    def proj(node, col: bool):
        """Sharding for one projection dict: handles the plain
        {'weight' [in,out]}, the scan-stacked [depth,in,out], and the
        int8-quantized {'weight_q','w_scale'} layouts — a key-name miss
        here would silently replicate (TP as a no-op) or shard the
        wrong axis."""
        out = {}
        for k, v in node.items():
            nd = getattr(v, "ndim", None)
            if k in ("weight", "weight_q"):
                if nd == 3:
                    out[k] = col_w3 if col else row_w3
                else:
                    out[k] = col_w if col else row_w
            elif k == "w_scale":   # per-OUT-column scales
                if col:
                    out[k] = col_b2 if nd == 2 else col_b
                else:
                    out[k] = rep
            elif k == "bias":
                if col:
                    out[k] = col_b2 if nd == 2 else col_b
                else:
                    out[k] = rep   # bias added after the psum
            else:
                out[k] = jax.tree.map(lambda _: rep, v)
        return out

    def walk(node, key=None):
        if isinstance(node, dict):
            if key in _COL_KEYS and ("weight" in node or "weight_q" in node):
                return proj(node, col=True)
            if key in _ROW_KEYS and ("weight" in node or "weight_q" in node):
                return proj(node, col=False)
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, key) for v in node)
        return rep

    return walk(params)


def replicated_like(params: Any, mesh: Mesh) -> Any:
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda _: rep, params)


def shard_params(params: Any, sharding_tree: Any) -> Any:
    """Place a param tree according to a parallel sharding tree."""
    return jax.tree.map(
        lambda p, s: jax.device_put(p, s), params, sharding_tree,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)))


def request_sharding(mesh: Mesh) -> NamedSharding:
    """Leading request axis over DATA_AXIS (independent prompts/seeds)."""
    return NamedSharding(mesh, P(DATA_AXIS))
