"""Native checkpointing of converted weight pytrees (orbax).

The reference's "checkpointing" is model loading: HF from_pretrained +
safetensors LoRA + raw .pt for SAM, re-parsed on every process start
(SURVEY.md §5 checkpoint/resume). Here converted pytrees are saved once
in orbax format — subsequent launches restore directly to device (with
optional sharding) instead of re-running the torch->JAX conversion.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_pytree(path: str, tree: Any) -> None:
    """Save a param pytree (absolute path; overwrites)."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    ckpt.save(path, tree, force=True)
    ckpt.wait_until_finished()


def load_pytree(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree. ``like`` (a matching pytree of arrays or
    ShapeDtypeStructs, possibly with shardings) restores each leaf to
    the right dtype/placement; without it, leaves restore as saved."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    if like is None:
        return ckpt.restore(path)
    targets = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape") else x, like)
    return ckpt.restore(path, targets)


def save_sdxl(path: str, params) -> None:
    """Save an SDXLParams NamedTuple as one checkpoint."""
    save_pytree(path, params._asdict())


def load_sdxl(path: str):
    from omg_tpu.pipelines.sdxl import SDXLParams
    return SDXLParams(**load_pytree(path))
