"""Device-mesh construction for OMG serving.

The reference has no live parallelism (SURVEY.md §2.3): inference pins a
single CUDA device, and its only distributed mechanism is shuttling
latents between the base-pipe device and the concept-pipe device every
step (reference: src/pipelines/lora_pipeline.py:583,601,605 via
``.to(concept_models._execution_device)``). The TPU-native equivalents:

  * ``data`` axis — independent requests/seeds per chip (the serving
    axis the reference covers by launching processes per GPU).
  * ``model`` axis — Megatron-style tensor parallelism inside each UNet
    forward: column-sharded q/k/v/ff-in projections, row-sharded
    out/ff-out projections; XLA/GSPMD inserts the psum over ICI.

The reference's cross-device base/concept placement becomes sharding the
fused lane batch (base + concept lanes run as one batched forward), so
the "transfer" is an on-device collective, not a host round-trip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, *,
              data: Optional[int] = None,
              model: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Default split: as much model parallelism as divides the device count
    by the requested data parallelism (data=1 unless given). On a v5e-8
    slice ``make_mesh(8, data=4)`` gives 4-way batch x 2-way tensor.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    if data is None and model is None:
        data, model = n_devices, 1
    elif data is None:
        data = n_devices // model
    elif model is None:
        model = n_devices // data
    if data * model != n_devices:
        raise ValueError(f"mesh {data}x{model} != {n_devices} devices")
    import numpy as np
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_latency_mesh(n: int) -> Mesh:
    """The v5e-8 LATENCY layout's mesh (shared by the serve/inference
    CLIs and OMG(mesh=...)): (data, model) = (2, n/2) when n is even.
    Stage 1 runs SPATIALLY sharded over it — the two CFG lanes on the
    data axis, the latent's H axis on the model axis (not head-TP:
    SDXL's 10/20 head counts don't divide a 4-way axis); stage 2 and
    the VAE decode re-view the same chips as a flat lane/H axis.
    Raises if fewer than n devices are visible."""
    visible = len(jax.devices())
    if visible < n:
        raise ValueError(f"latency mesh needs {n} devices; only "
                         f"{visible} visible")
    return make_mesh(n, data=2 if n % 2 == 0 else 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard a leading batch/request axis over the data axis."""
    spec = [None] * (axis + 1)
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))
