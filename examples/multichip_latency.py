"""Multi-chip latency mode: OMG(mesh=...) on a v5e-8 (or virtual) mesh.

The engine-level layout behind the < 5 s target (PARITY.md §6):
  * stage 1 — spatially sharded: the two CFG lanes over the mesh's
    data axis, the latent's H axis over the model axis; weights
    replicated; self-attention through the sequence-sharded flash
    kernel (local query block x all-gathered K/V).
  * stage 2 — lane-parallel: the 4+2K lane batch one-lane-per-chip,
    with the P2P row exchange as explicit ppermutes.

On real hardware just run with 8 visible TPU chips (or use the CLIs:
``omg-tpu-serve --mesh 8`` / ``omg-tpu-lora --mesh 8``). This example
is self-contained: it uses 8 VIRTUAL CPU devices and tiny random
weights so it runs anywhere:

    python examples/multichip_latency.py
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

import jax

jax.config.update("jax_platforms", "cpu")   # demo: virtual devices

import numpy as np

from omg_tpu.parallel import mesh as mesh_lib
from omg_tpu.pipelines import omg as omg_lib, sdxl
from omg_tpu.text.tokenizer import ToyTokenizer


def demo_mask_provider(image, cls):
    """Stand-in for the SAM+CLIP detector (segment.build_mask_provider):
    left half = first concept, right half = second."""
    m = np.zeros(image.shape[:2], np.float32)
    if cls == "man":
        m[:, : image.shape[1] // 2] = 1.0
    else:
        m[:, image.shape[1] // 2:] = 1.0
    return m


def main():
    # the latency mesh: (data, model) = (2, 4) — CFG lanes x H-shards
    mesh = mesh_lib.make_mesh(8, data=2)

    cfg = sdxl.tiny_config()   # real use: loader.load_sdxl(checkpoint)
    params = sdxl.init_params(jax.random.PRNGKey(0), cfg)
    engine = omg_lib.OMG(cfg=cfg, params=params,
                         tokenizer=ToyTokenizer(),
                         tokenizer_2=ToyTokenizer(),
                         mask_provider=demo_mask_provider,
                         num_steps=4, mesh=mesh)

    result = engine.generate(
        "photo of the man and woman",
        prompt_rewrite="[the chris man]-*-[ugly]|[the taylor woman]-*-"
                       "[ugly]",
        seed=14, height=32, width=32)
    print("stage1", result.stage1.shape, "stage2",
          None if result.stage2 is None else result.stage2.shape,
          "image", result.image.shape)


if __name__ == "__main__":
    main()
