"""TPU microbenchmarks: UNet step-time vs lane count, flash on/off.

Timing method per CLAUDE.md axon notes: chain ITERS steps inside one jit
(fori_loop) and fetch a scalar — block_until_ready alone can return
early through the tunnel.
"""
import os
import sys
sys.path.insert(0, "/root/repo")
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/omg_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from omg_tpu.models import unet as unet_lib
from omg_tpu.pipelines import sdxl

ITERS = int(os.environ.get("PROBE_ITERS", "8"))
H = W = 1024

cfg = sdxl.sdxl_config()
params = unet_lib.init_params(jax.random.PRNGKey(0), cfg.unet)
d = cfg.unet.cross_attention_dim
pdim = cfg.text_encoder_2.projection_dim


def unet_chain(b):
    embeds = jax.random.normal(jax.random.PRNGKey(1), (b, 77, d), cfg.unet.dtype)
    tembeds = jax.random.normal(jax.random.PRNGKey(2), (b, pdim), cfg.unet.dtype)
    tids = jnp.broadcast_to(sdxl.add_time_ids((H, W), (0, 0), (H, W)), (b, 6))
    x0 = jax.random.normal(jax.random.PRNGKey(3), (b, H // 8, W // 8, 4), cfg.unet.dtype)

    @jax.jit
    def run(p, x):
        def body(i, x):
            eps = unet_lib.apply(p, cfg.unet, x, jnp.int32(500) - i, embeds,
                                 text_embeds=tembeds, time_ids=tids)
            return x + 0.01 * eps.astype(x.dtype)
        x = jax.lax.fori_loop(0, ITERS, body, x)
        return jnp.sum(x[0, :1, :1, :1])
    return run, x0


def measure(name, b):
    if os.environ.get("PROBE_NO_FLASH") == "1":
        from omg_tpu.ops import flash_attention as fa
        fa.use_flash = lambda *a, **k: False
        name += "-noflash"
    run, x0 = unet_chain(b)
    t0 = time.time()
    float(run(params, x0))
    compile_s = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(run(params, x0))
        ts.append(time.time() - t0)
    step_ms = np.median(ts) / ITERS * 1000
    print(f"{name}: b={b} step={step_ms:.1f} ms/step "
          f"({step_ms / b:.1f} ms/lane), compile {compile_s:.0f}s", flush=True)
    return step_ms


if __name__ == "__main__":
    for b in [int(v) for v in sys.argv[1:]] or [2, 7, 8]:
        measure("unet", b)
# appended: env toggles used by ablation sweeps
