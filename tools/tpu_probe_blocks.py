"""Per-block microbenchmarks at SDXL shapes (b=8): where do the 470 ms go?

Counts per UNet forward: 6x depth-10 transformer @32^2/1280,
5x depth-2 transformer @64^2/640, resnets 7@32^2 + 5@64^2 + 5@128^2.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/omg_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from omg_tpu.models import unet as unet_lib
from omg_tpu.config import UNetConfig

ITERS = int(os.environ.get("PROBE_ITERS", "20"))
B = int(os.environ.get("PROBE_B", "8"))
cfg = UNetConfig()
dt = cfg.dtype
ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 77, 2048), dt)
temb = jax.random.normal(jax.random.PRNGKey(2), (B, 1280), dt)


def timeit(name, fn, p, x, count):
    # params are jit ARGUMENTS (closure constants bake into the remote
    # compile payload and blow the tunnel's request size limit)
    @jax.jit
    def run(p, x):
        def body(i, x):
            return fn(p, x) * 0.999
        x = jax.lax.fori_loop(0, ITERS, body, x)
        return jnp.sum(x[..., :1])
    t0 = time.time(); float(run(p, x)); c = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time(); float(run(p, x)); ts.append(time.time() - t0)
    ms = np.median(ts) / ITERS * 1000
    print(f"{name}: {ms:.2f} ms x{count} = {ms*count:.1f} ms/step "
          f"(compile {c:.0f}s)", flush=True)
    return ms * count


def transformer(dim, depth, hw):
    p = unet_lib._init_transformer(jax.random.PRNGKey(0), dim, depth, 2048, 64, 32, dt)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, hw, hw, dim), dt)
    def fn(p, x):
        c = unet_lib._AttnCtx(ctx, None, None, None, 1.0, None)
        return unet_lib._transformer(p, x, c, 64, 32, None)
    return fn, p, x


def resnet(ch, hw):
    p = unet_lib._init_resnet(jax.random.PRNGKey(0), ch, ch, 1280, 32, dt)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, hw, hw, ch), dt)
    return (lambda p, x: unet_lib._resnet(p, x, temb, 32)), p, x


total = 0
fn, p, x = transformer(1280, 10, 32); total += timeit("tfm32_d10", fn, p, x, 6)
fn, p, x = transformer(640, 2, 64);   total += timeit("tfm64_d2", fn, p, x, 5)
fn, p, x = resnet(1280, 32);          total += timeit("res32", fn, p, x, 7)
fn, p, x = resnet(640, 64);           total += timeit("res64", fn, p, x, 5)
fn, p, x = resnet(320, 128);          total += timeit("res128", fn, p, x, 5)
print(f"sum of parts: {total:.0f} ms/step (measured full step: ~470 ms)")
