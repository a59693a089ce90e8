"""Sub-block microbenchmarks: pinpoint the MFU gap inside a transformer
block and a resnet at SDXL shapes (b=8).

Speed-of-light references (v5e, 197 TFLOP/s bf16), per call at b=8:
  ff geglu d=1280 N=1024:   24*N*d^2*8 FLOP = 3.22e11 -> 1.64 ms
  attn1 qkvo d=1280:        8*N*d^2*8 + sdpa                ~0.55+0.44 ms
  conv3x3 1280@32^2:        2*9*1024*1280^2*8 = 2.42e11 -> 1.23 ms
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/omg_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from omg_tpu.models import unet as unet_lib
from omg_tpu.nn import layers, attention
from omg_tpu.config import UNetConfig

ITERS = int(os.environ.get("PROBE_ITERS", "30"))
B = int(os.environ.get("PROBE_B", "8"))
cfg = UNetConfig()
dt = cfg.dtype
key = jax.random.PRNGKey(0)


def timeit(name, fn, p, x, flops=None):
    @jax.jit
    def run(p, x):
        def body(i, x):
            return fn(p, x) * 0.999
        x = jax.lax.fori_loop(0, ITERS, body, x)
        return jnp.sum(x.reshape(-1)[:1])
    t0 = time.time(); float(run(p, x)); c = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time(); float(run(p, x)); ts.append(time.time() - t0)
    ms = np.median(ts) / ITERS * 1000
    mfu = f" mfu={flops / (ms / 1e3) / 197e12 * 100:.0f}%" if flops else ""
    print(f"{name}: {ms:.3f} ms{mfu} (compile {c:.0f}s)", flush=True)
    return ms


def norm_p(dim):
    return layers.init_norm(dim, dt)


# ---- d=1280, N=1024 transformer internals ----
d, N = 1280, 1024
x = jax.random.normal(key, (B, N, d), dt)
ctxt = jax.random.normal(key, (B, 77, 2048), dt)

blk = unet_lib._init_transformer_block(key, d, 2048, 64, dt)

timeit("ff_geglu_1280", lambda p, x: layers.linear(
    p["ff"]["net_2"], layers.geglu(p["ff"]["net_0_proj"], x)), blk, x,
    flops=24 * N * d * d * B)
timeit("attn1_1280", lambda p, x: attention.mha(
    p["attn1"], x, num_heads=20), blk, x,
    flops=(8 * N * d * d + 4 * N * N * d) * B)
timeit("attn2_1280", lambda p, x: attention.mha(
    p["attn2"], x, num_heads=20, context=ctxt), blk, x,
    flops=(4 * N * d * d + 2 * 77 * 2048 * d * 2 + 4 * N * 77 * d) * B)
timeit("ln_1280x3", lambda p, x: layers.layer_norm(
    p["norm3"], layers.layer_norm(
        p["norm2"], layers.layer_norm(p["norm1"], x))), blk, x)
timeit("block_1280_full", lambda p, x: unet_lib._transformer_block(
    p, x, unet_lib._AttnCtx(ctxt, None, None, None, 1.0, None), 64, None),
    blk, x, flops=(36 * N * d * d + 4 * N * N * d
                   + 2 * 77 * 2048 * d * 2 + 4 * N * 77 * d) * B)

# ---- d=640, N=4096 ----
d2, N2 = 640, 4096
x2 = jax.random.normal(key, (B, N2, d2), dt)
blk2 = unet_lib._init_transformer_block(key, d2, 2048, 64, dt)
timeit("ff_geglu_640", lambda p, x: layers.linear(
    p["ff"]["net_2"], layers.geglu(p["ff"]["net_0_proj"], x)), blk2, x2,
    flops=24 * N2 * d2 * d2 * B)
timeit("attn1_640", lambda p, x: attention.mha(
    p["attn1"], x, num_heads=10), blk2, x2,
    flops=(8 * N2 * d2 * d2 + 4 * N2 * N2 * d2) * B)
timeit("attn2_640", lambda p, x: attention.mha(
    p["attn2"], x, num_heads=10, context=ctxt), blk2, x2,
    flops=(4 * N2 * d2 * d2 + 2 * 77 * 2048 * d2 * 2 + 4 * N2 * 77 * d2) * B)
timeit("block_640_full", lambda p, x: unet_lib._transformer_block(
    p, x, unet_lib._AttnCtx(ctxt, None, None, None, 1.0, None), 64, None),
    blk2, x2, flops=(36 * N2 * d2 * d2 + 4 * N2 * N2 * d2) * B)

# ---- resnet internals at the three geometries ----
temb = jax.random.normal(key, (B, 1280), dt)
for ch, hw in ((1280, 32), (640, 64), (320, 128)):
    rp = unet_lib._init_resnet(key, ch, ch, 1280, 32, dt)
    xr = jax.random.normal(key, (B, hw, hw, ch), dt)
    timeit(f"conv3x3_{ch}@{hw}", lambda p, x: layers.conv2d(p["conv1"], x),
           rp, xr, flops=2 * 9 * hw * hw * ch * ch * B)
    timeit(f"gn_{ch}@{hw}", lambda p, x: layers.group_norm(
        p["norm1"], x, num_groups=32), rp, xr)
    timeit(f"resnet_{ch}@{hw}", lambda p, x: unet_lib._resnet(
        p, x, temb, 32), rp, xr, flops=2 * 2 * 9 * hw * hw * ch * ch * B)
