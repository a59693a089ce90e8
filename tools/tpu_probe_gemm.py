"""Raw ceilings on this chip: bf16 GEMM MFU at UNet shapes, int8 MXU
speed, geglu formulations, conv. The loop carry consumes a full-tensor
reduction of each output so XLA cannot slice-narrow or DCE the op
(a previous version fed only out[0,0] back — XLA rewrote the GEMM into
a dot product and reported >100% MFU)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/omg_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

ITERS = int(os.environ.get("PROBE_ITERS", "30"))
key = jax.random.PRNGKey(0)
PEAK = 197e12


def timeit(name, fn, args, flops=None, peak=PEAK, feedback=None):
    """fn(*args) -> y. Carry update: x += feedback(y) (a full reduction
    of y broadcast back onto x) so y must be fully computed each iter."""
    if feedback is None:
        def feedback(y, x):
            # mean over all but the first axis -> [M, 1...] broadcast to x
            m = y.astype(jnp.float32).mean(
                axis=tuple(range(1, y.ndim)), keepdims=True)
            return (m * 1e-6).astype(x.dtype)

    @jax.jit
    def run(*args):
        def body(i, x):
            y = fn(x, *args[1:])
            # cast back: int8 carries promote under the 0.999 decay and
            # a carry-dtype mismatch kills the fori_loop
            return (x * 0.999 + feedback(y, x)).astype(x.dtype)
        x = jax.lax.fori_loop(0, ITERS, body, args[0])
        return jnp.sum(x.astype(jnp.float32).reshape(-1)[:4])
    t0 = time.time(); float(run(*args)); c = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time(); float(run(*args)); ts.append(time.time() - t0)
    ms = np.median(ts) / ITERS * 1000
    note = f" mfu={flops / (ms / 1e3) / peak * 100:.0f}%" if flops else ""
    print(f"{name}: {ms:.3f} ms{note} (compile {c:.0f}s)", flush=True)
    return ms


bf = jnp.bfloat16

for (M, K, N) in [(8192, 1280, 10240), (8192, 5120, 1280),
                  (8192, 1280, 3840), (8192, 1280, 1280),
                  (32768, 640, 5120), (32768, 2560, 640),
                  (7168, 1280, 10240), (1024, 1280, 10240)]:
    x = jax.random.normal(key, (M, K), bf)
    w = jax.random.normal(key, (K, N), bf)
    timeit(f"gemm_{M}x{K}x{N}", lambda x, w: jnp.dot(x, w), (x, w),
           flops=2 * M * K * N)

# --- int8 GEMM (v5e MXU: 394 TOPS) ---
try:
    xi = jax.random.randint(key, (8192, 1280), -127, 127, jnp.int8)
    wi = jax.random.randint(key, (1280, 10240), -127, 127, jnp.int8)

    def fb_int8(y, x):
        m = (y.sum(axis=1, keepdims=True) % 3).astype(jnp.int8)
        return m

    timeit("int8gemm_8192x1280x10240",
           lambda x, w: jax.lax.dot_general(
               x, w, (((1,), (0,)), ((), ())),
               preferred_element_type=jnp.int32),
           (xi, wi), flops=2 * 8192 * 1280 * 10240, peak=394e12,
           feedback=fb_int8)
except Exception as e:
    print("int8 GEMM failed:", type(e).__name__, str(e)[:300], flush=True)

# --- mixed int8 weights x bf16 activations (weight-only quant) ---
try:
    x = jax.random.normal(key, (8192, 1280), bf)
    wi8 = jax.random.randint(key, (1280, 10240), -127, 127, jnp.int8)
    timeit("w8a16_gemm", lambda x, w: jnp.dot(x, w.astype(bf)), (x, wi8),
           flops=2 * 8192 * 1280 * 10240)
except Exception as e:
    print("w8a16 failed:", type(e).__name__, str(e)[:200], flush=True)

# --- dynamic-quant W8A8 end-to-end (quantize act, int8 GEMM, dequant) ---
try:
    x = jax.random.normal(key, (8192, 1280), bf)
    wi = jax.random.randint(key, (1280, 10240), -127, 127, jnp.int8)
    sw = jax.random.normal(key, (1, 10240), jnp.float32) * 0.01

    def w8a8(x, w, sw):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                       keepdims=True)
        sx = amax / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127,
                      127).astype(jnp.int8)
        y = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * sx * sw).astype(bf)

    timeit("w8a8_dynamic_gemm", w8a8, (x, wi, sw),
           flops=2 * 8192 * 1280 * 10240, peak=394e12)
except Exception as e:
    print("w8a8 failed:", type(e).__name__, str(e)[:300], flush=True)

# --- geglu formulations at d=1280 ---
x = jax.random.normal(key, (8192, 1280), bf)
w = jax.random.normal(key, (1280, 10240), bf)
w2 = jax.random.normal(key, (5120, 1280), bf)


def geglu_fat(x, w, w2):
    h = jnp.dot(x, w)
    a, g = jnp.split(h, 2, axis=-1)
    return jnp.dot(a * jax.nn.gelu(g, approximate=False), w2)


def geglu_two(x, w, w2):
    a = jnp.dot(x, w[:, :5120])
    g = jnp.dot(x, w[:, 5120:])
    return jnp.dot(a * jax.nn.gelu(g, approximate=False), w2)


timeit("geglu_fat", geglu_fat, (x, w, w2), flops=2 * 8192 * 1280 * 15360)
timeit("geglu_two", geglu_two, (x, w, w2), flops=2 * 8192 * 1280 * 15360)

# --- conv 3x3 1280@32^2 b=8 ---
xc = jax.random.normal(key, (8, 32, 32, 1280), bf)
wc = jax.random.normal(key, (3, 3, 1280, 1280), bf)
timeit("conv3x3_lax", lambda x, w: jax.lax.conv_general_dilated(
    x, w, (1, 1), ((1, 1), (1, 1)),
    dimension_numbers=("NHWC", "HWIO", "NHWC")), (xc, wc),
    flops=2 * 9 * 8 * 1024 * 1280 * 1280)

# --- attention qkvo chain (no sdpa) at d=1280, N=1024, b=8 ---
xa = jax.random.normal(key, (8, 1024, 1280), bf)
wqkv = jax.random.normal(key, (1280, 3840), bf)
wo = jax.random.normal(key, (1280, 1280), bf)


def qkvo(x, wqkv, wo):
    q, k, v = jnp.split(jnp.dot(x, wqkv), 3, axis=-1)
    b, n, _ = q.shape
    qh = q.reshape(b, n, 20, 64).transpose(0, 2, 1, 3)
    kh = k.reshape(b, n, 20, 64).transpose(0, 2, 1, 3)
    vh = v.reshape(b, n, 20, 64).transpose(0, 2, 1, 3)
    o = (qh * 0.5 + kh * 0.25 + vh * 0.25)   # stand-in for sdpa
    o = o.transpose(0, 2, 1, 3).reshape(b, n, 1280)
    return jnp.dot(o, wo)


timeit("qkvo_noattn", qkvo, (xa, wqkv, wo),
       flops=2 * 8 * 1024 * 1280 * (3840 + 1280))
