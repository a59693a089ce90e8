"""Measure every input of the v5e-8 latency projection on the real chip.

VERDICT round-2 item 1(a): the round-2 projection assumed two constants
(stage-1 "TP efficiency 0.6", stage-2 "+10% P2P overhead"). This probe
replaces them with measured quantities for the ACTUAL round-3 layout:

  * stage 1 — SPATIAL sharding (multiconcept._spatial_ctx): the two CFG
    lanes over 2 mesh rows, the latent's H axis over 4 mesh columns;
    weights replicated. Per-chip compute is measured directly as a
    PROXY FORWARD: the real SDXL UNet on a [1, 32, 128, 4] latent — the
    per-chip H-slab — whose per-level token counts (1024 at the 640-ch
    level, 256 at the 1280-ch level) and GEMM M-sizes equal the
    sharded program's exactly. Two corrections are measured on top:
      - self-attention per chip runs nq_local x nk_FULL (the proxy runs
        nq_local x nk_local): add the measured flash-kernel delta;
      - conv halo rows: upper-bounded by re-measuring the proxy with
        +2 halo rows per level (measured, not assumed).
  * stage 2 — lane-parallel (one lane per chip): per-chip compute is a
    measured b=1 full-frame UNet forward.
  * collective volumes come from tools/collective_stats.py (HLO of the
    actual compiled 8-device programs); ICI bandwidth is the published
    v5e spec — the projection's one non-measured input, labeled as such.

Writes tools/v5e8_probe.json; tools/project_v5e8.py combines it with
the collective stats into the projection bench.py reports.

Run on the TPU:  python tools/tpu_probe_v5e8.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/omg_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

ITERS = int(os.environ.get("PROBE_ITERS", "20"))
REPS = int(os.environ.get("PROBE_REPS", "3"))


def timeit(fn, *args):
    """Median ms/iter with a full-output feedback carry (XLA cannot
    slice-narrow or DCE the measured op — CLAUDE.md probe gotcha)."""

    @jax.jit
    def run(*a):
        def body(i, x):
            y = fn(x, *a[1:])
            m = y.astype(jnp.float32).mean(
                axis=tuple(range(1, y.ndim)), keepdims=True)
            return (x * 0.999 + (m * 1e-6).astype(x.dtype)).astype(x.dtype)
        x = jax.lax.fori_loop(0, ITERS, body, a[0])
        return jnp.sum(x.astype(jnp.float32).reshape(-1)[:4])

    t0 = time.time(); float(run(*args)); compile_s = time.time() - t0
    ts = []
    for _ in range(REPS):
        t0 = time.time(); float(run(*args)); ts.append(time.time() - t0)
    return float(np.median(ts)) / ITERS * 1000, compile_s


def main():
    from omg_tpu.models import unet as unet_lib
    from omg_tpu.ops import flash_attention as fa
    from omg_tpu.pipelines import multiconcept, sdxl

    cfg = sdxl.sdxl_config()
    key = jax.random.PRNGKey(0)
    params = unet_lib.init_params(key, cfg.unet)
    d = cfg.unet.cross_attention_dim
    pdim = cfg.text_encoder_2.projection_dim
    dt = cfg.unet.dtype
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    tids = sdxl.add_time_ids((1024, 1024), (0, 0), (1024, 1024))

    out = {"device": str(jax.devices()[0]),
           "backend": jax.default_backend(),
           "iters": ITERS}

    def unet_fwd_ms(b, h, w, tag, halo=0):
        """One UNet forward at latent [b, h(+halo), w, 4] — ms/step."""
        lat = jax.random.normal(key, (b, h + halo, w, 4), dt)
        ep = jax.random.normal(ks[0], (b, 77, d), dt)
        pp = jax.random.normal(ks[2], (b, pdim), dt)
        tid = jnp.broadcast_to(tids, (b, 6))
        t = jnp.asarray(500)

        def fwd(lat, ep, pp, tid, params):
            return unet_lib.apply(params, cfg.unet, lat, t, ep,
                                  text_embeds=pp, time_ids=tid)

        ms, c = timeit(fwd, lat, ep, pp, tid, params)
        out[tag] = round(ms, 3)
        print(f"{tag}: {ms:.2f} ms (compile {c:.0f}s)", flush=True)
        return ms

    # --- stage-1 per-chip proxy: the H/4 slab of one CFG lane ---------
    # full latent 128x128; per chip: 1 lane (b=1), 32 rows.
    unet_fwd_ms(1, 32, 128, "s1_chip_proxy_ms")
    # halo upper bound: +4 rows at the top level (the UNet needs H % 4
    # == 0; real halos are 1-2 rows per conv level, so 36 rows
    # over-counts — the safe side)
    unet_fwd_ms(1, 36, 128, "s1_chip_proxy_halo_ms")

    # --- seq-local attention corrections ------------------------------
    # proxy computed nq_local x nk_local; the sharded program computes
    # nq_local x nk_full. Measure both flash shapes; the delta times the
    # per-step layer count is the correction.
    #   640-ch level (64x64 full): h=10, nq 1024, nk 4096, 10 layers/step
    #   1280-ch level (32x32 full): h=20, nq 256, nk 1024, 60 layers/step
    for (tag, heads, nq, nk) in [("attn_640_local", 10, 1024, 1024),
                                 ("attn_640_full", 10, 1024, 4096),
                                 ("attn_1280_local", 20, 256, 256),
                                 ("attn_1280_full", 20, 256, 1024)]:
        q = jax.random.normal(key, (1, heads, nq, 64), dt)
        k = jax.random.normal(key, (1, heads, nk, 64), dt)
        v = jax.random.normal(key, (1, heads, nk, 64), dt)

        def att(q, k, v):
            return fa.flash_attention.__wrapped__(q, k, v)

        ms, c = timeit(att, q, k, v)
        out[tag + "_ms"] = round(ms, 4)
        print(f"{tag}: {ms:.3f} ms (compile {c:.0f}s)", flush=True)

    # --- stage-2 per-chip: one full-frame lane (b=1) -------------------
    unet_fwd_ms(1, 128, 128, "s2_chip_lane_ms")
    # reference points for the efficiency table
    unet_fwd_ms(2, 128, 128, "b2_full_ms")

    # layer counts the projection multiplies the attention deltas by
    out["attn_layers_640"] = 10   # 64x64-level self-attn layers/step
    out["attn_layers_1280"] = 60  # 32x32-level self-attn layers/step

    # --- VAE decode: full frame + per-chip H-slab (8-way spatial) -----
    from omg_tpu.models import vae as vae_lib
    from omg_tpu.pipelines import sdxl as sdxl_lib
    vae_params = vae_lib.init_params(jax.random.PRNGKey(1), cfg.vae)

    def vae_ms(b, h, w, tag):
        lat = jax.random.normal(key, (b, h, w, 4), jnp.float32)

        def dec(lat, vp):
            return sdxl_lib.decode_latents.__wrapped__(cfg, vp, lat)

        ms, c = timeit(dec, lat, vae_params)
        out[tag] = round(ms, 3)
        print(f"{tag}: {ms:.2f} ms (compile {c:.0f}s)", flush=True)

    vae_ms(2, 128, 128, "vae_full_ms")
    vae_ms(2, 16, 128, "vae_chip_slab_ms")
    # bottleneck-attention correction: the sharded decode's one
    # attention runs local-q (2048 tokens) x FULL 16384-token K/V;
    # the slab proxy ran local x local
    for tag, nq, nk in (("vae_attn_local", 2048, 2048),
                        ("vae_attn_full", 2048, 16384)):
        q = jax.random.normal(key, (2, 1, nq, 512), jnp.float32)
        kkv = jax.random.normal(key, (2, 1, nk, 512), jnp.float32)

        def att(q, k):
            from omg_tpu.nn.attention import sdpa
            return sdpa(q, k, k)

        ms, c = timeit(att, q, kkv)
        out[tag + "_ms"] = round(ms, 4)
        print(f"{tag}: {ms:.3f} ms (compile {c:.0f}s)", flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "v5e8_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
