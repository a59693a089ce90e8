"""Benchmark: OMG 2-concept 1024x1024 50-step end-to-end generation.

Measures the reference's implicit headline workload (BASELINE.md): both
OMG stages (stage 1: 50-step base denoise with P2P control; stage 2:
50-step denoise with per-concept LoRA UNets fused after step 15) plus
the fp32 VAE decode, at SDXL-base geometry in bf16, on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "s", "vs_baseline": ...}
vs_baseline is (driver target 5 s) / measured — >1 beats the target.

Weights are randomly initialized (no checkpoints ship in this image);
compute cost is identical to converted weights.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    # Persistent compilation cache: the SDXL program takes minutes to
    # compile; cache hits make repeat bench runs start in seconds.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/omg_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp

    from omg_tpu.control import p2p
    from omg_tpu.diffusion import schedulers
    from omg_tpu.models import unet as unet_lib
    from omg_tpu.models import vae as vae_lib
    from omg_tpu.pipelines import multiconcept, sdxl

    size = os.environ.get("OMG_BENCH_SIZE", "sdxl")
    steps = int(os.environ.get("OMG_BENCH_STEPS", "50"))
    reps = int(os.environ.get("OMG_BENCH_REPS", "3"))

    if size == "tiny":
        cfg = sdxl.tiny_config()
        H = W = 32
    else:
        cfg = sdxl.sdxl_config()
        H = W = 1024
    # OMG_BENCH_H/OMG_BENCH_W: measure a non-square serving bucket
    # (serving/conditions.py RESOLUTIONS, e.g. H=1216 W=832) — same
    # workload at that canvas; the metric name records the geometry.
    H = int(os.environ.get("OMG_BENCH_H", H))
    W = int(os.environ.get("OMG_BENCH_W", W))
    geom = "1024" if (H, W) == (1024, 1024) else f"{H}x{W}"

    key = jax.random.PRNGKey(0)
    unet_params = unet_lib.init_params(key, cfg.unet)
    # Scan-packing trades ~2% steady-state latency for ~35% faster XLA
    # compiles (131s vs 202s fresh-cache) — good for serving startup,
    # off by default here where the headline metric is latency.
    if os.environ.get("OMG_BENCH_PACKED", "0") == "1":
        unet_params = unet_lib.pack_params(unet_params)
    # OPT-IN approximate serving mode: int8 W8A8 transformer GEMMs
    # (ops/quant.py). Default stays exact bf16 reference parity.
    quant_mode = os.environ.get("OMG_BENCH_QUANT", "")
    if quant_mode == "int8":
        from omg_tpu.ops.quant import quantize_unet_params
        unet_params = quantize_unet_params(unet_params)
    if os.environ.get("OMG_BENCH_NO_FLASH") == "1":    # A/B diagnostics
        from omg_tpu.ops import flash_attention as fa
        fa.use_flash = lambda *a, **k: False
    vae_params = vae_lib.init_params(jax.random.PRNGKey(1), cfg.vae)
    # OMG_BENCH_SCHED=lcm + OMG_BENCH_STEPS=8 measures the few-step
    # LCM-LoRA serving mode (diffusion/schedulers.py LCM consistency
    # schedule); default matches the reference workload (50-step Euler).
    sched_name = os.environ.get("OMG_BENCH_SCHED", "euler")
    sched = schedulers.make_schedule(sched_name, steps)
    # fusion gate scales with the step count like the engine does
    # (pipelines/omg.py): the reference's i > 15 of 50 steps = 30%
    from omg_tpu.control import regions as regions_lib
    fusion_start = round(steps * regions_lib.FUSION_START_STEP / 50)

    d = cfg.unet.cross_attention_dim
    p_dim = cfg.text_encoder_2.projection_dim or cfg.text_encoder_2.hidden_size
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    dt = cfg.unet.dtype
    ep = jax.random.normal(ks[0], (1, 77, d), dt)
    en = jax.random.normal(ks[1], (1, 77, d), dt)
    pp = jax.random.normal(ks[2], (1, p_dim), dt)
    pn = jax.random.normal(ks[3], (1, p_dim), dt)
    tids = sdxl.add_time_ids((H, W), (0, 0), (H, W))
    base = multiconcept.make_base_inputs(ep, pp, en, pn, tids, 7.5)
    concept = multiconcept.make_concept_inputs(ep, pp, en, pn, tids)
    ctl = p2p.P2PControl.build(["x", "x"], num_steps=steps,
                               self_replace_steps=0.4,
                               width=W // 32, height=H // 32)

    # Two concept LoRAs at rank 32 on every attention projection of the
    # mid block + deepest down/up blocks (realistic character-LoRA cost).
    def make_lora(seed):
        rng = np.random.default_rng(seed)
        rank = 32

        def leaf(dim_in, dim_out):
            return {
                "down": jnp.asarray(
                    rng.standard_normal((dim_in, rank)) * 0.01, dt),
                "up": jnp.asarray(
                    rng.standard_normal((rank, dim_out)) * 0.01, dt),
                "scale": jnp.asarray(0.8, jnp.float32),
            }

        def block(dim, ctx, depth):
            return {"attentions": [{"transformer_blocks": [
                {"attn1": {k: leaf(dim, dim) for k in
                           ("to_q", "to_k", "to_v", "to_out")},
                 "attn2": {"to_q": leaf(dim, dim),
                           "to_k": leaf(ctx, dim),
                           "to_v": leaf(ctx, dim),
                           "to_out": leaf(dim, dim)}}
                for _ in range(depth)]}]}

        chs = cfg.unet.block_out_channels
        depths = cfg.unet.transformer_layers_per_block
        return {"mid_block": block(chs[-1], d, depths[-1])}

    loras = (make_lora(10), make_lora(11))

    m = np.zeros((2, H // 8, W // 8), np.float32)
    m[0, :, : W // 16] = 1.0
    m[1, :, W // 16:] = 1.0
    masks = jnp.asarray(m)

    mode = os.environ.get("OMG_BENCH_MODE", "latency")
    # OMG_BENCH_DEEPCACHE=N: approximate mode — full UNet forward every
    # N-th step, attention-free branch-0 shallow resume otherwise
    # (models/unet.py:apply_shallow); 0 = exact. Works in both modes.
    # OMG_BENCH_DEEPCACHE_KIND=front: non-uniform placement — the same
    # NUMBER of full steps packed toward step 0
    # (multiconcept.deepcache_schedule; VERDICT r4 item 5).
    dc_interval = int(os.environ.get("OMG_BENCH_DEEPCACHE", "0"))
    dc_kind = os.environ.get("OMG_BENCH_DEEPCACHE_KIND", "uniform")

    def dc_spec_of(n: int, kind: str = dc_kind):
        """-> the static cache_interval value: 0 / int / schedule tuple."""
        if n <= 1:
            return 0
        if kind == "uniform":
            return n
        return multiconcept.deepcache_schedule(
            steps, n, kind=kind, fusion_start=fusion_start)

    dc_spec = dc_spec_of(dc_interval)

    if mode == "throughput":
        # Batched-request serving throughput: R independent generations
        # (own seed per request), vmapped CHUNK requests at a time. One
        # v5e is compute-saturated from ~2 in-flight requests (per-lane
        # step time is flat from b=2), and the R=4 single-program
        # two-stage faults the device (HBM pressure), so requests run
        # in sequential chunks of OMG_BENCH_CHUNK (default 2) — the same
        # policy the serving queue uses via max_batch.
        R = int(os.environ.get("OMG_BENCH_REQUESTS", "4"))
        chunk = max(1, min(R, int(os.environ.get("OMG_BENCH_CHUNK", "2"))))
        if R % chunk:
            # a remainder chunk would trace+compile the heavy two-stage
            # program a SECOND time at the smaller batch (~4 min at SDXL
            # size); round up — every request is real work and the rate
            # is reported over the actual count
            R = ((R + chunk - 1) // chunk) * chunk
            print(f"note: rounded requests up to {R} (multiple of "
                  f"chunk {chunk})", file=sys.stderr)
        keys = jax.random.split(jax.random.PRNGKey(5), R)
        lat0 = jax.vmap(lambda k: sdxl.prepare_latents(
            k, 1, H, W, sched, cfg.unet.dtype))(keys)

        # fp32 VAE decode default (reference parity); OMG_BENCH_VAE=bf16
        # halves decode memory/traffic for serving-style runs.
        vae_dtype = (jnp.bfloat16 if os.environ.get("OMG_BENCH_VAE") == "bf16"
                     else jnp.float32)

        # params must be jit ARGUMENTS: a closure would capture the 5 GB
        # weight pytree as baked-in constants (and break remote compile).
        # OMG_BENCH_CROP=strips composes the approximate strip mode with
        # this path (and with OMG_BENCH_SCHED=lcm — the highest-
        # throughput serving configuration); masks are strip-clipped
        # inside two_stage_latents.
        crop = os.environ.get("OMG_BENCH_CROP") == "strips"
        two_stage = jax.jit(jax.vmap(
            lambda up, l0, k: multiconcept.two_stage_latents(
                cfg, sched, up, l0, base, ctl,
                (concept, concept), tuple(loras), masks,
                fusion_start=fusion_start, noise_key=k,
                concept_crop=crop, cache_interval=dc_spec),
            in_axes=(None, 0, 0)))

        # decode only copy B (the deliverable) of each request, ONE
        # REQUEST AT A TIME: a batched fp32 decode materializes
        # [R, 1024, 1024, 512] fp32 upsample activations (~2.2 GB per
        # request) — the round-1 R=4 OOM. Sequential b=1 decodes cap the
        # VAE's live set at one request regardless of R.
        decode1 = jax.jit(
            lambda vp, l: sdxl.decode_latents.__wrapped__(
                cfg, vp, l, dtype=vae_dtype))

        def run():
            imgs = []
            for c0 in range(0, R, chunk):
                _, lat2 = two_stage(unet_params, lat0[c0:c0 + chunk],
                                    keys[c0:c0 + chunk])
                imgs += [decode1(vae_params, lat2[r, 1:2])
                         for r in range(lat2.shape[0])]
            for im in imgs:
                im.block_until_ready()
            # reliable barrier through the axon tunnel (scalar fetch)
            float(jnp.sum(imgs[-1][..., :1, :1, :1]))
            return imgs

        t0 = time.time()
        run()
        compile_s = time.time() - t0
        times = []
        for _ in range(reps):
            t0 = time.time()
            run()
            times.append(time.time() - t0)
        p50 = float(np.median(times))
        ipm = 60.0 * R / p50
        result = {
            "metric": f"omg_2concept_{geom}_{steps}step_images_per_min_chip",
            "value": round(ipm, 3),
            "unit": "images/min/chip",
            "vs_baseline": round(ipm / 12.0, 3),  # 12/min == 5 s/image
            "extra": {
                "requests": R, "chunk": chunk,
                "batch_seconds": round(p50, 3),
                "compile_s": round(compile_s, 1),
                "size": size, "steps": steps,
                "height": H, "width": W,
                "scheduler": sched_name,
                "concept_crop": "strips" if crop else None,
                "deepcache_interval": dc_interval if dc_interval > 1
                                      else None,
                "deepcache_kind": dc_kind if dc_interval > 1 else None,
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
            },
        }
        print(json.dumps(result))
        return

    # fp32 VAE decode is reference behavior (lora_pipeline.py:634-654);
    # OMG_BENCH_VAE=bf16 opts into the faster serving decode.
    vae_dtype = (jnp.bfloat16 if os.environ.get("OMG_BENCH_VAE") == "bf16"
                 else jnp.float32)

    def sync(x):
        # the axon tunnel's block_until_ready can return early for some
        # arrays; fetching a scalar to host is a reliable barrier.
        return float(jnp.sum(x[..., :1, :1, :1]))

    def one_generation(cache_interval=dc_spec, params=unet_params,
                       seed=5):
        t0 = time.time()
        lat1, cache = multiconcept.sample_stage1_cached(
            cfg, sched, params, key=jax.random.PRNGKey(seed),
            height=H, width=W, base_inputs=base,
            fusion_start=fusion_start, cache_interval=cache_interval)
        sync(lat1)
        t1 = time.time()
        lat2 = multiconcept.sample_stage2_resumed(
            cfg, sched, params, cache, base_inputs=base,
            controller=ctl, concept_inputs=[concept, concept],
            concept_loras=list(loras), masks=masks,
            fusion_start=fusion_start, cache_interval=cache_interval,
            # OMG_BENCH_CROP=strips: approximate mode — concept lanes on
            # vertical strips (multiconcept._denoise_mc_range_traj_cropped)
            concept_crop=(os.environ.get("OMG_BENCH_CROP") == "strips"))
        sync(lat2)
        t2 = time.time()
        img = sdxl.decode_latents(cfg, vae_params, lat2, dtype=vae_dtype)
        sync(img)
        t3 = time.time()
        return t1 - t0, t2 - t1, t3 - t2, (lat2, cache)

    # Warm-up / compile.
    t0 = time.time()
    *_, (lat2_w, cache_w) = one_generation()
    compile_s = time.time() - t0

    def psnr_db(a, b):
        mse = float(np.mean((np.asarray(a, np.float64)
                             - np.asarray(b, np.float64)) ** 2))
        return 99.0 if mse == 0 else float(10 * np.log10(255.0 ** 2 / mse))

    def drift_vs_exact(lat2_other):
        """Stage-2 latent MAE + decoded-pixel PSNR vs the exact run
        (same weights, same seed) — the in-repo drift bound for the
        approximate serving modes (VERDICT round-2 item 4)."""
        mae = float(np.mean(np.abs(
            np.asarray(lat2_w, np.float32) - np.asarray(lat2_other,
                                                        np.float32))))
        img_a = sdxl.decode_latents(cfg, vae_params, lat2_w[1:2],
                                    dtype=vae_dtype)
        img_b = sdxl.decode_latents(cfg, vae_params, lat2_other[1:2],
                                    dtype=vae_dtype)
        a8 = np.asarray((img_a * 255).astype(jnp.uint8))
        b8 = np.asarray((img_b * 255).astype(jnp.uint8))
        return {"stage2_latent_mae": round(mae, 5),
                "pixel_psnr_db": round(psnr_db(a8, b8), 2)}

    # Approximate-mode drift, measured live against this run's exact
    # latents (same weights/seed at this geometry). Defaults to the
    # cheap crop measurement; OMG_BENCH_DRIFT=crop,int8 adds the int8
    # one (a second ~19-min compile); =none skips. Results are cached
    # in tools/drift_measured.json so later default runs can embed
    # modes they did not recompute (with provenance).
    drift_cache_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools",
        "drift_measured.json")
    try:
        with open(drift_cache_path) as f:
            drift_cache = json.load(f)
    except Exception:
        drift_cache = {}
    # token list, not substring matching: "deepcache_front" must not
    # also select the uniform "deepcache" run (round-5 review)
    drift_modes = [s.strip() for s in
                   os.environ.get("OMG_BENCH_DRIFT", "crop").split(",")]
    # interval <= 1 compiles the exact program (use_cache needs > 1)
    # (drift caches are 1024^2 measurements — don't refresh them from a
    # non-square bucket run)
    exact_run = (quant_mode == "" and dc_interval <= 1
                 and os.environ.get("OMG_BENCH_CROP") != "strips"
                 and sched_name == "euler" and size == "sdxl"
                 and (H, W) == (1024, 1024))
    crop_drift = int8_drift = deepcache_drift = None
    if exact_run and "crop" in drift_modes and \
            multiconcept.crop_strips_ok(cfg, W // 8, 2):
        lat2_c = multiconcept.sample_stage2_resumed(
            cfg, sched, unet_params, cache_w, base_inputs=base,
            controller=ctl, concept_inputs=[concept, concept],
            concept_loras=list(loras), masks=masks,
            fusion_start=fusion_start, concept_crop=True)
        crop_drift = dict(drift_vs_exact(lat2_c), measured="live")
    if exact_run and "int8" in drift_modes:
        from omg_tpu.ops.quant import quantize_unet_params
        qparams = quantize_unet_params(unet_params)
        _, cache_q = multiconcept.sample_stage1_cached(
            cfg, sched, qparams, key=jax.random.PRNGKey(5),
            height=H, width=W, base_inputs=base,
            fusion_start=fusion_start)
        lat2_q = multiconcept.sample_stage2_resumed(
            cfg, sched, qparams, cache_q, base_inputs=base,
            controller=ctl, concept_inputs=[concept, concept],
            concept_loras=list(loras), masks=masks,
            fusion_start=fusion_start)
        int8_drift = dict(drift_vs_exact(lat2_q), measured="live")
        del qparams
    dcN = int(os.environ.get("OMG_BENCH_DEEPCACHE_N", "3"))
    deepcache_front_drift = None
    if exact_run and "deepcache" in drift_modes and dcN > 1:
        # same program/args as the measured run (one_generation keeps
        # the drift comparison in lockstep with what is benchmarked; the
        # extra VAE decode it does is ~0.5 s of a ~22 s run)
        *_, (lat2_d, _) = one_generation(cache_interval=dcN)
        deepcache_drift = dict(drift_vs_exact(lat2_d), interval=dcN,
                               measured="live")
    if exact_run and "deepcache_front" in drift_modes and dcN > 1:
        # the non-uniform schedule at the SAME full-step budget: its
        # drift vs exact, comparable head-to-head with the uniform row
        *_, (lat2_f, _) = one_generation(
            cache_interval=dc_spec_of(dcN, "front"))
        deepcache_front_drift = dict(drift_vs_exact(lat2_f), interval=dcN,
                                     kind="front", measured="live")
    # merge: live measurements refresh the cache; cached values fill in
    if crop_drift is None:
        crop_drift = drift_cache.get("crop_drift")
        if crop_drift:
            crop_drift = dict(crop_drift, measured="cached")
    if int8_drift is None:
        int8_drift = drift_cache.get("int8_drift")
        if int8_drift:
            int8_drift = dict(int8_drift, measured="cached")
    if deepcache_drift is None:
        deepcache_drift = drift_cache.get("deepcache_drift")
        if deepcache_drift:
            deepcache_drift = dict(deepcache_drift, measured="cached")
    if deepcache_front_drift is None:
        deepcache_front_drift = drift_cache.get("deepcache_front_drift")
        if deepcache_front_drift:
            deepcache_front_drift = dict(deepcache_front_drift,
                                         measured="cached")
    if exact_run and (crop_drift or int8_drift or deepcache_drift
                      or deepcache_front_drift):
        try:
            new_cache = dict(drift_cache)
            for k, v in (("crop_drift", crop_drift),
                         ("int8_drift", int8_drift),
                         ("deepcache_drift", deepcache_drift),
                         ("deepcache_front_drift", deepcache_front_drift)):
                if v and v.get("measured") == "live":
                    new_cache[k] = {kk: vv for kk, vv in v.items()
                                    if kk != "measured"}
                    new_cache[k]["device"] = str(jax.devices()[0])
            if new_cache != drift_cache:
                with open(drift_cache_path, "w") as f:
                    json.dump(new_cache, f, indent=2)
                    f.write("\n")
        except Exception:
            pass

    stage1_t, stage2_t, vae_t, times = [], [], [], []
    for _ in range(reps):
        s1, s2, dv, _ = one_generation()
        stage1_t.append(s1)
        stage2_t.append(s2)
        vae_t.append(dv)
        times.append(s1 + s2 + dv)
    p50 = float(np.median(times))

    # Peak HBM: runtime stats when the backend reports them; otherwise
    # compiled-program memory analysis of the two biggest programs
    # (stage-2 denoise + VAE decode) — the axon tunnel returns no
    # runtime memory stats (round-1 bench shipped null here).
    from omg_tpu.utils.profiling import device_memory_stats
    peak_gb, mem_source = None, None
    for v in device_memory_stats().values():
        if v.get("peak_bytes_in_use"):
            peak_gb = round(v["peak_bytes_in_use"] / 2 ** 30, 2)
            mem_source = "runtime"
    if peak_gb is None:
        try:
            from omg_tpu.control import regions as regions_lib
            from omg_tpu.utils.profiling import compiled_peak_bytes
            # lowering args mirror sample_stage2_resumed's call exactly so
            # the persistent compilation cache is hit (no fresh compile)
            boundary = min(fusion_start + 1, steps)
            if (os.environ.get("OMG_BENCH_CROP") == "strips"
                    or dc_interval > 1):
                raise RuntimeError("skip memory analysis in crop/deepcache "
                                   "modes (lowering args mirror the exact "
                                   "program)")
            progs = {
                "stage2": lambda: multiconcept._denoise_mc_range_traj.lower(
                    cfg, sched, unet_params, cache_w.latents,
                    cache_w.sched_state, cache_w.a_traj, base, ctl,
                    (concept, concept), tuple(loras), masks, i0=boundary,
                    fusion_start=fusion_start),
                "vae": lambda: sdxl.decode_latents.lower(
                    cfg, vae_params, lat2_w, dtype=vae_dtype),
            }
            peaks = {}
            for name, lower in progs.items():
                try:
                    peaks[name] = compiled_peak_bytes(lower().compile())
                except Exception:
                    pass
            if peaks:
                peak_gb = round(max(peaks.values()) / 2 ** 30, 2)
                mem_source = "memory_analysis:" + max(peaks, key=peaks.get)
        except Exception:
            pass

    target_s = 5.0  # driver north-star: 2-concept 1024^2 50-step < 5 s
    s1, s2 = float(np.median(stage1_t)), float(np.median(stage2_t))
    # v5e-8 projection — the <5 s target is a v5e-8 figure (BASELINE.md);
    # one chip is GEMM-rate bound (PARITY.md §6). Round 3: the projection
    # comes from tools/v5e8_measured.json — per-chip shard timings
    # measured on THIS chip (tools/tpu_probe_v5e8.py) + per-step
    # collective bytes from the compiled 8-device HLO
    # (tools/collective_stats.py) over the published ICI spec; zero
    # assumed efficiency constants (tools/project_v5e8.py).
    v5e8_proj = None
    v5e8_note = "no measured projection (run tools/tpu_probe_v5e8.py + " \
                "tools/collective_stats.py + tools/project_v5e8.py)"
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "tools", "v5e8_measured.json")) as f:
            measured = json.load(f)
        v5e8_proj = measured["v5e8_projection_s"]
        v5e8_note = (measured.get("note", "")
                     + f"; stage1 {measured['stage1_s']}s + stage2 "
                       f"{measured['stage2_s']}s + vae/sam; collective "
                       f"overhead {measured['stage1_collective_ms']}/"
                       f"{measured['stage2_collective_ms']} ms/step; "
                       f"half-ICI sensitivity "
                       f"{measured.get('sensitivity_half_ici_s')}s")
    except Exception:
        pass
    result = {
        "metric": f"omg_2concept_{geom}_{steps}step_e2e_latency",
        "value": round(p50, 3),
        "unit": "s",
        "vs_baseline": round(target_s / p50, 3),
        "extra": {
            "compile_s": round(compile_s, 1),
            "times": [round(t, 3) for t in times],
            "stage1_s": round(float(np.median(stage1_t)), 3),
            "stage2_s": round(float(np.median(stage2_t)), 3),
            "vae_s": round(float(np.median(vae_t)), 3),
            "vae_dtype": "bf16" if vae_dtype == jnp.bfloat16 else "fp32",
            "quant": quant_mode or "none",
            "scheduler": sched_name,
            # canonical: records what RAN, not the raw env string (a
            # typo like "strip" must not label an exact run as cropped)
            "concept_crop": ("strips"
                             if os.environ.get("OMG_BENCH_CROP") == "strips"
                             else "none"),
            "deepcache_interval": dc_interval if dc_interval > 1
                                  else None,
            "deepcache_kind": dc_kind if dc_interval > 1 else None,
            "v5e8_projection_s": v5e8_proj,
            "v5e8_projection_note": v5e8_note,
            # approximate-mode drift vs this run's exact latents (same
            # weights/seed; "measured": "live" = computed this run,
            # "cached" = from tools/drift_measured.json)
            "crop_drift": crop_drift,
            "int8_drift": int8_drift,
            "deepcache_drift": deepcache_drift,
            "deepcache_front_drift": deepcache_front_drift,
            "size": size, "steps": steps,
            "height": H, "width": W,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "peak_hbm_gb": peak_gb,
            "peak_hbm_source": mem_source,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
