"""On-chip serving-STACK benchmark: requests through the real OMGServer.

bench.py's throughput mode times the bare compute (direct
multiconcept.two_stage_latents calls, pre-built embeddings, final-image
decode only). This tool times the same 2-concept 50-step workload
through the full serving stack instead — HTTP, JSON, queue +
microbatched drain, CLIP text encode, stage-1 decode + host mask
provider, fp32 VAE decodes, PNG encode — i.e. what a client actually
observes (role of the reference's gradio serve loop,
/root/reference/gradio_demo/app.py:359-473, which serves strictly
serially; ours microbatches).

Weights are random at real SDXL geometry (no checkpoints in this
image); the mask provider is a host-instant strip stub, so SAM's
179 ms encode (PARITY §6) is the one serving cost not included.

STAGE-2 INTEGRITY (round-4 post-mortem): the engine's
reference-faithful token gate (pipelines/omg.py _token_in_prompt,
mirroring inference_lora.py:276-283) runs mask prediction only when
the class words appear in the GLOBAL prompt. Round 4's prompt lacked
"man"/"woman", so every request silently measured stage 1 only and the
recorded img/min exceeded the bare-compute two-stage ceiling. This
version (a) uses gate-word prompts, (b) counts mask-provider calls and
asserts they happened, (c) asserts every response reports
stage2_ran=true, and (d) sanity-checks throughput against the
bare-compute ceiling (a serving stack cannot beat its own compute).

Measures:
  1. single-request latency through the server (client wall seconds)
  2. multi-prompt throughput: ONE POST with R prompts -> submit_many
     -> microbatched chunks of max_batch (default 2, the same no-OOM
     chunk policy bench.py uses) -> img/min/chip
  3. R concurrent single-request POSTs (queue-drain batching path)

Usage (real chip):  python tools/serve_bench.py
Env: OMG_SERVE_R (default 4), OMG_SERVE_CHUNK (2), OMG_SERVE_REPS (2),
     OMG_SERVE_SIZE=tiny for a CPU smoke run.
"""

import json
import os
import socket
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# bench.py OMG_BENCH_MODE=throughput, round-2 chip measurement: the
# bare-compute two-stage 2-concept 50-step ceiling. Serving throughput
# through the same engine CANNOT exceed this; round 4's invalid record
# did (7.46), which is how the stage-1-only bug should have been caught.
BARE_COMPUTE_CEILING_IPM = 2.70


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def make_strip_provider(counter: dict):
    """Host-instant deterministic strip-mask stub shared by the serving
    benchmarks (detection itself is measured separately: SAM xl1 encode
    179 ms + decode 6.6 ms, PARITY §6). Deterministic side per class —
    NOT hash(cls), which is PYTHONHASHSEED-randomized across processes
    (ADVICE round 4). ``counter["n"]`` counts calls so benches can
    assert the token gate actually fired."""
    import numpy as np

    def provider(image, cls):
        counter["n"] += 1
        m = np.zeros(image.shape[:2], np.float32)
        if cls == "man":
            m[:, : image.shape[1] // 2] = 1.0
        else:
            m[:, image.shape[1] // 2:] = 1.0
        return m

    return provider


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/omg_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import numpy as np

    from omg_tpu.pipelines import omg as omg_lib
    from omg_tpu.pipelines import sdxl
    from omg_tpu.serving.registry import Registry
    from omg_tpu.serving.server import OMGServer
    from omg_tpu.text.tokenizer import ToyTokenizer

    size = os.environ.get("OMG_SERVE_SIZE", "sdxl")
    if size == "tiny":
        jax.config.update("jax_platforms", "cpu")
        cfg = sdxl.tiny_config()
        H = W = 32
        steps = 2
    else:
        cfg = sdxl.sdxl_config()
        H = W = 1024
        steps = 50
    R = int(os.environ.get("OMG_SERVE_R", "4"))
    chunk = int(os.environ.get("OMG_SERVE_CHUNK", "2"))
    reps = int(os.environ.get("OMG_SERVE_REPS", "2"))
    # OMG_SERVE_DEEPCACHE=N (+ OMG_SERVE_DEEPCACHE_KIND=front): measure
    # the approximate serving configuration through the same HTTP path.
    # The ceiling check below only applies to the exact mode.
    dc = int(os.environ.get("OMG_SERVE_DEEPCACHE", "0"))
    dc_kind = os.environ.get("OMG_SERVE_DEEPCACHE_KIND", "front")

    params = sdxl.init_params(jax.random.PRNGKey(0), cfg)

    provider_calls = {"n": 0}
    provider = make_strip_provider(provider_calls)

    engine = omg_lib.OMG(cfg=cfg, params=params, tokenizer=ToyTokenizer(),
                         tokenizer_2=ToyTokenizer(), mask_provider=provider,
                         num_steps=steps)
    srv = OMGServer(engine, Registry(), max_batch=chunk)
    port = _free_port()
    threading.Thread(target=srv.serve, args=("127.0.0.1", port),
                     daemon=True).start()
    time.sleep(0.5)
    url = f"http://127.0.0.1:{port}/generate"

    def post(payload: dict, timeout: float = 3600.0) -> dict:
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())

    def check_stage2(out: dict) -> dict:
        """Every timed request must have run the FULL two-stage
        workload: both masks found, stage 2 executed."""
        assert out.get("stage2_ran") is True, \
            f"stage 2 did not run: {out.get('masks_found')}"
        assert out.get("masks_found") == [True, True], out.get("masks_found")
        return out

    rewrite = "[photo of a man]-*-[ugly]|[photo of a woman]-*-[ugly]"

    def job(i: int) -> dict:
        # the global prompt MUST contain the gate words "man"/"woman"
        # (pipelines/omg.py:_token_in_prompt) or mask prediction — and
        # with it all of stage 2 — is skipped (reference semantics,
        # inference_lora.py:276-283)
        out = {"prompt": f"a man and a woman at the beach {i}",
               "prompt_rewrite": rewrite, "seed": 100 + i,
               "height": H, "width": W}
        if dc > 1:
            out["cache_interval"] = dc
            out["cache_schedule"] = dc_kind
        return out

    multi = dict(job(0), prompts=[f"a man and a woman at the beach {i}"
                                  for i in range(R)])
    del multi["prompt"]

    # ---- warmup: compile every program the timed rounds will hit
    t0 = time.time()
    check_stage2(post(job(0)))
    t_compile_single = time.time() - t0
    assert provider_calls["n"] >= 2, \
        "mask provider was never called — the token gate skipped stage 2"
    print(f"warmup single done ({t_compile_single:.1f} s)", flush=True)
    t0 = time.time()
    warm = post(multi)
    for r_ in warm["results"]:
        check_stage2(r_)
    t_compile_multi = time.time() - t0
    print(f"warmup multi done ({t_compile_multi:.1f} s)", flush=True)

    # ---- 1. single-request latency
    lat = []
    for _ in range(reps):
        t0 = time.time()
        out = check_stage2(post(job(1)))
        lat.append(time.time() - t0)
        server_s = out["seconds"]
    lat_s = min(lat)
    print(f"single-request client latency {lat_s:.2f} s "
          f"(server-measured {server_s:.2f} s)", flush=True)

    # ---- 2. multi-prompt throughput (one POST, R prompts, chunks of
    # max_batch via submit_many)
    tp = []
    for _ in range(reps):
        t0 = time.time()
        out = post(multi)
        tp.append(time.time() - t0)
        assert len(out["results"]) == R
        for r_ in out["results"]:
            check_stage2(r_)
    tp_s = min(tp)
    tp_ipm = R / tp_s * 60.0
    print(f"multi-prompt R={R} chunk={chunk}: {tp_s:.2f} s "
          f"-> {tp_ipm:.2f} img/min/chip", flush=True)

    # ---- 3. R concurrent single-request POSTs (queue-drain batching)
    conc = []
    for _ in range(reps):
        results = [None] * R
        errors = [None] * R

        def one(i):
            # a failed request must fail the RUN, not die silently in
            # its thread with the throughput recorded as if it
            # completed (ADVICE round 4)
            try:
                t0 = time.time()
                check_stage2(post(job(i)))
                results[i] = time.time() - t0
            except Exception as e:
                errors[i] = e

        t0 = time.time()
        ts = [threading.Thread(target=one, args=(i,)) for i in range(R)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        bad = [e for e in errors if e is not None]
        assert not bad, f"{len(bad)}/{R} concurrent requests failed: {bad[0]}"
        assert all(r is not None for r in results)
        conc.append(time.time() - t0)
    conc_s = min(conc)
    conc_ipm = R / conc_s * 60.0
    print(f"concurrent R={R} POSTs: {conc_s:.2f} s "
          f"-> {conc_ipm:.2f} img/min/chip", flush=True)

    # a serving stack cannot out-run its own bare compute: img/min above
    # the measured two-stage compute ceiling means part of the workload
    # silently did not run (exactly round 4's failure mode)
    if size == "sdxl":
        # the exact mode's ceiling; DeepCache front-3's measured
        # bare-compute rate is 7.54 img/min (r5_throughput_deepcache3_
        # front_R4.json) — use the ceiling matching what ran
        ceiling = BARE_COMPUTE_CEILING_IPM if dc <= 1 else (
            7.54 if (dc, dc_kind) == (3, "front") else None)
        if ceiling is not None:
            for name, ipm in (("multi_prompt", tp_ipm),
                              ("concurrent", conc_ipm)):
                assert ipm <= ceiling * 1.05, (
                    f"{name} throughput {ipm:.2f} img/min exceeds the "
                    f"bare-compute ceiling {ceiling} — "
                    f"part of the workload did not run")

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics") as r:
        metrics = json.loads(r.read())
    assert not metrics.get("counters", {}).get("stage2_skipped"), metrics

    mode_tag = f"_deepcache{dc}_{dc_kind}" if dc > 1 else ""
    record = {
        "what": "serving-stack throughput through OMGServer over HTTP "
                "(2-concept TWO-STAGE, euler, random weights, "
                "strip-stub masks; every response verified "
                "stage2_ran=true)"
                + (f"; DeepCache interval {dc} {dc_kind}" if dc > 1
                   else ""),
        "geometry": f"{H}x{W}", "steps": steps, "requests": R,
        "max_batch": chunk, "reps": reps,
        "warmup_single_s": round(t_compile_single, 2),
        "warmup_multi_s": round(t_compile_multi, 2),
        "single_request_latency_s": round(lat_s, 3),
        "single_request_server_s": round(server_s, 3),
        "multi_prompt_wall_s": round(tp_s, 3),
        "multi_prompt_img_per_min_chip": round(tp_ipm, 3),
        "concurrent_wall_s": round(conc_s, 3),
        "concurrent_img_per_min_chip": round(conc_ipm, 3),
        "mask_provider_calls": provider_calls["n"],
        "bare_compute_ceiling_ipm": BARE_COMPUTE_CEILING_IPM,
        "metrics": metrics,
        "note": "compare vs bench.py OMG_BENCH_MODE=throughput "
                "(bare compute, 2.70 img/min/chip round-2): the delta "
                "is the serving stack (text encode, stage-1 decode + "
                "mask provider, extra fp32 decodes, PNG, HTTP/queue). "
                "Replaces round 4's r4_serving_http record, which "
                "measured stage 1 only (its prompt lacked the "
                "man/woman gate words).",
    }
    out_path = os.path.join(os.path.dirname(__file__), "bench_records",
                            f"r5_serving_http{mode_tag}_{H}x{W}.json")
    if size == "sdxl":
        with open(out_path, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
        print(f"wrote {out_path}", flush=True)
    print(json.dumps({k: v for k, v in record.items()
                      if k not in ("metrics", "what", "note")}),
          flush=True)


if __name__ == "__main__":
    main()
