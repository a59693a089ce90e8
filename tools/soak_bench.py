"""On-chip mixed-load serving soak: concurrent classes through OMGServer.

The chip-run counterpart of tests/test_soak.py (VERDICT r4 item 6): N
concurrent HTTP requests mixing serving classes — exact euler, DeepCache
interval-3 front-schedule, and a gate-miss (stage-1-only) job — against
ONE server at real SDXL geometry. Asserts per-response stage-2 status
and cross-request isolation (distinct seeds -> distinct images), and
records per-class p50/p95 client latency plus queue metrics.

Program note: the class mix is chosen so every jit key is one the
persistent compilation cache already holds from the bench/serve_bench
runs (exact single + batch-2, dc3-front single) — a cold run compiles
~4 min per program first.

Usage (real chip): python tools/soak_bench.py
Env: OMG_SOAK_REPS (default 1), OMG_SOAK_SIZE=tiny for a CPU smoke run.
"""

import hashlib
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from serve_bench import _free_port, make_strip_provider  # noqa: E402


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

    size = os.environ.get("OMG_SOAK_SIZE", "sdxl")
    if size == "tiny":
        jax.config.update("jax_platforms", "cpu")
        cfg = sdxl.tiny_config()
        H = W = 32
        steps = 2
    else:
        cfg = sdxl.sdxl_config()
        H = W = 1024
        steps = 50
    reps = int(os.environ.get("OMG_SOAK_REPS", "1"))

    params = sdxl.init_params(jax.random.PRNGKey(0), cfg)
    provider = make_strip_provider({"n": 0})
    engine = omg_lib.OMG(cfg=cfg, params=params, tokenizer=ToyTokenizer(),
                         tokenizer_2=ToyTokenizer(), mask_provider=provider,
                         num_steps=steps)
    srv = OMGServer(engine, Registry(), max_batch=2)
    port = _free_port()
    threading.Thread(target=srv.serve, args=("127.0.0.1", port),
                     daemon=True).start()
    time.sleep(0.5)
    url = f"http://127.0.0.1:{port}"

    rewrite = "[photo of a man]-*-[ugly]|[photo of a woman]-*-[ugly]"

    def jobs():
        """(class, job, stage2_expected) — one storm's mixed mix."""
        gate = "a man and a woman at the beach"
        return [
            ("euler", {"prompt": gate + " 1", "prompt_rewrite": rewrite,
                       "seed": 101, "height": H, "width": W}, True),
            ("euler", {"prompt": gate + " 2", "prompt_rewrite": rewrite,
                       "seed": 102, "height": H, "width": W}, True),
            ("dc3front", {"prompt": gate + " 3", "prompt_rewrite": rewrite,
                          "seed": 103, "height": H, "width": W,
                          "cache_interval": 3,
                          "cache_schedule": "front"}, True),
            ("gate_miss", {"prompt": "two people at the beach",
                           "prompt_rewrite": rewrite, "seed": 104,
                           "height": H, "width": W}, False),
        ]

    def post(payload, timeout=3600.0):
        req = urllib.request.Request(
            url + "/generate", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())

    # warmup: compile/load every program the storm hits (single per
    # class; the concurrent drain also batches the two euler jobs)
    t0 = time.time()
    for cls, job, s2 in jobs():
        out = post(dict(job))
        assert out.get("stage2_ran") is s2, (cls, out.get("masks_found"))
    # multi-prompt warm of the batch-2 program the drain will use
    multi = dict(jobs()[0][1])
    multi["prompts"] = [multi.pop("prompt"), jobs()[1][1]["prompt"]]
    for r_ in post(multi)["results"]:
        assert r_.get("stage2_ran") is True
    warm_s = time.time() - t0
    print(f"warmup done ({warm_s:.1f} s)", flush=True)

    per_class: dict = {}
    digests: dict = {}
    for rep in range(reps):
        batch = jobs()
        results = [None] * len(batch)
        errors = [None] * len(batch)
        lat = [None] * len(batch)

        def one(i):
            try:
                t0 = time.time()
                results[i] = post(batch[i][1])
                lat[i] = time.time() - t0
            except Exception as e:
                errors[i] = e

        t0 = time.time()
        ts = [threading.Thread(target=one, args=(i,))
              for i in range(len(batch))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        storm_s = time.time() - t0
        bad = [(batch[i][0], e) for i, e in enumerate(errors) if e]
        assert not bad, bad
        for i, (cls, job, s2) in enumerate(batch):
            out = results[i]
            assert out["stage2_ran"] is s2, (cls, out.get("masks_found"))
            per_class.setdefault(cls, []).append(lat[i])
            digests[(rep, i)] = hashlib.sha256(
                out["image"].encode()).hexdigest()
        # isolation: distinct seeds/prompts -> distinct images
        row = [digests[(rep, i)] for i in range(len(batch))]
        assert len(set(row)) == len(row), "identical images across jobs"
        print(f"storm {rep}: {storm_s:.1f} s wall", flush=True)

    stats = {c: {"n": len(v),
                 "p50": round(float(np.percentile(v, 50)), 3),
                 "p95": round(float(np.percentile(v, 95)), 3)}
             for c, v in per_class.items()}

    with urllib.request.urlopen(url + "/metrics") as r:
        metrics = json.loads(r.read())
    # exactly one gate-miss per warmup + per storm
    assert metrics["counters"].get("stage2_skipped", 0) == 1 + reps, metrics
    with urllib.request.urlopen(url + "/healthz") as r:
        hz = json.loads(r.read())
    assert hz["ok"] and hz["queued"] == 0, hz

    record = {
        "what": "mixed-class concurrent serving soak through OMGServer "
                "over HTTP (euler exact x2 / DeepCache-3 front / "
                "gate-miss; per-response stage-2 status asserted, "
                "distinct-image isolation asserted)",
        "geometry": f"{H}x{W}", "steps": steps, "reps": reps,
        "warmup_s": round(warm_s, 1),
        "per_class_latency_s": stats,
        "metrics": metrics,
    }
    out_path = os.path.join(os.path.dirname(__file__), "bench_records",
                            f"r5_soak_http_{H}x{W}.json")
    if size == "sdxl":
        with open(out_path, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
        print(f"wrote {out_path}", flush=True)
    print(json.dumps({k: v for k, v in record.items() if k != "metrics"}),
          flush=True)


if __name__ == "__main__":
    main()
