"""Mixed concurrent load soak (VERDICT r4 item 6).

N concurrent POSTs mixing schedulers, DeepCache intervals/schedules,
aspect buckets, InstantID and plain jobs, and a gate-miss prompt —
through the real HTTP server and microbatched worker. Asserts:

  * no cross-request state bleed: every concurrent response matches the
    SAME job's serial single-run baseline (seed/mask/face mixups would
    show as large pixel deltas; the batched-vs-single numeric window is
    <=1 uint8 step, the bound the generate_batch equivalence tests pin),
  * stage-2 status per class (the gate-miss job reports
    stage2_ran=false; everything else true),
  * within-class seed isolation (distinct seeds -> distinct images),
  * the queue drains, the worker survives, and metrics are consistent,
  * per-class p50/p95 client latencies are recorded (printed).

This stresses the serving loop far beyond the reference's strictly
serial gradio queue (/root/reference/gradio_demo/app.py:359-473).
"""

import base64
import io
import json
import socket
import threading
import time
import urllib.request

import jax
import numpy as np
import pytest

from omg_tpu.pipelines import omg as omg_lib
from omg_tpu.pipelines import sdxl
from omg_tpu.serving.registry import Registry
from omg_tpu.serving.server import OMGServer
from omg_tpu.text.tokenizer import ToyTokenizer

H = W = 32


def _png_to_array(b64: str) -> np.ndarray:
    import PIL.Image
    return np.asarray(PIL.Image.open(io.BytesIO(base64.b64decode(b64))))


def _build_server():
    from omg_tpu import config as cfglib
    from omg_tpu.models import resampler as rs_lib
    from omg_tpu.models import unet as unet_lib
    from omg_tpu.nn.attention import init_ip_kv

    cfg = sdxl.tiny_config()
    params = sdxl.init_params(jax.random.PRNGKey(0), cfg)

    def provider(image, cls):
        m = np.zeros(image.shape[:2], np.float32)
        half = image.shape[1] // 2
        if cls == "man":
            m[:, :half] = 1.0
        else:
            m[:, half:] = 1.0
        return m

    engine = omg_lib.OMG(cfg=cfg, params=params, tokenizer=ToyTokenizer(),
                         tokenizer_2=ToyTokenizer(), mask_provider=provider,
                         num_steps=2)
    rs_cfg = cfglib.tiny_resampler()
    iid = omg_lib.InstantIDModels(
        resampler_cfg=rs_cfg,
        resampler_params=rs_lib.init_params(jax.random.PRNGKey(1), rs_cfg),
        ip_adapter_layers=[
            init_ip_kv(jax.random.PRNGKey(10 + i),
                       cfg.unet.cross_attention_dim, 64)
            for i in range(unet_lib.num_cross_attention_layers(cfg.unet))])
    srv = OMGServer(engine, Registry(), instantid=iid, max_batch=2,
                    max_queue=32)
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    threading.Thread(target=srv.serve, args=("127.0.0.1", port),
                     daemon=True).start()
    time.sleep(0.5)
    return srv, f"http://127.0.0.1:{port}"


def _jobs():
    """(class, job, stage2_expected) — mixed serving classes."""
    rw = "[the man]-*-[ugly]|[the woman]-*-[ugly]"
    gate = "the man and the woman here"
    kps = [[8, 8], [24, 8], [16, 14], [10, 22], [22, 22]]
    out = []
    for seed in (11, 12, 13):         # same class, distinct seeds
        out.append(("euler", {"prompt": gate, "prompt_rewrite": rw,
                              "seed": seed, "height": H, "width": W}, True))
    out.append(("lcm", {"prompt": gate, "prompt_rewrite": rw, "seed": 21,
                        "height": H, "width": W, "scheduler": "lcm"}, True))
    out.append(("dc2", {"prompt": gate, "prompt_rewrite": rw, "seed": 31,
                        "height": H, "width": W,
                        "cache_interval": 2}, True))
    out.append(("dc2front", {"prompt": gate, "prompt_rewrite": rw,
                             "seed": 32, "height": H, "width": W,
                             "cache_interval": 2,
                             "cache_schedule": "front"}, True))
    out.append(("bucket", {"prompt": gate, "prompt_rewrite": rw,
                           "seed": 41, "height": H, "width": 2 * W}, True))
    out.append(("gate_miss", {"prompt": "two people at the beach",
                              "prompt_rewrite": rw, "seed": 51,
                              "height": H, "width": W}, False))
    out.append(("instantid", {
        "prompt": gate, "prompt_rewrite": rw, "seed": 61,
        "height": H, "width": W,
        "face_embeddings": [
            list(np.random.RandomState(6).randn(16).astype(float)),
            list(np.random.RandomState(7).randn(16).astype(float))],
        "face_kps": [kps, kps]}, True))
    return out


def test_soak_mixed_concurrent_load():
    srv, url = _build_server()
    jobs = _jobs()

    # METRICS is a process-global singleton shared by every OMGServer —
    # in a full-suite run earlier serving tests have already counted
    # into it, so all assertions below are on DELTAS from here
    with urllib.request.urlopen(url + "/metrics") as r:
        before = json.loads(r.read())["counters"]

    # serial baselines (also warms every program the mix needs)
    baselines = []
    for _, job, s2 in jobs:
        out = srv.submit(dict(job))
        assert out["stage2_ran"] is s2, (job, out.get("masks_found"))
        baselines.append(_png_to_array(out["image"]))

    # within-class seed isolation on the baselines
    euler = [b for (c, _, _), b in zip(jobs, baselines) if c == "euler"]
    for i in range(len(euler)):
        for j in range(i + 1, len(euler)):
            assert not np.array_equal(euler[i], euler[j]), (i, j)

    # concurrent storm through HTTP
    results = [None] * len(jobs)
    errors = [None] * len(jobs)
    lat = [None] * len(jobs)

    def one(i):
        try:
            t0 = time.time()
            req = urllib.request.Request(
                url + "/generate", data=json.dumps(jobs[i][1]).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=1500) as r:
                results[i] = json.loads(r.read())
            lat[i] = time.time() - t0
        except Exception as e:          # pragma: no cover - diagnostic
            errors[i] = e

    threads = [threading.Thread(target=one, args=(i,))
               for i in range(len(jobs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    bad = [(jobs[i][0], e) for i, e in enumerate(errors) if e is not None]
    assert not bad, bad

    per_class: dict = {}
    for i, (cls, job, s2) in enumerate(jobs):
        out = results[i]
        assert out["stage2_ran"] is s2, (cls, out.get("masks_found"))
        img = _png_to_array(out["image"])
        # no state bleed: identical to this job's serial baseline within
        # the batched-vs-single numeric window
        diff = np.abs(img.astype(np.int32) - baselines[i].astype(np.int32))
        assert diff.max() <= 1, (cls, diff.max())
        per_class.setdefault(cls, []).append(lat[i])

    stats = {c: {"n": len(v),
                 "p50": round(float(np.percentile(v, 50)), 3),
                 "p95": round(float(np.percentile(v, 95)), 3)}
             for c, v in per_class.items()}
    print("soak per-class client latency:", json.dumps(stats))

    # server health + metrics consistency
    with urllib.request.urlopen(url + "/healthz") as r:
        hz = json.loads(r.read())
    assert hz["ok"] is True and hz["queued"] == 0
    with urllib.request.urlopen(url + "/metrics") as r:
        counters = json.loads(r.read())["counters"]

    def delta(key):
        return counters.get(key, 0) - before.get(key, 0)

    # gate-miss ran twice (baseline + storm); nothing else skipped
    assert delta("stage2_skipped") == 2, (before, counters)
    assert delta("images_generated") == 2 * len(jobs)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-s"])
