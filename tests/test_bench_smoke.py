"""bench.py smoke: the driver's entrypoint must run in every mode.

Runs bench.main() at the tiny geometry on CPU (the real TPU numbers are
produced by the driver); asserts each mode prints one valid JSON line
with the contract fields.
"""

import io
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _run_bench(monkeypatch, env):
    import bench
    for k in list(env):
        monkeypatch.setenv(k, env[k])
    monkeypatch.setenv("OMG_BENCH_SIZE", "tiny")
    monkeypatch.setenv("OMG_BENCH_STEPS", "4")
    monkeypatch.setenv("OMG_BENCH_REPS", "1")
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    bench.main()
    lines = [ln for ln in out.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, lines          # contract: ONE JSON line
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0
    return rec


def test_bench_latency_mode(monkeypatch):
    rec = _run_bench(monkeypatch, {})
    assert rec["unit"] == "s"
    ex = rec["extra"]
    assert ex["stage1_s"] > 0 and ex["stage2_s"] > 0 and ex["vae_s"] > 0
    assert ex["concept_crop"] == "none"


def test_bench_crop_mode(monkeypatch):
    rec = _run_bench(monkeypatch, {"OMG_BENCH_CROP": "strips"})
    assert rec["extra"]["concept_crop"] == "strips"


def test_bench_lcm_mode(monkeypatch):
    rec = _run_bench(monkeypatch, {"OMG_BENCH_SCHED": "lcm"})
    assert rec["extra"]["scheduler"] == "lcm"


def test_bench_throughput_mode(monkeypatch):
    rec = _run_bench(monkeypatch, {"OMG_BENCH_MODE": "throughput",
                                   "OMG_BENCH_REQUESTS": "3",
                                   "OMG_BENCH_CHUNK": "2"})
    assert rec["unit"] == "images/min/chip"
    # R rounded up to a chunk multiple; rate reported over actual count
    assert rec["extra"]["requests"] == 4
    assert rec["extra"]["chunk"] == 2
