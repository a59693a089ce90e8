"""AOT-compile the v5e-8 latency-mode programs for a REAL v5e:2x4 TPU
topology (jax.experimental.topologies) and extract TPU-compiled
evidence for the PARITY §6 projection.

Round-2 VERDICT item 1(b) asked to attempt AOT topology compilation
"if the axon stack supports jax.experimental.topologies" — it does:
``get_topology_desc(platform="tpu", topology_name="v5e:2x4")`` works
through the tunnel, and ``jax.jit(...).lower(...).compile()`` against
shardings over the topology's abstract TpuDevices produces the actual
8-chip TPU executables (Mosaic kernels included) without 8 chips.

Versus tools/collective_stats.py (CPU-partitioned HLO), this gives:
  * collective volumes from the TPU backend's own SPMD partitioning
    and collective scheduling (the numbers the real slice would run),
  * per-chip memory analysis (argument/temp/output bytes — validates
    the 16 GB v5e HBM fit of the replicated-weights layout),
  * XLA's cost model for the step (flops, bytes accessed,
    optimal_seconds) where exposed.

Writes tools/v5e8_aot.json. OMG_AOT_SIZE=tiny smoke-runs the plumbing
(default sdxl); OMG_AOT_ONLY=stage1|stage2|vae compiles one program.

    python tools/aot_v5e8.py

Reference workload being projected: 2-concept 1024x1024 50-step e2e
(/root/reference/src/pipelines/lora_pipeline.py:485-632).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/omg_tpu_jax_cache")

from jax.experimental import topologies  # noqa: E402

from tools.collective_stats import (  # noqa: E402
    collective_shape_histogram, collectives_by_computation,
    lower_programs, once_totals, step_body_totals)

TOPOLOGY = os.environ.get("OMG_AOT_TOPOLOGY", "v5e:2x4")


def _mem(compiled) -> dict:
    try:
        m = compiled.memory_analysis()
        return {
            "argument_gb": round(m.argument_size_in_bytes / 1e9, 3),
            "temp_gb": round(m.temp_size_in_bytes / 1e9, 3),
            "output_gb": round(m.output_size_in_bytes / 1e9, 3),
            "code_mb": round(m.generated_code_size_in_bytes / 1e6, 2),
        }
    except Exception as e:  # pragma: no cover - backend-dependent
        return {"error": str(e)[:200]}


def _cost(compiled) -> dict:
    try:
        c = compiled.cost_analysis()
        if not c:
            return {}
        out = {k: c[k] for k in ("flops", "bytes accessed",
                                 "optimal_seconds") if k in c}
        # the TPU backend sometimes reports a nonsense negative
        # optimal_seconds (overflowed internal accounting) — drop it
        if out.get("optimal_seconds", 0) <= 0:
            out.pop("optimal_seconds", None)
        return out
    except Exception as e:  # pragma: no cover - backend-dependent
        return {"error": str(e)[:200]}


def _report_program(name, compiled, report, loop: bool = True):
    txt = compiled.as_text()
    per = collectives_by_computation(txt)
    if loop:
        rec = step_body_totals(per)
    else:
        # schema-matches collective_stats.py's vae record
        rec = {"per_decode": once_totals(per)}
    rec["shape_histogram"] = collective_shape_histogram(txt)
    rec["memory_per_chip"] = _mem(compiled)
    rec["cost_analysis"] = _cost(compiled)
    report[name] = rec
    print(name, json.dumps({k: rec[k] for k in
                            ("memory_per_chip", "cost_analysis")}, indent=2),
          flush=True)


def stage_boundary_delta(report: dict) -> dict | None:
    """Stage-boundary reshard (VERDICT round-3 item 3): in the combined
    artifact the boundary collectives are the ones OUTSIDE both loop
    bodies beyond what the two stage programs already carry outside
    their own loops (prologue conditioning pins etc.), so the per-op
    delta isolates the reshard the engine performs between the stages
    (omg.py generate(): device_put cache -> replicated)."""
    keys = ("stage1_spatial", "stage2_lane", "combined_two_stage")
    if not all(k in report for k in keys):
        return None
    comb = report["combined_two_stage"]["outside_body"]
    parts = [report[k]["outside_body"] for k in keys[:2]]
    by_op = {}
    for op in comb.get("by_op", {}):
        d_bytes = comb["by_op"][op]["bytes"] - sum(
            p.get("by_op", {}).get(op, {}).get("bytes", 0) for p in parts)
        d_count = comb["by_op"][op]["count"] - sum(
            p.get("by_op", {}).get(op, {}).get("count", 0) for p in parts)
        if d_bytes > 0 or d_count > 0:
            by_op[op] = {"count": max(d_count, 0), "bytes": max(d_bytes, 0)}
    return {
        "bytes": max(comb["bytes"] - sum(p["bytes"] for p in parts), 0),
        "count": max(comb["count"] - sum(p["count"] for p in parts), 0),
        "by_op": by_op,
        "outside_bytes_combined_vs_parts": [
            comb["bytes"], parts[0]["bytes"], parts[1]["bytes"]],
    }


def main():
    from omg_tpu.parallel import mesh as mesh_lib

    assert jax.default_backend() == "tpu", (
        "AOT v5e compile needs the TPU backend (got "
        f"{jax.default_backend()}) — the Pallas kernels must take their "
        "real Mosaic path, not interpret mode")

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=TOPOLOGY)
    n_dev = len(topo.devices)
    sp_mesh = topologies.make_mesh(topo, (2, n_dev // 2),
                                   (mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS))
    flat = topologies.make_mesh(topo, (n_dev, 1),
                                (mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS))

    size = os.environ.get("OMG_AOT_SIZE", "sdxl")
    # the program shapes come from the SAME builders the CPU-HLO
    # evidence chain compiles (collective_stats.lower_programs) — only
    # the meshes differ (real-TPU topology here, virtual CPU there)
    progs = lower_programs(sp_mesh, flat, size)
    report = {"topology": TOPOLOGY, "devices": n_dev, **progs["meta"],
              "backend": "tpu-aot"}
    only = os.environ.get("OMG_AOT_ONLY", "")

    for name, loop in (("stage1_spatial", True), ("stage2_lane", True),
                       ("vae_spatial", False),
                       ("combined_two_stage", True),
                       ("request_dp", True)):
        if only in ("", name.split("_")[0]):
            print(f"AOT-compiling {name} ({TOPOLOGY})...", flush=True)
            _report_program(name, progs[name]().compile(), report,
                            loop=loop)


    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "v5e8_aot.json")
    if size == "tiny" and os.path.exists(path):
        try:
            with open(path) as f:
                if json.load(f).get("size") == "sdxl":
                    path = path.replace(".json", ".tiny.json")
        except Exception:
            pass
    if only and os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        # only merge into a file produced at the SAME topology/size —
        # otherwise a partial re-run would attach, say, v5e:4x4 volumes
        # under v5e:2x4 metadata and silently poison the projection
        same_run = all(prev.get(k) == report[k]
                       for k in ("topology", "devices", "size"))
        if same_run:
            report = {**prev, **{k: v for k, v in report.items()
                                 if k in ("stage1_spatial", "stage2_lane",
                                          "vae_spatial",
                                          "combined_two_stage",
                                          "request_dp")}}
        else:
            print(f"note: existing {path} is from a different "
                  f"topology/size run — writing the partial report "
                  f"without merging", file=sys.stderr)
    boundary = stage_boundary_delta(report)
    if boundary is not None:
        report["stage_boundary"] = boundary
        print("stage_boundary", json.dumps(boundary), flush=True)
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
