"""Combine measured inputs into the v5e-8 latency projection.

VERDICT round-2 item 1(c): recompute the < 5 s projection from ONLY
measured quantities. Inputs:

  * tools/v5e8_probe.json   (tools/tpu_probe_v5e8.py, real-chip timings)
      - stage-1 per-chip H-slab proxy forward (+measured halo bound)
      - seq-local flash attention local-vs-full-KV deltas
      - stage-2 per-chip b=1 full-frame lane forward
  * tools/v5e8_collectives.json (tools/collective_stats.py, HLO of the
      compiled 8-device programs: per-step collective counts + bytes)
  * tools/v5e8_aot.json (tools/aot_v5e8.py, OPTIONAL but preferred
      when present at sdxl size: the same programs AOT-compiled by the
      real TPU backend for a v5e:2x4 topology — its collective volumes
      supersede the CPU partitioner's, which become a cross-check row)
  * the published v5e ICI spec — the one non-measured input, labeled:
      1600 Gbps/chip interchip interconnect (Google Cloud TPU v5e docs)
      = 2.0e11 B/s aggregate per chip. A half-bandwidth sensitivity row
      is reported alongside.

Per-step collective time uses the standard ring-cost factors on a
group of p chips: all-gather and reduce-scatter move (p-1)/p of the
gathered bytes per chip, all-reduce 2(p-1)/p, collective-permute 1x,
all-to-all (p-1)/p.

Writes tools/v5e8_measured.json; bench.py embeds it (with provenance)
as v5e8_projection_s instead of the round-2 assumed-constant formula.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

ICI_BYTES_PER_S = 2.0e11     # v5e spec: 1600 Gbps/chip (see module doc)
STEPS = 50
FUSION_START = 15            # reference gate i > 15 -> 34 fused steps
# measured in BENCH_r02 on the real chip (unsharded in this layout)
VAE_S = 0.48
SAM_MASKS_S = 0.19


def _ring_factor(op: str, p: int) -> float:
    if op in ("all-gather", "reduce-scatter", "all-to-all"):
        return (p - 1) / p
    if op == "all-reduce":
        return 2 * (p - 1) / p
    if op == "collective-permute":
        return 1.0
    return 1.0


def collective_ms(step_body: dict, p: int,
                  ici: float = ICI_BYTES_PER_S) -> float:
    total = 0.0
    for op, rec in step_body.get("by_op", {}).items():
        total += rec["bytes"] * _ring_factor(op, p) / ici
    return total * 1e3


def project(probe: dict, colls: dict, ici: float = ICI_BYTES_PER_S) -> dict:
    # stage 1: per-chip slab proxy (halo-inclusive measurement) +
    # measured attention local->full-KV deltas + HLO collective bytes
    # deltas clamp at 0: these b=1 kernels are launch-overhead-bound on
    # one chip, so a measured local>full inversion is noise, and a
    # negative "correction" would flatter the projection
    attn_corr = (
        probe["attn_layers_640"]
        * max(0.0, probe["attn_640_full_ms"] - probe["attn_640_local_ms"])
        + probe["attn_layers_1280"]
        * max(0.0,
              probe["attn_1280_full_ms"] - probe["attn_1280_local_ms"]))
    # group size: every stage-1 op is priced at the 4-way seq axis even
    # though a few minority ops (lane-axis all-reduces/all-to-alls) run
    # over the 2-way data axis — (p-1)/p grows with p, so this is an
    # UPPER bound on their cost, not an assumption in the fast direction
    # (the dominant 839 MB K/V all-gathers genuinely are seq-axis)
    s1_coll = collective_ms(colls["stage1_spatial"]["step_body"],
                            p=colls["devices"] // 2, ici=ici)
    s1_step = probe["s1_chip_proxy_halo_ms"] + attn_corr + s1_coll
    stage1_s = STEPS * s1_step / 1e3

    # stage 2: per-chip b=1 lane + HLO collective bytes (P2P row
    # exchange + fusion-row gather are IN the compiled program)
    s2_coll = collective_ms(colls["stage2_lane"]["step_body"],
                            p=colls["devices"], ici=ici)
    s2_step = probe["s2_chip_lane_ms"] + s2_coll
    stage2_s = (STEPS - FUSION_START - 1) * s2_step / 1e3

    # VAE decode: spatially sharded when measured (per-chip H-slab
    # proxy + bottleneck-attention full-KV delta + HLO collectives),
    # else the unsharded single-chip measurement
    vae_s = VAE_S
    vae_coll = 0.0
    if "vae_chip_slab_ms" in probe and "vae_spatial" in colls:
        vae_attn = max(0.0, probe["vae_attn_full_ms"]
                       - probe["vae_attn_local_ms"])
        vae_coll = collective_ms(colls["vae_spatial"]["per_decode"],
                                 p=colls["devices"], ici=ici)
        vae_s = (probe["vae_chip_slab_ms"] + vae_attn + vae_coll) / 1e3

    # stage boundary: the one reshard between the stages (the cache
    # latents/scheduler state gathered from stage 1's spatial layout to
    # replicated before the lane-parallel stage 2). Runs ONCE per
    # image; measured from the combined two-stage AOT artifact
    # (tools/aot_v5e8.py stage_boundary — the outside-loop collective
    # delta of combined vs the two stage programs). Priced at the full
    # 8-chip group (upper bound: parts of the delta ride the 2-way or
    # 4-way sub-axes, where (p-1)/p is smaller).
    boundary_ms = 0.0
    if "stage_boundary" in colls:
        boundary_ms = collective_ms(colls["stage_boundary"],
                                    p=colls["devices"], ici=ici)

    total = stage1_s + stage2_s + vae_s + SAM_MASKS_S + boundary_ms / 1e3
    return {
        "v5e8_projection_s": round(total, 2),
        "stage_boundary_ms": round(boundary_ms, 3),
        "stage1_s": round(stage1_s, 3),
        "stage2_s": round(stage2_s, 3),
        "stage1_step_ms": round(s1_step, 3),
        "stage2_step_ms": round(s2_step, 3),
        "stage1_collective_ms": round(s1_coll, 3),
        "stage2_collective_ms": round(s2_coll, 3),
        "attn_full_kv_correction_ms": round(attn_corr, 3),
        "vae_s": round(vae_s, 3),
        "vae_collective_ms": round(vae_coll, 3),
        "sam_masks_s": SAM_MASKS_S,
    }


def _load_aot():
    """TPU-backend AOT topology compile (tools/aot_v5e8.py), if run.

    Preferred over the CPU-partitioned HLO when present at sdxl size:
    these collective volumes come from the TPU compiler's own SPMD
    partitioning of the v5e:2x4 executables — the numbers the real
    slice would run.
    """
    path = os.path.join(HERE, "v5e8_aot.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        aot = json.load(f)
    if aot.get("size") != "sdxl":
        return None
    if not all(k in aot for k in ("stage1_spatial", "stage2_lane",
                                  "vae_spatial")):
        return None
    return aot


def main():
    with open(os.path.join(HERE, "v5e8_probe.json")) as f:
        probe = json.load(f)
    with open(os.path.join(HERE, "v5e8_collectives.json")) as f:
        colls = json.load(f)
    if colls.get("size") != "sdxl":
        print(f"WARNING: collective stats were computed at size="
              f"{colls.get('size')!r}, not sdxl — bytes are not at the "
              f"projection geometry", file=sys.stderr)

    aot = _load_aot()
    cpu_colls = colls
    if aot is not None:
        colls = aot

    out = project(probe, colls)
    out["inputs"] = {
        "probe": {k: probe[k] for k in sorted(probe)},
        "collectives": {
            "stage1_step_body": colls["stage1_spatial"]["step_body"],
            "stage2_step_body": colls["stage2_lane"]["step_body"],
            **({"vae_spatial_per_decode":
                colls["vae_spatial"]["per_decode"]}
               if "vae_spatial" in colls else {}),
            **({"stage_boundary": colls["stage_boundary"]}
               if "stage_boundary" in colls else {}),
            "size": colls.get("size"),
            "source": ("tpu-aot v5e:2x4 topology compile"
                       if aot is not None else
                       "cpu-partitioned 8-device HLO"),
        },
        "ici_bytes_per_s": ICI_BYTES_PER_S,
        "ici_source": "v5e spec: 1600 Gbps/chip interchip interconnect "
                      "(the projection's one non-measured input)",
    }
    if aot is not None:
        # cross-check: the CPU partitioner's volumes vs the TPU
        # backend's, plus the TPU compile's per-chip memory analysis
        # (16 GB v5e HBM fit) and XLA cost model where exposed
        cpu_out = project(probe, cpu_colls)
        out["cpu_hlo_crosscheck"] = {
            "v5e8_projection_s": cpu_out["v5e8_projection_s"],
            "stage1_collective_ms": cpu_out["stage1_collective_ms"],
            "stage2_collective_ms": cpu_out["stage2_collective_ms"],
            "stage1_bytes_cpu_vs_tpu": [
                cpu_colls["stage1_spatial"]["step_body"]["bytes"],
                colls["stage1_spatial"]["step_body"]["bytes"]],
            "stage2_bytes_cpu_vs_tpu": [
                cpu_colls["stage2_lane"]["step_body"]["bytes"],
                colls["stage2_lane"]["step_body"]["bytes"]],
        }
        out["tpu_aot"] = {
            name: {k: aot[name][k]
                   for k in ("memory_per_chip", "cost_analysis")
                   if k in aot[name]}
            for name in ("stage1_spatial", "stage2_lane", "vae_spatial",
                         "combined_two_stage")
            if name in aot
        }
    # ---- v5e-8 THROUGHPUT projection (VERDICT round-3 item 2) --------
    # The driver's primary metric is images/min/chip. The v5e-8
    # throughput layout is request-DP: each chip runs the complete
    # single-chip chunked two-stage program on its own requests
    # (bench.py throughput mode under shard_map over the request axis).
    # The per-chip rate is a real-chip MEASUREMENT; what the 8-chip
    # projection needs beyond it is exactly what the request_dp AOT
    # artifact supplies: the program compiles at v5e:2x4, its
    # steady-state ICI traffic is zero (empty step-body collective set,
    # so no term scales with chip count), and the per-chip working set
    # fits HBM — hence images/min/chip transfers 1:1 and the slice rate
    # is 8x the chip rate.
    thr_modes = {
        "exact_50step": {
            "img_per_min_chip": 2.70,
            "source": "round-2 real-chip bench, R=4 chunk=2 "
                      "(PARITY §6; 4 requests / 88.9 s batch)"},
        "lcm8_crop": {
            "img_per_min_chip": 21.1,
            "source": "round-3 real-chip bench, LCM-8 x concept_crop "
                      "(PARITY §6; 4 requests / 11.37 s) — approximate "
                      "mode (crop), needs LCM-LoRA weights"},
        "lcm8_deepcache3": {
            "img_per_min_chip": 35.122,
            "source": "tools/bench_records/"
                      "r4_throughput_lcm8_deepcache3_R4.json — "
                      "draft-quality (DeepCache) + needs LCM-LoRA"},
    }
    rec = os.path.join(HERE, "bench_records",
                       "r4_throughput_lcm8_deepcache3_R4.json")
    if os.path.exists(rec):
        with open(rec) as f:
            thr_modes["lcm8_deepcache3"]["img_per_min_chip"] = \
                json.load(f)["value"]
    thr = {
        "layout": "request-DP: shard_map over the request axis, each "
                  "chip runs the complete single-chip chunked two-stage "
                  "program (Pallas kernel included) on its local "
                  "requests",
        "per_chip_img_per_min": {k: v["img_per_min_chip"]
                                 for k, v in thr_modes.items()},
        "slice_img_per_min_8chip": {
            k: round(8 * v["img_per_min_chip"], 2)
            for k, v in thr_modes.items()},
        "provenance": {k: v["source"] for k, v in thr_modes.items()},
        # the latency mode run back-to-back, for comparison: DP wins
        # throughput (no collectives, chip-saturated batching); the
        # mesh wins latency
        "mesh_latency_mode_as_throughput_img_per_min_chip": round(
            60.0 / out["v5e8_projection_s"] / 8, 2),
    }
    if aot is not None and "request_dp" in aot:
        thr["aot_evidence"] = {
            "step_body_collectives": aot["request_dp"]["step_body"],
            "outside_body_collectives": aot["request_dp"]["outside_body"],
            "memory_per_chip": aot["request_dp"].get("memory_per_chip"),
            "note": "compiled at v5e:2x4 by the TPU backend "
                    "(tools/aot_v5e8.py OMG_AOT_ONLY=request)",
        }
    out["throughput_v5e8"] = thr

    # sensitivity: the projection must not hinge on the ICI spec value
    out["sensitivity_half_ici_s"] = project(
        probe, colls, ici=ICI_BYTES_PER_S / 2)["v5e8_projection_s"]
    out["note"] = ("projection from per-chip measurements + compiled-HLO "
                   "collective volumes — not an 8-chip measurement "
                   "(no multi-chip hardware in this environment)")

    path = os.path.join(HERE, "v5e8_measured.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
