"""Extract per-step collective volumes from the compiled 8-device HLO.

VERDICT round-2 item 1(b): the round-2 projection assumed a +10%
lane-parallel overhead. Here the ACTUAL multi-chip programs — the
spatially-sharded stage-1 CFG denoise and the lane-parallel stage-2
4+2K program with the P2P controller — are compiled for an 8-device
mesh (virtual CPU devices; XLA's SPMD partitioner emits the same
collective structure it would for a TPU mesh) at true SDXL geometry,
and every all-gather / all-reduce / collective-permute / all-to-all in
the step body is counted with its byte volume.

Writes tools/v5e8_collectives.json, consumed by tools/project_v5e8.py.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/collective_stats.py

(The script forces the CPU backend itself; SDXL-size CPU compiles take
a while — tens of minutes on one core. OMG_COLL_SIZE=tiny smoke-runs
the plumbing.)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = int(os.environ.get("OMG_COLL_DEVICES", "8"))


def _force_cpu_mesh() -> None:
    """Point this process at N_DEV virtual CPU devices.

    Called from __main__ only (before any device use — jax's backend
    init is lazy, so mutating XLA_FLAGS here still takes effect), so
    that tools/aot_v5e8.py can import the HLO-parsing helpers below
    without being yanked off the TPU backend.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={N_DEV}"
        ).strip()
    jax.config.update("jax_platforms", "cpu")


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
                "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
                "f64": 8, "c64": 8, "c128": 16}

# matches both the sync form (`bf16[...] all-gather(...)`) and the TPU
# backend's async pairs — counted at the `-done` op only (its result
# shape is the moved tensor; the `-start` result is an (operand,
# result) tuple that would double-count)
_COLL_RE = re.compile(
    r"=\s*((?:\(.*?\))|(?:[a-z0-9]+\[[0-9,]*\][^ ]*))\s*"
    r"(all-gather|all-reduce|collective-permute|all-to-all|"
    r"reduce-scatter)(?:-done)?\(")


def _shape_bytes(shape_str: str) -> int:
    """'bf16[2,10,4096,64]{...}' or a tuple of such -> total bytes."""
    total = 0
    for m in re.finditer(r"([a-z0-9]+)\[([0-9,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_shape_histogram(hlo_text: str, top: int = 12) -> list:
    """Most frequent (op, shape, bytes) inside loop-body computations —
    the diagnostic view for WHICH tensors a sharded program moves."""
    import collections
    hist = collections.Counter()
    current = "<module>"
    for line in hlo_text.splitlines():
        if ") -> " in line and line.rstrip().endswith("{"):
            m = re.match(r"\s*(?:ENTRY\s+)?%?([^\s(]+)\s*\(", line)
            if m:
                current = m.group(1)
                continue
        cm = _COLL_RE.search(line)
        if cm and ("region_" in current or "body" in current
                   or "while" in current):
            # strip layout annotations but keep ALL tuple members:
            # "(f32[1,32]{...}, f32[1,32]{...})" -> "(f32[1,32], f32[1,32])"
            # (a '{'-split would truncate the tuple to its first member
            # and undercount variadic collectives' bytes)
            hist[(cm.group(2),
                  re.sub(r"\{[^}]*\}", "", cm.group(1)))] += 1
    out = []
    for (op, shape), n in hist.most_common(top):
        out.append({"op": op, "shape": shape, "count": n,
                    "mb_total": round(_shape_bytes(shape) * n / 1e6, 2)})
    return sorted(out, key=lambda r: -r["mb_total"])


def collectives_by_computation(hlo_text: str) -> dict:
    """{computation_name: {op: {count, bytes}}} from HLO text."""
    out: dict = {}
    current = "<module>"
    for line in hlo_text.splitlines():
        # computation header: "%name (params...) -> type {" / "ENTRY ..."
        if ") -> " in line and line.rstrip().endswith("{"):
            m = re.match(r"\s*(?:ENTRY\s+)?%?([^\s(]+)\s*\(", line)
            if m:
                current = m.group(1)
                continue
        cm = _COLL_RE.search(line)
        if cm:
            shape, op = cm.group(1), cm.group(2)
            rec = out.setdefault(current, {}).setdefault(
                op, {"count": 0, "bytes": 0})
            rec["count"] += 1
            rec["bytes"] += _shape_bytes(shape)
    return out


def step_body_totals(per_comp: dict) -> dict:
    """Collectives inside while-loop bodies (the per-step cost) and
    outside (per-call prologue/epilogue)."""
    body = {"count": 0, "bytes": 0, "by_op": {}}
    other = {"count": 0, "bytes": 0, "by_op": {}}
    for comp, ops in per_comp.items():
        # XLA names loop-body computations "region_N" (CPU SPMD:
        # "wide.region_0...._spmd..."); "body"/"while" cover other
        # spellings
        is_body = ("region_" in comp or "body" in comp
                   or "while" in comp)
        tgt = body if is_body else other
        for op, rec in ops.items():
            tgt["count"] += rec["count"]
            tgt["bytes"] += rec["bytes"]
            agg = tgt["by_op"].setdefault(op, {"count": 0, "bytes": 0})
            agg["count"] += rec["count"]
            agg["bytes"] += rec["bytes"]
    return {"step_body": body, "outside_body": other}


def _sds(tree, sharding):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding),
        tree)


def lower_programs(sp_mesh, flat_mesh, size: str) -> dict:
    """Lowering thunks for the three v5e-8 latency-mode programs.

    The SINGLE definition of the projection workload's program shapes,
    shared by this tool (virtual-CPU meshes) and tools/aot_v5e8.py
    (real-TPU topology meshes) so the two evidence chains cannot
    diverge. ``sp_mesh`` is the stage-1 (data=2, model=N/2) mesh,
    ``flat_mesh`` the (N, 1) lane mesh; both may be topology meshes.

    Returns {"meta": {...}, <program>: thunk} where each thunk lowers
    (caller compiles): stage1_spatial / stage2_lane are 2-step loop
    bodies (a 1-iteration fori_loop gets unrolled — no while body, so
    per-step collectives could not be told apart from the prologue);
    vae_spatial runs once per decode.

    Reference workload being projected: 2-concept 1024x1024 50-step
    e2e (/root/reference/src/pipelines/lora_pipeline.py:485-632).
    """
    from omg_tpu.control import p2p
    from omg_tpu.diffusion import schedulers
    from omg_tpu.models import unet as unet_lib
    from omg_tpu.models import vae as vae_lib
    from omg_tpu.parallel import mesh as mesh_lib
    from omg_tpu.pipelines import multiconcept, sdxl

    if size == "tiny":
        cfg, H, W = sdxl.tiny_config(), 64, 64
    else:
        cfg, H, W = sdxl.sdxl_config(), 1024, 1024
    h, w = H // 8, W // 8
    dt = cfg.unet.dtype
    d = cfg.unet.cross_attention_dim
    pdim = cfg.text_encoder_2.projection_dim
    sched = schedulers.make_schedule("euler", 50 if size != "tiny" else 4)
    S = sched.num_steps

    params_sds = jax.eval_shape(
        lambda k: unet_lib.init_params(k, cfg.unet), jax.random.PRNGKey(0))

    # ---- stage 1: spatial (lane x seq) = (2 x N/2) -------------------
    rep1 = NamedSharding(sp_mesh, P())
    spatial = NamedSharding(sp_mesh,
                            P(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS))
    base_sds = multiconcept.BaseInputs(
        jax.ShapeDtypeStruct((4, 77, d), dt, sharding=rep1),
        jax.ShapeDtypeStruct((4, pdim), dt, sharding=rep1),
        jax.ShapeDtypeStruct((4, 6), jnp.float32, sharding=rep1),
        jax.ShapeDtypeStruct((), jnp.float32, sharding=rep1))
    lat_sds = jax.ShapeDtypeStruct((1, h, w, 4), dt, sharding=rep1)
    st_sds = schedulers.SchedulerState(
        jax.ShapeDtypeStruct((1, h, w, 4), jnp.float32, sharding=rep1),
        jax.ShapeDtypeStruct((), jnp.int32, sharding=rep1),
        jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep1))

    def lower_stage1():
        return multiconcept._denoise_cfg_range.lower(
            cfg, sched, _sds(params_sds, rep1), lat_sds, st_sds,
            base_sds, i0=0, i1=2, spatial_sharding=spatial)

    # ---- stage 2: lane-parallel 4+2K with the P2P controller ---------
    rep2 = NamedSharding(flat_mesh, P())
    lane = NamedSharding(flat_mesh, P(mesh_lib.DATA_AXIS))
    K = 2
    concept_sds = multiconcept.ConceptInputs(
        jax.ShapeDtypeStruct((2, 77, d), dt, sharding=rep2),
        jax.ShapeDtypeStruct((2, pdim), dt, sharding=rep2),
        jax.ShapeDtypeStruct((2, 6), jnp.float32, sharding=rep2), None)
    base2_sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep2),
        base_sds)
    lat2_sds = jax.ShapeDtypeStruct((2, h, w, 4), dt, sharding=rep2)
    st2_sds = schedulers.SchedulerState(
        jax.ShapeDtypeStruct((2, h, w, 4), jnp.float32, sharding=rep2),
        jax.ShapeDtypeStruct((), jnp.int32, sharding=rep2),
        jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep2))
    masks_sds = jax.ShapeDtypeStruct((K, h, w), jnp.float32, sharding=rep2)
    ctl = p2p.P2PControl.build(["x", "x"], S, self_replace_steps=0.4,
                               width=W // 32, height=H // 32)
    ctl_sds = jax.tree.map(
        lambda x: (jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep2)
                   if hasattr(x, "shape") else x), ctl)

    def lower_stage2():
        return multiconcept._denoise_mc_range.lower(
            cfg, sched, _sds(params_sds, rep2), lat2_sds, st2_sds,
            base2_sds, ctl_sds, (concept_sds,) * K, (None,) * K, masks_sds,
            i0=S - 2, fusion_start=S - 3, lane_sharding=lane)

    # ---- VAE decode: spatial (H over all chips), runs once ----------
    def lower_vae():
        vae_sds = jax.eval_shape(
            lambda k: vae_lib.init_params(k, cfg.vae), jax.random.PRNGKey(1))
        dec_sharding = NamedSharding(flat_mesh,
                                     P(None, mesh_lib.DATA_AXIS))
        lat_dec = jax.ShapeDtypeStruct((2, h, w, 4), jnp.float32,
                                       sharding=rep2)
        return sdxl.decode_latents.lower(
            cfg, _sds(vae_sds, rep2), lat_dec,
            spatial_sharding=dec_sharding)

    # ---- combined two-stage: stage 1 spatial -> reshard -> stage 2 ---
    # VERDICT round-3 item 3: the full mesh-latency program as ONE
    # artifact, so the stage-boundary reshard (the engine's
    # device_put-to-replicated of the cache at omg.py generate(),
    # expressed in-program as a with_sharding_constraint) is
    # compiled-and-counted instead of asserted, and the two meshes
    # (stage-1 (2, N/2) spatial, stage-2 flat lane) are proven to
    # compose inside one executable over the same device assignment.
    # Loop bodies stay 2 iterations each (same reason as above); the
    # boundary collectives land OUTSIDE both loop bodies, so
    # outside_body(combined) - outside(stage1) - outside(stage2)
    # isolates the reshard bytes.
    def lower_combined():
        def combined(params, lat0, st0, base1, base2, ctl_in, concepts,
                     masks):
            lat1, st1 = multiconcept._denoise_cfg_range(
                cfg, sched, params, lat0, st0, base1, i0=0, i1=2,
                spatial_sharding=spatial)
            # stage boundary: replicate the cache over the flat lane
            # mesh (omg.py generate() does this with device_put between
            # the two jit calls; inside one program it is the same
            # logical movement)
            lat1 = jax.lax.with_sharding_constraint(lat1, rep2)
            st1 = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, rep2), st1)
            lat4 = multiconcept.duplicate_latents(lat1)
            st4 = schedulers.SchedulerState(
                prev_model_output=jnp.concatenate(
                    [st1.prev_model_output, st1.prev_model_output]),
                step_count=st1.step_count, key=st1.key)
            return multiconcept._denoise_mc_range(
                cfg, sched, params, lat4, st4, base2, ctl_in, concepts,
                (None,) * K, masks, i0=S - 2, fusion_start=S - 3,
                lane_sharding=lane)

        lat0_sds = jax.ShapeDtypeStruct((1, h, w, 4), dt, sharding=rep2)
        st0_sds = schedulers.SchedulerState(
            jax.ShapeDtypeStruct((1, h, w, 4), jnp.float32, sharding=rep2),
            jax.ShapeDtypeStruct((), jnp.int32, sharding=rep2),
            jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep2))
        base1_sds = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep2),
            base_sds)
        return jax.jit(combined).lower(
            _sds(params_sds, rep2), lat0_sds, st0_sds, base1_sds,
            base2_sds, ctl_sds, (concept_sds,) * K, masks_sds)

    # ---- request-DP throughput: R = N requests one-per-chip ----------
    # VERDICT round-3 item 2: the serving THROUGHPUT layout (bench.py's
    # chunked two_stage_latents, PARITY §6 measured rates) compiled for
    # the v5e-8 topology. FORM: shard_map over the request axis — each
    # chip runs the complete single-chip program (Pallas flash kernel
    # included) on its local request; GSPMD cannot auto-partition the
    # Mosaic kernel across a vmapped batch ("Mosaic kernels cannot be
    # automatically partitioned"), so jit(vmap) with a sharded batch is
    # NOT compilable at this topology and the shard_map form is the one
    # a real slice runs. The artifact's evidentiary role: (a) the DP
    # program compiles at v5e:2x4, (b) its steady-state ICI traffic is
    # zero (no step-body collectives -> the single-chip measured rate
    # transfers per-chip 1:1), (c) per-chip memory fits HBM. LoRA lanes
    # are omitted (comm-structure-neutral; the measured single-chip
    # rates that supply the TIME input include them).
    def lower_request_dp():
        from jax import shard_map
        n = flat_mesh.devices.size
        reqP = P(mesh_lib.DATA_AXIS)
        lane_req = NamedSharding(flat_mesh, reqP)

        def chip_fn(up, l0_loc, k_loc, base1, concepts, masks):
            return jax.vmap(
                lambda l0, kk: multiconcept.two_stage_latents(
                    cfg, sched, up, l0, base1, ctl, concepts,
                    (None,) * K, masks,
                    fusion_start=S - 3, noise_key=kk))(l0_loc, k_loc)

        def dp(up, lat0_r, keys_r, base1, concepts, masks):
            # replicated conditioning rides in_specs P() prefixes
            # (shard_map can't close over traced values)
            return shard_map(
                chip_fn, mesh=flat_mesh,
                in_specs=(P(), reqP, reqP, P(), P(), P()),
                out_specs=(reqP, reqP), check_vma=False)(
                    up, lat0_r, keys_r, base1, concepts, masks)

        lat0_sds = jax.ShapeDtypeStruct((n, 1, h, w, 4), dt,
                                        sharding=lane_req)
        keys_sds = jax.ShapeDtypeStruct((n, 2), jnp.uint32,
                                        sharding=lane_req)
        base1_sds = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep2),
            base_sds)
        return jax.jit(dp).lower(
            _sds(params_sds, rep2), lat0_sds, keys_sds, base1_sds,
            (concept_sds,) * K, masks_sds)

    return {"meta": {"size": size, "height": H, "width": W},
            "stage1_spatial": lower_stage1,
            "stage2_lane": lower_stage2,
            "vae_spatial": lower_vae,
            "combined_two_stage": lower_combined,
            "request_dp": lower_request_dp}


def once_totals(per_comp: dict) -> dict:
    """Aggregate ALL collectives regardless of computation (for
    programs with no step loop — every collective runs once per call)."""
    tot = {"count": 0, "bytes": 0, "by_op": {}}
    for ops in per_comp.values():
        for op, rec in ops.items():
            tot["count"] += rec["count"]
            tot["bytes"] += rec["bytes"]
            agg = tot["by_op"].setdefault(op, {"count": 0, "bytes": 0})
            agg["count"] += rec["count"]
            agg["bytes"] += rec["bytes"]
    return tot


def main():
    from omg_tpu.parallel import mesh as mesh_lib

    size = os.environ.get("OMG_COLL_SIZE", "sdxl")
    sp_mesh = mesh_lib.make_mesh(N_DEV, data=2, model=N_DEV // 2)
    flat = mesh_lib.make_mesh(N_DEV, data=N_DEV, model=1)
    progs = lower_programs(sp_mesh, flat, size)
    report = {"devices": N_DEV, **progs["meta"]}

    only = os.environ.get("OMG_COLL_ONLY", "")
    if only in ("", "stage1"):
        print("compiling stage-1 spatial program (2 steps)...", flush=True)
        txt = progs["stage1_spatial"]().compile().as_text()
        report["stage1_spatial"] = step_body_totals(
            collectives_by_computation(txt))
        report["stage1_spatial"]["shape_histogram"] = \
            collective_shape_histogram(txt)
        print(json.dumps(report["stage1_spatial"], indent=2), flush=True)

    if only == "stage1":
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "v5e8_collectives.json")
        with open(path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {path} (stage1 only)")
        return
    if only in ("", "stage2"):
        print("compiling stage-2 lane program (2 steps)...", flush=True)
        txt = progs["stage2_lane"]().compile().as_text()
        report["stage2_lane"] = step_body_totals(
            collectives_by_computation(txt))
        report["stage2_lane"]["shape_histogram"] = \
            collective_shape_histogram(txt)
        print(json.dumps(report["stage2_lane"], indent=2), flush=True)

    if only in ("", "vae"):
        print("compiling spatial VAE decode...", flush=True)
        txt = progs["vae_spatial"]().compile().as_text()
        # no loop: every collective runs once per decode
        report["vae_spatial"] = {
            "per_decode": once_totals(collectives_by_computation(txt))}
        print(json.dumps(report["vae_spatial"], indent=2), flush=True)

    if only in ("", "combined"):
        print("compiling combined two-stage program (2+2 steps)...",
              flush=True)
        txt = progs["combined_two_stage"]().compile().as_text()
        report["combined_two_stage"] = step_body_totals(
            collectives_by_computation(txt))
        report["combined_two_stage"]["shape_histogram"] = \
            collective_shape_histogram(txt)
        print(json.dumps(report["combined_two_stage"], indent=2),
              flush=True)

    if only == "request":
        # opt-in (the full two-stage program per chip is the heaviest
        # CPU compile of the set); the expected result is an EMPTY
        # step-body — request-DP moves no bytes between chips
        print("compiling request-DP throughput program...", flush=True)
        txt = progs["request_dp"]().compile().as_text()
        report["request_dp"] = step_body_totals(
            collectives_by_computation(txt))
        report["request_dp"]["shape_histogram"] = \
            collective_shape_histogram(txt)
        print(json.dumps(report["request_dp"], indent=2), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "v5e8_collectives.json")
    if size == "tiny" and os.path.exists(path):
        try:
            with open(path) as f:
                if json.load(f).get("size") == "sdxl":
                    # never clobber projection-grade data with a smoke run
                    path = path.replace(".json", ".tiny.json")
        except Exception:
            pass
    if (only in ("stage2", "vae", "combined", "request")
            and os.path.exists(path)):
        with open(path) as f:
            prev = json.load(f)
        report = {**prev, **{k: report[k] for k in report
                             if k in ("stage2_lane", "vae_spatial",
                                      "combined_two_stage", "request_dp")}}
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    _force_cpu_mesh()
    main()
