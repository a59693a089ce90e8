"""Unit tests for the v5e-8 projection math (tools/project_v5e8.py).

The projection combines real-chip probe timings with compiled-HLO
collective volumes (CPU-partitioned or TPU-AOT) — these tests pin the
pure arithmetic and the AOT-preference file logic on synthetic inputs
so a refactor cannot silently change the headline v5e8_projection_s
formula. (Reference workload being projected: 2-concept 1024x1024
50-step e2e, /root/reference/src/pipelines/lora_pipeline.py:485-632.)
"""

import json
import os

import pytest

from tools import project_v5e8 as pv


def _probe():
    return {
        "s1_chip_proxy_halo_ms": 20.0,
        "attn_layers_640": 10,
        "attn_layers_1280": 20,
        "attn_640_full_ms": 0.3,
        "attn_640_local_ms": 0.2,
        "attn_1280_full_ms": 0.25,
        "attn_1280_local_ms": 0.15,
        "s2_chip_lane_ms": 60.0,
    }


def _colls(s1_bytes=800_000_000, s2_bytes=1_000_000_000):
    return {
        "devices": 8,
        "size": "sdxl",
        "stage1_spatial": {"step_body": {
            "count": 140, "bytes": s1_bytes,
            "by_op": {"all-gather": {"count": 140, "bytes": s1_bytes}}}},
        "stage2_lane": {"step_body": {
            "count": 10, "bytes": s2_bytes,
            "by_op": {"collective-permute":
                      {"count": 10, "bytes": s2_bytes}}}},
    }


class TestRingFactors:
    def test_all_gather_moves_p_minus_1_over_p(self):
        assert pv._ring_factor("all-gather", 4) == pytest.approx(0.75)

    def test_all_reduce_is_double(self):
        assert pv._ring_factor("all-reduce", 4) == pytest.approx(1.5)

    def test_permute_is_unit(self):
        assert pv._ring_factor("collective-permute", 8) == 1.0


class TestCollectiveMs:
    def test_bytes_over_ici(self):
        body = {"by_op": {"all-gather": {"count": 1, "bytes": 2.0e11}}}
        # 2e11 B * (7/8) / 2e11 B/s = 0.875 s = 875 ms
        assert pv.collective_ms(body, p=8) == pytest.approx(875.0)

    def test_empty_body(self):
        assert pv.collective_ms({}, p=8) == 0.0


class TestProject:
    def test_composition(self):
        out = pv.project(_probe(), _colls())
        # stage 1: 20.0 + (10*0.1 + 20*0.1) attn corr + coll over p=4
        s1_coll = 800_000_000 * 0.75 / 2.0e11 * 1e3
        assert out["stage1_step_ms"] == pytest.approx(23.0 + s1_coll,
                                                      abs=1e-3)
        assert out["stage1_s"] == pytest.approx(
            50 * (23.0 + s1_coll) / 1e3, abs=1e-2)
        # stage 2: 60.0 + permute bytes at factor 1 over p=8
        s2_coll = 1_000_000_000 / 2.0e11 * 1e3
        assert out["stage2_step_ms"] == pytest.approx(60.0 + s2_coll,
                                                      abs=1e-3)
        assert out["stage2_s"] == pytest.approx(
            34 * (60.0 + s2_coll) / 1e3, abs=1e-2)
        # total = stages + unsharded VAE + SAM
        assert out["v5e8_projection_s"] == pytest.approx(
            out["stage1_s"] + out["stage2_s"] + pv.VAE_S + pv.SAM_MASKS_S,
            abs=0.015)

    def test_negative_attn_delta_clamps_to_zero(self):
        p = _probe()
        p["attn_640_full_ms"] = 0.1   # full < local: measurement noise
        p["attn_1280_full_ms"] = 0.1
        out = pv.project(p, _colls())
        assert out["attn_full_kv_correction_ms"] == 0.0

    def test_half_ici_costs_more(self):
        full = pv.project(_probe(), _colls())
        half = pv.project(_probe(), _colls(), ici=pv.ICI_BYTES_PER_S / 2)
        assert half["v5e8_projection_s"] > full["v5e8_projection_s"]
        # compute terms unchanged — only the collective terms double
        assert half["stage1_collective_ms"] == pytest.approx(
            2 * full["stage1_collective_ms"], abs=1e-3)

    def test_stage_boundary_added_once(self):
        """The combined-artifact boundary reshard is a per-IMAGE cost:
        it must enter the total exactly once, not per step."""
        c = _colls()
        c["stage_boundary"] = {
            "count": 2, "bytes": 4.0e8,
            "by_op": {"all-gather": {"count": 2, "bytes": 4.0e8}}}
        base = pv.project(_probe(), _colls())
        out = pv.project(_probe(), c)
        want_ms = 4.0e8 * (7 / 8) / 2.0e11 * 1e3
        assert out["stage_boundary_ms"] == pytest.approx(want_ms,
                                                         abs=1e-3)
        assert out["v5e8_projection_s"] == pytest.approx(
            base["v5e8_projection_s"] + want_ms / 1e3, abs=0.015)
        # per-step terms untouched
        assert out["stage1_step_ms"] == base["stage1_step_ms"]
        assert out["stage2_step_ms"] == base["stage2_step_ms"]

    def test_sharded_vae_branch(self):
        p = _probe()
        p.update({"vae_chip_slab_ms": 50.0, "vae_attn_full_ms": 1.2,
                  "vae_attn_local_ms": 1.0})
        c = _colls()
        c["vae_spatial"] = {"per_decode": {
            "count": 4, "bytes": 2.0e8,
            "by_op": {"all-gather": {"count": 4, "bytes": 2.0e8}}}}
        out = pv.project(p, c)
        vae_coll = 2.0e8 * (7 / 8) / 2.0e11 * 1e3
        assert out["vae_s"] == pytest.approx(
            (50.0 + 0.2 + vae_coll) / 1e3, abs=1e-4)


class TestAotPreference:
    def test_missing_file_returns_none(self, tmp_path, monkeypatch):
        monkeypatch.setattr(pv, "HERE", str(tmp_path))
        assert pv._load_aot() is None

    def test_tiny_size_rejected(self, tmp_path, monkeypatch):
        monkeypatch.setattr(pv, "HERE", str(tmp_path))
        (tmp_path / "v5e8_aot.json").write_text(json.dumps(
            {**_colls(), "size": "tiny",
             "vae_spatial": {"per_decode": {}}}))
        assert pv._load_aot() is None

    def test_partial_programs_rejected(self, tmp_path, monkeypatch):
        monkeypatch.setattr(pv, "HERE", str(tmp_path))
        c = _colls()  # no vae_spatial key
        (tmp_path / "v5e8_aot.json").write_text(json.dumps(c))
        assert pv._load_aot() is None

    def test_sdxl_aot_loaded(self, tmp_path, monkeypatch):
        monkeypatch.setattr(pv, "HERE", str(tmp_path))
        c = _colls()
        c["vae_spatial"] = {"per_decode": {"count": 0, "bytes": 0,
                                           "by_op": {}}}
        (tmp_path / "v5e8_aot.json").write_text(json.dumps(c))
        aot = pv._load_aot()
        assert aot is not None and aot["devices"] == 8


def test_shipped_measured_json_is_consistent():
    """The committed v5e8_measured.json must reproduce from its own
    recorded inputs (guards against hand-edited numbers)."""
    path = os.path.join(os.path.dirname(pv.__file__), "v5e8_measured.json")
    if not os.path.exists(path):
        pytest.skip("no measured projection in tree")
    with open(path) as f:
        rec = json.load(f)
    probe = rec["inputs"]["probe"]
    colls = {
        "devices": 8,
        "stage1_spatial": {"step_body":
                           rec["inputs"]["collectives"]["stage1_step_body"]},
        "stage2_lane": {"step_body":
                        rec["inputs"]["collectives"]["stage2_step_body"]},
    }
    if "vae_spatial_per_decode" in rec["inputs"]["collectives"]:
        colls["vae_spatial"] = {
            "per_decode":
                rec["inputs"]["collectives"]["vae_spatial_per_decode"]}
    if "stage_boundary" in rec["inputs"]["collectives"]:
        colls["stage_boundary"] = \
            rec["inputs"]["collectives"]["stage_boundary"]
    out = pv.project(probe, colls)
    if "vae_spatial" not in colls and "vae_chip_slab_ms" in probe:
        # recorded run sharded the VAE but didn't store its collective
        # record — compare the stage terms only
        for k in ("stage1_s", "stage2_s", "stage1_step_ms",
                  "stage2_step_ms"):
            assert out[k] == pytest.approx(rec[k], rel=1e-6)
    else:
        assert out["v5e8_projection_s"] == pytest.approx(
            rec["v5e8_projection_s"], abs=0.011)
