"""Tests for the HLO collective parser (tools/collective_stats.py).

These helpers feed the v5e-8 projection (tools/project_v5e8.py) and the
AOT topology evidence (tools/aot_v5e8.py) — a parsing miss silently
understates communication cost, so the sync form, the TPU backend's
async `-start`/`-done` pairs, and the loop-body attribution are each
pinned on hand-written HLO snippets.
"""

from tools import collective_stats as cs

SYNC_HLO = """\
HloModule test
%wide.region_0.1_spmd (p: f32[8]) -> f32[8] {
  %ag = bf16[2,10,4096,64]{3,2,1,0} all-gather(%x), dimensions={2}
  %ar = f32[1,32]{1,0} all-reduce(%y), to_apply=%add
}
ENTRY %main (a: f32[8]) -> f32[8] {
  %cp = f32[1,128,128,4]{3,2,1,0} collective-permute(%z)
}
"""

ASYNC_HLO = """\
HloModule test
%wide.wide.region_0.112_spmd.sunk (p: f32[8]) -> f32[8] {
  %collective-permute-start = (f32[1,8,8,4]{3,2,1,0}, f32[1,8,8,4]{3,2,1,0}) collective-permute-start(%a)
  %collective-permute-done = f32[1,8,8,4]{3,0,2,1:T(1,128)S(1)} collective-permute-done(%collective-permute-start)
  %all-gather-start = (bf16[1,10,512,64]{3,2,1,0}, bf16[1,10,4096,64]{3,2,1,0}) all-gather-start(%b)
  %all-gather-done = bf16[1,10,4096,64]{3,2,1,0:T(8,128)(2,1)} all-gather-done(%all-gather-start)
}
ENTRY %main (a: f32[8]) -> f32[8] {
  %r = f32[8]{0} add(%a, %a)
}
"""


class TestShapeBytes:
    def test_single_shape(self):
        assert cs._shape_bytes("bf16[2,10,4096,64]{3,2,1,0}") == \
            2 * 2 * 10 * 4096 * 64

    def test_tuple_sums_members(self):
        s = "(f32[8]{0}, bf16[4]{0})"
        assert cs._shape_bytes(s) == 8 * 4 + 4 * 2


class TestSyncParsing:
    def test_ops_found_with_bytes(self):
        per = cs.collectives_by_computation(SYNC_HLO)
        body = per["wide.region_0.1_spmd"]
        assert body["all-gather"]["count"] == 1
        assert body["all-gather"]["bytes"] == 2 * 2 * 10 * 4096 * 64
        assert body["all-reduce"]["count"] == 1

    def test_entry_permute_outside_body(self):
        totals = cs.step_body_totals(
            cs.collectives_by_computation(SYNC_HLO))
        assert totals["step_body"]["count"] == 2
        assert totals["outside_body"]["by_op"][
            "collective-permute"]["count"] == 1
        assert totals["outside_body"]["by_op"][
            "collective-permute"]["bytes"] == 4 * 128 * 128 * 4


class TestAsyncParsing:
    """The TPU backend emits -start/-done pairs; only -done counts
    (the -start result is an (operand, result) tuple — counting it
    would double the volume)."""

    def test_done_counted_start_skipped(self):
        totals = cs.step_body_totals(
            cs.collectives_by_computation(ASYNC_HLO))
        body = totals["step_body"]["by_op"]
        assert body["collective-permute"]["count"] == 1
        assert body["collective-permute"]["bytes"] == 4 * 8 * 8 * 4
        assert body["all-gather"]["count"] == 1
        # gathered output shape, not the (local, gathered) start tuple
        assert body["all-gather"]["bytes"] == 2 * 10 * 4096 * 64

    def test_sunk_body_attributed_as_step(self):
        totals = cs.step_body_totals(
            cs.collectives_by_computation(ASYNC_HLO))
        assert totals["step_body"]["count"] == 2
        assert totals["outside_body"]["count"] == 0


class TestHistogram:
    def test_top_shapes(self):
        hist = cs.collective_shape_histogram(SYNC_HLO)
        assert hist[0]["op"] == "all-gather"
        assert hist[0]["mb_total"] > hist[-1]["mb_total"]


class TestStageBoundaryDelta:
    """tools/aot_v5e8.stage_boundary_delta isolates the stage-boundary
    reshard of the combined two-stage artifact as the per-op
    outside-loop delta of combined vs the two stage programs."""

    @staticmethod
    def _outside(by_op):
        tot = {"count": sum(r["count"] for r in by_op.values()),
               "bytes": sum(r["bytes"] for r in by_op.values()),
               "by_op": by_op}
        return {"outside_body": tot}

    def test_delta_isolates_reshard(self):
        from tools.aot_v5e8 import stage_boundary_delta
        s1 = self._outside({"all-reduce": {"count": 2, "bytes": 100}})
        s2 = self._outside({"collective-permute": {"count": 1,
                                                   "bytes": 50}})
        comb = self._outside({
            "all-reduce": {"count": 2, "bytes": 100},
            "collective-permute": {"count": 1, "bytes": 50},
            # the boundary: one extra all-gather the parts don't have
            "all-gather": {"count": 1, "bytes": 131072}})
        rep = {"stage1_spatial": s1, "stage2_lane": s2,
               "combined_two_stage": comb}
        d = stage_boundary_delta(rep)
        assert d["bytes"] == 131072
        assert d["by_op"] == {"all-gather": {"count": 1, "bytes": 131072}}
        assert d["outside_bytes_combined_vs_parts"] == [131222, 100, 50]

    def test_missing_program_returns_none(self):
        from tools.aot_v5e8 import stage_boundary_delta
        assert stage_boundary_delta({"stage1_spatial": {}}) is None

    def test_negative_deltas_clamp(self):
        from tools.aot_v5e8 import stage_boundary_delta
        s1 = self._outside({"all-reduce": {"count": 4, "bytes": 400}})
        s2 = self._outside({})
        comb = self._outside({"all-reduce": {"count": 1, "bytes": 90}})
        d = stage_boundary_delta(
            {"stage1_spatial": s1, "stage2_lane": s2,
             "combined_two_stage": comb})
        assert d["bytes"] == 0 and d["count"] == 0
        assert d["by_op"] == {}
