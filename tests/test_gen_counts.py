"""PARITY.md's mechanical counts must match the tree (tools/gen_counts.py).

Round-3 VERDICT item 8: hand-carried numbers drifted (236 quoted vs 267
in the tree; '7 scenarios' vs 6 printed). The counts are generated now;
this test fails whenever a test or dryrun scenario is added without
re-running `python tools/gen_counts.py --write`.
"""

import os

from tools import gen_counts


def _parity_text():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY.md")
    with open(path) as f:
        return f.read()


def test_counts_are_positive_and_sane():
    c = gen_counts.counts()
    assert c["test_functions"] > 200     # the suite's actual scale
    assert c["test_files"] > 30
    assert c["dryrun_scenarios"] >= 6


def test_parity_markers_match_tree():
    txt = _parity_text()
    c = gen_counts.counts()
    for key, frag in gen_counts.rendered(c).items():
        assert frag in txt, (
            f"PARITY.md's {key} marker is stale or missing — run "
            f"`python tools/gen_counts.py --write` (tree value: {c[key]})")


def test_apply_markers_rewrites_only_known_keys():
    c = {"test_functions": 7}
    txt = ("x <!-- gen_counts:test_functions -->1<!-- /gen_counts --> y "
           "<!-- gen_counts:unknown -->2<!-- /gen_counts --> z")
    out = gen_counts.apply_markers(txt, c)
    assert "<!-- gen_counts:test_functions -->7<!-- /gen_counts -->" in out
    assert "<!-- gen_counts:unknown -->2<!-- /gen_counts -->" in out
