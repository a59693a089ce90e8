"""Open-vocabulary detector: proposals, CLIP ranking, disjoint assignment.

The round-1 gap this closes (VERDICT missing #1): the default
whole-image box gave every concept the same mask, collapsing OMG's
per-concept identity separation. These tests pin the replacement's
mechanics deterministically (stub embedders/proposers) plus the real
SAM-grid proposal path at tiny geometry.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu.segment import detector as det_lib
from omg_tpu.segment import efficientvit as evit
from omg_tpu.segment import sam_decoder as dec
from omg_tpu.segment.detector import OpenVocabDetector, Proposal
from omg_tpu.segment.sam_provider import SamPredictor


# --------------------------------------------------------------------------
# Point-prompt encoding
# --------------------------------------------------------------------------

def test_encode_points_semantics():
    p = dec.init_prompt_encoder(jax.random.PRNGKey(0))
    pts = jnp.asarray([[[10.0, 20.0]]])
    pos = dec.encode_points(p, pts, jnp.ones((1, 1)), 64)
    neg = dec.encode_points(p, pts, jnp.zeros((1, 1)), 64)
    assert pos.shape == (1, 2, 256)          # 1 point + pad point
    # pad slot is exactly not_a_point_embed (PE zeroed per SAM semantics)
    np.testing.assert_allclose(np.asarray(pos[0, 1]),
                               np.asarray(p["not_a_point_embed"]["weight"][0]),
                               atol=1e-6)
    # label flips the additive embedding
    assert not np.allclose(np.asarray(pos[0, 0]), np.asarray(neg[0, 0]))
    diff = np.asarray(pos[0, 0] - neg[0, 0])
    want = np.asarray(p["point_embeddings"][1]["weight"][0]
                      - p["point_embeddings"][0]["weight"][0])
    np.testing.assert_allclose(diff, want, atol=1e-6)


# --------------------------------------------------------------------------
# Deterministic ranking/assignment (stub proposer + color embedders)
# --------------------------------------------------------------------------

def _two_blob_image(h=64, w=96):
    """Red blob on the left, blue blob on the right."""
    img = np.full((h, w, 3), 255, np.uint8)
    img[16:48, 8:40] = (220, 30, 30)      # red, left
    img[16:48, 56:88] = (30, 30, 220)     # blue, right
    return img


def _color_embed_image(crops):
    """Stub CLIP image tower: CENTERED normalized mean RGB (centering
    makes the similarity contrastive — positive-only features would give
    every text a positive score)."""
    e = crops.reshape(crops.shape[0], -1, 3).mean(axis=1).astype(np.float32)
    e = e / 255.0 - 0.5
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def _color_embed_texts(texts):
    table = {"red": [1.0, -0.5, -0.5], "blue": [-0.5, -0.5, 1.0],
             "green": [-0.5, 1.0, -0.5]}
    out = np.asarray([table[t] for t in texts], np.float32)
    return out / np.linalg.norm(out, axis=-1, keepdims=True)


def _blob_proposals(image):
    out = []
    for x0, x1 in ((8, 40), (56, 88)):
        m = np.zeros(image.shape[:2], bool)
        m[16:48, x0:x1] = True
        out.append(Proposal(m, np.array([x0, 16, x1, 48], np.float32), 0.9))
    return out


@pytest.fixture()
def color_detector():
    return OpenVocabDetector(_blob_proposals, _color_embed_image,
                             _color_embed_texts, sim_thresh=0.3,
                             crop_size=16)


def test_two_concepts_get_disjoint_correct_regions(color_detector):
    """The VERDICT done-criterion: a synthetic two-person image yields two
    disjoint, correctly-labeled masks."""
    img = _two_blob_image()
    box_red = color_detector(img, "red")
    box_blue = color_detector(img, "blue")
    assert box_red is not None and box_blue is not None
    assert box_red[2] <= 48, box_red        # red on the left
    assert box_blue[0] >= 48, box_blue      # blue on the right
    masks = color_detector.masks_for(img, ["red", "blue"])
    assert all(m is not None for m in masks)
    assert np.logical_and(masks[0] > 0, masks[1] > 0).sum() == 0  # disjoint


def test_unmatched_class_returns_none(color_detector):
    img = _two_blob_image()
    assert color_detector(img, "green") is None


def test_overlap_veto_prevents_shared_region():
    """Two classes that both prefer the same proposal: the second must
    not reuse the first's region (the whole-image-box failure mode)."""
    img = _two_blob_image()

    def one_blob(image):
        m = np.zeros(image.shape[:2], bool)
        m[16:48, 8:40] = True
        return [Proposal(m, np.array([8, 16, 40, 48], np.float32), 0.9)]

    def reddish_texts(texts):
        # both classes point at red-ish features
        out = np.asarray([[1.0, 0.2, 0.2]] * len(texts), np.float32)
        return out / np.linalg.norm(out, axis=-1, keepdims=True)

    d = OpenVocabDetector(one_blob, _color_embed_image, reddish_texts,
                          sim_thresh=0.3, crop_size=16)
    first = d(img, "red")
    second = d(img, "blue")
    assert first is not None
    assert second is None


def test_image_cache_and_reassignment(color_detector):
    img = _two_blob_image()
    b1 = color_detector(img, "red")
    b2 = color_detector(img, "red")
    np.testing.assert_array_equal(b1, b2)
    img2 = _two_blob_image(48, 64)
    b3 = color_detector(img2, "red")
    assert b3 is not None and b3[2] <= img2.shape[1]


# --------------------------------------------------------------------------
# SAM grid proposal path (tiny random weights: shapes + frame mapping)
# --------------------------------------------------------------------------

def test_sam_grid_proposer_runs():
    cfg = dataclasses.replace(evit.tiny_config(), neck_out_dim=256)
    params = {
        "image_encoder": evit.init_params(jax.random.PRNGKey(9), cfg),
        "prompt_encoder": dec.init_prompt_encoder(jax.random.PRNGKey(1)),
        "mask_decoder": dec.init_mask_decoder(jax.random.PRNGKey(2)),
    }
    pred = SamPredictor(params, cfg)
    proposer = det_lib.SamGridProposer(pred, grid=3, iou_thresh=-10.0,
                                       min_area_frac=0.0, max_area_frac=1.0,
                                       max_proposals=4, nms_thresh=0.9)
    img = (np.random.rand(48, 64, 3) * 255).astype(np.uint8)
    props = proposer(img)
    assert isinstance(props, list)
    for p in props:
        assert p.mask.shape == (48, 64)
        x0, y0, x1, y1 = p.box
        assert 0 <= x0 < x1 <= 64 and 0 <= y0 < y1 <= 48


def test_detector_feeds_mask_provider():
    """Detector drops into SamMaskProvider's box_provider slot and the
    resulting masks follow the detector's regions."""
    from omg_tpu.segment.sam_provider import SamMaskProvider
    cfg = dataclasses.replace(evit.tiny_config(), neck_out_dim=256)
    params = {
        "image_encoder": evit.init_params(jax.random.PRNGKey(9), cfg),
        "prompt_encoder": dec.init_prompt_encoder(jax.random.PRNGKey(1)),
        "mask_decoder": dec.init_mask_decoder(jax.random.PRNGKey(2)),
    }
    detector = OpenVocabDetector(_blob_proposals, _color_embed_image,
                                 _color_embed_texts, sim_thresh=0.3,
                                 crop_size=16)
    provider = SamMaskProvider(params=params, cfg=cfg,
                               box_provider=detector)
    img = _two_blob_image()
    m_red = provider(img, "red")
    m_green = provider(img, "green")
    assert m_red is not None and m_red.shape == img.shape[:2]
    assert m_green is None


def test_b32_text_config_pairs_with_vision():
    """The factory's CLIP pairing is geometrically consistent: the B/32
    text tower runs at its own head count and projects into the SAME
    512-d space as the B/32 vision tower (the round-2 factory wired a
    CLIP-L text config against B/32 weights, which cannot execute)."""
    import jax
    import jax.numpy as jnp
    from omg_tpu import config as cfglib
    from omg_tpu.models import clip as clip_lib

    t_cfg = cfglib.clip_vit_b32_text()
    v_cfg = cfglib.clip_vit_b32_vision()
    assert t_cfg.projection_dim == v_cfg.projection_dim == 512
    assert t_cfg.hidden_size % t_cfg.num_heads == 0
    params = clip_lib.init_params(jax.random.PRNGKey(0), t_cfg)
    ids = jnp.zeros((2, 77), jnp.int32)
    out = clip_lib.apply(params, t_cfg, ids)
    assert out.projected is not None
    assert out.projected.shape == (2, 512)


# --------------------------------------------------------------------------
# Checkpoint-gated validation tool (tools/validate_detector.py)
# --------------------------------------------------------------------------

def test_validate_detector_skips_cleanly_without_checkpoints(tmp_path):
    """The gated validation script (VERDICT round-2 item 8) must exit 0
    with a SKIP message when its checkpoints are absent."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "tools/validate_detector.py",
         "--sam_checkpoint", str(tmp_path / "missing.pt")],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "SKIP" in out.stdout


def test_validate_image_body_runs_on_synthetic_detector():
    """validate_image (the per-image validation body real runs execute)
    works against the weight-free stub detector: reports proposals,
    per-class boxes with similarities, cross-class IoU, and the
    sim_thresh sweep — and the swept detector state is restored."""
    from tools.validate_detector import validate_image

    det = OpenVocabDetector(_blob_proposals, _color_embed_image,
                            _color_embed_texts, sim_thresh=0.3,
                            crop_size=16)
    img = _two_blob_image()
    rec = validate_image(det, img, ["red", "blue", "green"],
                         sweep=[0.1, 0.3, 0.99])
    assert rec["n_proposals"] == 2
    assert rec["per_class"]["red"] is not None
    assert rec["per_class"]["blue"] is not None
    assert rec["per_class"]["green"] is None
    assert rec["per_class"]["red"]["similarity"] > 0.3
    assert "red|blue" in rec["cross_class_box_iou"]
    assert not rec.get("overlap_violation")
    # a very high threshold detects nothing (the stub embedder's
    # red-crop similarity is ~0.93); a low one detects both
    assert rec["sim_thresh_sweep"]["0.99"]["red"] is False
    assert rec["sim_thresh_sweep"]["0.1"]["red"] is True
    assert det.sim_thresh == 0.3   # restored after the sweep


# --------------------------------------------------------------------------
# Adversarial layouts (VERDICT r3 item 7): occlusion, empty scenes,
# class ties, >2 candidates per class — weight-free via fixed embedders
# (embed_image receives all crops in proposal order, so a constant
# matrix pins each proposal's embedding exactly)
# --------------------------------------------------------------------------

def _props(boxes, h=64, w=96):
    out = []
    for x0, y0, x1, y1 in boxes:
        m = np.zeros((h, w), bool)
        m[int(y0):int(y1), int(x0):int(x1)] = True
        out.append(Proposal(m, np.asarray([x0, y0, x1, y1], np.float32),
                            0.9))
    return lambda image: list(out)


def _fixed_embeds(mat):
    mat = np.asarray(mat, np.float32)
    mat = mat / np.linalg.norm(mat, axis=-1, keepdims=True)
    return lambda crops: mat


def _fixed_texts(table):
    def f(texts):
        out = np.asarray([table[t] for t in texts], np.float32)
        return out / np.linalg.norm(out, axis=-1, keepdims=True)
    return f


def test_overlap_fallback_to_next_candidate():
    """Class B's TOP proposal overlaps class A's assignment; B must fall
    back to its next-best non-overlapping proposal — not disappear (the
    veto-to-None failure on crowded scenes)."""
    proposer = _props([(0, 0, 40, 40),     # P0: A's best
                       (8, 0, 48, 40),     # P1: B's best, IoU(P0)=0.67
                       (60, 0, 96, 40)])   # P2: B's runner-up, disjoint
    d = OpenVocabDetector(
        proposer,
        _fixed_embeds([[1, 0, 0], [0.6, 0.8, 0], [0, 0.5, 0.866]]),
        _fixed_texts({"A": [1, 0, 0], "B": [0, 1, 0]}),
        sim_thresh=0.3, crop_size=16)
    img = _two_blob_image()
    box_a = d(img, "A")
    box_b = d(img, "B")
    np.testing.assert_array_equal(box_a, [0, 0, 40, 40])
    np.testing.assert_array_equal(box_b, [60, 0, 96, 40])


def test_occluding_people_below_veto_both_assigned():
    """OMG's headline case is occlusion: two people whose regions
    moderately overlap (box IoU under the veto threshold) must BOTH get
    assigned — overlapping masks are legal downstream (the reference's
    fusion `+=` accumulates them, lora_pipeline.py:602)."""
    # widths 40 and 40, inter 16 -> IoU 16/64 = 0.25 < 0.5 veto
    proposer = _props([(0, 0, 40, 64), (24, 0, 64, 64)])
    d = OpenVocabDetector(
        proposer,
        _fixed_embeds([[1, 0.1, 0], [0.1, 1, 0]]),
        _fixed_texts({"man": [1, 0, 0], "woman": [0, 1, 0]}),
        sim_thresh=0.3, crop_size=16)
    img = _two_blob_image()
    assert d(img, "man") is not None
    assert d(img, "woman") is not None
    masks = d.masks_for(img, ["man", "woman"])
    assert all(m is not None for m in masks)
    # the occluded strip belongs to both masks
    assert np.logical_and(masks[0] > 0, masks[1] > 0).sum() > 0


def test_person_free_image_detects_nothing():
    """Zero proposals (e.g. a landscape): every class gets None and
    masks_for degrades to all-None (upstream: stage 2 is skipped,
    reference inference_lora.py:285)."""
    d = OpenVocabDetector(lambda image: [],
                          _fixed_embeds([[1, 0, 0]]),
                          _fixed_texts({"man": [1, 0, 0]}),
                          sim_thresh=0.3, crop_size=16)
    img = _two_blob_image()
    assert d(img, "man") is None
    assert d.masks_for(img, ["man", "woman" if False else "man"]) \
        == [None, None]


def test_class_tie_first_query_wins_second_falls_back():
    """Both classes' best proposal is the SAME region (a tie): the
    first-queried class takes it; the second must fall back to its own
    runner-up instead of sharing the region."""
    proposer = _props([(0, 0, 40, 40),      # tie target
                       (60, 0, 96, 40)])    # disjoint runner-up
    shared = [1, 0, 0]
    d = OpenVocabDetector(
        proposer,
        _fixed_embeds([shared, [0.5, 0.7, 0.51]]),
        _fixed_texts({"man": [1, 0.01, 0], "woman": [1, 0, 0.01]}),
        sim_thresh=0.3, crop_size=16)
    img = _two_blob_image()
    first = d(img, "man")
    second = d(img, "woman")
    np.testing.assert_array_equal(first, [0, 0, 40, 40])
    np.testing.assert_array_equal(second, [60, 0, 96, 40])


def test_many_candidates_per_class_picks_argmax():
    """>2 plausible candidates for one class: assignment is by highest
    similarity, and masks_for returns THAT proposal's mask (not the
    first plausible one)."""
    boxes = [(0, 0, 20, 20), (30, 0, 50, 20), (60, 0, 80, 20),
             (0, 40, 20, 60)]
    embeds = [[0.6, 0.8, 0], [0.8, 0.6, 0], [0.95, 0.31, 0],
              [0.7, 0.71, 0]]   # all clear "A" sims; index 2 is max
    d = OpenVocabDetector(
        _props(boxes), _fixed_embeds(embeds),
        _fixed_texts({"A": [1, 0, 0]}),
        sim_thresh=0.3, crop_size=16)
    img = _two_blob_image()
    box = d(img, "A")
    np.testing.assert_array_equal(box, [60, 0, 80, 20])
    mask = d.masks_for(img, ["A"])[0]
    assert mask[10, 70] == 1.0 and mask[10, 10] == 0.0


def test_cli_rejects_unconsumed_dino_checkpoint(tmp_path, monkeypatch):
    """An explicitly-set --dino_checkpoint with a non-GroundingDINO
    segment type must error loudly, not print-and-ignore (VERDICT r3
    weak #6: silently-noted dead flags trap users porting configs)."""
    import sys

    from omg_tpu.cli import inference_lora

    monkeypatch.setattr(sys, "argv", [
        "inference_lora",
        "--dino_checkpoint", str(tmp_path / "dino"),
        "--segment_type", "none",
    ])
    with pytest.raises(SystemExit, match="GroundingDINO"):
        inference_lora.main()
