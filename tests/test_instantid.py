"""InstantID host utilities: kps rendering, region boxes, token encoding."""

import jax
import numpy as np

from omg_tpu import config as cfglib
from omg_tpu import instantid
from omg_tpu.models import resampler as rs_lib


def test_draw_kps_renders_limbs_and_points():
    kps = [np.array([[20, 30], [60, 30], [40, 45], [28, 60], [52, 60]],
                    np.float32)]
    img = instantid.draw_kps(96, 96, kps)
    assert img.shape == (96, 96, 3)
    # points drawn at full color, limbs at 0.6 intensity
    assert img.max() == 255
    assert (img > 0).any(axis=-1).sum() > 300


def test_draw_kps_multi_face():
    k1 = np.array([[10, 10], [20, 10], [15, 15], [12, 20], [18, 20]])
    k2 = k1 + 40
    img = instantid.draw_kps(96, 96, [k1, k2])
    on = (img > 0).any(axis=-1)
    assert on[:30, :30].any() and on[45:90, 45:90].any()


def test_face_region_box():
    kps = np.array([[40, 20], [60, 20], [50, 28], [44, 36], [56, 36]],
                   np.float32)
    box = instantid.face_region_box(kps, (128, 128))
    x0, y0, x1, y1 = box
    assert 0 <= x0 < 40 and x1 > 60
    assert y1 > 36 + 2 * 16  # extends well below the face
    assert y1 <= 128 and x1 <= 128


def test_kps_box_provider_cycles():
    k1 = np.array([[10, 10], [20, 10], [15, 15], [12, 20], [18, 20]])
    provider = instantid.make_kps_box_provider([k1, None])
    img = np.zeros((64, 64, 3), np.uint8)
    b1 = provider(img, "man")
    b2 = provider(img, "woman")
    assert b1 is not None and b2 is None
    assert instantid.make_kps_box_provider([])(img, "x") is None


def test_encode_face_tokens_cfg_rows():
    cfg = cfglib.tiny_resampler()
    params = rs_lib.init_params(jax.random.PRNGKey(0), cfg)
    emb = np.random.randn(cfg.embedding_dim).astype(np.float32)
    toks = instantid.encode_face_tokens(params, cfg, emb)
    assert toks.shape == (2, cfg.num_queries, cfg.output_dim)
    # row 0 is resampler(zeros) — a fixed unconditional, not zero tokens
    toks2 = instantid.encode_face_tokens(params, cfg, emb * 2.0)
    np.testing.assert_allclose(np.asarray(toks[0]), np.asarray(toks2[0]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(toks[1]), np.asarray(toks2[1]))
