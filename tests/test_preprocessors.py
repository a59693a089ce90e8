"""Pose/depth condition preprocessors (reference: gradio_demo/app.py
:315-357 computes these with controlnet_aux OpenPose + transformers DPT).

DPT is parity-tested against transformers DPTForDepthEstimation at a tiny
random config; OpenPose is parity-tested against an independent torch
re-implementation of the two-branch CMU network, and its PAF decode is
exercised on synthetic heatmaps/fields (two people -> two subsets).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# DPT
# --------------------------------------------------------------------------

def _tiny_hf_dpt():
    torch = pytest.importorskip("torch")
    from transformers import DPTConfig, DPTForDepthEstimation
    cfg = DPTConfig(hidden_size=32, num_hidden_layers=4,
                    num_attention_heads=2, intermediate_size=64,
                    image_size=64, patch_size=16,
                    neck_hidden_sizes=[16, 16, 32, 32],
                    fusion_hidden_size=16,
                    backbone_out_indices=[0, 1, 2, 3])
    torch.manual_seed(0)
    model = DPTForDepthEstimation(cfg).eval()
    return model, cfg


def test_dpt_matches_transformers():
    torch = pytest.importorskip("torch")
    from omg_tpu import convert
    from omg_tpu.models import dpt as dpt_lib

    model, _ = _tiny_hf_dpt()
    cfg = dpt_lib.tiny_config()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert.convert_dpt(sd, cfg)

    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(img)).predicted_depth.numpy()

    got = np.asarray(dpt_lib.apply(
        params, cfg, jnp.asarray(img.transpose(0, 2, 3, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_dpt_resized_input_runs():
    """Position-embedding interpolation path (non-native input size)."""
    from omg_tpu.models import dpt as dpt_lib
    cfg = dpt_lib.tiny_config()
    params = dpt_lib.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 96, 96, 3))
    out = dpt_lib.apply(params, cfg, x)
    assert out.shape == (1, 96, 96)


def test_depth_estimator_provider():
    from omg_tpu.models import dpt as dpt_lib
    cfg = dpt_lib.tiny_config()
    est = dpt_lib.DepthEstimator(
        dpt_lib.init_params(jax.random.PRNGKey(0), cfg), cfg)
    img = np.random.default_rng(0).integers(
        0, 255, (120, 90, 3), np.uint8)
    out = est(img, out_size=(64, 48))
    assert out.shape == (64, 48, 3) and out.dtype == np.uint8
    # min-max normalized: full range present
    assert out.max() == 255 and out.min() == 0


# --------------------------------------------------------------------------
# OpenPose network parity (independent torch re-implementation)
# --------------------------------------------------------------------------

def _torch_body(params):
    """Independent torch re-implementation of the CMU body graph driven
    by the SAME param tree (converted back to torch layouts)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from omg_tpu.models import openpose as op

    w = {k: {kk: torch.from_numpy(np.asarray(vv, np.float32))
             for kk, vv in v.items()} for k, v in params.items()}

    def conv(name, x, k):
        weight = w[name]["weight"].permute(3, 2, 0, 1)   # HWIO -> OIHW
        return F.conv2d(x, weight, w[name]["bias"], padding=k // 2)

    def run_seq(x, seq, final_relu):
        convs = [c for c in seq if c != "pool"]
        last = convs[-1][0]
        for item in seq:
            if item == "pool":
                x = F.max_pool2d(x, 2, 2)
                continue
            name, _, _, k = item
            x = conv(name, x, k)
            if final_relu or name != last:
                x = F.relu(x)
        return x

    def forward(x):
        feat = run_seq(x, op._TRUNK, True)
        paf = run_seq(feat, op._stage1("L1", op.PAF_CH), False)
        heat = run_seq(feat, op._stage1("L2", op.HEAT_CH), False)
        for n in range(2, 7):
            h = torch.cat([paf, heat, feat], dim=1)
            paf = run_seq(h, op._stageN(n, "L1", op.PAF_CH), False)
            heat = run_seq(h, op._stageN(n, "L2", op.HEAT_CH), False)
        return paf, heat

    return forward


def test_openpose_matches_torch_reimplementation():
    torch = pytest.importorskip("torch")
    from omg_tpu.models import openpose as op

    params = op.init_params(jax.random.PRNGKey(0), width_mult=0.125)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 48, 64, 3)).astype(np.float32) * 0.1

    paf_j, heat_j = op.apply(params, jnp.asarray(x))
    fwd = _torch_body(params)
    with torch.no_grad():
        paf_t, heat_t = fwd(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(paf_j),
                               paf_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(heat_j),
                               heat_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=2e-3)
    assert paf_j.shape == (1, 6, 8, op.PAF_CH)       # stride 8
    assert heat_j.shape == (1, 6, 8, op.HEAT_CH)


def test_openpose_convert_state_dict_layouts():
    from omg_tpu.models import openpose as op
    sd = {
        "model0.conv1_1.weight": np.zeros((64, 3, 3, 3), np.float32),
        "model0.conv1_1.bias": np.zeros((64,), np.float32),
        "Mconv7_stage6_L2.weight": np.zeros((19, 128, 1, 1), np.float32),
        "Mconv7_stage6_L2.bias": np.zeros((19,), np.float32),
    }
    p = op.convert_state_dict(sd)
    assert p["conv1_1"]["weight"].shape == (3, 3, 3, 64)
    assert p["Mconv7_stage6_L2"]["weight"].shape == (1, 1, 128, 19)


# --------------------------------------------------------------------------
# PAF decode on synthetic fields
# --------------------------------------------------------------------------

def _synthetic_person(heat, paf, neck_xy, offset):
    """Paint one person: all 18 parts in a vertical-ish layout, with
    consistent PAFs along each limb."""
    from omg_tpu.models import openpose as op
    H, W = heat.shape[:2]
    # simple skeleton: spread parts on a grid below the neck
    pts = {}
    nx, ny = neck_xy
    layout = {1: (0, 0), 0: (0, -8), 14: (-3, -10), 15: (3, -10),
              16: (-6, -9), 17: (6, -9),
              2: (-6, 1), 3: (-8, 8), 4: (-9, 15),
              5: (6, 1), 6: (8, 8), 7: (9, 15),
              8: (-4, 14), 9: (-4, 22), 10: (-4, 30),
              11: (4, 14), 12: (4, 22), 13: (4, 30)}
    yy_g, xx_g = np.mgrid[0:H, 0:W].astype(np.float32)
    for part, (dx, dy) in layout.items():
        x, y = nx + dx + offset, ny + dy
        if 0 <= y < H and 0 <= x < W:
            # wide gaussian blob: survives find_peaks' sigma-3 smoothing
            blob = np.exp(-((xx_g - x) ** 2 + (yy_g - y) ** 2) / (2 * 4.0 ** 2))
            heat[:, :, part] = np.maximum(heat[:, :, part], blob)
            pts[part] = (x, y)
    for k, (a, b) in enumerate(op.LIMB_SEQ):
        a, b = a - 1, b - 1
        if a not in pts or b not in pts:
            continue
        (xa, ya), (xb, yb) = pts[a], pts[b]
        vec = np.array([xb - xa, yb - ya], np.float32)
        vec /= max(np.linalg.norm(vec), 1e-6)
        ca, cb = op.MAP_IDX[k][0] - 19, op.MAP_IDX[k][1] - 19
        for t in np.linspace(0, 1, 24):
            x = int(round(xa + t * (xb - xa)))
            y = int(round(ya + t * (yb - ya)))
            for ddy in (-1, 0, 1):
                for ddx in (-1, 0, 1):
                    yy, xx = y + ddy, x + ddx
                    if 0 <= yy < H and 0 <= xx < W:
                        paf[yy, xx, ca] = vec[0]
                        paf[yy, xx, cb] = vec[1]
    return heat, paf


def test_paf_decode_two_people():
    from omg_tpu.models import openpose as op
    H, W = 96, 128
    heat = np.zeros((H, W, op.HEAT_CH), np.float32)
    paf = np.zeros((H, W, op.PAF_CH), np.float32)
    _synthetic_person(heat, paf, (30, 40), 0)
    _synthetic_person(heat, paf, (90, 40), 0)

    peaks = op.find_peaks(heat, thre1=0.1)
    conn, special = op.score_limbs(paf, peaks, H)
    candidate, subset = op.assemble_people(peaks, conn, special)
    assert len(subset) == 2
    # both people near-complete (>= 15 of 18 parts)
    assert all(row[-1] >= 15 for row in subset)
    # skeleton rendering smoke: draws colored pixels
    canvas = op.draw_bodypose(np.zeros((H, W, 3), np.uint8),
                              candidate, subset)
    assert canvas.sum() > 0


def test_body_estimator_end_to_end_tiny():
    """Random tiny-width model on a small photo: runs without error and
    returns a canvas of the input size (decode may find nobody)."""
    from omg_tpu.models import openpose as op
    est = op.BodyEstimator(
        op.init_params(jax.random.PRNGKey(0), width_mult=0.125),
        boxsize=64)
    img = np.random.default_rng(0).integers(0, 255, (80, 60, 3), np.uint8)
    out = est(img)
    assert out.shape == img.shape and out.dtype == np.uint8
