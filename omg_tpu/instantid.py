"""InstantID support: face-keypoint condition rendering + identity tokens.

The reference crosses into insightface ONNX models for detection and the
512-d ArcFace embedding (reference: inference_instantid.py:226-228) —
those run once per reference image, off the hot path, and stay host-side
behind the ``FaceEmbedder`` protocol here. Everything downstream (the
Resampler projection to 16 image-prompt tokens, the IdentityNet
condition image, the decoupled IP attention) is TPU-resident.
"""

from __future__ import annotations

import math
from typing import Protocol, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from omg_tpu.config import ResamplerConfig
from omg_tpu.models import resampler as resampler_lib

Array = jax.Array

# 5-keypoint face skeleton: eyes, nose, mouth corners; limbs all connect
# to the nose (index 2) (reference: instantid_single_pieline.py:107-134,
# multi-face variant inference_instantid.py:127-156).
KPS_COLORS = ((255, 0, 0), (0, 255, 0), (0, 0, 255),
              (255, 255, 0), (255, 0, 255))
_LIMBS = ((0, 2), (1, 2), (3, 2), (4, 2))
_STICKWIDTH = 4
_POINT_RADIUS = 10


def _fill_rotated_ellipse(img: np.ndarray, cx: float, cy: float,
                          a: float, b: float, angle_rad: float,
                          color: Sequence[int]) -> None:
    h, w = img.shape[:2]
    y0 = max(0, int(cy - a - b - 2))
    y1 = min(h, int(cy + a + b + 3))
    x0 = max(0, int(cx - a - b - 2))
    x1 = min(w, int(cx + a + b + 3))
    if y0 >= y1 or x0 >= x1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1]
    dx = xx - cx
    dy = yy - cy
    c, s = math.cos(angle_rad), math.sin(angle_rad)
    u = dx * c + dy * s
    v = -dx * s + dy * c
    inside = (u / max(a, 1e-6)) ** 2 + (v / max(b, 1e-6)) ** 2 <= 1.0
    img[y0:y1, x0:x1][inside] = color


def draw_kps(height: int, width: int,
             kps_list: Sequence[np.ndarray]) -> np.ndarray:
    """Render face keypoints into an IdentityNet condition image.

    ``kps_list``: one [5, 2] (x, y) array per face (the multi-face
    variant the OMG InstantID path needs, reference:
    inference_instantid.py:127-156). Returns uint8 [H, W, 3].
    """
    out = np.zeros((height, width, 3), np.float32)
    for kps in kps_list:
        kps = np.asarray(kps, np.float32)
        for i, (p, q) in enumerate(_LIMBS):
            color = np.asarray(KPS_COLORS[p], np.float32) * 0.6
            x0, y0 = kps[p]
            x1, y1 = kps[q]
            length = math.hypot(x1 - x0, y1 - y0)
            angle = math.atan2(y0 - y1, x0 - x1)
            _fill_rotated_ellipse(out, (x0 + x1) / 2, (y0 + y1) / 2,
                                  length / 2, _STICKWIDTH, angle, color)
    for kps in kps_list:
        kps = np.asarray(kps, np.float32)
        for idx, (x, y) in enumerate(kps):
            _fill_rotated_ellipse(out, x, y, _POINT_RADIUS, _POINT_RADIUS,
                                  0.0, KPS_COLORS[idx])
    return out.astype(np.uint8)


def kps_image_to_cond(img: np.ndarray) -> Array:
    """uint8 [H, W, 3] -> [1, H, W, 3] float in [0, 1] (diffusers
    ControlNet conditioning normalization)."""
    return jnp.asarray(img, jnp.float32)[None] / 255.0


class FaceEmbedder(Protocol):
    """Host-side identity embedding provider (insightface 'antelopev2' in
    the reference; any callable producing (kps [5,2], arcface [512]) per
    detected face works — e.g. precomputed .npy fixtures)."""

    def __call__(self, image: np.ndarray) -> Sequence[tuple]:
        ...


def face_region_box(kps: np.ndarray, image_hw: tuple,
                    expand: float = 1.6, body_factor: float = 4.0
                    ) -> np.ndarray:
    """Person-region box [x0, y0, x1, y1] from 5-point face keypoints.

    Detector-free region prior for the InstantID path: the face span is
    widened ``expand``x horizontally and extended ``body_factor`` face
    heights downward (a standing/sitting torso heuristic), clipped to
    the image. Used to prompt SAM when no open-vocab detector is
    plugged in (the reference requires YOLO-World/GroundingDINO pip
    models for this step, inference_lora.py:91-126).
    """
    kps = np.asarray(kps, np.float32)
    h, w = image_hw
    x0, y0 = kps[:, 0].min(), kps[:, 1].min()
    x1, y1 = kps[:, 0].max(), kps[:, 1].max()
    cx = (x0 + x1) / 2
    face_w = max(x1 - x0, 1.0)
    face_h = max(y1 - y0, 1.0)
    half_w = face_w * expand
    top = y0 - face_h * 1.0
    bottom = y1 + face_h * body_factor
    return np.array([max(0.0, cx - half_w), max(0.0, top),
                     min(float(w), cx + half_w), min(float(h), bottom)],
                    np.float32)


def make_kps_box_provider(faces_kps):
    """box_provider(image, text) -> region box cycling through the
    per-concept face keypoints (concept order == rewrite region order)."""
    state = {"i": 0}

    def provider(image, text):
        if not faces_kps:
            return None
        kps = faces_kps[state["i"] % len(faces_kps)]
        state["i"] += 1
        if kps is None:
            return None
        return face_region_box(kps, image.shape[:2])

    return provider


def encode_face_tokens(params: dict, cfg: ResamplerConfig,
                       embedding: Array) -> Array:
    """ArcFace embedding [E] (or [N, E]) -> CFG-stacked image-prompt
    tokens [2, num_queries, output_dim].

    Row 0 is the unconditional branch: the Resampler applied to a zeros
    embedding (reference: instantid_single_pieline.py:233-238), NOT zero
    tokens.
    """
    emb = jnp.asarray(embedding)
    emb = emb.reshape(1, -1, cfg.embedding_dim)
    stacked = jnp.concatenate([jnp.zeros_like(emb), emb], axis=0)
    return resampler_lib.apply(params, cfg, stacked)


_FACE_APP = None


def _face_analysis_app():
    """Module-cached insightface FaceAnalysis: the ONNX detection +
    recognition stack loads hundreds of MB from disk — build it ONCE
    like the reference's app-startup FaceAnalysis, not per request."""
    global _FACE_APP
    if _FACE_APP is None:
        try:
            from insightface.app import FaceAnalysis
        except ImportError as e:
            raise RuntimeError(
                "insightface is not installed: pass precomputed "
                "face_embeddings/face_kps in the request, or inject "
                "face_provider=... into OMGServer") from e
        app = FaceAnalysis(name="antelopev2",
                           providers=["CPUExecutionProvider"])
        app.prepare(ctx_id=0, det_size=(640, 640))
        _FACE_APP = app
    return _FACE_APP


def analyze_faces(image_rgb: np.ndarray):
    """[(kps [5,2], embedding [512]), ...] for ALL detected faces.

    The reference detects every face on the STAGE-1 image and renders
    all their keypoint skeletons as the stage-2 IdentityNet condition
    (face_app.get + draw_kps_multi, inference_instantid.py:352-354)."""
    app = _face_analysis_app()
    faces = app.get(image_rgb[:, :, ::-1])
    return [(np.asarray(f.kps, np.float32),
             np.asarray(f.embedding, np.float32)) for f in faces]


def stage1_kps_provider(image_rgb: np.ndarray):
    """Default face_kps_provider for OMG.generate: detect all faces on
    the stage-1 image and render their skeletons AT CANVAS COORDINATES
    (reference-photo keypoints live in the photo's own frame and would
    land in the wrong place)."""
    faces = analyze_faces(image_rgb)
    if not faces:
        return None
    return draw_kps(image_rgb.shape[0], image_rgb.shape[1],
                    [k for k, _ in faces])


def analyze_face(image_rgb: np.ndarray):
    """-> (kps [5, 2], embedding [512]) for the LARGEST face in the image.

    The reference's FaceAnalysis('antelopev2') flow (inference_instantid.py:
    226-228; largest-face pick at instantid_pipeline.py:757-768).
    insightface runs host-side ONNX — once per reference image, off the
    hot path. Raises with guidance when insightface is unavailable
    (serving callers can inject a custom face_provider instead).
    """
    app = _face_analysis_app()
    faces = app.get(image_rgb[:, :, ::-1])     # insightface wants BGR
    if not faces:
        raise ValueError("no face detected in the reference image")
    face = max(faces, key=lambda f: (f.bbox[2] - f.bbox[0])
               * (f.bbox[3] - f.bbox[1]))
    return np.asarray(face.kps, np.float32), np.asarray(face.embedding,
                                                        np.float32)
