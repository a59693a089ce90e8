"""Spatial-condition preprocessing for serving.

Role of the reference's in-app preprocessors (reference:
gradio_demo/app.py:315-357): turn a user image into a ControlNet
condition — Canny edges (cv2), or pass-through pose/depth maps computed
by external models — and snap the generation resolution to the SDXL
aspect-ratio bucket closest to the condition image
(app.py:300-309,395-420). Bucketing doubles as recompilation control:
nine shapes bound the compiled-program cache.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# The nine SDXL training aspect buckets (reference: app.py:300-309).
RESOLUTIONS = [
    (1024, 1024), (1152, 896), (896, 1152), (1216, 832), (832, 1216),
    (1344, 768), (768, 1344), (1536, 640), (640, 1536),
]


def snap_resolution(height: int, width: int) -> Tuple[int, int]:
    """Closest bucket by aspect ratio."""
    ratio = width / height
    return min(RESOLUTIONS, key=lambda hw: abs(hw[1] / hw[0] - ratio))


def resize_and_center_crop(image: np.ndarray, height: int,
                           width: int) -> np.ndarray:
    """Cover-fit an image into (height, width)
    (reference: app.py:266-290)."""
    import PIL.Image
    h, w = image.shape[:2]
    scale = max(height / h, width / w)
    nh, nw = round(h * scale), round(w * scale)
    img = np.asarray(PIL.Image.fromarray(image).resize(
        (nw, nh), PIL.Image.LANCZOS))
    top = (nh - height) // 2
    left = (nw - width) // 2
    return img[top:top + height, left:left + width]


def canny(image: np.ndarray, low: int = 100, high: int = 200) -> np.ndarray:
    """Canny edge condition (reference: app.py:332-338)."""
    import cv2
    edges = cv2.Canny(image, low, high)
    return np.stack([edges] * 3, axis=-1)


# Reference UI condition labels -> canonical kinds (app.py:310-314).
_KINDS = {"human pose": "pose", "canny edge": "canny", "depth": "depth",
          "pose": "pose", "canny": "canny"}


def condition_kind(kind: Optional[str]) -> Optional[str]:
    if kind in (None, "", "None"):
        return None
    return _KINDS.get(kind.strip().lower(), kind.strip().lower())


def prepare_condition(image: Optional[np.ndarray], kind: str,
                      height: int, width: int, *,
                      pose_provider=None,
                      depth_provider=None) -> Optional[np.ndarray]:
    """Photo -> ControlNet condition map at (height, width).

    kind in {None, 'canny', 'pose', 'depth'} (or the reference UI labels
    'Human pose' / 'Canny Edge' / 'Depth', app.py:310-314).
      * canny: cv2 edges (reference: app.py:332-338)
      * pose:  ``pose_provider(photo) -> skeleton map`` — the in-framework
        OpenPose body model (models/openpose.py:BodyEstimator), matching
        the reference's controlnet_aux flow (app.py:315-330)
      * depth: ``depth_provider(photo, out_size) -> inverse-depth map`` —
        the in-framework DPT (models/dpt.py:DepthEstimator), matching
        app.py:340-357.
    Without a provider, a pose/depth image is passed through as a
    precomputed map.
    """
    kind = condition_kind(kind)
    if image is None or kind is None:
        return None
    image = resize_and_center_crop(image, height, width)
    if kind == "canny":
        return canny(image)
    if kind == "pose" and pose_provider is not None:
        return np.asarray(pose_provider(image))
    if kind == "depth" and depth_provider is not None:
        return np.asarray(depth_provider(image, (height, width)))
    return image
