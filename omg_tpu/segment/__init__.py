"""Visual comprehension: open-vocabulary detection + segmentation.

The reference's mask stack (reference: inference_lora.py:91-126) is
YOLO-World or GroundingDINO detection followed by EfficientViT-SAM or
SAM-ViT-H mask prediction. Here the pipeline consumes a ``MaskProvider``
callable — (stage-1 image uint8 [H, W, 3], class text) -> binary [H, W]
mask or None — and this module builds providers:

  * "sam" — EfficientViT-SAM (JAX, segment/efficientvit.py) prompted by
    a detector box; the detector is pluggable (box_provider).
  * "external" — any user callable (e.g. host-side YOLO-World the user
    already runs); keeps configs usable when no SAM weights exist.
  * "none" — disables stage 2 (single-concept runs, BASELINE config #1).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def build_mask_provider(kind: str, *, sam_checkpoint: str = "",
                        external: Optional[Callable] = None,
                        box_provider: Optional[Callable] = None,
                        **_ignored):
    kind = (kind or "none").lower()
    if kind in ("none", ""):
        return None
    if kind == "external":
        if external is None:
            raise ValueError("external mask provider requires `external=`")
        return external
    if kind in ("sam", "yoloworld", "groundingdino"):
        from omg_tpu.segment.sam_provider import SamMaskProvider
        return SamMaskProvider(sam_checkpoint, box_provider=box_provider)
    raise ValueError(f"unknown segment kind: {kind}")
