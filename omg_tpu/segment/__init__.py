"""Visual comprehension: open-vocabulary detection + segmentation.

The reference's mask stack (reference: inference_lora.py:91-126) is
YOLO-World or GroundingDINO detection followed by EfficientViT-SAM or
SAM-ViT-H mask prediction. Here the pipeline consumes a ``MaskProvider``
callable — (stage-1 image uint8 [H, W, 3], class text) -> binary [H, W]
mask or None — and this module builds providers:

  * "sam" — EfficientViT-SAM (segment/efficientvit.py) or the original
    SAM ViT-H (segment/vit_sam.py), auto-detected from the checkpoint's
    keys (xl1.pt vs sam_vit_h_4b8939.pth — the reference's two
    segment_type stacks), prompted by a detector box; the detector is
    pluggable (box_provider).
  * "external" — any user callable (e.g. host-side YOLO-World the user
    already runs); keeps configs usable when no SAM weights exist.
  * "none" — disables stage 2 (single-concept runs, BASELINE config #1).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Optional

import numpy as np


def image_fingerprint(image: np.ndarray) -> tuple:
    """Content key for per-image caches. id(image) is NOT a valid key:
    CPython reuses ids after GC, so a steady-state serving loop can hand
    a new image the previous image's cached features."""
    h = hashlib.blake2b(np.ascontiguousarray(image).tobytes(),
                        digest_size=16).hexdigest()
    return (image.shape, str(image.dtype), h)


def build_mask_provider(kind: str, *, sam_checkpoint: str = "",
                        external: Optional[Callable] = None,
                        box_provider: Optional[Callable] = None,
                        clip_checkpoint: str = "",
                        clip_text_checkpoint: str = "",
                        tokenizer=None,
                        **_ignored):
    """``clip_checkpoint``/``clip_text_checkpoint``: CLIP image/text tower
    safetensors — when given (and no explicit box_provider), detection is
    the in-framework open-vocab detector (SAM grid proposals ranked by
    CLIP, segment/detector.py) instead of the whole-image fallback."""
    kind = (kind or "none").lower()
    if kind in ("none", ""):
        return None
    if kind == "external":
        if external is None:
            raise ValueError("external mask provider requires `external=`")
        return external
    if kind in ("sam", "yoloworld", "groundingdino", "openvocab"):
        from omg_tpu.segment.sam_provider import (SamMaskProvider,
                                                  convert_sam_checkpoint)
        if box_provider is None and clip_checkpoint:
            from omg_tpu import config as cfglib
            from omg_tpu import convert
            from omg_tpu.segment.detector import build_openvocab_detector
            sam_params = convert_sam_checkpoint(sam_checkpoint)
            # matched CLIP pair: B/32 vision + B/32 text share the 512-d
            # embedding space (a CLIP-L text tower here would neither
            # run at these head counts nor project into this space)
            v_cfg = cfglib.clip_vit_b32_vision()
            v_params = convert.convert_clip_vision(clip_checkpoint)
            t_cfg = cfglib.clip_vit_b32_text()
            t_params = convert.convert_clip(clip_text_checkpoint or
                                            clip_checkpoint,
                                            dtype=t_cfg.dtype)
            box_provider = build_openvocab_detector(
                sam_params, clip_vision_params=v_params,
                clip_vision_cfg=v_cfg, clip_text_params=t_params,
                clip_text_cfg=t_cfg, tokenizer=tokenizer)
            return SamMaskProvider(params=sam_params,
                                   box_provider=box_provider)
        return SamMaskProvider(sam_checkpoint, box_provider=box_provider)
    raise ValueError(f"unknown segment kind: {kind}")
