"""SAM predictor + the MaskProvider used by the OMG pipeline.

Mirrors the reference's predictor flow (reference:
src/efficientvit/models/efficientvit/sam.py:244-459): resize the long
side to 1024, normalize, pad; cache the image embedding; prompt with a
detector box; decode multimask; pick the best by IoU; upscale + crop
back to the original size; threshold at 0.

Detection is pluggable (``box_provider(image, text) -> xyxy | None``):
the reference uses YOLO-World / GroundingDINO pip packages
(inference_lora.py:91-126), which are external host-side models; absent
one, the provider falls back to a whole-image box.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from omg_tpu import convert
from omg_tpu.segment import efficientvit as evit
from omg_tpu.segment import evit_ops as ops
from omg_tpu.segment import sam_decoder as dec
from omg_tpu.segment import vit_sam

Array = jax.Array

_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_STD = np.array([58.395, 57.12, 57.375], np.float32)


def convert_sam_checkpoint(path_or_sd, *, dtype=jnp.float32) -> dict:
    """SAM checkpoint -> {"image_encoder", "prompt_encoder",
    "mask_decoder"} trees.

    Accepts BOTH encoder families the reference uses
    (inference_lora.py:92-124): EfficientViT-SAM (xl1.pt) and the
    original SAM ViT-H (sam_vit_h_4b8939.pth) — the family is detected
    from the keys and the right converter applied.
    """
    sd = (convert.load_state_dict(path_or_sd)
          if isinstance(path_or_sd, str) else path_or_sd)

    def sub(prefix, transpose_ct=()):
        part = {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}
        for key in list(part.keys()):
            if any(key.startswith(p) and key.endswith("weight")
                   for p in transpose_ct):
                # ConvTranspose2d [in, out, k, k] -> [k, k, out, in]
                # (consumed with transpose_kernel=True, sam_decoder.py)
                part[key] = np.asarray(part[key]).transpose(2, 3, 1, 0)
        return convert.state_dict_to_tree(part, dtype=dtype)

    if any(k.startswith("image_encoder.patch_embed.") for k in sd):
        # original SAM ViT encoder: pos_embed/rel_pos tables need the
        # family-specific conversion rules (segment/vit_sam.py)
        enc = vit_sam.convert_encoder(
            {k[len("image_encoder."):]: v for k, v in sd.items()
             if k.startswith("image_encoder.")}, dtype=dtype)
    else:
        enc = sub("image_encoder.")
    return {
        "image_encoder": enc,
        "prompt_encoder": sub("prompt_encoder."),
        "mask_decoder": sub("mask_decoder.",
                            transpose_ct=("output_upscaling.0",
                                          "output_upscaling.3")),
    }


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_image(cfg, params: dict, x: Array) -> Array:
    if isinstance(cfg, vit_sam.VitSamConfig):
        return vit_sam.encoder_apply(params, cfg, x)
    return evit.encoder_apply(params, cfg, x)


@jax.jit
def _decode_box(prompt_params: dict, decoder_params: dict, embedding: Array,
                box: Array, input_size: Array) -> tuple:
    sparse = dec.encode_boxes(prompt_params, box[None], input_size)
    dense = dec.no_mask_dense(prompt_params, 1, embedding.shape[1])
    masks, iou = dec.decode_masks(decoder_params, prompt_params,
                                  embedding, sparse, dense)
    return masks[0], iou[0]


class SamPredictor:
    """set_image once, predict boxes many times (features cached on-device,
    reference: sam.py:276-295)."""

    def __init__(self, params: dict, cfg=None):
        self.params = params
        if cfg is None:
            # encoder family + zoo geometry from the converted tree
            enc = params["image_encoder"]
            if "patch_embed" in enc:
                # geometry read off the tree: ViT-B/L/H all resolve
                cfg = vit_sam.config_from_params(enc)
            else:
                cfg = evit.infer_config(enc) or evit.xl1_config()
        self.cfg = cfg
        self._embedding = None
        self._orig_size = None
        self._input_size = None

    # -- preprocessing ---------------------------------------------------

    def _preprocess(self, image: np.ndarray) -> np.ndarray:
        s = self.cfg.image_size
        h, w = image.shape[:2]
        scale = s / max(h, w)
        nh, nw = round(h * scale), round(w * scale)
        import PIL.Image
        resized = np.asarray(PIL.Image.fromarray(image).resize(
            (nw, nh), PIL.Image.BILINEAR), np.float32)
        resized = (resized - _MEAN) / _STD
        out = np.zeros((s, s, 3), np.float32)
        out[:nh, :nw] = resized
        self._input_size = (nh, nw)
        return out

    def set_image(self, image: np.ndarray) -> None:
        self._orig_size = image.shape[:2]
        x = self._preprocess(image)[None]
        self._embedding = _encode_image(
            self.cfg, self.params["image_encoder"],
            jnp.asarray(x, self.cfg.dtype))

    def predict_box(self, box_xyxy: np.ndarray) -> tuple:
        """-> (mask [H, W] bool at original size, iou score float)."""
        assert self._embedding is not None, "call set_image first"
        h, w = self._orig_size
        nh, nw = self._input_size
        scale = self.cfg.image_size / max(h, w)
        box = jnp.asarray(np.asarray(box_xyxy, np.float32) * scale)
        masks, iou = _decode_box(
            self.params["prompt_encoder"], self.params["mask_decoder"],
            self._embedding, box,
            jnp.asarray(self.cfg.image_size, jnp.float32))
        # multimask selection: rows 1:4, best IoU (predictor behavior)
        best = int(np.argmax(np.asarray(iou[1:]))) + 1
        m = masks[best][None, :, :, None]
        s = self.cfg.image_size
        m = ops.bilinear_resize(m, (s, s))[0, :nh, :nw]
        m = ops.bilinear_resize(m[None], (h, w))[0, :, :, 0]
        return np.asarray(m > 0.0), float(iou[best])


def full_image_box(image: np.ndarray, text: str):
    h, w = image.shape[:2]
    return np.array([0.0, 0.0, w, h], np.float32)


class SamMaskProvider:
    """MaskProvider: detector box -> SAM mask (reference predict_mask,
    inference_lora.py:91-126)."""

    def __init__(self, checkpoint: str = "",
                 box_provider: Optional[Callable] = None,
                 params: Optional[dict] = None,
                 cfg: Optional[evit.EViTSamConfig] = None):
        if params is None:
            params = convert_sam_checkpoint(checkpoint)
        self.predictor = SamPredictor(params, cfg)
        self.box_provider = box_provider or full_image_box
        self._cached_image_id = None

    def __call__(self, image: np.ndarray, text: str):
        from omg_tpu.segment import image_fingerprint
        box = self.box_provider(image, text)
        if box is None:
            return None
        img_id = image_fingerprint(image)
        if img_id != self._cached_image_id:
            self.predictor.set_image(image)
            self._cached_image_id = img_id
        mask, _score = self.predictor.predict_box(box)
        return mask.astype(np.float32)

    def masks_for(self, image: np.ndarray, texts) -> list:
        """Batch form the pipelines call when they know every concept
        class up front: a box_provider that can assign classes JOINTLY
        (OpenVocabDetector.assign_jointly — global max similarity over
        (class, proposal) pairs) does so here, removing the query-order
        dependence of repeated single-class calls (an early class with
        a weaker affinity stealing a later class's best region —
        measured on the synthetic-composite eval). Other box_providers
        fall back to per-class calls unchanged."""
        joint = getattr(self.box_provider, "assign_jointly", None)
        if joint is not None:
            joint(image, list(texts))
        # per-text calls now consult the joint assignment (the detector
        # caches it per image); non-joint providers take the old path
        return [self(image, t) for t in texts]
