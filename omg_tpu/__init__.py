"""omg_tpu — TPU-native multi-concept personalized SDXL generation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of kongzhecn/OMG
(two-stage multi-concept SDXL inference with prompt-to-prompt attention
control, per-concept LoRA / InstantID personalization, region-mask noise
fusion, ControlNet conditioning, and on-device detection/segmentation).

Design stance (vs. the torch reference, see SURVEY.md):
  * Models are pure functions over nested-dict parameter pytrees
    (`init_params(rng, cfg)` + `apply(params, ...)`), named to mirror the
    HF/diffusers checkpoint layout so torch->JAX conversion is mechanical.
  * OMG's three behavioural hooks — prompt-to-prompt attention replace
    (reference: src/prompt_attention/p2p_attention.py), stage-2 region
    fusion (reference: src/pipelines/lora_pipeline.py:568-607) and
    IP-Adapter dual cross-attention (reference:
    src/ip_adapter/attention_processor.py:296) — are first-class *inputs*
    of one jitted denoise step, not attention-processor monkey patches.
  * LoRA adapters are low-rank delta pytrees applied inside the linear
    layers at runtime, so the base UNet and every concept UNet share one
    compiled XLA program and can be vmapped/sharded over concepts.
"""

__version__ = "0.2.0"

# Lazy convenience exports (keep `import omg_tpu` light — the engine
# pulls in the full model zoo).
_LAZY = {
    "OMG": ("omg_tpu.pipelines.omg", "OMG"),
    "InstantIDModels": ("omg_tpu.pipelines.omg", "InstantIDModels"),
    "load_sdxl": ("omg_tpu.loader", "load_sdxl"),
    "load_lora": ("omg_tpu.lora", "load_lora"),
    "build_mask_provider": ("omg_tpu.segment", "build_mask_provider"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'omg_tpu' has no attribute {name!r}")
