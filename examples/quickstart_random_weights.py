"""Zero-checkpoint quickstart: the full OMG two-stage flow on CPU.

Runs the complete engine — stage-1 P2P denoise, mask provider, stage-2
region fusion with a per-concept LoRA — at the CPU-testable tiny
geometry with random weights. Nothing meaningful is generated (weights
are random); the point is seeing every API in one runnable file without
downloading checkpoints. ~2 min on one CPU core (mostly XLA compile).

    python examples/quickstart_random_weights.py
"""

import pathlib
import sys

# runnable straight from a source checkout (no install needed)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")   # keep the demo off any TPU

import numpy as np

import omg_tpu
from omg_tpu.pipelines import sdxl
from omg_tpu.text.tokenizer import ToyTokenizer


def left_right_masks(image, cls):
    """Stand-in mask provider: 'man' owns the left half, 'woman' the
    right (real deployments use build_mask_provider('sam', ...))."""
    m = np.zeros(image.shape[:2], np.float32)
    half = image.shape[1] // 2
    if cls == "man":
        m[:, :half] = 1.0
    else:
        m[:, half:] = 1.0
    return m


def random_lora(seed, dim, rank=4):
    """A rank-4 LoRA delta on the mid-block cross-attention query."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    leaf = {"down": jax.random.normal(k1, (dim, rank)) * 0.05,
            "up": jax.random.normal(k2, (rank, dim)) * 0.05,
            "scale": jax.numpy.asarray(1.0)}
    return {"mid_block": {"attentions": [{"transformer_blocks": [
        {"attn2": {"to_q": leaf}}]}]}}


def main():
    cfg = sdxl.tiny_config()
    params = sdxl.init_params(jax.random.PRNGKey(0), cfg)
    # Serving knobs (all optional): scheduler="lcm" + num_steps=8 for the
    # few-step mode, concept_crop=True for strip-cropped concept lanes,
    # cache_interval=3 for DeepCache, quantize="int8", mesh=... for the
    # multi-chip latency layout — see examples/multichip_latency.py.
    engine = omg_tpu.OMG(
        cfg=cfg, params=params,
        tokenizer=ToyTokenizer(), tokenizer_2=ToyTokenizer(),
        mask_provider=left_right_masks, num_steps=4)

    dim = cfg.unet.block_out_channels[-1]
    result = engine.generate(
        "photo of the man and the woman at the beach",
        prompt_rewrite="[photo of the man]-*-[ugly]|"
                       "[photo of the woman]-*-[ugly]",
        concept_loras=[random_lora(1, dim), random_lora(2, dim)],
        seed=14, height=32, width=32)

    print("stage-1 image:", result.stage1.shape, result.stage1.dtype)
    print("final image:  ", result.image.shape, result.image.dtype)
    print("masks found:  ", [m is not None for m in result.masks])
    try:
        import PIL.Image
        PIL.Image.fromarray(result.image).save("quickstart.png")
        print("wrote quickstart.png")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
