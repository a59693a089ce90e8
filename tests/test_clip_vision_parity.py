"""CLIP image tower vs transformers CLIPVisionModelWithProjection.

Random-weight parity at tiny geometry: the HF torch module is the ground
truth for the architecture the converter expects (the reference's CLIP
towers come from the same library, inference_lora.py:163-171)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from omg_tpu import config as cfglib
from omg_tpu import convert
from omg_tpu.models import clip_vision as cv


def test_vision_tower_matches_transformers():
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, projection_dim=16,
        hidden_act="quick_gelu")
    torch.manual_seed(0)
    model = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert.convert_clip_vision(sd)
    cfg = cfglib.tiny_clip_vision()

    rng = np.random.default_rng(1)
    pix = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(pix))
    out = cv.apply(params, cfg, jnp.asarray(pix.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(np.asarray(out.projected),
                               ref.image_embeds.numpy(),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.last_hidden_state),
                               ref.last_hidden_state.numpy(),
                               rtol=1e-4, atol=2e-4)


def test_preprocess_range():
    img = (np.random.rand(2, 16, 24, 3) * 255).astype(np.uint8)
    pix = cv.preprocess(img, 32)
    assert pix.shape == (2, 32, 32, 3)
    # CLIP normalization: white ~ (1-mean)/std ~ 1.9..2.2, black ~ -1.8
    assert float(jnp.abs(pix).max()) < 3.0
