"""High-level OMG pipeline: DSL, token gating, two-stage orchestration."""

import jax
import numpy as np
import pytest

from omg_tpu import rewrite
from omg_tpu.pipelines import omg as omg_lib
from omg_tpu.pipelines import sdxl
from omg_tpu.text.tokenizer import ToyTokenizer

H = W = 32


def test_parse_rewrite_two_field():
    r = rewrite.parse_rewrite(
        "[photo of the man]-*-[ugly]|[photo of the woman]-*-[blurry]")
    assert len(r) == 2
    assert r[0].prompt == "photo of the man"
    assert r[0].negative_prompt == "ugly"
    assert r[1].ref_image is None


def test_parse_rewrite_three_field():
    r = rewrite.parse_rewrite(
        "[a man]-*-[bad]-*-./example/chris-evans.jpg|[a woman]-*-[bad]-*-"
        "./example/TaylorSwift.png")
    assert r[0].ref_image == "./example/chris-evans.jpg"
    assert r[1].ref_image == "./example/TaylorSwift.png"


def test_parse_rewrite_trailing_empty():
    assert rewrite.parse_rewrite("") == []
    assert len(rewrite.parse_rewrite("[a]-*-[b]|")) == 1


@pytest.fixture(scope="module")
def engine():
    cfg = sdxl.tiny_config()
    params = sdxl.init_params(jax.random.PRNGKey(0), cfg)
    calls = []

    def provider(image, cls):
        calls.append(cls)
        m = np.zeros(image.shape[:2], np.float32)
        if cls == "man":
            m[:, : image.shape[1] // 2] = 1.0
        else:
            m[:, image.shape[1] // 2:] = 1.0
        return m

    eng = omg_lib.OMG(cfg=cfg, params=params,
                      tokenizer=ToyTokenizer(), tokenizer_2=ToyTokenizer(),
                      mask_provider=provider, num_steps=4)
    return eng, calls


def test_generate_two_stage(engine):
    eng, calls = engine
    calls.clear()
    res = eng.generate(
        "photo of the man and woman at the beach",
        negative_prompt="ugly",
        prompt_rewrite="[photo of the chris man]-*-[ugly]|"
                       "[photo of the taylor woman]-*-[ugly]",
        seed=7, height=H, width=W)
    assert calls == ["man", "woman"]
    assert res.stage1.shape == (2, H, W, 3)
    assert res.stage2 is not None
    assert res.image.shape == (H, W, 3)
    assert res.image.dtype == np.uint8


def test_generate_gating_skips_detection(engine):
    """No 'man'/'woman' token in the global prompt => no detection, no
    stage 2 (reference: inference_lora.py:276-285)."""
    eng, calls = engine
    calls.clear()
    res = eng.generate(
        "photo of two cats",
        prompt_rewrite="[tabby cat]-*-[ugly]|[black cat]-*-[ugly]",
        seed=3, height=H, width=W)
    assert calls == []
    assert res.stage2 is None
    assert res.image.shape == (H, W, 3)


def test_generate_deterministic(engine):
    eng, _ = engine
    kw = dict(prompt_rewrite="[the man]-*-[u]|[the woman]-*-[u]",
              seed=11, height=H, width=W)
    a = eng.generate("the man and the woman", **kw)
    b = eng.generate("the man and the woman", **kw)
    np.testing.assert_array_equal(a.stage1, b.stage1)
    np.testing.assert_array_equal(a.stage2, b.stage2)
