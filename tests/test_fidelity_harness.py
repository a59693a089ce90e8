"""Fidelity harness plumbing (the harness itself is checkpoint-gated;
this environment has zero egress, so CI asserts the weight-free parts:
torch-noise import, metrics, clean skip, and the engine's
initial_noise override)."""

import subprocess
import sys

import numpy as np

from tools.fidelity_harness import psnr, ssim, torch_initial_latents


def test_torch_noise_import_shape_and_determinism():
    a = torch_initial_latents(14, 1, 64, 64)
    b = torch_initial_latents(14, 1, 64, 64)
    assert a.shape == (1, 8, 8, 4)
    np.testing.assert_array_equal(a, b)
    c = torch_initial_latents(15, 1, 64, 64)
    assert not np.array_equal(a, c)


def test_metrics():
    a = (np.random.rand(16, 16, 3) * 255).astype(np.uint8)
    assert psnr(a, a) == 99.0
    assert abs(ssim(a, a) - 1.0) < 1e-9
    b = 255 - a
    assert psnr(a, b) < 20.0


def test_harness_skips_cleanly_without_checkpoints(tmp_path):
    out = subprocess.run(
        [sys.executable, "tools/fidelity_harness.py",
         "--pretrained_sdxl_model", str(tmp_path / "missing"),
         "--prompt", "x"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "SKIP" in out.stdout


def test_self_check_runs_full_compare_path(tmp_path):
    """--self_check executes the harness BODY in CI (VERDICT round-2
    item 7): torch-noise import -> two tiny-config generations ->
    psnr/ssim/lpips -> report writing. The two runs must agree
    bit-exactly; crop drift (when the geometry supports strips) must be
    a real number."""
    import json

    from tools.fidelity_harness import run_self_check

    out = tmp_path / "self_report.json"
    report = run_self_check(str(out))
    assert report["self_exact_equal"] is True
    assert report["psnr"] == 99.0
    assert abs(report["ssim"] - 1.0) < 1e-9
    assert report["stage2_latent_mae"] == 0.0
    # report file written through the same path the real harness uses
    on_disk = json.loads(out.read_text())
    assert on_disk["mode"] == "self_check"
    if "crop_psnr" in report:
        assert np.isfinite(report["crop_psnr"])
        assert report["crop_stage2_latent_mae"] >= 0.0


def test_engine_initial_noise_override():
    """generate(initial_noise=...) must reproduce exactly the run whose
    PRNG draw equals that noise — the harness's parity mechanism."""
    import jax
    import jax.numpy as jnp

    from omg_tpu.pipelines import omg as omg_lib, sdxl
    from omg_tpu.diffusion import schedulers
    from omg_tpu.text.tokenizer import ToyTokenizer

    cfg = sdxl.tiny_config()
    params = sdxl.init_params(jax.random.PRNGKey(0), cfg)
    eng = omg_lib.OMG(cfg=cfg, params=params, tokenizer=ToyTokenizer(),
                      tokenizer_2=ToyTokenizer(), num_steps=3)
    # the unit noise PRNGKey(seed) would draw
    key = jax.random.PRNGKey(5)
    noise = jax.random.normal(key, (1, 4, 4, 4), cfg.unet.dtype)
    a = eng.generate("a hill", prompt_rewrite="", seed=5, height=32,
                     width=32)
    b = eng.generate("a hill", prompt_rewrite="", seed=999, height=32,
                     width=32, initial_noise=np.asarray(noise))
    np.testing.assert_array_equal(a.stage1, b.stage1)
