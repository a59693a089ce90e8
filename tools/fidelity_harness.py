"""Side-by-side fidelity harness: torch reference pipeline vs omg_tpu.

Target: < 0.05 LPIPS between the reference two-stage OMG generation and
this framework's, at identical config (BASELINE.md:24). Checkpoint-gated:
every section degrades with an actionable message when its inputs
(checkpoints, diffusers, lpips) are missing — this environment has zero
egress, so CI only asserts the harness skips cleanly (tests/
test_fidelity_harness.py); run it on a machine with the real weights:

    python tools/fidelity_harness.py \
        --pretrained_sdxl_model ./checkpoint/stable-diffusion-xl-base-1.0 \
        --reference_repo /path/to/kongzhecn-OMG \
        --lora_path "ckpt/lora_chris.safetensors|ckpt/lora_taylor.safetensors" \
        --prompt "..." --prompt_rewrite "[..]-*-[..]|[..]-*-[..]" \
        --seed 14 --steps 50

What it reports:
  * stage-1 / stage-2 final-latent mean-abs deltas (torch-RNG initial
    noise is imported into JAX, so latents are directly comparable —
    PRNG mismatch is eliminated, not averaged over);
  * LPIPS (via the `lpips` pip package when installed) between the
    stage-2 images, plus PSNR / SSIM fallbacks with no extra deps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def torch_initial_latents(seed: int, batch: int, height: int, width: int):
    """Initial noise exactly as the reference draws it: torch.Generator
    manual_seed -> randn (reference: inference_lora.py:267 via diffusers
    prepare_latents). Imported into JAX so both pipelines start from the
    SAME noise — the one source of irreducible divergence otherwise."""
    import torch
    g = torch.Generator("cpu").manual_seed(seed)
    noise = torch.randn((batch, 4, height // 8, width // 8), generator=g)
    return noise.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Global-statistics SSIM (dep-free; a coarse sanity companion to
    LPIPS, not a replacement)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return float(((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                 / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))


def lpips_distance(a: np.ndarray, b: np.ndarray):
    """LPIPS(AlexNet) if the `lpips` package + weights are present."""
    try:
        import lpips
        import torch
    except ImportError:
        return None
    loss = lpips.LPIPS(net="alex")

    def prep(x):
        t = torch.from_numpy(x.astype(np.float32) / 127.5 - 1.0)
        return t.permute(2, 0, 1)[None]

    with torch.no_grad():
        return float(loss(prep(a), prep(b)))


def run_ours(args, noise_nhwc: np.ndarray, masks=None):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax.numpy as jnp

    from omg_tpu import loader, lora as lora_lib
    from omg_tpu.pipelines import omg as omg_lib
    from omg_tpu.segment import build_mask_provider

    cfg, params, tok1, tok2 = loader.load_sdxl(args.pretrained_sdxl_model)
    provider = build_mask_provider(
        args.segment_type, sam_checkpoint=args.efficientViT_checkpoint,
        clip_checkpoint=args.clip_checkpoint, tokenizer=tok1)
    engine = omg_lib.OMG(cfg=cfg, params=params, tokenizer=tok1,
                         tokenizer_2=tok2, mask_provider=provider,
                         num_steps=args.steps,
                         quantize=getattr(args, "quantize", ""),
                         concept_crop=getattr(args, "concept_crop", False),
                         cache_interval=getattr(args, "cache_interval", 0))
    loras = [lora_lib.load_lora(p) if p else None
             for p in args.lora_path.split("|")]

    # torch-imported initial noise (same randn the reference draws) so
    # both pipelines integrate from identical latents
    res = engine.generate(
        args.prompt, negative_prompt=args.negative_prompt,
        prompt_rewrite=args.prompt_rewrite, concept_loras=loras,
        seed=args.seed, height=args.height, width=args.width,
        guidance_scale=args.guidance_scale, masks=masks,
        initial_noise=jnp.asarray(noise_nhwc))
    return res


def run_reference(args, masks=None, device: str = "cpu"):
    """Drive the torch reference's TWO-STAGE flow (needs diffusers + the
    reference repo checkout). ``masks``: per-concept [H, W] {0,1} arrays
    (the --masks sidecars) — with masks the reference runs stage 1 AND
    the region-fused stage 2, exactly like inference_lora.py:262-297;
    without them only the stage-1 image is comparable."""
    try:
        import diffusers  # noqa: F401
        import torch
    except ImportError as e:
        print(f"SKIP reference run: {e}")
        return None
    sys.path.insert(0, args.reference_repo)
    try:
        import inference_lora  # noqa: F401
    except ImportError as e:
        print(f"SKIP reference run (repo not importable): {e}")
        return None
    # The reference's sample_image flow, minimally driven:
    from inference_lora import build_model_sd, prepare_text, sample_image
    pipe, controller, pipe_concepts = build_model_sd(
        args.pretrained_sdxl_model, "", device, prompts=[args.prompt] * 2)
    # LoRA loading mirrors inference_lora.py:162-170
    lora_list = []
    for i, path in enumerate(p for p in args.lora_path.split("|") if p):
        pipe_concepts.load_lora_weights(path, adapter_name=f"c{i}")
        lora_list.append(f"c{i}")
    input_prompt = prepare_text(args.prompt, args.prompt_rewrite)

    def gen():
        return torch.Generator(device).manual_seed(args.seed)

    common = dict(
        input_prompt=input_prompt, concept_models=pipe_concepts,
        input_neg_prompt=[args.negative_prompt] * len(input_prompt),
        controller=controller, lora_list=lora_list,
        height=args.height, width=args.width,
        guidance_scale=args.guidance_scale,
        num_inference_steps=args.steps, spatial_condition=None)
    stage1 = sample_image(pipe, generator=gen(), stage=1, **common)
    if masks is None:
        return {"stage1": stage1, "stage2": None}
    controller.reset()
    region_masks = [torch.from_numpy(np.asarray(m, np.float32))
                    for m in masks]
    stage2 = sample_image(pipe, generator=gen(), stage=2,
                          region_masks=region_masks, **common)
    return {"stage1": stage1, "stage2": stage2}


def run_self_check(out_path: str = "") -> dict:
    """``--self_check``: execute the FULL compare/report path with no
    checkpoints (VERDICT round-2 item 7 — round 2 found real bugs in the
    harness body that the skip-only CI never executed).

    A tiny-config engine with random weights generates twice from the
    same torch-imported initial noise (torch_initial_latents — the exact
    noise-import path the real harness uses) and the two runs are pushed
    through psnr/ssim/lpips_distance and the report writer. The runs
    must agree bit-exactly; a third run in the approximate concept_crop
    mode (when the tiny geometry supports strips) reports real drift
    numbers through the same code.
    """
    import jax
    import jax.numpy as jnp

    from omg_tpu.pipelines import multiconcept, omg as omg_lib, sdxl
    from omg_tpu.text.tokenizer import ToyTokenizer

    H = W = 32
    cfg = sdxl.tiny_config()
    params = sdxl.init_params(jax.random.PRNGKey(0), cfg)

    def provider(image, cls):
        m = np.zeros(image.shape[:2], np.float32)
        if cls == "man":
            m[:, : image.shape[1] // 2] = 1.0
        else:
            m[:, image.shape[1] // 2:] = 1.0
        return m

    def build(concept_crop=False, cache_interval=0):
        return omg_lib.OMG(cfg=cfg, params=params, tokenizer=ToyTokenizer(),
                           tokenizer_2=ToyTokenizer(),
                           mask_provider=provider, num_steps=4,
                           concept_crop=concept_crop,
                           cache_interval=cache_interval)

    noise = torch_initial_latents(14, 1, H, W)
    kwargs = dict(
        negative_prompt="ugly",
        prompt_rewrite="[the chris man]-*-[ugly]|[the taylor woman]-*-[ugly]",
        seed=14, height=H, width=W, initial_noise=jnp.asarray(noise))
    prompt = "photo of the man and woman"

    a = build().generate(prompt, **kwargs)
    b = build().generate(prompt, **kwargs)

    report = {"mode": "self_check", "steps": 4, "height": H, "width": W}
    report["stage2_latent_mae"] = 0.0 if a.stage2 is None else float(
        np.abs(a.stage2.astype(np.float64)
               - b.stage2.astype(np.float64)).mean())
    report["psnr"] = psnr(a.image, b.image)
    report["ssim"] = ssim(a.image, b.image)
    lp = lpips_distance(a.image, b.image)
    report["lpips"] = lp   # None without the lpips package — reported as such
    report["self_exact_equal"] = bool((a.image == b.image).all())

    if multiconcept.crop_strips_ok(cfg, W // 8, 2):
        c = build(concept_crop=True).generate(prompt, **kwargs)
        report["crop_psnr"] = psnr(a.image, c.image)
        report["crop_ssim"] = ssim(a.image, c.image)
        report["crop_stage2_latent_mae"] = float(
            np.abs(np.asarray(a.stage2, np.float64)
                   - np.asarray(c.stage2, np.float64)).mean())
    else:
        report["crop"] = "skipped (tiny geometry has no UNet-safe strips)"

    # DeepCache self-drift (interval 2 over 4 steps = 2 shallow steps)
    dcv = build(cache_interval=2).generate(prompt, **kwargs)
    report["deepcache_psnr"] = psnr(a.image, dcv.image)
    report["deepcache_ssim"] = ssim(a.image, dcv.image)
    report["deepcache_stage2_latent_mae"] = float(
        np.abs(np.asarray(a.stage2, np.float64)
               - np.asarray(dcv.stage2, np.float64)).mean())

    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return report


def main():
    p = argparse.ArgumentParser("omg fidelity harness")
    p.add_argument("--pretrained_sdxl_model", default="")
    p.add_argument("--reference_repo", default="/root/reference")
    p.add_argument("--lora_path", default="")
    p.add_argument("--efficientViT_checkpoint", default="")
    p.add_argument("--clip_checkpoint", default="")
    p.add_argument("--segment_type", default="sam")
    p.add_argument("--prompt", default="")
    p.add_argument("--negative_prompt", default="noisy, blurry, ugly")
    p.add_argument("--prompt_rewrite", default="")
    p.add_argument("--seed", type=int, default=14)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--concept_crop", action="store_true",
                   help="measure the approximate cropped-concept mode's "
                        "LPIPS against the torch reference")
    p.add_argument("--quantize", default="", choices=["", "int8"],
                   help="measure the approximate int8 serving mode's "
                        "LPIPS against the torch reference")
    p.add_argument("--cache_interval", type=int, default=0,
                   help="measure the approximate DeepCache mode's "
                        "LPIPS against the torch reference")
    p.add_argument("--out", default="fidelity_report.json")
    p.add_argument("--masks", default="",
                   help="'|'-separated .npy per-concept binary masks "
                        "[H, W], applied to BOTH pipelines — makes the "
                        "stage-2 comparison detector-independent (the "
                        "two frameworks' detectors differ by design)")
    p.add_argument("--self_check", action="store_true",
                   help="run the harness against itself on a tiny random-"
                        "weight config (no checkpoints): executes the "
                        "full noise-import/compare/report path in CI")
    args = p.parse_args()

    if args.self_check:
        report = run_self_check(args.out)
        return 0 if report.get("self_exact_equal") else 1
    if not args.pretrained_sdxl_model or not args.prompt:
        p.error("--pretrained_sdxl_model and --prompt are required "
                "(or use --self_check)")

    if not os.path.isdir(args.pretrained_sdxl_model):
        print(f"SKIP: no checkpoint at {args.pretrained_sdxl_model} "
              "(zero-egress environments cannot run this harness)")
        return 0

    masks = None
    if args.masks:
        masks = [np.load(p0) if p0 else None
                 for p0 in args.masks.split("|")]

    noise = torch_initial_latents(args.seed, 1, args.height, args.width)
    ours = run_ours(args, noise, masks=masks)
    ref = run_reference(args, masks=masks)

    report = {"config": {k: v for k, v in vars(args).items()}}
    if ref is not None:
        # stage-matched comparison: stage 2 vs stage 2 when masks were
        # supplied to both sides, else stage 1 vs stage 1 (the round-2
        # harness compared ref stage-1 against our stage-2 — a bug the
        # skip-only CI never executed)
        if masks is not None and ref["stage2"] is not None:
            a = np.asarray(ref["stage2"][1])
            b = ours.image
            report["compared"] = "stage2"
        else:
            a = np.asarray(ref["stage1"][1])
            b = np.asarray(ours.stage1[1])
            report["compared"] = ("stage1 (pass --masks for the stage-2 "
                                  "comparison)")
        report["psnr"] = psnr(a, b)
        report["ssim"] = ssim(a, b)
        lp = lpips_distance(a, b)
        report["lpips"] = lp
        report["lpips_target"] = 0.05
        if lp is not None:
            report["pass"] = lp < 0.05
    else:
        report["reference"] = "skipped (diffusers/repo unavailable)"
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
