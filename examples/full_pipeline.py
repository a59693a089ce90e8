"""Real-checkpoint OMG generation (mirrors the reference's
inference_lora.py workflow through the Python API).

Requires downloaded checkpoints (see kongzhecn/OMG's README):
  stable-diffusion-xl-base-1.0/   (HF diffusers layout)
  sam/xl1.pt                      (EfficientViT-SAM; or sam_vit_h_*.pth)
  two character LoRA .safetensors + optionally a style LoRA
  CLIP vision+text safetensors    (optional: enables the in-framework
                                   open-vocab detector; otherwise both
                                   concepts share whole-image boxes)

    python examples/full_pipeline.py --sdxl <dir> --sam xl1.pt \
        --lora chris.safetensors --lora taylor.safetensors
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sdxl", required=True)
    p.add_argument("--sam", required=True)
    p.add_argument("--lora", action="append", default=[])
    p.add_argument("--style_lora", default="")
    p.add_argument("--clip", default="",
                   help="CLIP checkpoint for the open-vocab detector")
    p.add_argument("--prompt", default="Close-up photo of the cool man "
                   "and beautiful woman as they discover a mysterious "
                   "island, smiling, 35mm photograph, 4k")
    p.add_argument("--prompt_rewrite", default="")
    p.add_argument("--seed", type=int, default=14)
    p.add_argument("--scheduler", default="euler",
                   help="'lcm' + --steps 8 for the few-step mode "
                        "(needs an LCM-LoRA merged checkpoint)")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--concept_crop", action="store_true",
                   help="approximate cropped-concept stage 2 (~26%% "
                        "faster)")
    p.add_argument("--out", default="omg_out.png")
    args = p.parse_args()

    import omg_tpu

    cfg, params, tok1, tok2 = omg_tpu.load_sdxl(args.sdxl)
    provider = omg_tpu.build_mask_provider(
        "sam", sam_checkpoint=args.sam, clip_checkpoint=args.clip,
        tokenizer=tok1)
    engine = omg_tpu.OMG(cfg=cfg, params=params, tokenizer=tok1,
                         tokenizer_2=tok2, mask_provider=provider,
                         scheduler=args.scheduler, num_steps=args.steps,
                         concept_crop=args.concept_crop)

    rewrite = args.prompt_rewrite or "|".join(
        "[photo of a person]-*-[noisy, blurry]" for _ in args.lora)
    result = engine.generate(
        args.prompt, prompt_rewrite=rewrite,
        concept_loras=[omg_tpu.load_lora(l) for l in args.lora],
        style_lora=(omg_tpu.load_lora(args.style_lora)
                    if args.style_lora else None),
        seed=args.seed)

    import PIL.Image
    PIL.Image.fromarray(result.image).save(args.out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
