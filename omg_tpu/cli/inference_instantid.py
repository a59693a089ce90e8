"""OMG + InstantID command-line entry point.

Flag-compatible with the reference's ``inference_instantid.py``
(reference: inference_instantid.py:257-287): YamerMIX SDXL base,
IdentityNet ControlNet, the InstantID face adapter, the 3-field
``prompt_rewrite`` with per-region reference face images, and the
identitynet/adapter/controlnet strength ratios (defaults 0.8).

Face analysis (detection + ArcFace embedding + 5-point keypoints) is a
host-side ONNX stack in the reference (insightface 'antelopev2',
inference_instantid.py:226-228). Here it is pluggable: insightface is
used when importable; otherwise precomputed sidecar files
``<image>.arcface.npy`` (512-d embedding) and ``<image>.kps.npy``
([5, 2] keypoints) are read — those run once per reference image, off
the hot path.
"""

from __future__ import annotations

import argparse
import hashlib
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser("omg_tpu OMG+InstantID", add_help=True)
    p.add_argument("--pretrained_model",
                   default="./checkpoint/YamerMIX_v8")
    p.add_argument("--controlnet_path",
                   default="./checkpoint/InstantID/ControlNetModel",
                   help="IdentityNet checkpoint dir")
    p.add_argument("--face_adapter_path",
                   default="./checkpoint/InstantID/ip-adapter.bin")
    p.add_argument("--controlnet_checkpoint", default="",
                   help="optional spatial controlnet (pose/canny/depth)")
    p.add_argument("--spatial_condition", default="", type=str)
    p.add_argument("--efficientViT_checkpoint",
                   default="./checkpoint/sam/xl1.pt")
    p.add_argument("--save_dir", default="results/instantID")
    p.add_argument("--prompt", default="Close-up photo of the cool man and"
                   " beautiful woman in surprised expressions, 4k.")
    p.add_argument("--negative_prompt",
                   default="noisy, blurry, soft, deformed, ugly")
    p.add_argument("--prompt_rewrite", default="", type=str)
    p.add_argument("--segment_type", default="sam")
    p.add_argument("--identitynet_strength_ratio", default=0.8, type=float)
    p.add_argument("--adapter_strength_ratio", default=0.8, type=float)
    p.add_argument("--controlnet_ratio", default=0.8, type=float)
    p.add_argument("--guidance_scale", default=3.0, type=float)
    p.add_argument("--seed", default=53, type=int)
    p.add_argument("--suffix", default="", type=str)
    p.add_argument("--num_steps", default=50, type=int)
    p.add_argument("--height", default=1024, type=int)
    p.add_argument("--width", default=1024, type=int)
    p.add_argument("--cache_interval", default=0, type=int, metavar="N",
                   help="approximate mode: DeepCache — full UNet forward "
                        "every N-th step, attention-free shallow resume "
                        "otherwise (IP/IdentityNet apply on full steps); "
                        "0 = exact")
    p.add_argument("--cache_schedule", default="uniform",
                   choices=["uniform", "front"],
                   help="DeepCache full-step placement ('front': same "
                        "count packed toward step 0 — faster AND lower "
                        "drift, PARITY §6)")
    return p.parse_args()


def get_face_info(image_path: str):
    """-> (kps [5,2], embedding [512]) for the largest face.

    Falls back to ``<image>.arcface.npy`` / ``<image>.kps.npy`` sidecars
    on ANY insightface failure (not just ImportError — e.g. the
    antelopev2 ONNX models being absent, or an unreadable image), with
    an actionable message otherwise."""
    npy_emb = image_path + ".arcface.npy"
    npy_kps = image_path + ".kps.npy"
    try:
        from PIL import Image

        from omg_tpu import instantid as iid_lib
        img = np.asarray(Image.open(image_path).convert("RGB"))
        kps, emb = iid_lib.analyze_face(img)   # cached FaceAnalysis app
        return kps, emb
    except Exception as e:
        if os.path.exists(npy_emb):
            kps = (np.load(npy_kps) if os.path.exists(npy_kps)
                   else np.zeros((5, 2), np.float32))
            return kps, np.load(npy_emb)
        raise RuntimeError(
            f"face analysis failed for {image_path} ({e}) and no sidecar "
            f"{npy_emb}; precompute the ArcFace embedding (512-d .npy) "
            "for each reference image") from e


def main():
    args = parse_args()
    from PIL import Image

    from omg_tpu import convert, instantid, loader
    from omg_tpu.pipelines import omg as omg_lib
    from omg_tpu.rewrite import parse_rewrite
    from omg_tpu.segment import build_mask_provider

    cfg, params, tok1, tok2 = loader.load_sdxl(args.pretrained_model)
    idnet_cfg, idnet_params = loader.load_controlnet(args.controlnet_path)
    adapter_sd = convert.load_state_dict(args.face_adapter_path)
    adapter = convert.convert_ip_adapter(adapter_sd)

    # geometry from the checkpoint's own shapes (real InstantID infers
    # to exactly cfglib.instantid_resampler(); non-SDXL adapters load
    # without a preset)
    rs_cfg = convert.infer_resampler_cfg(adapter_sd)
    iid = omg_lib.InstantIDModels(
        resampler_cfg=rs_cfg,
        resampler_params=adapter["image_proj"],
        ip_adapter_layers=adapter["ip_adapter"],
        identitynet_params=idnet_params,
        identitynet_cfg=idnet_cfg,
        ip_scale=args.adapter_strength_ratio,
        identitynet_scale=args.identitynet_strength_ratio,
    )

    provider = build_mask_provider(
        args.segment_type, sam_checkpoint=args.efficientViT_checkpoint)

    regions = parse_rewrite(args.prompt_rewrite)
    face_embeds = []
    for r in regions:
        if r.ref_image:
            _kps, emb = get_face_info(r.ref_image)
            face_embeds.append(emb)     # reference-photo kps are NOT a
        else:                           # canvas-frame layout; see below
            face_embeds.append(None)

    # IdentityNet keypoint condition: the reference detects faces on the
    # STAGE-1 image and renders their skeletons at canvas coordinates
    # (face_app.get + draw_kps_multi, inference_instantid.py:352-354);
    # the engine calls this provider between the stages. Degrades to no
    # IdentityNet condition when face analysis is unavailable.
    def kps_provider(stage1_img):
        try:
            return instantid.stage1_kps_provider(stage1_img)
        except Exception as e:
            print(f"warning: stage-1 face analysis failed ({e}); "
                  "running stage 2 without the IdentityNet condition")
            return None

    # optional spatial ControlNet alongside IdentityNet (reference:
    # controlnet2, inference_instantid.py:216-218 + kwargs t2i_image)
    cn_kwargs = {}
    if args.controlnet_checkpoint and args.spatial_condition:
        sp_cfg, sp_params = loader.load_controlnet(
            args.controlnet_checkpoint)
        cond = np.asarray(Image.open(args.spatial_condition)
                          .convert("RGB").resize((args.width,
                                                  args.height)))
        cn_kwargs = dict(spatial_condition=cond,
                         controlnet_params=sp_params,
                         controlnet_scale=args.controlnet_ratio)

    engine = omg_lib.OMG(cfg=cfg, params=params, tokenizer=tok1,
                         tokenizer_2=tok2, mask_provider=provider,
                         cn_cfg=idnet_cfg, num_steps=args.num_steps,
                         cache_interval=args.cache_interval,
                         cache_schedule=args.cache_schedule)

    result = engine.generate(
        args.prompt, negative_prompt=args.negative_prompt,
        prompt_rewrite=args.prompt_rewrite,
        seed=args.seed, height=args.height, width=args.width,
        guidance_scale=args.guidance_scale,
        instantid=iid, face_embeddings=face_embeds,
        face_kps_provider=kps_provider, **cn_kwargs)

    configs = [
        f"pretrained_model: {args.pretrained_model}\n",
        f"context_prompt: {args.prompt}\n",
        f"neg_context_prompt: {args.negative_prompt}\n",
        f"prompt_rewrite: {args.prompt_rewrite}\n",
    ]
    hash_code = hashlib.sha256("".join(configs).encode()).hexdigest()[:8]
    save_dir = os.path.join(args.save_dir, f"seed_{args.seed}")
    os.makedirs(save_dir, exist_ok=True)
    print(f"save to: {save_dir}")
    Image.fromarray(result.stage1[1]).save(
        os.path.join(save_dir, "stage-1.png"))
    if result.stage2 is not None:
        Image.fromarray(result.stage2[1]).save(
            os.path.join(save_dir, "stage-2.png"))
    with open(os.path.join(save_dir,
                           f"image---{args.suffix}---{hash_code}.txt"),
              "w") as fw:
        fw.writelines(configs)


if __name__ == "__main__":
    main()
