"""Serving entry point (role of gradio_demo/app.py's __main__).

    python -m omg_tpu.cli.serve --pretrained_sdxl_model <dir> \
        --registry registry.json --port 7861
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser("omg_tpu serve")
    p.add_argument("--pretrained_sdxl_model",
                   default="./checkpoint/stable-diffusion-xl-base-1.0")
    p.add_argument("--efficientViT_checkpoint",
                   default="./checkpoint/sam/xl1.pt")
    p.add_argument("--segment_type", default="sam")
    p.add_argument("--registry", default="", help="registry JSON path")
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address; use 0.0.0.0 to expose externally")
    p.add_argument("--port", default=7861, type=int)
    p.add_argument("--num_steps", default=50, type=int)
    p.add_argument("--face_adapter_path", default="",
                   help="InstantID ip-adapter.bin (enables identity serving)")
    p.add_argument("--identitynet_path", default="",
                   help="InstantID IdentityNet ControlNet dir")
    p.add_argument("--warmup", action="store_true",
                   help="AOT-compile all resolution buckets before serving")
    # spatial-condition stack (reference: app.py:216-226,315-357,572-578)
    p.add_argument("--openpose_checkpoint", default="",
                   help="ControlNet-openpose-sdxl dir (enables kind=pose)")
    p.add_argument("--canny_checkpoint", default="",
                   help="ControlNet-canny-sdxl dir (enables kind=canny)")
    p.add_argument("--depth_checkpoint", default="",
                   help="ControlNet-depth-sdxl dir (enables kind=depth)")
    p.add_argument("--pose_detector_checkpoint", default="",
                   help="OpenPose body_pose_model.pth (photo->pose server-"
                        "side; otherwise pose maps must be precomputed)")
    p.add_argument("--dpt_checkpoint", default="",
                   help="DPT depth model dir (photo->depth server-side)")
    p.add_argument("--quantize", default="", choices=["", "int8"],
                   help="int8: W8A8 transformer GEMMs. NOT RECOMMENDED "
                        "(measured: ~1%% e2e speedup for 31.5 dB PSNR "
                        "drift, PARITY.md §6 — dynamic-quant reductions "
                        "serialize against the MXU and the pure-int8 MXU "
                        "rate is only 1.36x bf16 on this chip); prefer "
                        "--cache_interval or --concept_crop. Kept for "
                        "A/B measurement.")
    p.add_argument("--scheduler", default="euler",
                   choices=["euler", "ddim", "dpmpp_2m", "lcm"],
                   help="lcm + --num_steps 8 is the few-step serving "
                        "mode (requires an LCM-LoRA'd checkpoint)")
    p.add_argument("--concept_crop", action="store_true",
                   help="approximate mode: stage-2 concept lanes on "
                        "vertical strips (~26%% faster e2e; falls back "
                        "to exact per-request when ControlNets are on)")
    p.add_argument("--cache_interval", default=0, type=int, metavar="N",
                   help="approximate mode: DeepCache — full UNet "
                        "forward every N-th step, attention-free "
                        "shallow resume otherwise. 0 = exact. "
                        "Exclusive with --concept_crop; composes with "
                        "--mesh.")
    p.add_argument("--cache_schedule", default="uniform",
                   choices=["uniform", "front"],
                   help="DeepCache full-step placement: 'front' packs "
                        "the same number of full steps toward step 0 — "
                        "measured 8.97 s vs uniform's 10.59 s at "
                        "interval 3, with 17 dB lower drift (PARITY §6)."
                        " Also a per-request job field.")
    p.add_argument("--mesh", default=0, type=int, metavar="N",
                   help="multi-chip LATENCY mode over N chips (the "
                        "v5e-8 layout): stage 1 spatially sharded "
                        "(CFG lanes x latent-H), stage 2 one lane per "
                        "chip. 0 = single chip. Needs N visible "
                        "devices.")
    args = p.parse_args()

    from omg_tpu import loader
    from omg_tpu.pipelines import omg as omg_lib
    from omg_tpu.segment import build_mask_provider
    from omg_tpu.serving.registry import Registry, default_registry
    from omg_tpu.serving.server import OMGServer

    cfg, params, tok1, tok2 = loader.load_sdxl(args.pretrained_sdxl_model)
    provider = build_mask_provider(
        args.segment_type, sam_checkpoint=args.efficientViT_checkpoint)
    mesh = None
    if args.mesh:
        from omg_tpu.parallel import mesh as mesh_lib
        try:
            mesh = mesh_lib.make_latency_mesh(args.mesh)
        except ValueError as e:
            raise SystemExit(f"--mesh {args.mesh}: {e}")
    engine = omg_lib.OMG(cfg=cfg, params=params, tokenizer=tok1,
                         tokenizer_2=tok2, mask_provider=provider,
                         num_steps=args.num_steps, quantize=args.quantize,
                         scheduler=args.scheduler,
                         concept_crop=args.concept_crop, mesh=mesh,
                         cache_interval=args.cache_interval,
                         cache_schedule=args.cache_schedule)
    registry = (Registry.from_json(args.registry) if args.registry
                else default_registry())

    iid = None
    if args.face_adapter_path:
        from omg_tpu import convert
        adapter_sd = convert.load_state_dict(args.face_adapter_path)
        adapter = convert.convert_ip_adapter(adapter_sd)
        idnet_cfg = idnet_params = None
        if args.identitynet_path:
            idnet_cfg, idnet_params = loader.load_controlnet(
                args.identitynet_path)
            engine.cn_cfg = idnet_cfg
        iid = omg_lib.InstantIDModels(
            # geometry from the checkpoint's own shapes (the hand preset
            # cfglib.instantid_resampler() is what real InstantID infers
            # to; non-SDXL adapters now load too)
            resampler_cfg=convert.infer_resampler_cfg(adapter_sd),
            resampler_params=adapter["image_proj"],
            ip_adapter_layers=adapter["ip_adapter"],
            identitynet_params=idnet_params, identitynet_cfg=idnet_cfg)

    controlnets = {}
    for kind, path in (("pose", args.openpose_checkpoint),
                       ("canny", args.canny_checkpoint),
                       ("depth", args.depth_checkpoint)):
        if path:
            cn_cfg, cn_params = loader.load_controlnet(path)
            controlnets[kind] = cn_params
            # one ControlNetConfig serves every kind (the engine threads
            # a single cn_cfg through the jitted programs) — a mixed zoo
            # with differing geometries would silently run against the
            # wrong config, so refuse it up front (ADVICE round 2)
            if engine.cn_cfg is not None and engine.cn_cfg != cn_cfg:
                raise ValueError(
                    f"ControlNet {kind!r} at {path} has a different "
                    f"geometry than the previously loaded ControlNets/"
                    f"IdentityNet; all loaded ControlNets must share one "
                    f"config (got {cn_cfg} vs {engine.cn_cfg})")
            engine.cn_cfg = cn_cfg
    pose_provider = None
    if args.pose_detector_checkpoint:
        from omg_tpu.models import openpose
        pose_provider = openpose.load_body_model(
            args.pose_detector_checkpoint)
    depth_provider = None
    if args.dpt_checkpoint:
        from omg_tpu.models import dpt as dpt_lib
        depth_provider = dpt_lib.load_depth_model(args.dpt_checkpoint)

    server = OMGServer(engine, registry, instantid=iid,
                       controlnets=controlnets,
                       pose_provider=pose_provider,
                       depth_provider=depth_provider)
    if args.warmup:
        from omg_tpu.serving.warmup import default_serving_warmup
        if mesh is not None:
            print("warmup note: --mesh engines compile the SHARDED "
                  "programs on first request (warmup covers the "
                  "single-chip jit keys); expect one cold compile per "
                  "(resolution, concept-count) under the mesh layout")
        # shapes come from the engine's REAL trees (packed layout,
        # post-quantize) and a registry LoRA so the warmed jit keys are
        # the ones real requests hit
        sample = next(iter(server.loras.values()), None)
        default_serving_warmup(
            cfg, unet_params=engine.params.unet, steps=args.num_steps,
            scheduler=args.scheduler,
            sample_lora=(sample.get("unet", sample)
                         if isinstance(sample, dict) else None),
            sample_ip_adapter=(iid.ip_adapter_layers
                               if iid is not None else None),
            vae_params=engine.params.vae,
            cache_interval=args.cache_interval,
            cache_schedule=args.cache_schedule,
            # the microbatcher's chunked batch shapes compile their own
            # programs (round-4 serve_bench: a separate 137 s compile on
            # the first batched request despite --warmup)
            max_batch=server.max_batch)
    server.serve(args.host, args.port)


if __name__ == "__main__":
    main()
