"""Checkpoint-gated validation for the open-vocab detector.

VERDICT round-2 item 8: the detector (segment/detector.py) is the
component with the most judgment-sensitive hyperparameters
(sim_thresh=0.18, grid=8, NMS/area bounds) and the least real-data
instrumentation — zero egress means its weights never load in CI. This
script is the gated-validation counterpart of tools/fidelity_harness.py:
given real SAM + CLIP checkpoints and a tokenizer, it runs the detector
on the reference repo's example/ photos (or any images you point it at),
reports per-class boxes, mask-area sanity, and cross-class overlap, and
sweeps sim_thresh so the default can be re-tuned against real data.

    python tools/validate_detector.py \
        --sam_checkpoint ./checkpoint/sam/xl1.pt \
        --clip_checkpoint ./checkpoint/clip-vit-base-patch32/model.safetensors \
        --tokenizer_dir ./checkpoint/stable-diffusion-xl-base-1.0/tokenizer \
        --images_dir /path/to/kongzhecn-OMG/example \
        --classes man,woman

CI asserts the no-checkpoint skip path only (tests/test_detector.py).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def build(args):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from omg_tpu import config as cfglib
    from omg_tpu import convert
    from omg_tpu.segment.detector import build_openvocab_detector
    from omg_tpu.segment.sam_provider import convert_sam_checkpoint
    from omg_tpu.text.tokenizer import HFCLIPTokenizer

    sam_params = convert_sam_checkpoint(args.sam_checkpoint)
    v_cfg = cfglib.clip_vit_b32_vision()
    v_params = convert.convert_clip_vision(args.clip_checkpoint)
    t_cfg = cfglib.clip_vit_b32_text()
    t_params = convert.convert_clip(
        args.clip_text_checkpoint or args.clip_checkpoint, dtype=t_cfg.dtype)
    tok = HFCLIPTokenizer(args.tokenizer_dir)
    return build_openvocab_detector(
        sam_params, clip_vision_params=v_params, clip_vision_cfg=v_cfg,
        clip_text_params=t_params, clip_text_cfg=t_cfg, tokenizer=tok,
        grid=args.grid, sim_thresh=args.sim_thresh)


def validate_image(det, image: np.ndarray, classes: list,
                   sweep: list) -> dict:
    h, w = image.shape[:2]
    rec: dict = {"size": [h, w]}

    det._prepare(image)
    rec["n_proposals"] = len(det._proposals)
    rec["proposal_scores"] = [round(p.score, 3) for p in det._proposals]
    rec["proposal_area_frac"] = [
        round(float(p.mask.mean()), 4) for p in det._proposals]

    boxes = {}
    for cls in classes:
        box = det(image, cls)
        if box is None:
            boxes[cls] = None
            continue
        idx = det._assigned_indices[cls]
        sims = det._crop_embeds @ det._text_embed(cls)
        boxes[cls] = {
            "box_xyxy": [round(float(v), 1) for v in box],
            "similarity": round(float(sims[idx]), 4),
            "mask_area_frac": round(float(det._proposals[idx].mask.mean()),
                                    4),
        }
    rec["per_class"] = boxes

    # disjointness sanity: assigned boxes must respect the overlap veto
    live = [(c, np.asarray(b["box_xyxy"], np.float32))
            for c, b in boxes.items() if b is not None]
    overlaps = {}
    for i in range(len(live)):
        for j in range(i + 1, len(live)):
            iou = det._box_iou(live[i][1], live[j][1])
            overlaps[f"{live[i][0]}|{live[j][0]}"] = round(float(iou), 4)
            if iou > det.overlap_thresh:
                rec["overlap_violation"] = True
    rec["cross_class_box_iou"] = overlaps

    # sim_thresh sweep on the CACHED proposals/embeddings: which
    # thresholds still detect each class on this image
    sweep_hits = {}
    saved = det.sim_thresh
    for thr in sweep:
        det.sim_thresh = thr
        det._assigned, det._assigned_indices = {}, {}
        sweep_hits[str(thr)] = {
            cls: det(image, cls) is not None for cls in classes}
    det.sim_thresh = saved
    det._assigned, det._assigned_indices = {}, {}
    rec["sim_thresh_sweep"] = sweep_hits
    return rec


def main():
    p = argparse.ArgumentParser("omg detector validation")
    p.add_argument("--sam_checkpoint", default="./checkpoint/sam/xl1.pt")
    p.add_argument("--clip_checkpoint", default="")
    p.add_argument("--clip_text_checkpoint", default="")
    p.add_argument("--tokenizer_dir", default="")
    p.add_argument("--images_dir", default="/root/reference/example")
    p.add_argument("--images", default="",
                   help="comma-separated image paths (overrides "
                        "--images_dir)")
    p.add_argument("--classes", default="man,woman")
    p.add_argument("--grid", type=int, default=8)
    p.add_argument("--sim_thresh", type=float, default=0.18)
    p.add_argument("--sweep", default="0.12,0.15,0.18,0.22,0.26,0.30")
    p.add_argument("--composites", type=int, default=0,
                   help="also run the synthetic-composite IoU/accuracy "
                        "eval (segment/detector_eval.py) with the REAL "
                        "SAM+CLIP detector on N color-word composites — "
                        "the same tracked metric CI computes with the "
                        "weight-free stack")
    p.add_argument("--out", default="detector_report.json")
    args = p.parse_args()

    missing = [n for n, v in (("--sam_checkpoint", args.sam_checkpoint),
                              ("--clip_checkpoint", args.clip_checkpoint),
                              ("--tokenizer_dir", args.tokenizer_dir))
               if not v or not os.path.exists(v)]
    if missing:
        print(f"SKIP: missing checkpoints/inputs: {', '.join(missing)} "
              "(zero-egress environments cannot run this validation)")
        return 0

    if args.images:
        paths = [s for s in args.images.split(",") if s]
    else:
        paths = sorted(
            q for pat in ("*.jpg", "*.jpeg", "*.png")
            for q in glob.glob(os.path.join(args.images_dir, pat)))
    if not paths:
        print(f"SKIP: no images under {args.images_dir}")
        return 0

    import PIL.Image
    det = build(args)
    classes = [c for c in args.classes.split(",") if c]
    sweep = [float(s) for s in args.sweep.split(",") if s]

    report = {"config": {k: v for k, v in vars(args).items()},
              "images": {}}
    for path in paths:
        img = np.asarray(PIL.Image.open(path).convert("RGB"))
        report["images"][os.path.basename(path)] = validate_image(
            det, img, classes, sweep)

    # aggregate: per-class hit rate at each swept threshold
    agg = {}
    for thr in sweep:
        hits = {c: 0 for c in classes}
        for rec in report["images"].values():
            for c in classes:
                if rec["sim_thresh_sweep"][str(thr)][c]:
                    hits[c] += 1
        agg[str(thr)] = {c: f"{hits[c]}/{len(paths)}" for c in classes}
    report["hit_rate_by_sim_thresh"] = agg
    report["overlap_violations"] = sum(
        1 for r in report["images"].values() if r.get("overlap_violation"))

    if args.composites > 0:
        # same metric, real weights: composed scenes with known masks,
        # color-word classes real CLIP can score
        from omg_tpu.segment import detector_eval as de
        # SAME recipe as the tracked CI score (one shared builder so the
        # real-weights number stays comparable), at a resolution real
        # CLIP crops are meaningful at
        cases, absents = de.build_cases(args.composites, h=256, w=384)
        comp = de.evaluate(det, cases,
                           query_absent=sorted(set(absents)))
        report["composite_eval"] = comp
        print(json.dumps({k: v for k, v in comp.items()
                          if k != "per_case"}, indent=2))

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"images": len(paths),
                      "hit_rate_by_sim_thresh": agg,
                      "overlap_violations": report["overlap_violations"],
                      "out": args.out}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
