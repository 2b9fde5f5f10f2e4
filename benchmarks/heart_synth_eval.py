"""Held-out detection/segmentation eval of the heart synthetic weights.

Makes the README's end-to-end learning-check numbers reproducible: runs
the production ``Detector`` on held-out synthetic volumes (disjoint seeds
from the train/val sets in ``train_synth.py``) and reports FG score, box
IoU vs the 5%-extended GT box, and per-class mask IoU / Dice -- the same
metrics the reference's ``test`` CLI prints (heart_main.py:286-360).

Axon env (CLAUDE.md):
    python benchmarks/heart_synth_eval.py --weights weights/heart_synth.npz \
        --stage beginning
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="weights/heart_synth.npz")
    ap.add_argument("--stage", default="beginning",
                    choices=["beginning", "finetune"])
    ap.add_argument("--n", default=3, type=int)
    ap.add_argument("--seed", default=3000, type=int,
                    help="held-out volumes (train=1000.., val=2000..)")
    ap.add_argument("--host-shape", default=(144, 144, 96), type=int,
                    nargs=3, metavar=("H", "W", "D"))
    ap.add_argument("--report", default="benchmarks/heart_synth_eval.json")
    args = ap.parse_args()

    import jax

    from cfun_tpu.cli.lits_main import _box_iou, _gt_extended_box_yxz
    from cfun_tpu.config import heart_inference_config
    from cfun_tpu.data.datasets import SyntheticDataset
    from cfun_tpu.inference import Detector
    from cfun_tpu.models import cfun
    from cfun_tpu.utils import checkpoint
    from cfun_tpu.utils.metrics import per_class_dice, per_class_mask_iou

    cfg = heart_inference_config(args.stage)
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    params, _, meta = checkpoint.load_any(args.weights, cfg, params,
                                          strict=False)
    det = Detector(cfg, params)
    holdout = SyntheticDataset(cfg, n=args.n, seed=args.seed,
                               host_shape=tuple(args.host_shape), n_fg=7)

    # synthetic volumes are [H, W, D] float already in the z-scored domain
    fg, bious, ious, dices, times = [], [], [], [], []
    buckets = {"mold": [], "device": [], "unmold": []}
    for i in range(holdout.num_images):
        image = holdout.load_image(i)[..., 0]
        label = np.asarray(holdout.load_mask(i), np.int32)
        t0 = time.perf_counter()
        result = det.detect(image)
        times.append(time.perf_counter() - t0)
        for k in buckets:  # attribute wall drift (VERDICT r3 weak #5):
            # a wide device bucket = tunnel congestion; a shifted mold
            # bucket = host contention; a shifted min = real regression
            buckets[k].append(round(det.last_timings[k], 4))
        rois = np.clip(result["rois"], 0, None).astype(np.int64)
        if rois.shape[0] > 0:
            fg.append(float(result["scores"][0]))
            gt_box = _gt_extended_box_yxz(label)
            bious.append(_box_iou(gt_box.astype(np.float64),
                                  rois[0].astype(np.float64)))
        ious.append(per_class_mask_iou(label, result["mask"],
                                       cfg.num_classes))
        dices.append(per_class_dice(label, result["mask"], cfg.num_classes))

    arr, darr = np.array(ious), np.array(dices)
    rep = {"stage": args.stage, "weights": args.weights,
           "weights_tag": meta.get("tag"), "n_volumes": holdout.num_images,
           "detections": len(fg),
           "fg_score_mean": round(float(np.mean(fg)), 4) if fg else None,
           "box_iou_mean": round(float(np.mean(bious)), 4) if bious else None,
           "mask_iou_per_class": [round(v, 4) for v in arr.mean(axis=0)],
           "dice_per_class": [round(v, 4) for v in darr.mean(axis=0)],
           "dice_mean": round(float(darr.mean()), 4),
           "detect_s_median": round(float(np.median(times)), 3),
           "detect_s_all": [round(t, 3) for t in times],
           "buckets": buckets}
    print(json.dumps(rep))
    if args.report:
        merged = []
        if os.path.exists(args.report):
            with open(args.report) as f:
                merged = json.load(f)
        merged.append(rep)
        with open(args.report, "w") as f:
            json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
