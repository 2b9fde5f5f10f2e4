"""LiTS staged training to held-out segmentation quality (synthetic).

The LiTS counterpart of the heart 30-epoch demo: runs the reference's
full staged recipe (LiTS_2017/LiTS_main.py:435) through the REAL
``train_model`` loop -- 'beginning' (detection only) -> key-filtered
stage transfer (LiTS_2017/model.py:1358-1371) -> 'together' ->
'finetune' -- then evaluates each stage's checkpoint on held-out
synthetic volumes with the production ``Detector``, reporting box IoU vs
the extended GT box (all stages, LiTS_main.py:285-367) and per-class
mask IoU / Dice (after 'beginning').

Saves ``weights/lits_synth.npz`` (f16-on-disk, committable) so bench.py's
LiTS rep can run a trained detection tail, and writes
``benchmarks/lits_synth_e2e.json``.

Axon env (CLAUDE.md), ONE TPU process at a time:
    python benchmarks/lits_synth_e2e.py
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from lits_train_steps import SyntheticLiTS  # noqa: E402


def transfer_seed(ckpt: str, cfg, out_path: str) -> str:
    """Key-filtered stage transfer: load the previous stage's params into
    the next stage's template (missing/mismatched leaves keep their init
    values), re-saved with epoch=0 so train_model starts the new stage's
    epoch numbering fresh."""
    import jax

    from cfun_tpu.models import cfun
    from cfun_tpu.utils import checkpoint

    template = cfun.init_params(jax.random.PRNGKey(0), cfg)
    params, _, _ = checkpoint.load(ckpt, template, strict=False)
    checkpoint.save(out_path, params, epoch=0,
                    meta={"name": cfg.name, "stage": cfg.stage,
                          "transfer_from": os.path.basename(ckpt)})
    return out_path if out_path.endswith(".npz") else out_path + ".npz"


def evaluate(stage: str, ckpt: str, holdout) -> dict:
    """Held-out eval with the production Detector: box IoU vs the 5%%-
    extended GT box in every stage; per-class mask IoU/Dice after
    'beginning' (mirrors cli/lits_main.py::run_test)."""
    import jax

    from cfun_tpu.cli.lits_main import _box_iou, _gt_extended_box_yxz
    from cfun_tpu.config import lits_inference_config
    from cfun_tpu.inference import Detector
    from cfun_tpu.models import cfun
    from cfun_tpu.utils import checkpoint
    from cfun_tpu.utils.metrics import per_class_dice, per_class_mask_iou

    cfg = lits_inference_config(stage)
    template = cfun.init_params(jax.random.PRNGKey(0), cfg)
    params, _, _ = checkpoint.load(ckpt, template, strict=False)
    det = Detector(cfg, params)

    box_ious, ious, dices, fg_scores, times = [], [], [], [], []
    buckets = {"mold": [], "device": [], "unmold": []}
    for i in range(holdout.num_images):
        image = holdout.load_image(i)[..., 0]
        label = holdout.load_mask(i).astype(np.int32)
        t0 = time.perf_counter()
        result = det.detect(image)
        times.append(time.perf_counter() - t0)
        for k in buckets:  # every latency row carries its attribution
            buckets[k].append(round(det.last_timings[k], 4))
        rois = np.clip(result["rois"], 0, None).astype(np.int64)
        if rois.shape[0] > 0:
            gt_box = _gt_extended_box_yxz(label)
            box_ious.append(_box_iou(gt_box.astype(np.float64),
                                     rois[0].astype(np.float64)))
            fg_scores.append(float(result["scores"][0]))
        if stage != "beginning":
            ious.append(per_class_mask_iou(label, result["mask"],
                                           cfg.num_classes))
            dices.append(per_class_dice(label, result["mask"],
                                        cfg.num_classes))
    rep = {"stage": stage, "n_volumes": holdout.num_images,
           "detections": len(box_ious),
           "fg_score_mean": round(float(np.mean(fg_scores)), 4)
           if fg_scores else None,
           "box_iou_mean": round(float(np.mean(box_ious)), 4)
           if box_ious else None,
           "detect_s_median": round(float(np.median(times)), 3),
           "buckets": buckets}
    if ious:
        arr, darr = np.array(ious), np.array(dices)
        rep["mask_iou_per_class"] = [round(v, 4)
                                     for v in arr.mean(axis=0)]
        rep["dice_per_class"] = [round(v, 4) for v in darr.mean(axis=0)]
        rep["dice_mean"] = round(float(darr.mean()), 4)
    print(json.dumps(rep))
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--begin-epochs", default=10, type=int)
    ap.add_argument("--begin-steps", default=20, type=int)
    ap.add_argument("--mid-epochs", default=8, type=int)
    ap.add_argument("--mid-steps", default=15, type=int)
    ap.add_argument("--fine-epochs", default=6, type=int)
    ap.add_argument("--fine-steps", default=12, type=int)
    ap.add_argument("--out", default="weights/lits_synth.npz")
    ap.add_argument("--resume-stage", default=None,
                    choices=[None, "together", "finetune"],
                    help="skip earlier stages; --seed-ckpt supplies the "
                         "checkpoint to transfer from")
    ap.add_argument("--seed-ckpt", default=None)
    args = ap.parse_args()

    from cfun_tpu.config import lits_config
    from cfun_tpu.train.loop import train_model
    from cfun_tpu.utils import checkpoint

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    train_src = SyntheticLiTS(n=6, seed=0)
    val_src = SyntheticLiTS(n=2, seed=50)
    holdout = SyntheticLiTS(n=3, seed=90)

    tmp = tempfile.mkdtemp(prefix="lits_e2e_")
    stages = [("beginning", args.begin_epochs, args.begin_steps),
              ("together", args.mid_epochs, args.mid_steps),
              ("finetune", args.fine_epochs, args.fine_steps)]
    if args.resume_stage:
        idx = [s[0] for s in stages].index(args.resume_stage)
        stages = stages[idx:]

    report = {"stages": {}, "eval": []}
    ckpt = args.seed_ckpt
    try:
        for stage, epochs, steps in stages:
            cfg = lits_config(stage, steps_per_epoch=steps,
                              validation_steps=2, val_every_epochs=5)
            weights = None
            if ckpt:
                weights = transfer_seed(
                    ckpt, cfg, os.path.join(tmp, f"seed_{stage}"))
            t0 = time.time()
            ckpt = train_model(cfg, train_src, val_src,
                               log_dir=os.path.join(tmp, stage),
                               weights=weights, epochs=epochs,
                               num_workers=2)
            report["stages"][stage] = {
                "epochs": epochs, "steps_per_epoch": steps,
                "wall_s": round(time.time() - t0, 1), "ckpt": ckpt}
            print(f"[{stage}] done in {report['stages'][stage]['wall_s']}s"
                  f" -> {ckpt}")
            report["eval"].append(evaluate(stage, ckpt, holdout))

        if args.out:
            import jax

            from cfun_tpu.config import lits_config as _lc
            from cfun_tpu.models import cfun

            fin_cfg = _lc("finetune")
            template = cfun.init_params(jax.random.PRNGKey(0), fin_cfg)
            params, _, _ = checkpoint.load(ckpt, template, strict=False)
            out = os.path.join(root, args.out)
            checkpoint.save(out, params, epoch=args.fine_epochs,
                            meta={"tag": "lits-synthetic-staged",
                                  "stage": "finetune"},
                            store_dtype="float16", compress=True)
            report["weights"] = args.out
            print(f"saved {out}")
    finally:
        out_json = os.path.join(root, "benchmarks", "lits_synth_e2e.json")
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)
        print(f"-> {out_json}")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
