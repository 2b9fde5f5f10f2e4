"""Whole-heart (MM-WHS 2017) train / test CLI.

Command-compatible with the reference's ``heart_main.py`` (argparse surface
heart_main.py:367-446):

    python -m cfun_tpu.cli.heart_main train --weights none --stage beginning \
        --data /path/to/data/ [--logs ./logs/]
    python -m cfun_tpu.cli.heart_main test --weights ckpt.npz --stage finetune \
        --data /path/to/data/ [--limit 5 --save true --bbox false]

``test`` runs the full inference stack on labeled volumes, reports per-class
mask IoU (and Dice -- the paper's headline metric) plus per-volume latency,
and optionally exports predicted label volumes as .nii.gz with the GT affine
into ./results (heart_main.py:286-360).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def draw_bbox_wireframe(mask: np.ndarray, roi, value: int = 10) -> None:
    """Draw the detection box edges into the mask in-place
    (heart_main.py:335-348).  roi: (y1, x1, z1, y2, x2, z2)."""
    y1, x1, z1, y2, x2, z2 = [int(v) for v in roi]
    h, w, d = mask.shape
    y1, y2 = np.clip([y1, y2], 0, h - 1)
    x1, x2 = np.clip([x1, x2], 0, w - 1)
    z1, z2 = np.clip([z1, z2], 0, d - 1)
    for y in (y1, y2):
        for z in (z1, z2):
            mask[y, x1:x2, z] = value
    for x in (x1, x2):
        for z in (z1, z2):
            mask[y1:y2, x, z] = value
    for y in (y1, y2):
        for x in (x1, x2):
            mask[y, x, z1:z2] = value


def run_test(cfg, params, data_dir: str, limit: int, save: bool,
             bbox: bool, results_dir: str = "./results"):
    import json

    from cfun_tpu.data import nifti
    from cfun_tpu.inference import Detector
    from cfun_tpu.utils.metrics import per_class_dice, per_class_mask_iou

    detector = Detector(cfg, params)
    with open(os.path.join(data_dir, "dataset.json")) as f:
        info = list(json.load(f)["train_and_test"])

    from cfun_tpu.data.datasets import _resolve
    per_class_ious, per_class_dices = [], []
    detect_time = 0.0
    for item in info[:limit]:
        image, _ = nifti.load(_resolve(data_dir, item["image"]))
        label, affine = nifti.load(_resolve(data_dir, item["label"]))
        t0 = time.time()
        result = detector.detect(image.astype(np.float32))
        dt = time.time() - t0
        detect_time += dt
        print(f"detect_time: {dt:.3f}s  breakdown: "
              f"{ {k: round(v, 3) for k, v in detector.last_timings.items()} }")

        mask = result["mask"]
        iou = per_class_mask_iou(label, mask, cfg.num_classes)
        dice = per_class_dice(label, mask, cfg.num_classes)
        per_class_ious.append(iou)
        per_class_dices.append(dice)
        name = os.path.basename(item["image"])
        print(f"{name} detected done. iou = {iou}")

        if save:
            if bbox and result["rois"].shape[0] > 0:
                draw_bbox_wireframe(mask, result["rois"][0])
            os.makedirs(results_dir, exist_ok=True)
            nifti.save(os.path.join(
                results_dir, f"{iou.mean():.4f}_{name}"),
                mask.astype(np.int32), affine)

    per_class_ious = np.array(per_class_ious)
    per_class_dices = np.array(per_class_dices)
    print("Test completed.")
    print("per class iou mean:", per_class_ious.mean(axis=0))
    print("std:", per_class_ious.std(axis=0))
    print("Total ious mean:", per_class_ious.mean())
    print("per class dice mean:", per_class_dices.mean(axis=0))
    print("Total dice mean:", per_class_dices.mean())
    print("Total detect time:", detect_time)
    return per_class_ious, per_class_dices


def run_submit(cfg, params, data_dir: str, limit: int,
               results_dir: str = "./results/heart_submissions"):
    """Export predicted label volumes for every manifest image (no labels
    needed) -- the heart-variant counterpart of LiTS `submit` (the
    reference only ships it for LiTS, LiTS_main.py:370-394)."""
    import json

    from cfun_tpu.data import nifti
    from cfun_tpu.data.datasets import _resolve
    from cfun_tpu.inference import Detector

    detector = Detector(cfg, params)
    with open(os.path.join(data_dir, "dataset.json")) as f:
        info = list(json.load(f)["train_and_test"])
    os.makedirs(results_dir, exist_ok=True)
    items = info[:limit]
    affines = []

    def volumes():
        for item in items:
            image, affine = nifti.load(_resolve(data_dir, item["image"]))
            affines.append(affine)
            yield image.astype(np.float32)

    # pipelined: volume N+1 loads + molds while N runs on device and
    # N-1 fetches + unmolds in detect_stream's worker thread
    t0 = time.time()
    for item, result in zip(items, detector.detect_stream(volumes())):
        name = os.path.basename(item["image"])
        print(f"{name} predicted ({time.time() - t0:.3f}s elapsed)")
        nifti.save(os.path.join(results_dir, name),
                   result["mask"].astype(np.int32), affines.pop(0))
    total = time.time() - t0
    print(f"prediction completed: {len(items)} volumes in {total:.3f}s "
          f"({total / max(len(items), 1):.3f}s/volume sustained)")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Train/test the TPU-native CFUN whole-heart pipeline.")
    parser.add_argument("command", metavar="<command>",
                        help="'train', 'test' or 'submit'")
    parser.add_argument("--weights", required=True,
                        help="Path to a .npz checkpoint, or 'none'")
    parser.add_argument("--stage", required=True,
                        choices=["beginning", "finetune"])
    parser.add_argument("--logs", default="./logs/")
    parser.add_argument("--data", required=True)
    parser.add_argument("--limit", default=5, type=int)
    parser.add_argument("--save", default="true")
    parser.add_argument("--bbox", default="false")
    parser.add_argument("--epochs", default=None, type=int)
    parser.add_argument("--workers", default=8, type=int)
    parser.add_argument("--mesh", default=None, metavar="DATA[,SPACE]",
                        help="train over a device mesh: DATA-way volume "
                             "parallelism x SPACE-way spatial H sharding "
                             "(e.g. --mesh 4 or --mesh 4,2); needs "
                             "DATA*SPACE visible devices")
    parser.add_argument("--aug-device", action="store_true",
                        help="apply the rotation augmentation (and RPN "
                             "target assignment) on device; molded volumes "
                             "are cached host-side across epochs "
                             "(Config.augment_on_device)")
    parser.add_argument("--device-cache", action="store_true",
                        help="with --aug-device: pin the molded train set "
                             "in device memory -- after epoch 1 no train "
                             "image bytes cross the host->device link "
                             "(Config.device_mold_cache; single-device)")
    parser.add_argument("--exact", action="store_true",
                        help="disable every wire/unmold approximation "
                             "(exact top-k, scan NMS, bf16 wire, "
                             "probability-stack unmold) for reference-exact "
                             "numerics at latency cost")
    parser.add_argument("--trace", default=None, metavar="DIR",
                        help="capture a jax.profiler device trace into DIR "
                             "(TensorBoard/Perfetto-compatible)")
    args = parser.parse_args(argv)

    import contextlib

    import jax

    from cfun_tpu.config import (exact_reference_overrides, heart_config,
                                 heart_inference_config)
    from cfun_tpu.utils.profiling import device_trace
    from cfun_tpu.data.datasets import HeartDataset
    from cfun_tpu.models import cfun
    from cfun_tpu.utils import checkpoint

    trace_ctx = (device_trace(args.trace) if args.trace
                 else contextlib.nullcontext())
    if args.command == "train":
        cfg = heart_config(args.stage)
        if args.device_cache and not args.aug_device:
            # the HBM mold cache pins angle-independent molds, which only
            # exist when rotation happens on device
            raise SystemExit("--device-cache requires --aug-device")
        if args.aug_device:
            cfg = cfg.replace(augment_on_device=True,
                              device_mold_cache=args.device_cache)
        train_ds = HeartDataset()
        train_ds.load_heart(args.data, "train")
        train_ds.prepare()
        val_ds = HeartDataset()
        val_ds.load_heart(args.data, "val")
        val_ds.prepare()
        from cfun_tpu.train.loop import train_model
        print(cfg.describe())
        print("Training...")
        from cfun_tpu.cli import parse_mesh
        with trace_ctx:
            train_model(cfg, train_ds, val_ds, log_dir=args.logs,
                        weights=args.weights, epochs=args.epochs,
                        num_workers=args.workers,
                        mesh_spec=parse_mesh(args.mesh))
    elif args.command in ("test", "submit"):
        overrides = exact_reference_overrides() if args.exact else {}
        cfg = heart_inference_config(args.stage, **overrides)
        params = cfun.init_params(jax.random.PRNGKey(0), cfg)
        if args.weights.lower() != "none":
            # native .npz or a reference PyTorch checkpoint, auto-detected
            params, _, meta = checkpoint.load_any(args.weights, cfg, params)
            print(f"Weights loaded: {args.weights} "
                  f"({meta.get('source', 'npz')})")
        if args.command == "test":
            print("Testing..." + (" (exact reference mode)" if args.exact
                                  else ""))
            with trace_ctx:
                run_test(cfg, params, args.data, args.limit,
                         args.save.lower() == "true",
                         args.bbox.lower() == "true")
        else:
            print("Predicting...")
            with trace_ctx:
                run_submit(cfg, params, args.data, args.limit)
    else:
        parser.error(f"'{args.command}' is not recognized. "
                     "Use 'train', 'test' or 'submit'")


if __name__ == "__main__":
    main()
