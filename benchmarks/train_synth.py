"""Synthetic whole-heart training on the chip through the real train loop.

Two jobs:
1. produce `weights/heart_synth.npz` so bench.py's detection tail sees a
   trained score distribution instead of random weights (VERDICT r2 #7);
2. the int8-train-wire numerics A/B (VERDICT r2 #6): run the same seeded
   schedule with --wire bf16 and --wire int8 and diff the loss curves.

Run in the axon env (CLAUDE.md):
    python benchmarks/train_synth.py --epochs 30 --wire bf16 \
        --out weights/heart_synth.npz
"""

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", default=30, type=int)
    ap.add_argument("--steps", default=15, type=int,
                    help="steps per epoch (45 in the real config)")
    ap.add_argument("--wire", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--out", default=None,
                    help="save the final params here (npz)")
    ap.add_argument("--full-out", default=None,
                    help="also copy the FULL final checkpoint (params + "
                         "optimizer + epoch) here -- the file a later "
                         "--weights run resumes from exactly (the --out "
                         "npz is params-only/f16 for committing)")
    ap.add_argument("--seed", default=0, type=int)
    ap.add_argument("--stage", default="beginning",
                    choices=["beginning", "finetune"])
    ap.add_argument("--weights", default=None,
                    help="resume/transfer from this checkpoint; same-stage "
                         "npz resumes epoch numbering, cross-stage follows "
                         "the reference's transfer recipe (params only, "
                         "epochs restart)")
    ap.add_argument("--transfer", action="store_true",
                    help="force params-only transfer (epoch counter reset) "
                         "even within the same stage")
    ap.add_argument("--report", default=None,
                    help="append {wire, losses[]} to this JSON file")
    ap.add_argument("--aug-device", action="store_true",
                    help="Config.augment_on_device: rotation/RPN targets "
                         "on device, molds cached across epochs (epoch 2+ "
                         "shows the steady-state wall)")
    ap.add_argument("--device-cache", action="store_true",
                    help="Config.device_mold_cache: molded train set pinned "
                         "in HBM; epoch 2+ uploads nothing but angles")
    ap.add_argument("--host-shape", default=(144, 144, 96), type=int,
                    nargs=3, metavar=("H", "W", "D"),
                    help="synthetic source volume shape; use 512 512 300 "
                         "to measure the real-shape step wall (mold + "
                         "upload at full wire size)")
    args = ap.parse_args()

    import numpy as np

    from cfun_tpu.config import heart_config
    from cfun_tpu.data.datasets import SyntheticDataset
    from cfun_tpu.train.loop import train_model
    from cfun_tpu.utils import checkpoint

    cfg = heart_config(args.stage,
                       steps_per_epoch=args.steps,
                       train_wire_int8=(args.wire == "int8"),
                       augment_on_device=args.aug_device,
                       device_mold_cache=args.device_cache)
    host_shape = tuple(args.host_shape)
    train_ds = SyntheticDataset(cfg, n=8, seed=1000,
                                host_shape=host_shape, n_fg=7)
    val_ds = SyntheticDataset(cfg, n=2, seed=2000,
                              host_shape=host_shape, n_fg=7)

    tmp = tempfile.mkdtemp(prefix=f"synth_{args.wire}_")
    try:
        weights = args.weights
        if weights:
            import json as _json

            real = weights if weights.endswith(".npz") else weights + ".npz"
            with np.load(real) as z:
                meta0 = (_json.loads(bytes(z["__meta__"].tobytes()).decode())
                         if "__meta__" in z.files else {})
            if args.transfer or meta0.get("stage", args.stage) != args.stage:
                # reference stage-transfer recipe: params only (key-
                # filtered into the new stage's tree), epochs restart
                import jax

                from cfun_tpu.models import cfun
                template = cfun.init_params(jax.random.PRNGKey(0), cfg)
                p, _, _ = checkpoint.load(real, template, strict=False)
                weights = os.path.join(tmp, "transfer_seed.npz")
                checkpoint.save(weights, p, epoch=0,
                                meta={"name": cfg.name, "stage": args.stage,
                                      "transfer_from":
                                      os.path.basename(real)})
                print(f"transfer: {real} (stage "
                      f"{meta0.get('stage', '?')}) -> {args.stage}")
        ckpt = train_model(cfg, train_ds, val_ds, log_dir=tmp,
                           weights=weights,
                           epochs=args.epochs, seed=args.seed,
                           num_workers=2)
        metrics = []
        for f in sorted(glob.glob(
                os.path.join(tmp, "**", "train_metrics.jsonl"),
                recursive=True)):
            with open(f) as fh:
                metrics.extend(json.loads(line) for line in fh)
        losses = [r["loss"] for r in metrics if "loss" in r]
        print(f"wire={args.wire} losses: first {losses[0]:.3f} "
              f"last {losses[-1]:.3f}")
        if args.report:
            rep = []
            if os.path.exists(args.report):
                with open(args.report) as fh:
                    rep = json.load(fh)
            epoch_s = [r["epoch_s"] for r in metrics if "epoch_s" in r]
            hbm = None
            try:  # live per-device HBM peak (VERDICT r3 #4: wall + HBM)
                import jax
                ms = jax.local_devices()[0].memory_stats() or {}
                peak = ms.get("peak_bytes_in_use")
                hbm = round(peak / 2.0**30, 2) if peak else None
            except Exception:
                pass
            rep.append({"stage": args.stage,
                        "hbm_peak_gib": hbm,
                        "wire": args.wire, "epochs": args.epochs,
                        "aug_device": bool(args.aug_device),
                        "device_cache": bool(args.device_cache),
                        "steps": args.steps, "seed": args.seed,
                        "host_shape": list(host_shape),
                        "losses": [round(v, 4) for v in losses],
                        "s_per_step": [round(s / args.steps, 3)
                                       for s in epoch_s]})
            with open(args.report, "w") as fh:
                json.dump(rep, fh, indent=1)
        if args.full_out:
            os.makedirs(os.path.dirname(os.path.abspath(args.full_out)),
                        exist_ok=True)
            shutil.copyfile(ckpt, args.full_out)
            print(f"saved full checkpoint {args.full_out}")
        if args.out:
            params, _, meta = checkpoint.load(ckpt, _template(cfg),
                                              strict=False)
            os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                        exist_ok=True)
            # params only, f16-on-disk + compressed so the file is
            # committable (load() casts back to the f32 template)
            checkpoint.save(args.out, params,
                            epoch=int(meta.get("epoch", args.epochs)),
                            meta={"tag": f"synthetic-{args.epochs}ep-"
                                         f"{args.wire}",
                                  "name": cfg.name, "stage": args.stage},
                            store_dtype="float16", compress=True)
            print(f"saved {args.out}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _template(cfg):
    import jax

    from cfun_tpu.models import cfun
    return cfun.init_params(jax.random.PRNGKey(0), cfg)


if __name__ == "__main__":
    main()
