"""Does rematerialization SPEED UP the HBM-bound heart train step?

benchmarks/mfu.py measured train_fwd_bwd at 70% HBM bandwidth utilization
with 3.9% MFU -- the step is bytes-bound, not FLOPs-bound, so
``jax.checkpoint`` (recompute activations in the backward pass instead of
storing them) can trade cheap FLOPs for scarce bytes and come out AHEAD on
wall time, not just memory.  This times the train fwd+bwd for the four
remat combinations on the chip and records XLA's own flop/byte counts.

Axon env (CLAUDE.md), ONE TPU process at a time:
    python benchmarks/remat_matrix.py [--stage beginning] [--reps 3]
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
    ap.add_argument("--stage", default="beginning",
                    choices=["beginning", "finetune"])
    ap.add_argument("--reps", default=3, type=int)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cfun_tpu.config import heart_config
    from cfun_tpu.models import cfun
    from cfun_tpu.ops.anchors import config_anchors
    from cfun_tpu.train.step import TrainBatch, train_forward
    from cfun_tpu.train.targets import build_rpn_targets
    from cfun_tpu.utils.roofline import (chip_generation, compile_with_cost,
                                         segment_report)

    gen = chip_generation()
    results = {"stage": args.stage, "chip": gen,
               "device": str(jax.devices()[0]), "combos": {}}
    base = heart_config(args.stage)
    d, h, w = base.image_shape
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(1, d, h, w, 1)), jnp.float32)
    labels = np.zeros((d, h, w), np.int8)
    labels[60:120, 100:220, 100:220] = 1
    gt = np.array([60, 100, 100, 120, 220, 220], np.float32)
    norm = np.array([d, h, w, d, h, w], np.float32)
    key = jax.random.PRNGKey(0)

    def scalar(tree):
        leaves = [jnp.sum(x.astype(jnp.float32))
                  for x in jax.tree.leaves(tree) if hasattr(x, "astype")]
        return sum(leaves[1:], leaves[0])

    for r_trunk in (False, True):
        for r_unet in (False, True):
            cfg = base.replace(remat_trunk=r_trunk, remat_unet=r_unet)
            params = cfun.init_params(jax.random.PRNGKey(0), cfg)
            anchors = config_anchors(cfg)
            m, dl = build_rpn_targets(anchors, gt, cfg,
                                      np.random.default_rng(0))
            batch = TrainBatch(image, jnp.asarray(m), jnp.asarray(dl),
                               jnp.asarray(gt / norm),
                               jnp.asarray(labels.astype(np.int32)))

            def loss_and_grads(p, b, an, k, cfg=cfg):
                (total, _), grads = jax.value_and_grad(
                    train_forward, has_aux=True)(p, b, an, cfg, k)
                return total + scalar(grads) * 0.0

            an = jnp.asarray(anchors)
            jf, cost = compile_with_cost(loss_and_grads, params, batch,
                                         an, key)
            float(jf(params, batch, an, key))  # warm
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(jf(params, batch, an, key))
                times.append(time.perf_counter() - t0)
            rep = segment_report(float(np.median(times)), gen=gen, **cost)
            name = (f"trunk={'remat' if r_trunk else 'store'},"
                    f"unet={'remat' if r_unet else 'store'}")
            results["combos"][name] = rep
            print(f"{name:28} {rep['seconds']*1e3:8.1f} ms "
                  f"{rep['gflop']:9.1f} GF  {rep['gbytes']:7.1f} GB  "
                  f"mfu {rep['mfu']*100:5.2f}%  "
                  f"bw {rep['hbm_bw_util']*100:5.1f}%")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"remat_matrix_{args.stage}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
