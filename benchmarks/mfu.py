"""Per-segment MFU / roofline table for the device programs, on real TPU.

Times each hot segment (scalar-readback timing -- block_until_ready is
unreliable through the tunnel, CLAUDE.md) and divides XLA's own compiled
flop/byte counts by the chip's peak (utils/roofline.py).

Usage (axon env, see CLAUDE.md):
    python benchmarks/mfu.py [--family heart|lits|both] [--reps 5]

Writes benchmarks/mfu_<family>.json and prints a table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _time(fn, *args, reps=5):
    """Median seconds via scalar readback (fn must return a scalar)."""
    float(fn(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _tree_scalar(out):
    leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)
              if hasattr(x, "astype")]
    return sum(leaves[1:], leaves[0])


def measure_family(family: str, reps: int = 5):
    from cfun_tpu.config import heart_inference_config, heart_config, \
        lits_inference_config
    from cfun_tpu.models import cfun
    from cfun_tpu.models.heads import apply_mask_head
    from cfun_tpu.ops.anchors import config_anchors
    from cfun_tpu.utils.roofline import chip_generation, \
        compile_with_cost, segment_report

    if family == "heart":
        cfg = heart_inference_config("beginning")
        n_crops = 1
    else:
        cfg = lits_inference_config("finetune")
        n_crops = cfg.detection_max_instances
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(config_anchors(cfg))
    d, h, w = cfg.image_shape
    image = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, d, h, w, 1)),
        jnp.float32)
    window = jnp.asarray([0, 0, 0, d, h, w], jnp.float32)
    gen = chip_generation()
    rows = {}

    # ---- trunk: P3D backbone + FPN + RPN heads
    def trunk_fn(p, img):
        return _tree_scalar(cfun.apply_trunk(p, img, cfg))

    jf, cost = compile_with_cost(trunk_fn, params, image)
    sec = _time(jf, params, image, reps=reps)
    rows["trunk"] = segment_report(sec, gen=gen, **cost)

    # ---- proposal tail: top-k + deltas + NMS on precomputed rpn outputs
    trunk_out = jax.jit(lambda p, i: cfun.apply_trunk(p, i, cfg))(
        params, image)
    logits = jax.device_put(np.asarray(trunk_out.rpn_logits[0]))
    deltas = jax.device_put(np.asarray(trunk_out.rpn_deltas[0]))

    def propose_fn(lg, dl, an):
        props, valid = cfun.propose(lg, dl, an, cfg,
                                    cfg.post_nms_rois_inference)
        return jnp.sum(props) + jnp.sum(valid)

    jf, cost = compile_with_cost(propose_fn, logits, deltas, anchors)
    sec = _time(jf, logits, deltas, anchors, reps=reps)
    rows["propose_nms"] = segment_report(sec, gen=gen, **cost)

    # ---- mask U-Net on the stage's crop batch
    md, mh, mw = cfg.mask_pool_size
    crops = jnp.asarray(
        np.random.default_rng(1).normal(size=(n_crops, md, mh, mw, 1)),
        jnp.float32)

    def unet_fn(p, c):
        return jnp.sum(apply_mask_head(
            p["mask"], c, stage=cfg.stage,
            dtype=jnp.dtype(cfg.compute_dtype)).astype(jnp.float32))

    jf, unet_cost = compile_with_cost(unet_fn, params, crops)
    sec = _time(jf, params, crops, reps=reps)
    rows["unet"] = segment_report(sec, gen=gen, **unet_cost)

    # same math, Pallas-fused lowering; FLOP basis = the XLA graph's count
    def unet_fused_fn(p, c):
        return jnp.sum(apply_mask_head(
            p["mask"], c, stage=cfg.stage,
            dtype=jnp.dtype(cfg.compute_dtype),
            fused=True).astype(jnp.float32))

    try:
        jf, _ = compile_with_cost(unet_fused_fn, params, crops)
        sec = _time(jf, params, crops, reps=reps)
        rows["unet_pallas_fused"] = segment_report(
            sec, gen=gen, **unet_cost)
    except Exception as e:
        rows["unet_pallas_fused"] = {"error": repr(e)[:200]}

    # ---- whole inference graph
    def infer_fn(p, img, an, win):
        return _tree_scalar(cfun.infer_forward(p, img, an, win, cfg=cfg))

    jf, cost = compile_with_cost(infer_fn, params, image, anchors,
                                 window)
    sec = _time(jf, params, image, anchors, window, reps=reps)
    rows["infer_graph"] = segment_report(sec, gen=gen, **cost)

    # ---- train step (undonated copy of the product step's math)
    if family == "heart":
        from cfun_tpu.train.step import TrainBatch, train_forward
        from cfun_tpu.train.targets import build_rpn_targets

        tcfg = heart_config("beginning")
        tparams = cfun.init_params(jax.random.PRNGKey(0), tcfg)
        tanchors = config_anchors(tcfg)
        labels = np.zeros((d, h, w), np.int8)
        labels[60:120, 100:220, 100:220] = 1
        gt = np.array([60, 100, 100, 120, 220, 220], np.float32)
        m, dl = build_rpn_targets(tanchors, gt, tcfg,
                                  np.random.default_rng(0))
        norm = np.array([d, h, w, d, h, w], np.float32)
        batch = TrainBatch(jnp.asarray(np.asarray(image)),
                           jnp.asarray(m), jnp.asarray(dl),
                           jnp.asarray(gt / norm),
                           jnp.asarray(labels.astype(np.int32)))

        def train_loss_and_grads(p, b, an, k):
            (total, _), grads = jax.value_and_grad(
                train_forward, has_aux=True)(p, b, an, tcfg, k)
            return total + _tree_scalar(grads) * 0.0

        key = jax.random.PRNGKey(0)
        jf, cost = compile_with_cost(train_loss_and_grads, tparams,
                                     batch, jnp.asarray(tanchors), key)
        sec = _time(jf, tparams, batch, jnp.asarray(tanchors), key,
                    reps=max(2, reps // 2))
        rows["train_fwd_bwd"] = segment_report(sec, gen=gen, **cost)

    return {"family": family, "chip": gen,
            "device": str(jax.devices()[0]), "segments": rows}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="heart",
                    choices=["heart", "lits", "both"])
    ap.add_argument("--reps", default=5, type=int)
    args = ap.parse_args()
    fams = ["heart", "lits"] if args.family == "both" else [args.family]
    for fam in fams:
        res = measure_family(fam, reps=args.reps)
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"mfu_{fam}.json")
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"== {fam} ({res['chip']}) ==")
        for name, r in res["segments"].items():
            if "error" in r:
                print(f"{name:18} ERROR {r['error']}")
                continue
            bw = (f" bw {r['hbm_bw_util']*100:5.1f}%"
                  if r.get("hbm_bw_util") is not None else "")
            mfu_s = (f"{r['mfu']*100:5.2f}%" if r.get("mfu") is not None
                     else "  n/a")
            print(f"{name:18} {r['seconds']*1e3:8.1f} ms "
                  f"{r['gflop'] or 0:10.1f} GF "
                  f"{r['tflops_per_s'] or 0:7.2f} TF/s "
                  f"mfu {mfu_s}{bw}")
        print(f"-> {out}")


if __name__ == "__main__":
    main()
