"""Per-segment MFU / roofline table for the device programs, on real TPU.

Every segment is timed TWO ways (utils/roofline.py::time_amortized):
* per-call wall -- includes the backend's per-call dispatch, which through
  the tunneled axon backend is a ~25 ms RPC floor (CLAUDE.md; measured
  below as ``dispatch_floor_ms``), 35-50% of the small segments' wall;
* amortized kernel time from a jit'd lax.scan chain of dependent calls --
  dispatch paid once, kernel paid CHAIN times.  MFU / bandwidth
  utilization are derived from BOTH; the kernel-only column is the honest
  distance-to-roof number (VERDICT r3 #1: the round-3 table conflated
  dispatch with kernel time and understated utilization ~2x on the small
  segments).

FLOP/byte counts come from XLA's compiled cost analysis; timing is scalar
readback (block_until_ready is unreliable through the tunnel, CLAUDE.md).

Usage (axon env, see CLAUDE.md):
    python benchmarks/mfu.py [--family heart|lits|both] [--reps 5]
        [--chain 8]

Writes benchmarks/mfu_<family>.json and prints a table.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _tree_scalar(out):
    leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)
              if hasattr(x, "astype")]
    return sum(leaves[1:], leaves[0])


def _segment(fn, args, *, perturb, cost, gen, reps, chain):
    """Both timings + both roofline reports for one segment."""
    from cfun_tpu.utils.roofline import (compile_with_cost, segment_report,
                                         time_amortized)

    jf, measured = compile_with_cost(fn, *args)
    cost = cost if cost is not None else measured
    tm = time_amortized(fn, args, perturb=perturb, reps=reps, chain=chain,
                        compiled_single=jf)
    return {
        "per_call": segment_report(tm["single_s"], gen=gen, **cost),
        "kernel": segment_report(tm["kernel_s"], gen=gen, **cost),
        "dispatch_ms": round(tm["dispatch_s"] * 1e3, 2),
        "chain": tm["chain"],
        "cost": cost,
    }


def measure_family(family: str, reps: int = 5, chain: int = 8):
    from cfun_tpu.config import heart_inference_config, heart_config, \
        lits_inference_config
    from cfun_tpu.models import cfun
    from cfun_tpu.models.heads import apply_mask_head
    from cfun_tpu.ops.anchors import config_anchors
    from cfun_tpu.utils.roofline import chip_generation, \
        measure_dispatch_floor

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

    rows["trunk"] = _segment(trunk_fn, (params, image), perturb=1,
                             cost=None, gen=gen, reps=reps, chain=chain)

    # ---- proposal tail: top-k + deltas + NMS on precomputed rpn outputs
    trunk_out = jax.jit(lambda p, i: cfun.apply_trunk(p, i, cfg))(
        params, image)
    logits = jax.device_put(np.asarray(trunk_out.rpn_logits[0]))
    deltas = jax.device_put(np.asarray(trunk_out.rpn_deltas[0]))

    def propose_fn(lg, dl, an):
        props, valid = cfun.propose(lg, dl, an, cfg,
                                    cfg.post_nms_rois_inference)
        return jnp.sum(props) + jnp.sum(valid).astype(jnp.float32)

    rows["propose_nms"] = _segment(propose_fn, (logits, deltas, anchors),
                                   perturb=0, cost=None, gen=gen,
                                   reps=reps, chain=chain)

    # ---- mask U-Net on the stage's crop batch
    md, mh, mw = cfg.mask_pool_size
    crops = jnp.asarray(
        np.random.default_rng(1).normal(size=(n_crops, md, mh, mw, 1)),
        jnp.float32)

    def unet_fn(p, c):
        return jnp.sum(apply_mask_head(
            p["mask"], c, stage=cfg.stage,
            dtype=jnp.dtype(cfg.compute_dtype)).astype(jnp.float32))

    rows["unet"] = _segment(unet_fn, (params, crops), perturb=1,
                            cost=None, gen=gen, reps=reps, chain=chain)
    unet_cost = rows["unet"]["cost"]

    # finetune-stage U-Net (the reference's published-quality path): same
    # crop, 2x upscale head doubling the output res (mask_branch.py:216-218)
    def unet_ft_fn(p, c):
        return jnp.sum(apply_mask_head(
            p["mask"], c, stage="finetune",
            dtype=jnp.dtype(cfg.compute_dtype)).astype(jnp.float32))

    if cfg.stage != "finetune":
        rows["unet_finetune"] = _segment(unet_ft_fn, (params, crops),
                                         perturb=1, cost=None, gen=gen,
                                         reps=reps, chain=chain)

    # same math, Pallas-fused lowering; FLOP basis = the XLA graph's count
    def unet_fused_fn(p, c):
        return jnp.sum(apply_mask_head(
            p["mask"], c, stage=cfg.stage,
            dtype=jnp.dtype(cfg.compute_dtype),
            fused=True).astype(jnp.float32))

    try:
        rows["unet_pallas_fused"] = _segment(
            unet_fused_fn, (params, crops), perturb=1, cost=unet_cost,
            gen=gen, reps=reps, chain=chain)
    except Exception as e:
        rows["unet_pallas_fused"] = {"error": repr(e)[:200]}

    # ---- whole inference graph
    def infer_fn(p, img, an, win):
        return _tree_scalar(cfun.infer_forward(p, img, an, win, cfg=cfg))

    rows["infer_graph"] = _segment(infer_fn,
                                   (params, image, anchors, window),
                                   perturb=1, cost=None, gen=gen,
                                   reps=reps, chain=max(2, chain // 2))

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
        rows["train_fwd_bwd"] = _segment(
            train_loss_and_grads, (tparams, batch, jnp.asarray(tanchors),
                                   key),
            perturb=2, cost=None, gen=gen, reps=max(2, reps // 2),
            chain=4)

    return {"family": family, "chip": gen,
            "dispatch_floor_ms": round(measure_dispatch_floor() * 1e3, 2),
            "device": str(jax.devices()[0]), "segments": rows}


def print_table(res):
    print(f"== {res['family']} ({res['chip']}) "
          f"dispatch floor {res['dispatch_floor_ms']} ms ==")
    hdr = (f"{'segment':18} {'call ms':>9} {'kern ms':>9} {'disp ms':>8} "
           f"{'GF':>9} {'kTF/s':>7} {'kMFU':>7} {'kBW%':>6}")
    print(hdr)
    for name, r in res["segments"].items():
        if "error" in r:
            print(f"{name:18} ERROR {r['error']}")
            continue
        pc, kn = r["per_call"], r["kernel"]
        mfu_s = (f"{kn['mfu']*100:6.2f}%" if kn.get("mfu") is not None
                 else "   n/a")
        bw = (f"{kn['hbm_bw_util']*100:5.1f}%"
              if kn.get("hbm_bw_util") is not None else "  n/a")
        print(f"{name:18} {pc['seconds']*1e3:9.1f} {kn['seconds']*1e3:9.1f} "
              f"{r['dispatch_ms']:8.1f} {kn['gflop'] or 0:9.1f} "
              f"{kn['tflops_per_s'] or 0:7.2f} {mfu_s} {bw}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="heart",
                    choices=["heart", "lits", "both"])
    ap.add_argument("--reps", default=5, type=int)
    ap.add_argument("--chain", default=8, type=int)
    args = ap.parse_args()
    fams = ["heart", "lits"] if args.family == "both" else [args.family]
    for fam in fams:
        res = measure_family(fam, reps=args.reps, chain=args.chain)
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"mfu_{fam}.json")
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
        print_table(res)
        print(f"-> {out}")


if __name__ == "__main__":
    main()
