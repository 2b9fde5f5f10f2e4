"""Bisect the LiTS finetune U-Net's 170 ms kernel time (mfu_lits.json).

The honest (dispatch-separated) roofline shows the LiTS mask U-Net at 25 %
HBM-bandwidth utilization and 5 % MFU -- the one device segment far from
any roof (heart segments and the LiTS trunk all sit at 63-75 % BW).  This
script times the stage variants and the candidate hot sub-graphs to locate
the gap before optimizing:

* the whole U-Net at stage='together' (same graph minus the 2x upscale
  head) vs stage='finetune';
* the upscale head alone: ``up = upsample_nearest(out); up + conv5(up)``
  over [10, 32, 80, 80, 3] -> [10, 64, 160, 160, 3] (reference
  mask_branch.py:216-218) -- suspicious because class-count tensors
  (C=3) lane-pad 3->128 on TPU, so the materialized high-res tensor
  costs ~43x its logical bytes;
* the deep-supervision tail (ds2/ds3 1x1 convs + nearest upsamples,
  mask_branch.py:209-215) at C=3.

Usage (axon env, CLAUDE.md):  python benchmarks/unet_segments.py
Writes benchmarks/unet_segments.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cfun_tpu import nn
    from cfun_tpu.config import lits_inference_config
    from cfun_tpu.models import cfun
    from cfun_tpu.models.heads import apply_mask_head
    from cfun_tpu.utils.roofline import (chip_generation, compile_with_cost,
                                         measure_dispatch_floor,
                                         segment_report, time_amortized)

    cfg = lits_inference_config("finetune")
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    gen = chip_generation()
    md, mh, mw = cfg.mask_pool_size
    n = cfg.detection_max_instances
    rng = np.random.default_rng(0)
    crops = jnp.asarray(rng.normal(size=(n, md, mh, mw, 1)), jnp.float32)
    nc = cfg.num_classes
    dt = jnp.dtype(cfg.compute_dtype)

    rows = {}

    def seg(name, fn, args, perturb=0, chain=8):
        jf, cost = compile_with_cost(fn, *args)
        tm = time_amortized(fn, args, perturb=perturb, reps=5, chain=chain,
                            compiled_single=jf)
        rows[name] = {
            "per_call_ms": round(tm["single_s"] * 1e3, 2),
            "kernel_ms": round(tm["kernel_s"] * 1e3, 2),
            "report": segment_report(tm["kernel_s"], gen=gen, **cost),
        }
        print(name, rows[name]["per_call_ms"], "ms/call",
              rows[name]["kernel_ms"], "ms kernel",
              rows[name]["report"].get("hbm_bw_util"), "bw")

    # whole U-Net, both stages (finetune = together + upscale head)
    for stage in ("together", "finetune"):
        def unet_fn(p, c, _stage=stage):
            return jnp.sum(apply_mask_head(
                p["mask"], c, stage=_stage, dtype=dt).astype(jnp.float32))
        seg(f"unet_{stage}", unet_fn, (params, crops), perturb=1)

    # upscale head alone on a representative 'out' tensor
    out_lo = jnp.asarray(rng.normal(size=(n, md, mh, mw, nc)), dt)
    wup = params["mask"]["unet"]["out_upscale"]

    def head_fn(p, o):
        up = nn.upsample_nearest(o)
        return jnp.sum((up + nn.conv3d(p, up, dtype=dt))
                       .astype(jnp.float32))
    seg("upscale_head", head_fn, (wup, out_lo), perturb=1)

    # the lhs-dilated rewrite (nn.upsample2_conv_residual): same math, no
    # materialized high-res tensor
    def head_fused_fn(p, o):
        return jnp.sum(nn.upsample2_conv_residual(p, o, dtype=dt)
                       .astype(jnp.float32))
    seg("upscale_head_dilated", head_fused_fn, (wup, out_lo), perturb=1)

    # deep-supervision tail: ds2 at 1/4 res (C=8*base), ds3 at 1/2 res
    base = cfg.unet_base_channels
    ds2 = jnp.asarray(rng.normal(
        size=(n, md // 4, mh // 4, mw // 4, 8 * base)), dt)
    ds3 = jnp.asarray(rng.normal(
        size=(n, md // 2, mh // 2, mw // 2, 4 * base)), dt)
    out_pred = jnp.asarray(rng.normal(size=(n, md, mh, mw, nc)), dt)
    p_ds2 = params["mask"]["unet"]["ds2"]
    p_ds3 = params["mask"]["unet"]["ds3"]

    def ds_fn(pa, pb, d2, d3, op):
        ds2_up = nn.upsample_nearest(nn.conv3d(pa, d2, dtype=dt))
        ds3_c = nn.conv3d(pb, d3, dtype=dt)
        return jnp.sum((op + nn.upsample_nearest(ds2_up + ds3_c))
                       .astype(jnp.float32))
    seg("ds_tail", ds_fn, (p_ds2, p_ds3, ds2, ds3, out_pred), perturb=2)

    res = {"chip": gen, "dispatch_floor_ms":
           round(measure_dispatch_floor() * 1e3, 2),
           "shapes": {"crops": list(crops.shape), "classes": nc},
           "segments": rows}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "unet_segments.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("->", out)


if __name__ == "__main__":
    main()
