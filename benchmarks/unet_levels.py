"""Per-level bisection of the LiTS U-Net body's kernel time.

After the round-4 upscale-head fix, the LiTS mask U-Net body still sits at
~47 % HBM-bandwidth utilization / 12 % MFU (benchmarks/unet_segments.json)
-- the device segment furthest from any roof.  This script times each
resolution level's sub-graph at the real LiTS finetune shapes
(crops [10, 32, 80, 80], base=32; reference LiTS_2017/mask_branch.py:11-220)
to locate the slack, and A/B-times the two candidate rewrites:

* ``up_phase``: the decoder's ``upsample_nearest -> 3^3 conv`` as ONE
  phase-decomposed conv + depth-to-space (``nn.upsample2_conv``) -- 8x the
  MXU output lanes at the U-Net's narrow channel counts, no materialized
  2x tensor;
* ``cat_split``: ``conv(concat([a, b]))`` as ``conv(a, W[:ci_a]) +
  conv(b, W[ci_a:])`` -- skips materializing the concatenated tensor
  (XLA does not fuse concat into conv operands).

Usage (axon env, CLAUDE.md): python benchmarks/unet_levels.py
Writes benchmarks/unet_levels.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main():
    import jax

    from cfun_tpu import nn
    from cfun_tpu.config import lits_inference_config
    from cfun_tpu.models import cfun
    from cfun_tpu.utils.roofline import (chip_generation, compile_with_cost,
                                         measure_dispatch_floor,
                                         segment_report, time_amortized)

    cfg = lits_inference_config("finetune")
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)["mask"]["unet"]
    gen = chip_generation()
    md, mh, mw = cfg.mask_pool_size
    n = cfg.detection_max_instances
    base = cfg.unet_base_channels
    rng = np.random.default_rng(0)
    dt = jnp.dtype(cfg.compute_dtype)

    def t(shape):
        return jnp.asarray(rng.normal(size=shape), dt)

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
        print(name, rows[name]["kernel_ms"], "ms kernel",
              rows[name]["report"].get("hbm_bw_util"), "bw",
              rows[name]["report"].get("mfu"), "mfu", flush=True)

    def conv(p, v, stride=1):
        return nn.conv3d(p, v, stride=stride, dtype=dt)

    def nlc(p, v):  # norm_lrelu_conv
        return conv(p, nn.leaky_relu(nn.instance_norm(v)))

    def cnl(p, v):  # conv_norm_lrelu
        return nn.leaky_relu(nn.instance_norm(conv(p, v)))

    def s(v):
        return jnp.sum(v.astype(jnp.float32))

    # ---- encoder level 1 (full res, C=base): 3 convs + residual + IN
    x1 = t((n, md, mh, mw, 1))

    def enc1(p, x):
        out = nn.conv3d_1ch(p["c1_1"], x, dtype=dt)
        res = out
        out = conv(p["c1_2"], nn.leaky_relu(out))
        out = conv(p["c1_lrelu_conv"], nn.leaky_relu(out))
        out = out + res
        return s(nn.leaky_relu(nn.instance_norm(out)))
    seg("enc_l1", enc1, (params, x1), perturb=1)

    # ---- encoder levels 2-5 (stride-2 down + shared-weight double conv)
    e1 = t((n, md, mh, mw, base))

    def enc2345(p, v):
        out = v
        acc = jnp.float32(0)
        for lvl in (2, 3, 4, 5):
            out = conv(p[f"c{lvl}_down"], out, stride=2)
            res = out
            out = nlc(p[f"c{lvl}_conv"], out)
            out = nlc(p[f"c{lvl}_conv"], out)
            out = out + res
            if lvl < 5:
                out = nn.leaky_relu(nn.instance_norm(out))
                acc = acc + s(out)
        return acc + s(out)
    seg("enc_l2345", enc2345, (params, e1), perturb=1)

    # ---- decoder blocks at their real shapes
    # l0: up 512 -> conv 256 at 1/8 -> 1/4 res, then 1x1
    e5 = t((n, md // 16, mh // 16, mw // 16, base * 16))

    def dec_l0(p, v):
        out = nn.upsample_nearest(nn.leaky_relu(nn.instance_norm(v)))
        out = nn.leaky_relu(nn.instance_norm(conv(p["l0_up_conv"], out)))
        out = conv(p["l0_conv"], out)
        return s(nn.leaky_relu(nn.instance_norm(out)))
    seg("dec_l0", dec_l0, (params, e5), perturb=1)

    def block(cat, conv_p, reduce_p, up_p, p):
        out = cnl(p[conv_p], cat)
        out = conv(p[reduce_p], out)
        out = nn.upsample_nearest(nn.leaky_relu(nn.instance_norm(out)))
        return nn.leaky_relu(nn.instance_norm(conv(p[up_p], out)))

    def block_phase(cat, conv_p, reduce_p, up_p, p):
        out = cnl(p[conv_p], cat)
        out = conv(p[reduce_p], out)
        out = nn.leaky_relu(nn.instance_norm(out))
        return nn.leaky_relu(nn.instance_norm(
            nn.upsample2_conv(p[up_p], out, dtype=dt)))

    shapes = {  # concat input per decoder block: [res_div, channels]
        "dec_l1": (8, base * 16, "l1_conv", "l1_reduce", "l1_up_conv"),
        "dec_l2": (4, base * 8, "l2_conv", "l2_reduce", "l2_up_conv"),
        "dec_l3": (2, base * 4, "l3_conv", "l3_reduce", "l3_up_conv"),
    }
    for name, (dv, ch, cp, rp, up) in shapes.items():
        cat = t((n, md // dv, mh // dv, mw // dv, ch))
        seg(name, lambda p, c, cp=cp, rp=rp, up=up:
            s(block(c, cp, rp, up, p)), (params, cat), perturb=1)
        seg(name + "_phase", lambda p, c, cp=cp, rp=rp, up=up:
            s(block_phase(c, cp, rp, up, p)), (params, cat), perturb=1)

    # ---- l4 (full res): concat conv + 1x1 out
    a = t((n, md, mh, mw, base))
    b = t((n, md, mh, mw, base))

    def dec_l4(p, u, c1):
        out = cnl(p["l4_conv"], jnp.concatenate([u, c1], axis=-1))
        return s(conv(p["l4_out"], out))
    seg("dec_l4", dec_l4, (params, a, b), perturb=1)

    def dec_l4_split(p, u, c1):
        w = p["l4_conv"]["w"]
        ci = u.shape[-1]
        y = nn.conv3d({"w": w[:, :, :, :ci]}, u, dtype=dt) + \
            nn.conv3d({"w": w[:, :, :, ci:]}, c1, dtype=dt)
        out = nn.leaky_relu(nn.instance_norm(y))
        return s(conv(p["l4_out"], out))
    seg("dec_l4_split", dec_l4_split, (params, a, b), perturb=1)

    # ---- enc_l1 via the Pallas fused conv+IN+LReLU kernel (W-on-lanes
    # layout, ops/pallas_conv.py): the whole-net fused graph loses to XLA
    # (benchmarks/pallas_conv_timing.json), but enc_l1 is the one level
    # where XLA moves ~6x the logical bytes -- test it in isolation
    from cfun_tpu.ops.pallas_conv import fused_conv3d, identity_affine

    def enc1_fused(p, x):
        out = nn.conv3d_1ch(p["c1_1"], x, dtype=dt)
        res_ = out
        aff = identity_affine(out.shape[0], out.shape[-1])
        # identity affine + pre_lrelu: the reference has plain lrelu (no
        # IN) between the level-1 convs (mask_branch.py:131-134)
        out, _ = fused_conv3d(out, p["c1_2"]["w"], aff[0], aff[1],
                              pre_lrelu=True, out_dtype=dt)
        out2, _ = fused_conv3d(out, p["c1_lrelu_conv"]["w"], aff[0], aff[1],
                               pre_lrelu=True, out_dtype=dt)
        out = out2 + res_
        return s(nn.leaky_relu(nn.instance_norm(out)))
    try:
        seg("enc_l1_fused", enc1_fused, (params, x1), perturb=1)
    except Exception as e:  # keep the sweep alive if the kernel rejects
        print("enc_l1_fused failed:", e)

    # ---- whole U-Net body, explicit vs phase decoder up-convs
    from cfun_tpu.models.unet3d import apply_unet

    for impl in ("explicit", "phase"):
        def unet_fn(p, c, _impl=impl):
            return s(apply_unet(p, c, stage="finetune", dtype=dt,
                                head_impl="phase", up_impl=_impl))
        seg(f"unet_body_{impl}", unet_fn, (params, x1), perturb=1)

    res = {"chip": gen, "dispatch_floor_ms":
           round(measure_dispatch_floor() * 1e3, 2),
           "shapes": {"crops": [n, md, mh, mw, 1], "base": base},
           "segments": rows}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "unet_levels.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("->", out)


if __name__ == "__main__":
    main()
