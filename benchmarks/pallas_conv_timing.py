"""Fused Pallas conv+IN+LeakyReLU kernel vs XLA, on the real chip.

The VERDICT-r2 #2 measurement: the kernel (`ops/pallas_conv.py`) fuses
pre-affine + LeakyReLU + 3x3x3 conv + output-moment emission into one
VMEM-resident pass; this times it against XLA's own fusion of the same
computation at the mask U-Net's two hot level shapes.

Two modes per case:
* single jit'd call (includes the backend's per-call dispatch, ~25-28 ms
  through the tunnel, CLAUDE.md);
* a jit'd `lax.scan` chain of REPS dependent convs -- dispatch paid once,
  kernel paid REPS times, so (chain - roundtrip)/REPS is true device time.

Axon env, one TPU process:  python benchmarks/pallas_conv_timing.py

Result (2026-08-17, tunneled v5e): XLA ties/wins -- heart_L1 2.90 ms/conv
XLA vs 3.37 Pallas; lits_L1 13.23 vs 13.07.  Both sit at 3-4 % MFU: the
16-32 input channels pad to the 128-wide MXU lanes, and that occupancy
bound binds both schedules equally.  `Config.pallas_unet` stays opt-in.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REPS = 10
# (name, B, D, H, W, C_in, C_out) -- U-Net level-1 shapes of both families
CASES = [("heart_L1", 1, 96, 96, 96, 20, 20),
         ("lits_L1", 10, 32, 80, 80, 32, 32)]


def main():
    import jax
    import jax.numpy as jnp

    from cfun_tpu import nn
    from cfun_tpu.ops.pallas_conv import fused_conv3d, identity_affine

    def t_scalar(fn, *args, reps=5):
        float(fn(*args))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    ov = t_scalar(jax.jit(lambda v: v * 2.0 + 1.0), jnp.float32(3.0))
    results = {"roundtrip_overhead_ms": round(ov * 1e3, 2)}
    print(f"roundtrip overhead: {ov*1e3:.1f} ms")

    for name, b, d, h, w, c, co in CASES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(b, d, h, w, c)), jnp.float32)
        wk = jnp.asarray((0.2 / c) * rng.normal(size=(3, 3, 3, c, co)),
                         jnp.float32)
        sc, sh = identity_affine(b, c)

        def xla_one(xx, ww):
            act = nn.leaky_relu(xx)
            y = nn.conv3d({"w": ww}, act.astype(jnp.bfloat16),
                          dtype=jnp.bfloat16)
            s = jnp.stack(
                [jnp.sum(y, axis=(1, 2, 3), dtype=jnp.float32),
                 jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(1, 2, 3))],
                1)
            return y.astype(jnp.float32), s

        def pl_one(xx, ww):
            return fused_conv3d(xx, ww, sc, sh, pre_lrelu=True)

        def chain(one):
            def run(xx, ww):
                def body(carry, _):
                    y, s = one(carry, ww)
                    # conv output is bf16; keep the scan carry f32-stable
                    return y.astype(jnp.float32), jnp.sum(s)
                out, ss = jax.lax.scan(body, xx, None, length=REPS)
                return jnp.sum(out) + jnp.sum(ss)
            return run

        gf = 2 * b * d * h * w * 27 * c * co / 1e9
        results[name] = {"gflop_per_conv": round(gf, 1)}
        for tag, one in (("xla", xla_one), ("pallas", pl_one)):
            single = t_scalar(jax.jit(
                lambda xx, ww, f=one: jnp.sum(f(xx, ww)[0])), x, wk)
            chained = t_scalar(jax.jit(chain(one)), x, wk)
            per = max(chained - ov, 0.0) / REPS
            tf = gf / per / 1e3 if per else float("nan")
            results[name][tag] = {
                "single_call_ms": round(single * 1e3, 2),
                "per_conv_ms": round(per * 1e3, 2),
                "tflops": round(tf, 2),
                "mfu_pct_v5e": round(tf / 197.0 * 100, 1),
            }
            print(f"{name} {tag}: single {single*1e3:.1f} ms, "
                  f"{per*1e3:.2f} ms/conv = {tf:.2f} TF/s "
                  f"({tf/197.0*100:.1f}% MFU) [{gf:.1f} GF]")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "pallas_conv_timing.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
