"""Execute the LiTS 'together' and 'finetune' train steps ON CHIP.

Round 2 compiled these stages and published memory_analysis() numbers but
only 'beginning' ever executed (VERDICT r2 #4).  This script runs the
reference's staged recipe (LiTS_2017/LiTS_main.py:435) on synthetic
liver/tumor volumes: train 'beginning' for a few epochs so the RPN
localizes, transfer the checkpoint (key-filtered load, the reference's
stage-transfer path), then execute N real optimizer steps of 'together'
and 'finetune' recording s/step wall, loss trajectory and HBM peak.

Round 5: sources default to REAL LiTS sizes (512x512x420 -- the shape
round 2 measured 2.32 s/step feeder-bound) with the epoch-constant
rotation ACTIVE, exercising the fused native rotation+mold train path
(native/host_ops.cc::lits_train_mold_q8; the round-4-weak-#2 fix).  A
host-side before/after microbench of the feeder item (two-pass rotate ->
mold chain vs the fused kernel) is recorded alongside the on-chip
s/step.

Axon env (CLAUDE.md), ONE TPU process at a time:
    python benchmarks/lits_train_steps.py --begin-epochs 3 --steps 10
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


class SyntheticLiTS:
    """In-memory HU-valued volumes: bright (low-HU) liver blob with a
    tumor core on a ~300 HU background, sized so the molded organ box is
    detectable by the (64, 128) cube anchors."""

    def __init__(self, n=6, seed=0, host_shape=(400, 400, 280)):
        self._vols = []
        h, w, d = host_shape
        for i in range(n):
            rng = np.random.default_rng(seed + i)
            labels = np.zeros((h, w, d), np.int8)
            cy, cx, cz = (rng.integers(h // 3, 2 * h // 3),
                          rng.integers(w // 3, 2 * w // 3), d // 2)
            yy, xx, zz = np.ogrid[:h, :w, :d]
            liver = (((yy - cy) / (h // 5)) ** 2 + ((xx - cx) / (w // 5)) ** 2
                     + ((zz - cz) / (d // 4)) ** 2) < 1.0
            tumor = (((yy - cy) / (h // 12)) ** 2
                     + ((xx - cx) / (w // 12)) ** 2
                     + ((zz - cz) / (d // 10)) ** 2) < 1.0
            labels[liver] = 1
            labels[tumor] = 2
            vol = np.full((h, w, d), 300.0, np.float32)
            vol += rng.normal(0, 40, size=(h, w, d)).astype(np.float32)
            vol[liver] = -150.0
            vol[tumor] = -280.0
            self._vols.append((vol, labels))
        self.num_images = n

    def load_image(self, i):
        return self._vols[i][0][..., None]

    def load_mask(self, i):
        return self._vols[i][1]


def feeder_item_microbench(feeder_src, angle, reps=3):
    """Host wall of ONE feeder item at real source sizes: the fused
    rotation+mold path vs the two-pass fallback (rotate_hw raw copies,
    then mold) -- the before/after of the round-5 fast path.  Outputs are
    asserted bit-identical."""
    import cfun_tpu.native as nat
    from cfun_tpu.config import lits_config
    from cfun_tpu.data.feeder import TrainFeeder
    from cfun_tpu.ops.anchors import config_anchors

    cfg = lits_config("beginning")
    anchors = config_anchors(cfg)
    feeder = TrainFeeder(feeder_src, cfg, anchors, seed=7, num_workers=1)

    def time_item():
        walls = []
        item = None
        for _ in range(reps):
            t0 = time.perf_counter()
            item = feeder.make_item(0, angle=angle, seed=11)
            walls.append(time.perf_counter() - t0)
        return {"median_s": round(float(np.median(walls)), 3),
                "min_s": round(float(np.min(walls)), 3)}, item

    fused_t, fused_item = time_item()
    with nat.force_two_pass():
        twopass_t, twopass_item = time_item()
    feeder.close()
    for name, a, b in zip(fused_item._fields, fused_item, twopass_item):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    return {"angle_deg": angle, "fused": fused_t, "two_pass": twopass_t,
            "speedup": round(twopass_t["median_s"] /
                             max(fused_t["median_s"], 1e-9), 1),
            "native_threads": nat.num_threads(), "bit_identical": True}


def run_stage(stage, ckpt, steps, feeder_src, angle=0.0):
    import jax
    import jax.numpy as jnp

    from cfun_tpu.config import lits_config
    from cfun_tpu.data.feeder import TrainFeeder
    from cfun_tpu.models import cfun
    from cfun_tpu.ops.anchors import config_anchors
    from cfun_tpu.train.step import make_train_step
    from cfun_tpu.utils import checkpoint

    cfg = lits_config(stage)
    anchors = config_anchors(cfg)
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    init_state, step = make_train_step(cfg, anchors)
    state = init_state(params)
    if ckpt:
        p, o, meta = checkpoint.load(ckpt, state.params, state.opt_state,
                                     strict=False)
        state = state._replace(params=p)
        print(f"[{stage}] transferred weights from {ckpt} "
              f"(epoch {meta.get('epoch')})")

    feeder = TrainFeeder(feeder_src, cfg, anchors, seed=7, num_workers=2)
    key = jax.random.PRNGKey(1)
    losses, mask_losses, walls = [], [], []
    first_wall = None
    batch = None
    for i, item in enumerate(feeder.epoch(angle, steps)):
        batch = jax.tree.map(jnp.asarray, item)
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, metrics = step(state, batch, sub)
        total = float(metrics["total_loss"])  # scalar readback = sync
        wall = time.perf_counter() - t0
        losses.append(total)
        mask_losses.append(float(metrics["mrcnn_mask_loss"]))
        if i == 0:
            first_wall = wall  # includes compile
        else:
            walls.append(wall)
        print(f"[{stage}] step {i}: loss {total:.4f} "
              f"mask {mask_losses[-1]:.4f} ({wall:.2f}s)")
    feeder.close()

    # HBM peak from the compiled executable (cache hit: same jit fn)
    mem = {}
    try:
        ma = step.lower(state, batch, key).compile().memory_analysis()
        mem = {"temp_gib": round(ma.temp_size_in_bytes / 2**30, 2),
               "args_gib": round(ma.argument_size_in_bytes / 2**30, 2),
               "output_gib": round(ma.output_size_in_bytes / 2**30, 2)}
    except Exception as e:
        mem = {"error": repr(e)[:150]}
    return {"stage": stage, "angle_deg": angle,
            "compile_step_s": round(first_wall or 0, 2),
            "s_per_step": round(float(np.median(walls)), 3) if walls else None,
            "losses": [round(v, 3) for v in losses],
            "mask_losses": [round(v, 4) for v in mask_losses],
            "memory": mem}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--begin-epochs", default=3, type=int)
    ap.add_argument("--begin-steps", default=30, type=int)
    ap.add_argument("--steps", default=10, type=int)
    ap.add_argument("--skip-beginning", default=None,
                    help="path to an existing beginning-stage ckpt")
    ap.add_argument("--host-shape", default="512,512,420",
                    help="raw source (H, W, D) -- default is the real LiTS "
                         "size round 2 measured feeder-bound")
    ap.add_argument("--angle", default=17.0, type=float,
                    help="epoch rotation angle (0 disables augmentation)")
    ap.add_argument("--n-volumes", default=4, type=int)
    args = ap.parse_args()

    from cfun_tpu.config import lits_config
    from cfun_tpu.train.loop import train_model

    host_shape = tuple(int(v) for v in args.host_shape.split(","))
    src = SyntheticLiTS(n=args.n_volumes, host_shape=host_shape)
    micro = feeder_item_microbench(src, args.angle)
    print(json.dumps({"feeder_item": micro, "host_shape": host_shape}))

    ckpt = args.skip_beginning
    results = [{"host_shape": list(host_shape), "feeder_item": micro}]
    if not ckpt:
        cfg = lits_config("beginning", steps_per_epoch=args.begin_steps,
                          validation_steps=2, val_every_epochs=10)
        tmp = tempfile.mkdtemp(prefix="lits_begin_")
        ckpt = train_model(cfg, src, SyntheticLiTS(n=2, seed=50,
                                                   host_shape=host_shape),
                           log_dir=tmp, epochs=args.begin_epochs,
                           num_workers=2)
        print(f"beginning ckpt: {ckpt}")

    for stage in ("beginning", "together", "finetune"):
        res = run_stage(stage, None if stage == "beginning" else ckpt,
                        args.steps, src, angle=args.angle)
        results.append(res)
        print(json.dumps(res))

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "lits_steps.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
