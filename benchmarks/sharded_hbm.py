"""Per-device memory of the heart FINETUNE train step, dense vs sharded.

The sharded U-Net's reason to exist (parallel/halo.py) is scaling the
finetune stage -- 192^3 mask crops, measured 15.3 GB of a 16 GB v5e as a
single-device program -- beyond one chip.  This script makes that concrete
(VERDICT r3 #3a): it AOT-compiles the REAL heart finetune train step

  * single-device (``make_train_step``), and
  * on a ('data', 'space') mesh at space=2, both the GSPMD-propagated
    spatial sharding and the explicit shard_map halo U-Net
    (``cfg.shard_unet_spatial``),

and records each executable's ``memory_analysis()`` -- per-DEVICE numbers
for SPMD executables, so the dense-vs-sharded delta is exactly the HBM a
second chip buys.  Everything is abstract (ShapeDtypeStruct lowering): no
arrays are allocated, so the 15+ GiB programs "fit" on any host and the
CPU backend is fine (the buffer-assignment sizes, not the runtime, are the
measurement; XLA fusion differs slightly across backends, so treat the
absolute numbers as estimates and the dense-vs-sharded RATIO as the
result).

Usage (CPU, no TPU needed):
    XLA_FLAGS=--xla_force_host_platform_device_count=2 JAX_PLATFORMS=cpu \
        python benchmarks/sharded_hbm.py [--stage finetune] [--space 2]

Writes benchmarks/sharded_hbm.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# FORCE the CPU backend: this is an analysis script ("CPU, no TPU
# needed"); with the axon plugin importable a mere setdefault let it grab
# the tunneled TPU and OOM/contend with real chip runs (observed r5)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
# virtual device count must cover --space, and it must be set BEFORE jax
# imports -- pre-scan argv rather than pinning 2 (which silently capped
# the advertised --space parameter)
_space = 2
for _i, _a in enumerate(sys.argv):
    if _a == "--space" and _i + 1 < len(sys.argv):
        _space = max(2, int(sys.argv[_i + 1]))
    elif _a.startswith("--space="):
        _space = max(2, int(_a.split("=", 1)[1]))
if "--xla_force_host_platform_device_count" not in \
        os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{_space}").strip()

import jax  # noqa: E402

# the env assignments above are NOT enough when the axon env is already
# present at interpreter start: /root/.axon_site/sitecustomize.py imports
# jax during site init (before this script body runs), latching
# jax_platforms='axon' -- the r5 rerun grabbed the tunneled chip and OOMed
# its 16 GB HBM on the dense finetune compile.  Re-force via config, which
# wins over the latched env value.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, jnp.dtype(dtype))


def batch_sds(cfg, n_anchors, batch_axis=None):
    """Abstract TrainBatch (optionally with a leading stacked axis)."""
    from cfun_tpu.train.step import TrainBatch

    d, h, w = cfg.image_shape
    lead = () if batch_axis is None else (batch_axis,)
    return TrainBatch(
        image=_sds(lead + (1, d, h, w, 1), jnp.float32),
        rpn_match=_sds(lead + (n_anchors,), jnp.int8),
        rpn_deltas=_sds(lead + (n_anchors, 6), jnp.float32),
        gt_box_norm=_sds(lead + (6,), jnp.float32),
        labels=_sds(lead + (d, h, w), jnp.int32),
    )


def state_sds(cfg):
    from cfun_tpu.models import cfun
    from cfun_tpu.train.step import TrainState, make_optimizer

    params = jax.eval_shape(lambda k: cfun.init_params(k, cfg),
                            jax.random.PRNGKey(0))
    opt = jax.eval_shape(lambda p: make_optimizer(cfg, p).init(p), params)
    return TrainState(params, opt, _sds((), jnp.int32))


def mem_report(lowered):
    ma = lowered.compile().memory_analysis()
    gib = 2.0**30
    temp = ma.temp_size_in_bytes / gib
    args = ma.argument_size_in_bytes / gib
    out = ma.output_size_in_bytes / gib
    return {
        "temp_gib": round(temp, 3),
        "args_gib": round(args, 3),
        "output_gib": round(out, 3),
        # donation aliases state args onto outputs, so peak live bytes are
        # ~ args + temp (the dominant terms at these shapes)
        "peak_est_gib": round(temp + args, 3),
    }


def measure(stage: str, space: int, compute_dtype: str = "float32"):
    from cfun_tpu.config import heart_config
    from cfun_tpu.ops.anchors import config_anchors
    from cfun_tpu.parallel.mesh import make_mesh, make_parallel_train_step
    from cfun_tpu.train.step import make_train_step

    # float32 on the CPU backend: this XLA build's AllReducePromotion pass
    # check-fails cloning the bf16 all-reduces the sharded grads produce
    # ("Invalid binary instruction opcode copy").  Dtype is held EQUAL
    # across the dense and sharded compiles, so the dense-vs-sharded ratio
    # -- the measurement -- is unaffected; the absolute bf16 single-chip
    # number is the on-chip 15.3 GB in README.
    cfg = heart_config(stage).replace(compute_dtype=compute_dtype)
    anchors = config_anchors(cfg)
    n_anchors = int(np.prod(anchors.shape[:-1])) if anchors.ndim > 2 \
        else anchors.shape[0]
    key = _sds((2,), jnp.uint32)
    rows = {"stage": stage, "image_shape": list(cfg.image_shape),
            "mask_shape": list(cfg.mask_shape),
            "remat_unet": cfg.remat_unet,
            "compute_dtype": compute_dtype}

    # --- single device ---
    _, step = make_train_step(cfg, anchors)
    low = step.lower(state_sds(cfg), batch_sds(cfg, n_anchors), key)
    rows["single_device"] = mem_report(low)
    print("single_device", json.dumps(rows["single_device"]), flush=True)

    # --- mesh (data=1, space=N): GSPMD vs explicit halo shard_map ---
    mesh = make_mesh(space, space=space)
    for name, flag in (("mesh_gspmd", False), ("mesh_halo", True)):
        mcfg = cfg.replace(shard_unet_spatial=flag)
        _, mstep = make_parallel_train_step(mcfg, anchors, mesh)
        low = mstep.lower(state_sds(mcfg),
                          batch_sds(mcfg, n_anchors, batch_axis=1), key)
        rows[name] = mem_report(low)
        rows[name]["mesh"] = dict(mesh.shape)
        print(name, json.dumps(rows[name]), flush=True)

    s, g = rows["single_device"], rows["mesh_gspmd"]
    rows["gspmd_vs_single_peak_ratio"] = round(
        g["peak_est_gib"] / s["peak_est_gib"], 3)
    h = rows["mesh_halo"]
    rows["halo_vs_single_peak_ratio"] = round(
        h["peak_est_gib"] / s["peak_est_gib"], 3)
    return rows


def _real_batch(cfg, seed=0):
    """Concrete TrainBatch with a centered organ blob (shape-scaled version
    of tests/test_train_step.py::_make_batch)."""
    from cfun_tpu.ops.anchors import config_anchors
    from cfun_tpu.train.step import TrainBatch
    from cfun_tpu.train.targets import build_rpn_targets

    rng = np.random.default_rng(seed)
    d, h, w = cfg.image_shape
    labels = np.zeros((d, h, w), np.int32)
    labels[d // 4:3 * d // 4, h // 4:3 * h // 4, w // 4:3 * w // 4] = 1
    labels[3 * d // 8:5 * d // 8, 3 * h // 8:5 * h // 8,
           3 * w // 8:5 * w // 8] = 2
    image = rng.normal(size=(1, d, h, w, 1)).astype(np.float32)
    image += 2.0 * (labels > 0)[None, ..., None]
    gt_box = np.array([d // 4, h // 4, w // 4,
                       3 * d // 4, 3 * h // 4, 3 * w // 4], np.float32)
    match, deltas = build_rpn_targets(config_anchors(cfg), gt_box, cfg,
                                      np.random.default_rng(seed))
    norm = np.array([d, h, w, d, h, w], np.float32)
    return TrainBatch(image=image, rpn_match=match, rpn_deltas=deltas,
                      gt_box_norm=(gt_box / norm).astype(np.float32),
                      labels=labels)


def execute_phase(stage: str, space: int, mode: str, image_hw: int):
    """EXECUTE one real finetune-shape train step (not just AOT-compile it
    -- VERDICT r4 weak #7): full D=192 mask depth, H/W of the image trimmed
    to ``image_hw`` for CPU wall time (the mask U-Net -- the sharded
    subsystem -- still runs at the REAL finetune mask shape from the stage
    rule).  Prints one JSON line: loss, wall, peak RSS.  Run per-phase in a
    fresh process so ru_maxrss is a per-phase high-water mark.

    NOTE on memory semantics: the AOT rows above are PER-DEVICE numbers
    (what a second chip buys); an executed CPU-mesh step shares one
    process's RSS across all virtual devices, so RSS here validates
    execution + totals, while the per-device claim stays with the AOT
    analysis."""
    import resource
    import time

    from cfun_tpu.config import heart_config
    from cfun_tpu.ops.anchors import config_anchors
    from cfun_tpu.parallel.mesh import make_mesh, make_parallel_train_step
    from cfun_tpu.models import cfun
    from cfun_tpu.train.step import make_train_step

    cfg = heart_config(stage).replace(
        compute_dtype="float32",
        image_shape=(heart_config(stage).image_shape[0], image_hw, image_hw))
    anchors = config_anchors(cfg)
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    batch = _real_batch(cfg)
    key = jax.random.PRNGKey(3)

    if mode == "dense":
        init_state, step = make_train_step(cfg, anchors)
        state = init_state(params)
        dev_batch = jax.tree.map(jnp.asarray, batch)
    else:  # halo | gspmd
        from cfun_tpu.parallel import batch_sharding
        mcfg = cfg.replace(shard_unet_spatial=(mode == "halo"))
        mesh = make_mesh(space, space=space)
        init_state, step = make_parallel_train_step(mcfg, anchors, mesh)
        state = init_state(params)
        dev_batch = jax.device_put(
            jax.tree.map(lambda x: np.asarray(x)[None], batch),
            batch_sharding(mesh))

    t0 = time.time()
    state, metrics = step(state, dev_batch, key)
    loss = float(metrics["total_loss"])  # blocks
    wall = time.time() - t0
    rss_gib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    print("EXEC_RESULT " + json.dumps({
        "mode": mode, "loss": round(loss, 5),
        "mask_shape": list(cfg.mask_shape),
        "image_shape": list(cfg.image_shape),
        "wall_s": round(wall, 1), "peak_rss_gib": round(rss_gib, 2)}),
        flush=True)


def run_executed(stage: str, space: int, image_hw: int):
    """Dense + halo executed steps in fresh subprocesses; returns the
    parsed rows keyed by mode."""
    import subprocess

    rows = {}
    for mode in ("dense", "halo"):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                            f"{space if mode != 'dense' else 1}")
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        cmd = [sys.executable, os.path.abspath(__file__),
               "--stage", stage, "--space", str(space),
               "--execute-phase", mode, "--image-hw", str(image_hw)]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=3600, env=env)
        for line in out.stdout.splitlines():
            if line.startswith("EXEC_RESULT "):
                rows[mode] = json.loads(line[len("EXEC_RESULT "):])
                break
        else:
            rows[mode] = {"error": (out.stderr or out.stdout)[-400:]}
    if "loss" in rows.get("dense", {}) and "loss" in rows.get("halo", {}):
        d, h = rows["dense"]["loss"], rows["halo"]["loss"]
        rows["loss_rel_diff"] = round(abs(d - h) / max(abs(d), 1e-9), 6)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="finetune")
    ap.add_argument("--space", default=2, type=int)
    ap.add_argument("--execute", action="store_true",
                    help="also EXECUTE one dense + one halo step "
                         "(subprocesses) and record loss/RSS")
    ap.add_argument("--execute-phase", default=None,
                    choices=("dense", "halo", "gspmd"))
    ap.add_argument("--image-hw", default=128, type=int)
    args = ap.parse_args()

    if args.execute_phase:
        execute_phase(args.stage, args.space, args.execute_phase,
                      args.image_hw)
        return

    res = measure(args.stage, args.space)
    res["device"] = str(jax.devices()[0])
    if args.execute:
        res["executed"] = run_executed(args.stage, args.space, args.image_hw)
        res["executed"]["note"] = (
            "executed on the CPU mesh: loss parity + per-phase RSS; the "
            "per-device HBM claim is the AOT rows (one process hosts all "
            "virtual devices, so RSS cannot split per device)")
    print(json.dumps(res, indent=1))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "sharded_hbm.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
