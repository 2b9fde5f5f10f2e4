"""Reconcile the scan-chain roofline against a REAL device trace.

The dispatch-separated roofline (utils/roofline.py::time_amortized) infers
kernel-only time from a dependent lax.scan chain; VERDICT r4 weak #6 asks
for an independent confirmation from an actual ``jax.profiler`` device
trace.  This script:

1. captures a trace of N reps of the heart infer graph (the packed
   program bench.py times) and one train step;
2. parses the XSpace proto IN-PROCESS via jax.profiler.ProfileData (no
   TensorBoard round-trip) and sums per-rep device-plane kernel busy time
   (wall between first event start and last event end on the device
   plane, and the busy sum -- both reported);
3. prints the side-by-side vs the chain-amortized kernel estimate and
   writes benchmarks/trace_reconcile.json.

If the tunneled axon backend cannot produce a device plane, the artifact
records that as a measured negative (host-only planes listed).

Axon env (CLAUDE.md), ONE TPU process:
    python benchmarks/trace_reconcile.py
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def newest_xspace(log_dir):
    files = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    return max(files, key=os.path.getmtime) if files else None


def device_plane_summary(xspace_path):
    """Per-plane event stats from a serialized XSpace.

    Returns {plane_name: {"events": n, "busy_ms": sum of event durations,
    "span_ms": last_end - first_start}} -- device planes (TPU) carry the
    kernel timeline; host planes carry runtime threads."""
    import jax

    data = jax.profiler.ProfileData.from_file(xspace_path)
    planes = {}
    for plane in data.planes:
        lines = {}
        for line in plane.lines:
            first, last, busy, n = None, None, 0.0, 0
            for ev in line.events:
                n += 1
                st = ev.start_ns
                en = ev.end_ns
                busy += (en - st)
                first = st if first is None else min(first, st)
                last = en if last is None else max(last, en)
            if n:
                # per-LINE stats: a device plane carries several
                # timelines (modules, ops, annotations) whose events NEST
                # -- summing across lines double-counts wall time, so the
                # kernel number must come from one line, not the plane
                lines[line.name] = {
                    "events": n,
                    "busy_ms": round(busy / 1e6, 3),
                    "span_ms": round((last - first) / 1e6, 3),
                }
        if lines:
            planes[plane.name] = lines
    return planes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", default=4, type=int)
    ap.add_argument("--report", default="benchmarks/trace_reconcile.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cfun_tpu.config import heart_inference_config
    from cfun_tpu.inference import Detector
    from cfun_tpu.models import cfun
    from cfun_tpu.utils.roofline import packed_infer_chain

    cfg = heart_inference_config("beginning")
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    det = Detector(cfg, params)

    rng = np.random.default_rng(0)
    vol = rng.normal(0.0, 50.0, size=(512, 512, 300)).astype(np.float32)
    vol[200:320, 200:330, 90:210] += 400.0

    det.detect(vol)  # compile + warm
    det.detect(vol)

    report = {"reps": args.reps, "device": str(jax.devices()[0])}

    # --- chain-amortized estimate (the number under test): the SAME
    # helper bench.py's link-conditioned floor uses, so this trace
    # validates exactly the graph the floor is built from (the helper
    # perturbs the image, not the window -- the first run of this
    # reconciliation caught the window-perturbed chain understating the
    # kernel 2.1x via loop-invariant code motion)
    slabs, window, _ = det._mold(vol)
    tm = packed_infer_chain(det, vol, molded=(slabs, window))
    report["chain_amortized"] = {
        "infer_kernel_ms": round(tm["kernel_s"] * 1e3, 2),
        "single_call_ms": round(tm["single_s"] * 1e3, 2),
        "dispatch_ms": round(tm["dispatch_s"] * 1e3, 2),
    }

    # --- real device trace of N dispatches of the same program ---
    trace_dir = tempfile.mkdtemp(prefix="cfun_trace_")
    win_dev = jnp.asarray(window)
    out = det._infer_packed(det.params, tuple(slabs), det.anchors, win_dev)
    np.asarray(out)  # warm
    try:
        t0 = time.perf_counter()
        with jax.profiler.trace(trace_dir):
            for _ in range(args.reps):
                out = det._infer_packed(det.params, tuple(slabs),
                                        det.anchors, win_dev)
                np.asarray(out)
        report["traced_wall_ms_per_rep"] = round(
            (time.perf_counter() - t0) / args.reps * 1e3, 1)
        xs = newest_xspace(trace_dir)
        if xs is None:
            report["trace_negative"] = ("trace produced no .xplane.pb -- "
                                        "backend emitted nothing")
        else:
            planes = device_plane_summary(xs)
            report["planes"] = planes
            dev_planes = {k: v for k, v in planes.items()
                          if "TPU" in k.upper() or "device" in k.lower()}
            if dev_planes:
                name, lines = max(
                    dev_planes.items(),
                    key=lambda kv: sum(l["busy_ms"]
                                       for l in kv[1].values()))
                report["trace_device_plane"] = name
                # the op-level timeline (XLA Ops) is the kernel-busy
                # ground truth; module/step lines span the same wall and
                # would double-count.  Fall back to the busiest single
                # line if the name scheme differs.
                op_line = next((v for k, v in lines.items()
                                if "op" in k.lower()), None)
                if op_line is None:
                    op_line = max(lines.values(),
                                  key=lambda v: v["busy_ms"])
                per_rep = op_line["busy_ms"] / args.reps
                report["trace_kernel_ms_per_rep"] = round(per_rep, 2)
                est = report["chain_amortized"]["infer_kernel_ms"]
                report["trace_vs_chain_ratio"] = (
                    round(per_rep / est, 3) if est else None)
            else:
                report["trace_negative"] = (
                    "no device plane in the XSpace (host-only capture "
                    "through the tunneled backend); planes listed above")
    except Exception as e:
        report["trace_negative"] = f"trace capture failed: {e!r}"[:300]

    print(json.dumps(report, indent=1))
    with open(args.report, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {args.report}")


if __name__ == "__main__":
    main()
