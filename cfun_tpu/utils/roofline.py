"""Roofline / MFU accounting for the device programs.

The reference publishes no utilization numbers (its baseline is wall-clock
on a 2019 12 GB GPU, reference README.md:45); "actually fast" on TPU means
knowing the distance to the chip's roof.  FLOPs and HBM bytes come from
XLA's own compiled cost analysis (``Compiled.cost_analysis()``), peaks
from the chip generation table; MFU = flops / seconds / peak_flops and
bandwidth utilization = bytes / seconds / peak_bw.

Used by bench.py (JSON extras: trunk_mfu, unet_mfu, ...) and
benchmarks/mfu.py (full per-segment table).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

# peak dense-matmul FLOP/s (compute dtype bf16) and HBM bandwidth, B/s.
# v5e: 197 bf16 TFLOP/s, 819 GB/s, 16 GB HBM.  v5p: 459 TFLOP/s,
# 2765 GB/s.  v4: 275 TFLOP/s, 1228 GB/s.
PEAKS: Dict[str, Dict[str, float]] = {
    "v5e": {"flops_bf16": 197e12, "hbm_bw": 8.19e11},
    "v5p": {"flops_bf16": 459e12, "hbm_bw": 2.765e12},
    "v4": {"flops_bf16": 275e12, "hbm_bw": 1.228e12},
    "cpu": {"flops_bf16": float("nan"), "hbm_bw": float("nan")},
}


def chip_generation() -> str:
    """Best-effort chip id: the axon env pin, else the device kind."""
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    if gen in PEAKS:
        return gen
    kind = ""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        pass
    for g in PEAKS:
        if g in kind:
            return g
    return "v5e" if "tpu" in kind else "cpu"


def compile_with_cost(fn: Callable, *args):
    """(compiled_executable, {'flops', 'bytes_accessed'}) with ONE
    compile -- reuse the executable for timing instead of jitting the fn
    a second time (first compiles cost minutes on the remote server)."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    ca = ca or {}
    return compiled, {
        "flops": float(ca.get("flops", float("nan"))),
        "bytes_accessed": float(ca.get("bytes accessed", float("nan"))),
    }


def cost_of(fn: Callable, *args) -> Dict[str, float]:
    """{'flops', 'bytes_accessed'} of the jitted fn from XLA's cost
    analysis; splats straight into ``segment_report``."""
    return compile_with_cost(fn, *args)[1]


def chain_executable(fn: Callable, *args, length: int = 8,
                     perturb: int = 0):
    """Compile a jit'd chain of ``length`` dependent calls of ``fn``.

    ``fn(*args)`` must return a scalar.  Each iteration perturbs the
    ``perturb``-th argument by ``1e-30 * previous_scalar`` -- numerically
    negligible but structurally data-dependent, so XLA cannot CSE or elide
    the repeats (the same trick benchmarks/nms_timing.py uses).  The body
    compiles ONCE (lax.scan), so compile cost matches a single call.
    """
    def chained(*a):
        def body(carry, _):
            aa = list(a)
            x = aa[perturb]
            aa[perturb] = x + (carry * 1e-30).astype(x.dtype)
            return fn(*aa).astype(jnp.float32), None
        out, _ = lax.scan(body, jnp.float32(0.0), None, length=length)
        return out

    return jax.jit(chained).lower(*args).compile()


def time_amortized(fn: Callable, args: Sequence, *, perturb: int = 0,
                   reps: int = 5, chain: int = 8,
                   compiled_single=None) -> Dict[str, float]:
    """Per-call wall AND amortized kernel time of ``jit(fn)(*args)``.

    Wall per single call includes the backend's per-call dispatch (through
    the tunneled axon backend a ~25 ms RPC floor, CLAUDE.md); the chained
    executable pays dispatch once and the kernel ``chain`` times, so

        kernel_s   = (chain_s - single_s) / (chain - 1)
        dispatch_s = max(single_s - kernel_s, 0)

    Timing is scalar readback (``float(...)``) -- block_until_ready is
    unreliable through the tunnel.  Returns
    {'single_s', 'chain_s', 'kernel_s', 'dispatch_s', 'chain'}.
    """
    single = (compiled_single if compiled_single is not None
              else jax.jit(fn).lower(*args).compile())
    chained = chain_executable(fn, *args, length=chain, perturb=perturb)
    float(single(*args))  # warm
    float(chained(*args))
    t1, tn = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(single(*args))
        t1.append(time.perf_counter() - t0)
    for _ in range(max(2, reps - 1)):
        t0 = time.perf_counter()
        float(chained(*args))
        tn.append(time.perf_counter() - t0)
    single_s = _median(t1)
    chain_s = _median(tn)
    kernel_s = max(chain_s - single_s, 0.0) / max(chain - 1, 1)
    # a kernel can't be slower than its own single call (dispatch >= 0);
    # tunnel jitter on chain_s can otherwise push the estimate past it
    kernel_s = min(kernel_s, single_s)
    return {
        "single_s": single_s,
        "chain_s": chain_s,
        "kernel_s": kernel_s,
        "dispatch_s": max(single_s - kernel_s, 0.0),
        "chain": chain,
    }


def _median(xs) -> float:
    """True median (mean of the middle pair for even counts) -- the
    sorted[n//2] shortcut is the UPPER-middle element, which through
    tunnel jitter biases small even samples upward (with 2 samples it is
    the maximum)."""
    s = sorted(xs)
    n = len(s)
    mid = n // 2
    return s[mid] if n % 2 else 0.5 * (s[mid - 1] + s[mid])


def measure_dispatch_floor(reps: int = 7) -> float:
    """Median wall seconds of a near-empty device program (scalar add +
    readback) -- the backend's per-call dispatch floor.  Through the
    tunneled axon backend this is ~25 ms; on direct-attach it is <1 ms."""
    one = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(one(x))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(one(x))
        ts.append(time.perf_counter() - t0)
    return _median(ts)


def segment_report(seconds: float, flops: float,
                   bytes_accessed: float = float("nan"),
                   gen: Optional[str] = None) -> Dict[str, float]:
    """Roofline numbers for one timed segment."""
    peaks = PEAKS[gen or chip_generation()]
    if seconds <= 0:
        # a chained measurement can resolve to 0 kernel time when the
        # segment is pure dispatch (chain_s <= single_s under jitter);
        # keep the same NaN guards and key schema as the normal path
        # (bare NaN tokens would break the driver-contract JSON line)
        out = {"seconds": 0.0,
               "gflop": round(flops / 1e9, 2) if flops == flops else None,
               "tflops_per_s": None, "mfu": None}
        if bytes_accessed == bytes_accessed:
            out["gbytes"] = round(bytes_accessed / 1e9, 3)
            out["hbm_bw_util"] = None
        return out
    tflops = flops / seconds / 1e12
    out = {
        "seconds": round(seconds, 5),
        "gflop": round(flops / 1e9, 2) if flops == flops else None,
        "tflops_per_s": round(tflops, 2) if tflops == tflops else None,
    }
    # guard NaN peaks (gen='cpu'): bare NaN tokens would make the
    # driver-contract bench JSON line unparseable by strict consumers
    mfu = flops / seconds / peaks["flops_bf16"]
    out["mfu"] = round(mfu, 4) if mfu == mfu else None
    if bytes_accessed == bytes_accessed:  # not NaN
        out["gbytes"] = round(bytes_accessed / 1e9, 3)
        bw = bytes_accessed / seconds / peaks["hbm_bw"]
        out["hbm_bw_util"] = round(bw, 4) if bw == bw else None
    return out


def packed_infer_chain(det, vol, *, reps: int = 3, chain: int = 8,
                       molded=None) -> Dict[str, float]:
    """Chain-amortized timing of a Detector's FULL packed infer program.

    The scalar under the chain is ``infer_forward`` + ``pack_fast_output``
    on the molded volume -- the exact device program ``detect()`` runs --
    so ``kernel_s`` is the full-graph kernel-only time.  Shared by
    bench.py's link-conditioned floor and benchmarks/trace_reconcile.py's
    device-trace reconciliation (one definition keeps the two measurements
    of the same graph in sync).

    The chain perturbs the concatenated IMAGE array, not the window:
    perturbing the window lets XLA hoist the whole window-independent
    trunk out of the scan chain (loop-invariant code motion), understating
    the full-graph kernel 2.1x -- caught by the first run of the trace
    reconciliation (trace_vs_chain_ratio 2.13).
    """
    from cfun_tpu.models import cfun

    if molded is not None:
        # (slabs, window) from a caller that already molded the volume --
        # skips a second full-volume resize + ~20 MB re-upload through
        # the tunnel (trace_reconcile molds once for trace AND chain)
        slabs, window = molded
    else:
        slabs, window, _ = det._mold(vol)
    bits = det._pack_bits
    dcfg = det.cfg
    image = jnp.concatenate(slabs, axis=0)[None, :, :, :, None]

    def scalar_fn(p, im, a, w):
        out = cfun.infer_forward(p, im, a, w, cfg=dcfg)
        return cfun.pack_fast_output(out, bits=bits).astype(
            jnp.float32).sum()

    return time_amortized(
        scalar_fn, (det.params, image, det.anchors, jnp.asarray(window)),
        perturb=1, reps=reps, chain=chain)
