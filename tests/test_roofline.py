"""Unit tests for the roofline/MFU accounting behind bench.py's JSON extras.

The driver contract depends on bench.py emitting one parseable JSON line;
`segment_report` feeds its extras, so NaN leakage or bad math here would
break the headline artifact (reference publishes no utilization numbers at
all — reference README.md:45 is wall-clock only).
"""

import json
import math

import jax.numpy as jnp
import pytest

from cfun_tpu.utils import roofline


def test_segment_report_math():
    # 1 TFLOP in 0.1 s on a v5e (197 bf16 TF/s, 819 GB/s).  The flops are
    # large enough that the rounded MFU (0.0508) sits far above the
    # tolerance -- a zeroed-flops or wrong-peak regression cannot pass.
    rep = roofline.segment_report(0.1, 1e12, 8.19e10, gen="v5e")
    assert rep["seconds"] == 0.1
    assert rep["gflop"] == 1000.0
    assert rep["tflops_per_s"] == pytest.approx(10.0)
    assert rep["mfu"] == pytest.approx(1e13 / 197e12, abs=1e-4)
    assert rep["mfu"] > 0.05
    # 8.19e10 B / 0.1 s = 819 GB/s = 100% of peak
    assert rep["hbm_bw_util"] == pytest.approx(1.0, abs=1e-4)


def test_segment_report_nan_peaks_json_safe():
    # gen='cpu' has NaN peaks; the report must stay JSON-parseable
    # (None, never a bare NaN token) per the driver contract.
    rep = roofline.segment_report(0.1, 1e9, 1e9, gen="cpu")
    assert rep["mfu"] is None
    assert rep["hbm_bw_util"] is None
    parsed = json.loads(json.dumps(rep))
    assert parsed["gflop"] == 1.0


def test_segment_report_nan_flops():
    rep = roofline.segment_report(0.1, float("nan"), gen="v5e")
    assert rep["gflop"] is None and rep["mfu"] is None
    assert "gbytes" not in rep  # bytes defaulted to NaN -> omitted
    json.dumps(rep)


def test_compile_with_cost_counts_matmul_flops():
    # a [64,64]@[64,64] matmul is 2*64^3 = 524288 FLOPs; XLA's cost
    # analysis should report at least that (fusions may add a little).
    a = jnp.ones((64, 64), jnp.float32)
    compiled, cost = roofline.compile_with_cost(lambda x: x @ x, a)
    assert cost["flops"] >= 2 * 64**3 * 0.99
    assert cost["flops"] < 2 * 64**3 * 10
    assert cost["bytes_accessed"] >= 2 * 64 * 64 * 4  # in + out at least
    # the compiled executable is reusable for timing
    out = compiled(a)
    assert out.shape == (64, 64)


def test_chip_generation_fallback_is_known_key():
    gen = roofline.chip_generation()
    assert gen in roofline.PEAKS
    assert not math.isnan(roofline.PEAKS["v5e"]["flops_bf16"])


def test_time_amortized_separates_dispatch():
    # bench.py / benchmarks/mfu.py derive MFU from kernel_s; the estimate
    # must be non-negative, bounded by the single-call wall, and the
    # parts must sum back to the single-call wall.
    x = jnp.ones((64, 64), jnp.float32)
    tm = roofline.time_amortized(lambda a: jnp.sum(a @ a), (x,),
                                 reps=3, chain=4)
    assert 0.0 <= tm["kernel_s"] <= tm["single_s"] + 1e-12
    assert tm["dispatch_s"] >= 0.0
    assert tm["kernel_s"] + tm["dispatch_s"] == pytest.approx(
        tm["single_s"])
    assert tm["chain"] == 4


def test_chain_executable_preserves_value():
    # the data-dependence perturbation is 1e-30-scale: the chained
    # program's final scalar must equal the single call's
    x = jnp.full((8, 8), 2.0, jnp.float32)
    chained = roofline.chain_executable(lambda a: jnp.sum(a), x, length=5)
    assert float(chained(x)) == pytest.approx(128.0)


def test_measure_dispatch_floor_nonnegative():
    assert roofline.measure_dispatch_floor(reps=3) >= 0.0
