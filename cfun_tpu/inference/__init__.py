"""Inference runtime: jit'd detector with host mold/unmold."""

from cfun_tpu.inference.pipeline import Detector  # noqa: F401
