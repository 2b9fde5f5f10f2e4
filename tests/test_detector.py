"""End-to-end Detector test: raw synthetic volume in, label volume out."""

import numpy as np
import jax

from cfun_tpu.config import tiny_config
from cfun_tpu.inference import Detector
from cfun_tpu.models import cfun


def test_detector_end_to_end():
    cfg = tiny_config(stage="beginning").replace(detection_max_instances=1)
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    det = Detector(cfg, params)

    rng = np.random.default_rng(0)
    image = rng.normal(size=(80, 96, 40)).astype(np.float32)  # [H, W, D]
    result = det.detect(image)

    assert result["mask"].shape == (80, 96, 40)
    assert result["class_ids"].tolist() == list(
        range(1, cfg.num_classes))
    assert result["rois"].shape[1] == 6
    assert result["scores"].shape[0] == result["rois"].shape[0]
    assert set(np.unique(result["mask"])) <= set(range(cfg.num_classes))
    assert det.last_timings["total"] > 0
    # idempotent second call (jit cache hit)
    result2 = det.detect(image)
    np.testing.assert_array_equal(result["mask"], result2["mask"])


def test_detector_fast_wire_path_close_to_exact():
    """int8 upload + device-argmax label download vs the exact probs path:
    same shapes, near-identical label volumes."""
    base = tiny_config(stage="beginning").replace(detection_max_instances=1)
    fast = base.replace(wire_image_dtype="int8", fast_unmold=True)
    params = cfun.init_params(jax.random.PRNGKey(0), base)

    rng = np.random.default_rng(1)
    image = rng.normal(size=(64, 64, 32)).astype(np.float32)
    image[16:48, 16:48, 8:24] += 3.0

    r_exact = Detector(base, params).detect(image)
    r_fast = Detector(fast, params).detect(image)
    assert r_fast["mask"].shape == r_exact["mask"].shape
    agree = (r_fast["mask"] == r_exact["mask"]).mean()
    assert agree > 0.95, f"fast/exact agreement only {agree:.3f}"
