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


def test_detector_pins_host_params_on_device():
    """Detector must device_put host-numpy params once at construction --
    host leaves would otherwise re-ship the whole tree on every detect()
    (observed as a 10x latency regression with loaded checkpoints)."""
    cfg = tiny_config(stage="beginning")
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    host_params = jax.tree.map(lambda x: np.asarray(x), params)
    det = Detector(cfg, host_params)
    for leaf in jax.tree_util.tree_leaves(det.params):
        assert isinstance(leaf, jax.Array)


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


def test_pack_unpack_roundtrip():
    """pack_fast_output <-> unpack_fast_output carry detections, validity
    and 4-bit labels bit-exactly."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    det = rng.normal(size=(3, 8)).astype(np.float32)
    valid = np.array([True, False, True])
    labels = rng.integers(0, 8, size=(3, 4, 6, 8)).astype(np.int8)

    from cfun_tpu.models.cfun import (InferOut, pack_fast_output,
                                      unpack_fast_output)
    out = InferOut(jnp.asarray(det), jnp.asarray(valid), None,
                   jnp.asarray(labels))
    buf = np.asarray(pack_fast_output(out))
    det2, valid2, labels2 = unpack_fast_output(buf, 3, (3, 4, 6, 8))
    np.testing.assert_array_equal(det, det2)
    np.testing.assert_array_equal(valid, valid2)
    np.testing.assert_array_equal(labels, labels2)


def test_detector_pipelined_path_close_to_exact():
    """The slab-pipelined mold (native slab quantize + device re-z-score)
    agrees with the exact path; skipped when the native lib is missing."""
    from cfun_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native host-ops unavailable")

    base = tiny_config(stage="beginning").replace(detection_max_instances=1)
    pipe = base.replace(wire_image_dtype="int8", fast_unmold=True,
                        device_normalize=True, wire_slabs=3)
    params = cfun.init_params(jax.random.PRNGKey(0), base)

    rng = np.random.default_rng(1)
    image = rng.normal(size=(64, 64, 32)).astype(np.float32)
    image[16:48, 16:48, 8:24] += 3.0

    det_pipe = Detector(pipe, params)
    assert det_pipe._pipelined, "pipelined preconditions not met"
    det_pipe.warmup()
    r_exact = Detector(base, params).detect(image)
    r_pipe = det_pipe.detect(image)
    assert r_pipe["mask"].shape == r_exact["mask"].shape
    agree = (r_pipe["mask"] == r_exact["mask"]).mean()
    assert agree > 0.95, f"pipelined/exact agreement only {agree:.3f}"


def test_detector_lits_overlap_fast_path_close_to_exact():
    """The device-side overlap-tile unmold (molded-space paste + argmax +
    packed int8 fetch) agrees with the exact host probability-stack path
    (LiTS_2017/utils.py:383-408 semantics)."""
    base = tiny_config(stage="beginning").replace(
        name="lits", detection_max_instances=3,
        intensity_norm="hu_window", pad_shape=(40, 70, 70))
    fast = base.replace(wire_image_dtype="int8", wire_int8_scale=127.0,
                        fast_unmold=True)
    params = cfun.init_params(jax.random.PRNGKey(0), base)

    rng = np.random.default_rng(4)
    image = rng.normal(0, 200, size=(60, 66, 36)).astype(np.float32)
    image[20:50, 20:50, 10:30] -= 450.0  # bright after the inverted window

    r_exact = Detector(base, params).detect(image)
    r_fast = Detector(fast, params).detect(image)
    assert r_fast["mask"].shape == r_exact["mask"].shape
    agree = (r_fast["mask"] == r_exact["mask"]).mean()
    assert agree > 0.95, f"lits fast/exact agreement only {agree:.3f}"


def test_detect_stream_matches_serial():
    """The three-stage pipelined detect_stream must return exactly the serial
    detect() results, in order, for a mixed-shape volume batch."""
    cfg = tiny_config(stage="beginning").replace(
        detection_max_instances=2, wire_image_dtype="int8",
        fast_unmold=True, device_normalize=True, wire_slabs=2)
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    det = Detector(cfg, params)

    rng = np.random.default_rng(7)
    vols = []
    for i, shape in enumerate([(60, 70, 30), (80, 96, 40), (64, 64, 32)]):
        v = rng.normal(size=shape).astype(np.float32)
        v[10:40, 10:40, 5:25] += 2.0 + i
        vols.append(v)

    serial = [det.detect(v) for v in vols]
    streamed = list(det.detect_stream(vols))
    assert len(streamed) == len(serial)
    for s, r in zip(streamed, serial):
        np.testing.assert_array_equal(s["mask"], r["mask"])
        np.testing.assert_array_equal(s["rois"], r["rois"])
        np.testing.assert_allclose(s["scores"], r["scores"], rtol=1e-6)


def test_pack_unpack_roundtrip_2bit():
    """2-bit packing (num_classes <= 4, the LiTS case) round-trips
    bit-exactly at 4 labels/byte."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    det = rng.normal(size=(2, 8)).astype(np.float32)
    valid = np.array([True, True])
    labels = rng.integers(0, 3, size=(8, 6, 4)).astype(np.int8)

    from cfun_tpu.models.cfun import (InferOut, pack_fast_output,
                                      unpack_fast_output)
    out = InferOut(jnp.asarray(det), jnp.asarray(valid), None,
                   jnp.asarray(labels))
    buf = np.asarray(pack_fast_output(out, bits=2))
    assert buf.size == 2 * 32 + 2 + labels.size // 4
    det2, valid2, labels2 = unpack_fast_output(buf, 2, (8, 6, 4), bits=2)
    np.testing.assert_array_equal(det, det2)
    np.testing.assert_array_equal(valid, valid2)
    np.testing.assert_array_equal(labels, labels2)


def test_heart_multi_instance_overlap_paste():
    """detection_max_instances > 1 on the heart config takes the device
    overlap-paste fast path (round-2 gap: it was LiTS-only).  Oracle: a
    NumPy trilinear paste + hit-count average over 3 synthetic organs."""
    import jax.numpy as jnp

    from cfun_tpu.models.cfun import overlap_paste_labels, uses_overlap_paste

    cfg = tiny_config(stage="beginning").replace(
        detection_max_instances=3, fast_unmold=True,
        wire_image_dtype="int8")
    assert uses_overlap_paste(cfg)

    rng = np.random.default_rng(3)
    n, (md, mh, mw), c = 3, cfg.mask_pool_size, cfg.num_classes
    probs = rng.uniform(size=(n, md, mh, mw, c)).astype(np.float32)
    d, h, w = cfg.image_shape
    dets = np.zeros((n, 8), np.float32)
    dets[0, :6] = [2, 4, 4, 18, 36, 36]
    dets[1, :6] = [8, 20, 20, 24, 52, 52]   # overlaps det 0
    dets[2, :6] = [0, 0, 0, 8, 16, 16]
    valid = np.array([True, True, False])   # det 2 must not contribute

    labels = np.asarray(overlap_paste_labels(
        jnp.asarray(probs), jnp.asarray(dets), jnp.asarray(valid), cfg))
    assert labels.shape == (d, h, w)

    # NumPy oracle (reference overlap semantics, LiTS_2017/utils.py:383-408)
    acc = np.zeros((d, h, w, c), np.float32)
    cnt = np.zeros((d, h, w), np.float32)
    for i in range(n):
        if not valid[i]:
            continue
        z1, y1, x1, z2, y2, x2 = dets[i, :6].astype(int)
        resized = np.asarray(jax.image.scale_and_translate(
            jnp.asarray(probs[i]), (d, h, w, c), (0, 1, 2),
            jnp.asarray([(z2 - z1) / md, (y2 - y1) / mh, (x2 - x1) / mw],
                        jnp.float32),
            jnp.asarray([z1, y1, x1], jnp.float32),
            method="trilinear", antialias=False))
        box = np.zeros((d, h, w), bool)
        box[z1:z2, y1:y2, x1:x2] = True
        acc[box] += resized[box]
        cnt[box] += 1
    expect = np.argmax(acc / (cnt[..., None] + 1e-6), axis=-1)
    agree = (labels == expect).mean()
    assert agree > 0.999, f"overlap paste agreement {agree:.4f}"


def test_heart_multi_instance_detector_end_to_end():
    """Full Detector with 3 allowed instances on the heart config: packed
    wire carries the molded label volume (N>1 hardening of
    pack_fast_output), output geometry is intact."""
    cfg = tiny_config(stage="beginning").replace(
        detection_max_instances=3, fast_unmold=True,
        wire_image_dtype="int8")
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    det = Detector(cfg, params)
    assert det._labels_shape == tuple(cfg.image_shape)

    rng = np.random.default_rng(4)
    image = rng.normal(size=(64, 64, 32)).astype(np.float32)
    image[8:28, 8:28, 4:14] += 3.0
    image[36:56, 36:56, 18:28] += 3.0
    result = det.detect(image)
    assert result["mask"].shape == (64, 64, 32)
    assert set(np.unique(result["mask"])) <= set(range(cfg.num_classes))
    assert result["rois"].shape[0] <= 3
