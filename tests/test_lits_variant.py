"""LiTS-variant behaviors: pad-then-resize molding, HU window, stage
gating, overlap-tile unmold, P3D35 backbone."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfun_tpu.config import lits_config, tiny_config
from cfun_tpu.data.feeder import mold_volume
from cfun_tpu.data.resample import unmold_overlap_labels
from cfun_tpu.models import cfun
from cfun_tpu.ops.anchors import config_anchors
from cfun_tpu.train.step import stage_flags, train_forward
from tests.test_train_step import _make_batch


def _tiny_lits(stage="beginning"):
    return tiny_config(stage).replace(
        name="lits",
        num_classes=3,
        backbone="P3D35",
        intensity_norm="hu_window",
        pad_shape=(64, 128, 128),
        mask_class_weights=(1.0, 1.0, 100.0),
        unet_dropout_rate=0.0,
        # anisotropic like real LiTS; D must survive 4 stride-2 halvings
        mask_shape_override=(16, 16, 16),
        mask_pool_size=(16, 16, 16),
    )


def test_lits_config_stage_fields():
    cfg = lits_config("beginning")
    assert cfg.train_rois_per_image == 50
    assert cfg.mask_shape == (32, 80, 80)
    cfg = lits_config("finetune")
    assert cfg.train_rois_per_image == 4
    assert cfg.roi_positive_ratio == 1.0
    assert cfg.mask_shape == (64, 160, 160)
    assert stage_flags(lits_config("beginning")) == (True, False, False)
    assert stage_flags(lits_config("together")) == (False, True, True)
    assert stage_flags(lits_config("finetune")) == (False, True, True)


def test_lits_pad_molding_window():
    cfg = _tiny_lits()
    # a 100x100x40 volume into pad (D=64, H=128, W=128) then resize to
    # (32, 64, 64): window reflects the pad offsets
    image = np.full((100, 100, 40), 100.0, np.float32)
    molded, window, _ = mold_volume(image[..., None], cfg)
    assert molded.shape == cfg.image_shape
    d, h, w = cfg.image_shape
    pd, ph, pw = cfg.pad_shape
    # offsets: H pad (128-100)//2=14, W 14, D (64-40)//2=12
    np.testing.assert_allclose(
        window,
        [12 * d / pd, 14 * h / ph, 14 * w / pw,
         52 * d / pd, 114 * h / ph, 114 * w / pw], rtol=1e-5)
    # HU window applied: raw 100 -> (100-300)/(-600) = 1/3
    core = molded[d // 2, h // 2, w // 2]
    assert abs(core - 1.0 / 3.0) < 1e-4
    # padding region is zero
    assert molded[0, 0, 0] == 0.0


def test_lits_train_forward_stage_gating():
    anchors_key = jax.random.PRNGKey(0)
    for stage, (det_on, mask_on) in [("beginning", (True, False)),
                                     ("together", (False, True))]:
        cfg = _tiny_lits(stage)
        params = cfun.init_params(anchors_key, cfg)
        batch = _make_batch(cfg)
        anchors = jnp.asarray(config_anchors(cfg))
        total, parts = jax.jit(
            train_forward, static_argnames=("cfg",))(
                params, batch, anchors, cfg, jax.random.PRNGKey(1))
        assert np.isfinite(float(total))
        if det_on:
            assert float(parts["rpn_class_loss"]) > 0
            assert float(parts["mrcnn_mask_loss"]) == 0
        else:
            # with an untrained RPN no proposal clears the 0.5 IoU bar, so
            # the masked mask losses may be exactly 0 -- the gated-off
            # detection losses must be 0 regardless
            assert float(parts["rpn_class_loss"]) == 0
            assert float(parts["mrcnn_bbox_loss"]) == 0
            assert float(parts["mrcnn_mask_loss"]) >= 0
            assert float(parts["mrcnn_mask_edge_loss"]) >= 0


def test_p3d35_depths():
    cfg = _tiny_lits()
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    assert len(params["backbone"]["c2"]) == 4
    assert len(params["backbone"]["c3"]) == 5


def test_overlap_tile_unmold_averages():
    # two overlapping boxes voting for different classes: overlap averages
    probs = np.zeros((2, 4, 4, 4, 3), np.float32)
    probs[0, ..., 1] = 0.8   # class 1 with prob .8
    probs[0, ..., 2] = 0.2
    probs[1, ..., 2] = 0.6   # class 2 with prob .6
    probs[1, ..., 1] = 0.4
    boxes = np.array([[0, 0, 0, 8, 8, 8], [4, 4, 4, 12, 12, 12]])
    out = unmold_overlap_labels(probs, boxes, (16, 16, 16))
    assert out[2, 2, 2] == 1          # only box 0
    assert out[10, 10, 10] == 2       # only box 1
    # overlap: class1 avg (.8+.4)/2=.6 > class2 (.2+.6)/2=.4
    assert out[6, 6, 6] == 1
    assert out[14, 14, 14] == 0       # outside both


def test_lits_detector_end_to_end_overlap_unmold():
    """Full LiTS Detector path: HU-window pad molding, multi-instance
    detections, overlap-tile unmold."""
    from cfun_tpu.inference import Detector

    cfg = _tiny_lits("together").replace(detection_max_instances=2)
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    det = Detector(cfg, params)
    rng = np.random.default_rng(0)
    image = rng.normal(0, 100, size=(100, 100, 40)).astype(np.float32)
    image[30:70, 30:70, 10:30] -= 200.0  # "liver" region in inverted window
    result = det.detect(image)
    assert result["mask"].shape == (100, 100, 40)
    assert result["class_ids"].tolist() == [1, 2]
    assert set(np.unique(result["mask"])) <= {0, 1, 2}


def test_step_timer_summary():
    import time as _time

    from cfun_tpu.utils.profiling import StepTimer

    t = StepTimer()
    for _ in range(3):
        with t.time("phase"):
            _time.sleep(0.01)
    s = t.summary()["phase"]
    assert s["n"] == 3 and s["min"] >= 0.009


def test_mask_loss_class_weights():
    from cfun_tpu.train.losses import mask_loss
    cfg = _tiny_lits("together")
    p, c = 2, 3
    m = (4, 4, 4)
    target = np.zeros((p, *m, c), np.float32)  # channels last
    target[..., 2] = 1.0  # everything is class 2 (tumor, weight 100)
    logits = np.zeros((p, *m, c), np.float32)
    pos = jnp.asarray([True, False])
    w_loss = float(mask_loss(jnp.asarray(target), pos, jnp.asarray(logits), cfg))
    uw_loss = float(mask_loss(jnp.asarray(target), pos, jnp.asarray(logits),
                              cfg.replace(mask_class_weights=None)))
    # uniform logits -> CE = log(3) either way (weights cancel in the mean)
    np.testing.assert_allclose(w_loss, np.log(3), rtol=1e-5)
    np.testing.assert_allclose(uw_loss, np.log(3), rtol=1e-5)
    # but a mixed-class target weights tumor voxels 100x
    target[..., 2] = 0.0
    target[..., 1] = 1.0
    target[0, 0, 0, 0, 2] = 1.0
    target[0, 0, 0, 0, 1] = 0.0
    logits2 = np.zeros((p, *m, c), np.float32)
    logits2[..., 1] = 3.0  # confidently predict class 1 everywhere
    lw = float(mask_loss(jnp.asarray(target), pos, jnp.asarray(logits2), cfg))
    lu = float(mask_loss(jnp.asarray(target), pos, jnp.asarray(logits2),
                         cfg.replace(mask_class_weights=None)))
    assert lw > lu  # the missed tumor voxel dominates under weighting


def test_fused_lits_mold_matches_literal_pad_path():
    """The virtual-pad molds (native lits_mold / numpy pad_resize_nearest)
    must be bit-identical to the literal normalize->zero-pad->nearest-resize
    reference path (LiTS_2017/model.py:1154-1233) without ever allocating
    the pad buffer."""
    import numpy as np

    from cfun_tpu.config import lits_config
    from cfun_tpu.data.feeder import mold_volume, normalize_intensity
    from cfun_tpu.data.resample import pad_resize_nearest, resize

    cfg = lits_config("beginning").replace(image_shape=(64, 80, 80),
                                           pad_shape=(134, 162, 162))
    rng = np.random.default_rng(0)
    img = rng.normal(0, 200, size=(120, 130, 90)).astype(np.float32)
    mask = (rng.random((120, 130, 90)) > 0.8).astype(np.int32) * 2

    # literal reference path
    normed = normalize_intensity(img, cfg)
    pd, ph, pw = cfg.pad_shape
    h0, w0, d0 = img.shape
    oh, ow, od = (ph - h0) // 2, (pw - w0) // 2, (pd - d0) // 2
    padded = np.zeros((ph, pw, pd), np.float32)
    padded[oh:oh + h0, ow:ow + w0, od:od + d0] = normed
    d_t, h_t, w_t = cfg.image_shape
    ref_molded = resize(padded, (h_t, w_t, d_t), order=0).transpose(2, 0, 1)
    pm = np.zeros((ph, pw, pd), np.int32)
    pm[oh:oh + h0, ow:ow + w0, od:od + d0] = mask
    ref_mask = resize(pm, (h_t, w_t, d_t), order=0).transpose(2, 0, 1)

    molded, _window, out_mask = mold_volume(img[..., None], cfg, mask)
    assert np.abs(molded - ref_molded).max() < 1e-6
    np.testing.assert_array_equal(out_mask, ref_mask)

    fb = pad_resize_nearest(normed, (ph, pw, pd), (h_t, w_t, d_t),
                            (oh, ow, od)).transpose(2, 0, 1)
    np.testing.assert_array_equal(fb, ref_molded)
