"""NIfTI IO roundtrip, host resampling, feeder, checkpoint tests."""

import os

import numpy as np
import jax
import pytest

from cfun_tpu.config import tiny_config
from cfun_tpu.data import nifti
from cfun_tpu.data.feeder import (TrainFeeder, mold_volume,
                                  np_mask_to_extended_bbox,
                                  normalize_intensity)
from cfun_tpu.data.resample import resize, rotate_hw, unmold_mask_labels
from cfun_tpu.models import cfun
from cfun_tpu.ops.anchors import config_anchors
from cfun_tpu.utils import checkpoint
from cfun_tpu.utils.metrics import per_class_dice, per_class_mask_iou


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for suffix in (".nii", ".nii.gz"):
        vol = rng.integers(-500, 2000, size=(17, 23, 11)).astype(np.int16)
        affine = np.diag([0.8, 0.8, 1.5, 1.0])
        affine[:3, 3] = [-100, -80, 40]
        path = str(tmp_path / f"vol{suffix}")
        nifti.save(path, vol, affine)
        data, aff = nifti.load(path)
        np.testing.assert_array_equal(data, vol)
        np.testing.assert_allclose(aff, affine, atol=1e-5)


def test_nifti_float_and_int32(tmp_path):
    vol = np.random.default_rng(1).normal(size=(8, 9, 10)).astype(np.float32)
    path = str(tmp_path / "f.nii.gz")
    nifti.save(path, vol)
    data, _ = nifti.load(path)
    np.testing.assert_allclose(data, vol, rtol=1e-6)
    ivol = np.arange(4 * 5 * 6, dtype=np.int32).reshape(4, 5, 6)
    nifti.save(str(tmp_path / "i.nii"), ivol)
    data, _ = nifti.load(str(tmp_path / "i.nii"))
    np.testing.assert_array_equal(data, ivol)


def test_resize_preserves_constant_and_is_fast():
    vol = np.full((64, 64, 32), 3.25, np.float32)
    out = resize(vol, (32, 48, 16), order=1)
    np.testing.assert_allclose(out, 3.25, rtol=1e-6)
    m = np.zeros((20, 20, 20), np.int32)
    m[5:15, 5:15, 5:15] = 2
    out = resize(m, (10, 10, 10), order=0)
    assert set(np.unique(out)) <= {0, 2}


def test_rotate_hw_identity_and_90():
    vol = np.random.default_rng(2).normal(size=(16, 16, 4)).astype(np.float32)
    np.testing.assert_array_equal(rotate_hw(vol, 0.0), vol)
    r90 = rotate_hw(vol, 90.0, order=0)
    assert r90.shape == vol.shape
    # rotating +90 then -90 with nearest recovers the interior
    back = rotate_hw(r90, -90.0, order=0)
    inner = (slice(4, 12), slice(4, 12))
    np.testing.assert_allclose(back[inner], vol[inner], atol=1e-5)


def test_mask_to_extended_bbox():
    labels = np.zeros((32, 64, 64), np.int32)
    labels[10:20, 20:40, 24:44] = 1
    box = np_mask_to_extended_bbox(labels)
    # size (10, 20, 20), 5% -> floor/ceil
    np.testing.assert_allclose(box, [9, 19, 23, 21, 41, 45])
    assert np.all(np_mask_to_extended_bbox(np.zeros((4, 4, 4))) == 0)


def test_normalize_intensity_modes():
    cfg = tiny_config()
    x = np.random.default_rng(3).normal(5, 10, size=(8, 8, 8)).astype(np.float32)
    z = normalize_intensity(x, cfg)
    assert abs(z.mean()) < 1e-4 and abs(z.std() - 1) < 1e-3
    cfg_l = cfg.replace(intensity_norm="hu_window")
    hw = normalize_intensity(np.array([300.0, 0.0, -300.0, 999.0]), cfg_l)
    np.testing.assert_allclose(hw, [0.0, 0.5, 1.0, 0.0])  # inverted window


def test_unmold_mask_labels():
    probs = np.zeros((4, 4, 4, 3), np.float32)
    probs[..., 1] = 1.0  # class 1 everywhere in the crop
    out = unmold_mask_labels(probs, np.array([2, 2, 2, 6, 6, 6]), (8, 8, 8))
    assert out.shape == (8, 8, 8)
    assert np.all(out[2:6, 2:6, 2:6] == 1)
    assert out.sum() == 4 * 4 * 4


def test_metrics_hand_case():
    gt = np.zeros((4, 4, 4), np.int32)
    pr = np.zeros((4, 4, 4), np.int32)
    gt[:2], pr[:2] = 1, 1
    gt[2], pr[2] = 2, 0
    iou = per_class_mask_iou(gt, pr, 3)
    np.testing.assert_allclose(iou, [1.0, 0.0], atol=1e-5)
    dice = per_class_dice(gt, pr, 3)
    np.testing.assert_allclose(dice, [1.0, 0.0], atol=1e-5)


class _SynthDataset:
    """In-memory dataset with one synthetic labeled volume."""

    num_images = 2

    def __init__(self, shape_hwd=(64, 64, 32)):
        rng = np.random.default_rng(0)
        h, w, d = shape_hwd
        self.image = rng.normal(size=(h, w, d)).astype(np.float32)
        self.mask = np.zeros((h, w, d), np.int32)
        self.mask[16:48, 16:48, 8:24] = 1
        self.mask[24:40, 24:40, 12:20] = 2
        self.image += 2.0 * (self.mask > 0)

    def load_image(self, image_id):
        return self.image[..., None]

    def load_mask(self, image_id):
        return self.mask


def test_feeder_produces_valid_batches():
    cfg = tiny_config()
    anchors = config_anchors(cfg)
    ds = _SynthDataset()
    feeder = TrainFeeder(ds, cfg, anchors, seed=0, num_workers=2, prefetch=2)
    batches = list(feeder.epoch(angle=10.0, steps=3))
    feeder.close()
    assert len(batches) == 3
    b = batches[0]
    assert b.image.shape == (1, *cfg.image_shape, 1)
    assert b.rpn_match.shape == (cfg.num_anchors,)
    # labels ship 4-bit W-packed (num_classes <= 16); unpack losslessly
    from cfun_tpu.train.step import unpack_labels_w
    d, h, w = cfg.image_shape
    assert b.labels.shape == (d, h, w // 2)
    labels = np.asarray(unpack_labels_w(jax.numpy.asarray(b.labels)))
    assert labels.shape == cfg.image_shape
    assert labels.max() < cfg.num_classes
    assert (b.rpn_match == 1).sum() >= 1
    assert np.all(b.gt_box_norm >= 0) and np.all(b.gt_box_norm <= 1)
    assert b.gt_box_norm[3] > b.gt_box_norm[0]


def test_feeder_survives_bad_volume():
    cfg = tiny_config()
    anchors = config_anchors(cfg)

    class Flaky(_SynthDataset):
        num_images = 3

        def load_image(self, image_id):
            if image_id == 1:
                raise IOError("corrupt volume")
            return super().load_image(image_id)

    feeder = TrainFeeder(Flaky(), cfg, anchors, seed=0, num_workers=2,
                         prefetch=2)
    batches = list(feeder.epoch(angle=0.0, steps=4))
    feeder.close()
    # the bad volume is skipped with substitutions; the step count holds
    assert len(batches) == 4
    for b in batches:
        assert np.isfinite(np.asarray(b.image, dtype=np.float32)).all()


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, params, epoch=7, step=315)
    zeroed = jax.tree.map(lambda x: np.zeros_like(x), params)
    restored, _, meta = checkpoint.load(path, zeroed)
    assert meta["epoch"] == 7 and meta["step"] == 315
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(restored)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_f16_store_roundtrip(tmp_path):
    """save(store_dtype=f16, compress=True) -- the committed bench-weights
    format -- loads back AS the template dtype (f32) within f16 precision."""
    cfg = tiny_config()
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt16.npz")
    checkpoint.save(path, params, epoch=3, store_dtype="float16",
                    compress=True)
    zeroed = jax.tree.map(lambda x: np.zeros_like(x), params)
    restored, _, meta = checkpoint.load(path, zeroed)
    assert meta["epoch"] == 3
    for x, y in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        assert np.asarray(y).dtype == np.asarray(x).dtype
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-3, rtol=1e-3)


def test_checkpoint_optimizer_state_roundtrip(tmp_path):
    from cfun_tpu.ops.anchors import config_anchors
    from cfun_tpu.train.step import make_train_step

    cfg = tiny_config()
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    init_state, step = make_train_step(cfg, config_anchors(cfg))
    state = init_state(params)
    from tests.test_train_step import _make_batch
    state, _ = step(state, _make_batch(cfg), jax.random.PRNGKey(1))

    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, state.params, epoch=1, step=1,
                    opt_state=state.opt_state)
    fresh = init_state(cfun.init_params(jax.random.PRNGKey(9), cfg))
    params2, opt2, meta = checkpoint.load(path, fresh.params,
                                          fresh.opt_state, strict=True)
    a = jax.tree_util.tree_leaves(state.opt_state)
    b = jax.tree_util.tree_leaves(opt2)
    assert len(a) == len(b)
    # the SGD momentum trace survives exactly
    diffs = [np.abs(np.asarray(x) - np.asarray(y)).max() for x, y in zip(a, b)]
    assert max(diffs) == 0.0
    # and it is non-trivial after one step
    assert any(np.asarray(x).std() > 0 for x in a)


def test_checkpoint_partial_load(tmp_path):
    cfg = tiny_config()
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt.npz")
    # save only the mask branch (stage-transfer scenario)
    checkpoint.save(path, {"mask": params["mask"]})
    template = cfun.init_params(jax.random.PRNGKey(1), cfg)
    with pytest.raises(KeyError):
        checkpoint.load(path, template, strict=True)
    restored, _, _ = checkpoint.load(path, template, strict=False)
    np.testing.assert_array_equal(
        np.asarray(restored["mask"]["unet"]["c1_1"]["w"]),
        np.asarray(params["mask"]["unet"]["c1_1"]["w"]))
    # untouched subtree keeps template values
    np.testing.assert_array_equal(
        np.asarray(restored["rpn"]["shared"]["w"]),
        np.asarray(template["rpn"]["shared"]["w"]))


def test_fused_heart_train_mold_matches_chain():
    """native heart_train_mold/labels must equal the literal
    resize -> rotate_hw -> z-score -> bf16 chain (labels bit-exact; image
    within one bf16 ULP -- the native stats accumulate in double)."""
    import ml_dtypes
    import numpy as np
    import pytest

    from cfun_tpu import native
    from cfun_tpu.config import heart_config
    from cfun_tpu.data.feeder import normalize_intensity
    from cfun_tpu.data.resample import resize, rotate_hw

    if not native.available():
        pytest.skip("native host-ops unavailable")

    cfg = heart_config("beginning").replace(image_shape=(32, 64, 64))
    rng = np.random.default_rng(0)
    img = rng.normal(0, 50, size=(90, 100, 60)).astype(np.float32)
    mask = np.zeros((90, 100, 60), np.int32)
    mask[20:70, 25:80, 10:50] = 3

    d_t, h_t, w_t = cfg.image_shape
    for angle in (0.0, 13.0, -20.0):
        molded = resize(img, (h_t, w_t, d_t), order=1).transpose(2, 0, 1)
        labels = np.rint(resize(mask, (h_t, w_t, d_t), order=0)
                         ).astype(np.int32).transpose(2, 0, 1)
        if angle != 0.0:
            molded = rotate_hw(molded.transpose(1, 2, 0), angle,
                               order=0).transpose(2, 0, 1)
            labels = rotate_hw(labels.transpose(1, 2, 0), angle,
                               order=0).transpose(2, 0, 1)
        ref_img = normalize_intensity(molded, cfg).astype(ml_dtypes.bfloat16)

        got_img = native.heart_train_mold(img, cfg.image_shape, angle)
        got_lab = native.heart_train_labels(mask, cfg.image_shape, angle)
        np.testing.assert_array_equal(got_lab, labels)
        np.testing.assert_allclose(got_img.astype(np.float32),
                                   ref_img.astype(np.float32),
                                   rtol=2e-2, atol=2e-2)

        # int8-wire emitter: bit-identical to quantizing the kernel's own
        # bf16 output the way the feeder fallback does (clip +-5, *scale,
        # astype truncation)
        scale = cfg.wire_int8_scale
        want_q8 = (np.clip(got_img.astype(np.float32), -5.0, 5.0)
                   * scale).astype(np.int8)
        got_q8 = native.heart_train_mold_q8(img, cfg.image_shape, angle,
                                            5.0, scale)
        np.testing.assert_array_equal(got_q8, want_q8)


def test_fused_lits_train_mold_matches_chain():
    """native lits_train_mold{_q8,}/labels must be BIT-identical to the
    two-pass chain rotate_hw(raw) -> mold_volume -> astype(bfloat16)
    [-> clip/scale/astype(int8)]: the rotation and the virtual-pad nearest
    resize are both nearest gathers, so their composition is exact (the
    round-4 weak-#2 fix that unblocks LiTS training at real source
    sizes)."""
    import ml_dtypes
    import numpy as np
    import pytest

    from cfun_tpu import native
    from cfun_tpu.config import lits_config
    from cfun_tpu.data.feeder import mold_volume
    from cfun_tpu.data.resample import rotate_hw

    if not native.available():
        pytest.skip("native host-ops unavailable")

    cfg = lits_config("beginning").replace(image_shape=(32, 64, 64),
                                           pad_shape=(72, 120, 120))
    rng = np.random.default_rng(1)
    # HU-ish values straddling the (300, -300) window, odd source dims
    img = rng.normal(0, 400, size=(100, 96, 50)).astype(np.float32)
    mask = np.zeros((100, 96, 50), np.int32)
    mask[30:80, 20:70, 10:40] = 2

    pd_, ph, pw = cfg.pad_shape
    h0, w0, d0 = img.shape
    offs = (max(0, (ph - h0) // 2), max(0, (pw - w0) // 2),
            max(0, (pd_ - d0) // 2))
    for angle in (0.0, 17.0, -30.0):
        img_rot, mask_rot = img, mask
        if angle != 0.0:
            img_rot = rotate_hw(img, angle, order=0)
            mask_rot = rotate_hw(mask, angle, order=0)
        molded, _w, labels = mold_volume(img_rot[..., None], cfg, mask_rot)
        ref_bf16 = molded.astype(ml_dtypes.bfloat16)
        ref_q8 = (np.clip(ref_bf16.astype(np.float32), -5.0, 5.0)
                  * cfg.wire_int8_scale).astype(np.int8)

        got_bf16 = native.lits_train_mold(img, (ph, pw, pd_),
                                          cfg.image_shape, offs, angle,
                                          cfg.hu_window)
        got_q8 = native.lits_train_mold_q8(img, (ph, pw, pd_),
                                           cfg.image_shape, offs, angle,
                                           cfg.hu_window, 5.0,
                                           cfg.wire_int8_scale)
        got_lab = native.lits_train_labels(mask, (ph, pw, pd_),
                                           cfg.image_shape, offs, angle)
        np.testing.assert_array_equal(got_lab, labels)
        np.testing.assert_array_equal(got_bf16.view(np.uint16),
                                      ref_bf16.view(np.uint16),
                                      err_msg=f"angle={angle}")
        np.testing.assert_array_equal(got_q8, ref_q8,
                                      err_msg=f"angle={angle}")


def test_lits_feeder_fused_path_matches_two_pass():
    """The feeder's make_item LiTS branch (fused native path) must produce
    the same TrainBatch the two-pass fallback would."""
    import pytest

    from cfun_tpu import native
    from cfun_tpu.config import lits_config
    from cfun_tpu.data.datasets import SyntheticDataset
    from cfun_tpu.data.feeder import TrainFeeder
    from cfun_tpu.ops.anchors import config_anchors

    if not native.available():
        pytest.skip("native host-ops unavailable")

    cfg = lits_config("beginning").replace(
        image_shape=(16, 32, 32), pad_shape=(40, 72, 72),
        anchor_scales=(8, 16), train_wire_int8=True)
    ds = SyntheticDataset(cfg, n=2, seed=3)
    anchors = config_anchors(cfg)
    feeder = TrainFeeder(ds, cfg, anchors, seed=0, num_workers=1)
    try:
        fused = feeder.make_item(0, angle=12.0, seed=42)
        # force the two-pass fallback (mold_volume keeps the native
        # lits_mold, so both paths share the window arithmetic ->
        # bit-exact comparison)
        with native.force_two_pass():
            twopass = feeder.make_item(0, angle=12.0, seed=42)
    finally:
        feeder.close()
    for name, a, b in zip(fused._fields, fused, twopass):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_native_unmold_kernels_bit_identical():
    """The run-length native unmold kernels (LiTS full-volume map and the
    heart box paste) must be bit-identical to their numpy formulations,
    including non-monotone index maps and edge boxes."""
    import pytest

    from cfun_tpu import native
    from cfun_tpu.data.resample import resize

    if not native.available():
        pytest.skip("native host-ops unavailable")
    rng = np.random.default_rng(7)

    # LiTS-style full-volume nearest map (upsampling runs + random maps)
    lab = rng.integers(0, 4, size=(24, 40, 40), dtype=np.int8)
    for mz, my, mx in [
        (np.repeat(np.arange(24), 3)[:50], np.repeat(np.arange(40), 2)[:64],
         np.repeat(np.arange(40), 2)[:64]),
        (rng.integers(0, 24, 50), rng.integers(0, 40, 64),
         rng.integers(0, 40, 64)),
    ]:
        got = native.unmold_nearest_labels(lab, mz, my, mx)
        ref = np.take(np.take(np.take(lab, mz, 0), my, 1), mx, 2)
        ref = np.ascontiguousarray(ref.transpose(1, 2, 0)).astype(np.int16)
        np.testing.assert_array_equal(got, ref)

    # heart-style box paste vs resize(order=0) + paste
    crop = rng.integers(0, 8, size=(24, 24, 24), dtype=np.int8)
    shape = (40, 64, 64)
    for box in ([4, 10, 9, 30, 60, 50], [0, 0, 0, 40, 64, 64],
                [3, 5, 7, 4, 6, 8], [2, 2, 2, 26, 26, 26]):
        z1, y1, x1, z2, y2, x2 = box
        target = (max(z2 - z1, 1), max(y2 - y1, 1), max(x2 - x1, 1))
        got = native.unmold_labels_box(crop, box, shape)
        ref = np.zeros(shape, np.int16)
        ref[z1:z1 + target[0], y1:y1 + target[1],
            x1:x1 + target[2]] = resize(crop, target, order=0)
        np.testing.assert_array_equal(got, ref)
