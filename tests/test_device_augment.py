"""On-device augmentation (Config.augment_on_device, ops/augment.py):
device rotation / GT bbox / RPN targets vs their host counterparts, the
feeder's cross-epoch mold cache, and the train step end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from cfun_tpu.config import tiny_config
from cfun_tpu.data.datasets import SyntheticDataset
from cfun_tpu.data.feeder import TrainFeeder, np_mask_to_extended_bbox
from cfun_tpu.data.resample import rotate_hw
from cfun_tpu.ops.anchors import config_anchors
from cfun_tpu.ops.augment import (AugTrainBatch, device_augment,
                                  extended_bbox, rotate_hw_device,
                                  rpn_targets_device)
from cfun_tpu.train.step import make_train_step


def _labels_volume(shape=(8, 40, 40), seed=0):
    d, h, w = shape
    rng = np.random.default_rng(seed)
    labels = np.zeros(shape, np.int32)
    zz, yy, xx = np.ogrid[:d, :h, :w]
    cy, cx = rng.integers(14, 26), rng.integers(14, 26)
    ball = (((zz - d / 2) / (d / 3)) ** 2 + ((yy - cy) / 9.0) ** 2
            + ((xx - cx) / 7.0) ** 2) < 1.0
    labels[ball] = 2
    return labels


def _host_rotate(vol_dhw, angle, order=0):
    # host rotate_hw operates on [H, W, ...] over axes (0, 1)
    return rotate_hw(vol_dhw.transpose(1, 2, 0), angle,
                     order=order).transpose(2, 0, 1)


def test_rotate_device_matches_host():
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(6, 40, 40)).astype(np.float32)
    labels = _labels_volume((6, 40, 40))
    for angle in (0.0, 12.0, -33.5, 90.0):
        dev_v = np.asarray(rotate_hw_device(jnp.asarray(vol), angle, 0.0))
        dev_l = np.asarray(rotate_hw_device(jnp.asarray(labels), angle, 0))
        host_v = _host_rotate(vol, angle)
        host_l = _host_rotate(labels, angle)
        # the device grid is float32 (host: float64); rounding ties at
        # slice boundaries may pick the neighboring voxel
        agree_v = np.mean(dev_v == host_v)
        agree_l = np.mean(dev_l == host_l)
        assert agree_v > 0.995 and agree_l > 0.995, (angle, agree_v, agree_l)
        if angle in (0.0, 90.0):  # exact grids: no rounding ties
            np.testing.assert_array_equal(dev_v, host_v)
            np.testing.assert_array_equal(dev_l, host_l)


def test_rotate_device_fill_value():
    vol = np.ones((2, 16, 16), np.float32)
    out = np.asarray(rotate_hw_device(jnp.asarray(vol), 45.0, -3.5))
    # corners rotate outside the source square -> constant fill
    assert out[0, 0, 0] == -3.5
    assert np.all(np.isin(out, (1.0, np.float32(-3.5))))


def test_extended_bbox_matches_host():
    labels = _labels_volume()
    dev = np.asarray(extended_bbox(jnp.asarray(labels)))
    host = np_mask_to_extended_bbox(labels)
    np.testing.assert_allclose(dev, host)
    empty = np.zeros((4, 8, 8), np.int32)
    np.testing.assert_array_equal(
        np.asarray(extended_bbox(jnp.asarray(empty))), np.zeros(6))


def test_rpn_targets_device_invariants():
    cfg = tiny_config()
    anchors = config_anchors(cfg).astype(np.float32)
    gt = np.array([8, 16, 16, 24, 48, 48], np.float32)

    match, deltas = jax.jit(
        lambda g, k: rpn_targets_device(jnp.asarray(anchors), g, cfg, k)
    )(jnp.asarray(gt), jax.random.PRNGKey(0))
    match, deltas = np.asarray(match), np.asarray(deltas)

    # host candidate sets (float64 IoU, same thresholds)
    a = anchors.astype(np.float64)
    lo = np.maximum(a[:, :3], gt[:3])
    hi = np.minimum(a[:, 3:], gt[3:])
    inter = np.prod(np.maximum(hi - lo, 0.0), axis=1)
    iou = inter / (np.prod(a[:, 3:] - a[:, :3], 1)
                   + np.prod(gt[3:] - gt[:3]) - inter + 1e-6)
    pos_cand = (iou >= 0.7) | (np.arange(len(a)) == np.argmax(iou))
    neg_cand = (iou < 0.3) & ~pos_cand

    quota = cfg.rpn_train_anchors_per_image
    n_pos = int(np.sum(match == 1))
    n_neg = int(np.sum(match == -1))
    assert n_pos == min(int(pos_cand.sum()), quota // 2)
    assert n_neg == quota - n_pos
    assert np.all(pos_cand[match == 1])
    assert np.all(neg_cand[match == -1])

    # dense deltas on the positive set match the host formula
    from cfun_tpu.train.targets import build_rpn_targets
    host_match, host_deltas = build_rpn_targets(
        anchors, gt, cfg, np.random.default_rng(0))
    pos_ids = np.flatnonzero(match == 1)
    host_pos = np.flatnonzero(host_match == 1)
    # the random subsets differ, but any anchor positive in both carries
    # identical deltas
    both = np.intersect1d(pos_ids, host_pos)
    assert both.size > 0
    np.testing.assert_allclose(deltas[both], host_deltas[both],
                               rtol=1e-4, atol=1e-5)
    assert np.all(deltas[match != 1] == 0.0)


def test_rpn_targets_device_empty_gt_is_neutral_and_finite():
    """An all-zero gt_box (rotation pushed every foreground voxel out of
    frame) must not create a forced-positive anchor with log(0) deltas:
    the whole item goes neutral and every delta stays finite."""
    cfg = tiny_config()
    anchors = config_anchors(cfg).astype(np.float32)
    match, deltas = jax.jit(
        lambda g, k: rpn_targets_device(jnp.asarray(anchors), g, cfg, k)
    )(jnp.zeros(6, jnp.float32), jax.random.PRNGKey(0))
    assert np.all(np.asarray(match) == 0)
    assert np.all(np.isfinite(np.asarray(deltas)))
    assert np.all(np.asarray(deltas) == 0.0)


def test_device_augment_angle_zero_reproduces_host_batch():
    cfg = tiny_config()  # float32 compute -> exact comparisons
    d, h, w = cfg.image_shape
    rng = np.random.default_rng(3)
    molded = rng.normal(2.0, 4.0, size=(d, h, w)).astype(np.float32)
    labels = _labels_volume((d, h, w))

    m, s = molded.mean(), molded.std()
    y = (molded - m) / s
    from cfun_tpu.train.step import pack_labels_w
    aug = AugTrainBatch(image=jnp.asarray(y[None, ..., None]),
                        labels=jnp.asarray(pack_labels_w(labels)),
                        angle=jnp.float32(0.0),
                        fill=jnp.float32(-m / s))
    anchors = jnp.asarray(config_anchors(cfg).astype(np.float32))
    batch = jax.jit(
        lambda b, k: device_augment(b, anchors, cfg, k)
    )(aug, jax.random.PRNGKey(7))

    # at angle 0 the rotation is the identity and re-z-scoring y is a no-op
    np.testing.assert_allclose(np.asarray(batch.image[0, ..., 0]), y,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(batch.labels), labels)
    norm = np.array([d, h, w, d, h, w], np.float32)
    np.testing.assert_allclose(np.asarray(batch.gt_box_norm),
                               np_mask_to_extended_bbox(labels) / norm,
                               atol=1e-6)


def test_feeder_aug_mode_caches_molds():
    cfg = tiny_config().replace(augment_on_device=True)
    ds = SyntheticDataset(cfg, n=2, seed=0)
    feeder = TrainFeeder(ds, cfg, config_anchors(cfg), seed=0,
                         num_workers=2)
    try:
        items = list(feeder.epoch(angle=7.0, steps=4))
        assert len(items) == 4
        assert all(isinstance(it, AugTrainBatch) for it in items)
        assert all(float(it.angle) == 7.0 for it in items)
        assert len(feeder._mold_cache) == 2
        # the cache returns the SAME arrays across epochs (no re-mold)
        again = feeder.make_item(0, angle=-3.0, seed=1)
        assert again.image is feeder._mold_cache[0].image
        assert float(again.angle) == -3.0
    finally:
        feeder.close()


def test_train_step_with_device_augmentation():
    cfg = tiny_config().replace(augment_on_device=True)
    ds = SyntheticDataset(cfg, n=2, seed=0)
    anchors = config_anchors(cfg)
    feeder = TrainFeeder(ds, cfg, anchors, seed=0, num_workers=2)
    try:
        items = list(feeder.epoch(angle=11.0, steps=2))
    finally:
        feeder.close()

    from cfun_tpu.models import cfun
    init_state, step = make_train_step(cfg, anchors)
    state = init_state(cfun.init_params(jax.random.PRNGKey(0), cfg))
    key = jax.random.PRNGKey(1)
    for i, it in enumerate(items):
        key, sub = jax.random.split(key)
        state, metrics = step(state, it, sub)
        total = float(metrics["total_loss"])
        assert np.isfinite(total), (i, metrics)


def test_device_mold_cache_pins_items_in_device_memory():
    import pytest

    cfg = tiny_config().replace(augment_on_device=True,
                                device_mold_cache=True)
    ds = SyntheticDataset(cfg, n=1, seed=0)
    anchors = config_anchors(cfg)
    feeder = TrainFeeder(ds, cfg, anchors, seed=0, num_workers=1)
    try:
        it = feeder.make_item(0, angle=4.0, seed=0)
        assert isinstance(it.image, jax.Array)
        assert isinstance(it.labels, jax.Array)
        # the next epoch's item reuses the SAME device buffer (only the
        # 4-byte angle scalar differs)
        it2 = feeder.make_item(0, angle=-8.0, seed=1)
        assert it2.image is it.image
        assert float(it2.angle) == -8.0
    finally:
        feeder.close()

    from cfun_tpu.models import cfun
    init_state, step = make_train_step(cfg, anchors)
    state = init_state(cfun.init_params(jax.random.PRNGKey(0), cfg))
    _, metrics = step(state, it, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))

    # the mesh batch path stacks host rows -> explicitly unsupported
    from cfun_tpu.train.loop import make_training_programs
    with pytest.raises(ValueError, match="single-device"):
        make_training_programs(cfg, anchors, mesh_spec=(2, 1))


def test_mesh_training_with_device_augmentation():
    """The mesh trainer consumes AugTrainBatch items: aug_batch_sharding +
    the generic stack/put path + device_augment under vmap on a mesh."""
    from cfun_tpu.train.loop import make_training_programs

    cfg = tiny_config().replace(augment_on_device=True)
    ds = SyntheticDataset(cfg, n=2, seed=0)
    anchors = config_anchors(cfg)
    prog = make_training_programs(cfg, anchors, mesh_spec=(2, 1))
    assert prog.group == 2

    feeder = TrainFeeder(ds, cfg, anchors, seed=0, num_workers=2)
    try:
        items = list(feeder.epoch(angle=9.0, steps=2))
    finally:
        feeder.close()

    from cfun_tpu.models import cfun
    state = prog.init_state(cfun.init_params(jax.random.PRNGKey(0), cfg))
    batch = prog.put_batch(items)
    assert isinstance(batch, AugTrainBatch)
    state, metrics = prog.step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))


def test_device_augment_matches_host_feeder_at_angle_zero():
    """The device-augmented batch must carry the same image, labels and
    GT box the host feeder builds for the same volume at angle 0 (the RPN
    subsample is a different random subset by design, covered by the
    invariants test above)."""
    cfg = tiny_config()
    ds = SyntheticDataset(cfg, n=1, seed=0)
    anchors = config_anchors(cfg)

    host_feeder = TrainFeeder(ds, cfg, anchors, seed=0, num_workers=1)
    aug_feeder = TrainFeeder(ds, cfg.replace(augment_on_device=True),
                             anchors, seed=0, num_workers=1)
    try:
        host_item = host_feeder.make_item(0, angle=0.0, seed=5)
        aug_item = aug_feeder.make_item(0, angle=0.0, seed=5)
    finally:
        host_feeder.close()
        aug_feeder.close()

    anc = jnp.asarray(anchors)
    acfg = cfg.replace(augment_on_device=True)
    dev_batch = jax.jit(
        lambda b, k: device_augment(b, anc, acfg, k))(
            jax.tree.map(jnp.asarray, aug_item), jax.random.PRNGKey(42))

    # identical image and labels reach the forward
    np.testing.assert_allclose(np.asarray(dev_batch.image),
                               np.asarray(host_item.image), atol=2e-5)
    from cfun_tpu.train.step import unpack_labels_w
    np.testing.assert_array_equal(
        np.asarray(dev_batch.labels),
        np.asarray(unpack_labels_w(jnp.asarray(host_item.labels))))
    np.testing.assert_allclose(np.asarray(dev_batch.gt_box_norm),
                               np.asarray(host_item.gt_box_norm), atol=1e-6)
