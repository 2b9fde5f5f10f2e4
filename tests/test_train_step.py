"""End-to-end training-step tests on the tiny config (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfun_tpu.config import tiny_config
from cfun_tpu.models import cfun
from cfun_tpu.ops.anchors import config_anchors
from cfun_tpu.train import losses as L
from cfun_tpu.train.step import (TrainBatch, make_train_step, trainable_mask,
                                 train_forward)
from cfun_tpu.train.targets import build_rpn_targets, detection_targets


def _make_batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    d, h, w = cfg.image_shape
    labels = np.zeros((d, h, w), np.int32)
    # a synthetic "organ": nested boxes of classes 1..3
    labels[8:24, 16:48, 16:48] = 1
    labels[10:20, 20:40, 20:40] = 2
    labels[12:16, 24:32, 24:32] = 3
    image = rng.normal(size=(1, d, h, w, 1)).astype(np.float32)
    image += 2.0 * (labels > 0)[None, ..., None]

    gt_box = np.array([8, 16, 16, 24, 48, 48], np.float32)
    anchors = config_anchors(cfg)
    match, deltas = build_rpn_targets(anchors, gt_box, cfg,
                                      np.random.default_rng(seed))
    norm = np.array([d, h, w, d, h, w], np.float32)
    return TrainBatch(
        image=jnp.asarray(image),
        rpn_match=jnp.asarray(match),
        rpn_deltas=jnp.asarray(deltas),
        gt_box_norm=jnp.asarray(gt_box / norm),
        labels=jnp.asarray(labels),
    )


def test_rpn_targets_invariants():
    cfg = tiny_config()
    anchors = config_anchors(cfg)
    gt_box = np.array([8, 16, 16, 24, 48, 48], np.float32)
    match, deltas = build_rpn_targets(anchors, gt_box, cfg,
                                      np.random.default_rng(0))
    assert match.shape == (cfg.num_anchors,)
    n_pos = int((match == 1).sum())
    n_neg = int((match == -1).sum())
    assert n_pos >= 1  # the GT box is always matched
    assert n_pos <= cfg.rpn_train_anchors_per_image // 2
    assert n_pos + n_neg <= cfg.rpn_train_anchors_per_image
    # deltas nonzero only on positives
    assert np.all(deltas[match != 1] == 0)
    assert np.any(deltas[match == 1] != 0)


def test_detection_targets_shapes_and_sampling():
    cfg = tiny_config()
    key = jax.random.PRNGKey(0)
    n = 20
    rng = np.random.default_rng(1)
    gt = jnp.asarray([0.25, 0.25, 0.25, 0.75, 0.75, 0.75], jnp.float32)
    # half the proposals overlap the GT well, half don't
    good = np.tile(np.array([0.26, 0.24, 0.25, 0.74, 0.73, 0.76]), (10, 1))
    good += rng.normal(0, 0.01, good.shape)
    bad = np.tile(np.array([0.0, 0.0, 0.0, 0.2, 0.2, 0.2]), (10, 1))
    bad += np.abs(rng.normal(0, 0.01, bad.shape))
    proposals = jnp.asarray(np.concatenate([good, bad]), jnp.float32)
    labels = jnp.zeros((32, 64, 64), jnp.int32)

    tgt = detection_targets(key, proposals, jnp.ones(n, bool), gt, labels, cfg)
    p_cap = cfg.num_positive_rois
    assert tgt.rois.shape == (cfg.train_rois_per_image, 6)
    assert tgt.pos_rois.shape == (p_cap, 6)
    assert tgt.masks.shape == (p_cap, *cfg.mask_shape, cfg.num_classes)
    n_pos = int(np.asarray(tgt.pos_valid).sum())
    assert n_pos == min(10, p_cap)
    # negatives follow the 1:2 ratio rule: int(pos/ratio) - pos
    want_neg = int(n_pos / cfg.roi_positive_ratio) - n_pos
    n_neg = int(np.asarray(tgt.roi_valid).sum()) - n_pos
    assert n_neg == min(want_neg, cfg.train_rois_per_image - p_cap)
    # positive class ids are 1, negatives 0
    ids = np.asarray(tgt.class_ids)
    assert np.all(ids[:p_cap][np.asarray(tgt.pos_valid)] == 1)
    assert np.all(ids[p_cap:] == 0)


def test_detection_targets_no_positives():
    cfg = tiny_config()
    gt = jnp.asarray([0.4, 0.4, 0.4, 0.6, 0.6, 0.6], jnp.float32)
    proposals = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.1, 0.1, 0.1]), (8, 1))
    labels = jnp.zeros((32, 64, 64), jnp.int32)
    tgt = detection_targets(jax.random.PRNGKey(0), proposals,
                            jnp.ones(8, bool), gt, labels, cfg)
    assert int(np.asarray(tgt.pos_valid).sum()) == 0
    # no positives -> no negatives either (reference model.py:501)
    assert int(np.asarray(tgt.roi_valid).sum()) == 0


@pytest.mark.parametrize("stage", ["beginning", "finetune"])
def test_train_forward_losses_finite(stage):
    cfg = tiny_config(stage)
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    batch = _make_batch(cfg)
    anchors = jnp.asarray(config_anchors(cfg))
    total, parts = jax.jit(
        train_forward, static_argnames=("cfg",))(
            params, batch, anchors, cfg, jax.random.PRNGKey(1))
    assert np.isfinite(float(total))
    for k, v in parts.items():
        assert np.isfinite(float(v)), k
    if stage == "beginning":
        assert float(parts["mrcnn_mask_edge_loss"]) == 0.0
    else:
        assert float(parts["mrcnn_mask_edge_loss"]) >= 0.0


def test_train_step_updates_params_but_not_bn_stats():
    cfg = tiny_config()
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    anchors = config_anchors(cfg)
    init_state, step = make_train_step(cfg, anchors)
    state = init_state(params)
    batch = _make_batch(cfg)
    # snapshot before stepping: the step donates its input state buffers
    w0 = np.asarray(params["backbone"]["stem_conv"]["w"]).copy()

    state2, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))
    # a conv weight moved
    w1 = np.asarray(state2.params["backbone"]["stem_conv"]["w"])
    assert not np.allclose(w0, w1)
    # frozen BN statistics did not move
    np.testing.assert_array_equal(
        np.asarray(state2.params["backbone"]["stem_bn"]["mean"]),
        np.zeros_like(w1[0, 0, 0, 0]))
    np.testing.assert_array_equal(
        np.asarray(state2.params["backbone"]["stem_bn"]["var"]),
        np.ones_like(w1[0, 0, 0, 0]))


def test_losses_masked_means():
    # rpn class loss ignores neutral anchors
    logits = jnp.asarray([[10.0, -10.0], [0.0, 0.0], [-10.0, 10.0]])
    match = jnp.asarray([-1, 0, 1], jnp.int8)
    loss = float(L.rpn_class_loss(match, logits))
    assert loss < 1e-3  # both non-neutral rows are confidently correct
    # flipping the positive row's prediction raises the loss
    bad = jnp.asarray([[10.0, -10.0], [0.0, 0.0], [10.0, -10.0]])
    assert float(L.rpn_class_loss(match, bad)) > 1.0


def test_packed_labels_equivalent():
    """4-bit W-packed labels (pack_labels_w) produce the identical losses
    as the unpacked int batch -- the device unpack is lossless and
    shape-dispatched."""
    from cfun_tpu.train.step import pack_labels_w, unpack_labels_w

    cfg = tiny_config()
    anchors = jnp.asarray(config_anchors(cfg))
    batch = _make_batch(cfg)
    np.testing.assert_array_equal(
        np.asarray(unpack_labels_w(jnp.asarray(
            pack_labels_w(np.asarray(batch.labels))))),
        np.asarray(batch.labels))

    packed = batch._replace(
        labels=jnp.asarray(pack_labels_w(np.asarray(batch.labels))))
    key = jax.random.PRNGKey(4)
    t1, m1 = train_forward(cfg=cfg, params=cfun.init_params(
        jax.random.PRNGKey(0), cfg), batch=batch, anchors=anchors, key=key)
    t2, m2 = train_forward(cfg=cfg, params=cfun.init_params(
        jax.random.PRNGKey(0), cfg), batch=packed, anchors=anchors, key=key)
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-6)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-6)


def test_train_wire_int8_close_to_float():
    """cfg.train_wire_int8: the int8-quantized image batch (device
    dequantize in train_forward) gives losses close to the float wire
    (noise ~0.011 sigma rms)."""
    cfg = tiny_config()
    anchors = jnp.asarray(config_anchors(cfg))
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    batch = _make_batch(cfg, seed=5)
    key = jax.random.PRNGKey(9)

    total_f, parts_f = train_forward(params, batch, anchors, cfg, key)

    q = np.clip(np.asarray(batch.image, np.float32), -5.0, 5.0)
    batch_q = batch._replace(
        image=jnp.asarray((q * cfg.wire_int8_scale).astype(np.int8)))
    cfg_q = cfg.replace(train_wire_int8=True)
    total_q, parts_q = train_forward(params, batch_q, anchors, cfg_q, key)
    np.testing.assert_allclose(float(total_q), float(total_f), rtol=0.05)
    for k in parts_f:
        np.testing.assert_allclose(float(parts_q[k]), float(parts_f[k]),
                                   rtol=0.1, atol=5e-3)


def test_grad_accum_matches_mean_gradient_step():
    """cfg.grad_accum_steps=2 (the reference's batch emulation,
    model.py:1642-1645, via optax.MultiSteps): params must stay EXACTLY
    frozen mid-accumulation, and the post-accumulation params must equal
    one accum=1 update applied to the mean of the two micro-gradients --
    the drift-prone interplay VERDICT r2 called out."""
    from cfun_tpu.train.step import apply_update

    cfg2 = tiny_config().replace(grad_accum_steps=2)
    cfg1 = tiny_config().replace(grad_accum_steps=1)
    anchors = config_anchors(cfg2)
    params = cfun.init_params(jax.random.PRNGKey(0), cfg2)
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), params)

    init2, step2 = make_train_step(cfg2, anchors)
    state = init2(params)
    batch_a, batch_b = _make_batch(cfg2, seed=0), _make_batch(cfg2, seed=3)
    key_a, key_b = jax.random.PRNGKey(11), jax.random.PRNGKey(12)

    state, _ = step2(state, batch_a, key_a)
    for leaf, ref in zip(jax.tree_util.tree_leaves(state.params),
                         jax.tree_util.tree_leaves(p0)):
        np.testing.assert_array_equal(np.asarray(leaf), ref)

    state, _ = step2(state, batch_b, key_b)

    # manual path: both micro-gradients at the ORIGINAL params (no update
    # happened in between), averaged, applied through the accum=1 tail
    grad_fn = jax.jit(jax.value_and_grad(train_forward, has_aux=True),
                      static_argnames=("cfg",))
    anchors_j = jnp.asarray(anchors)
    (total, parts), g_a = grad_fn(p0, batch_a, anchors_j, cfg2, key_a)
    _, g_b = grad_fn(p0, batch_b, anchors_j, cfg2, key_b)
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2.0, g_a, g_b)

    init1, _ = make_train_step(cfg1, anchors)
    ref_state, _ = jax.jit(
        apply_update, static_argnames=("cfg",))(
            cfg1, init1(p0), g_mean, total, parts)

    for got, want in zip(jax.tree_util.tree_leaves(state.params),
                         jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-7)
