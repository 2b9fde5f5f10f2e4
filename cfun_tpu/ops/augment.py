"""On-device training augmentation: rotation, GT bbox, RPN targets.

``Config.augment_on_device`` moves the per-item augmentation work the host
feeder normally does (``data/feeder.py::make_item``) into the jit'd train
step.  The feeder then ships the UNROTATED molded volume -- which is
angle-independent, so it is cached across epochs (``TrainFeeder``): on
CPU-starved hosts the per-epoch feeder cost drops to ~zero after the first
pass over the dataset, and the (cheap for a TPU) rotate/bbox/RPN-target
work rides the accelerator.

Host-counterpart semantics preserved:

* rotation: ``data/resample.py::rotate_hw`` order=0 -- inverse-mapped
  nearest with round-half-even and constant fill (the reference's
  slice-wise imgaug Affine, reference model.py:1019-1052).  The heart path
  rotates the molded volume BEFORE z-scoring; z-scoring is
  affine-invariant, so the device rotates the wired (normalized /
  dequantized) volume with ``fill`` = the wire-domain value of a raw 0
  voxel and re-z-scores -- exactly ``zscore(rotate(raw_molded))``.
* GT bbox: ``data/feeder.py::np_mask_to_extended_bbox`` (5 % per-face
  extension, reference model.py:1057-1075).
* RPN targets: ``train/targets.py::build_rpn_targets`` (reference
  model.py:1090-1181) with the subsampling RNG moved to ``jax.random``
  (a different random subset than the host's NumPy ``Generator`` -- same
  distribution, documented in PARITY.md).

Only the heart molding (rotate-AFTER-resize, reference model.py:1019-1052)
is supported: LiTS rotates the raw volume before pad+resize
(LiTS_2017/model.py:1211-1215), and rotation does not commute with
resampling.

Deviations from the host path (all sub-voxel / RNG-level; PARITY.md):
the rotation grid is computed in float32 (host: float64), so boundary
voxels at rounding ties can differ; anchor IoU is float32; positive /
negative subsampling uses ``approx_max_k`` when ``cfg.approx_topk`` (the
same compile-time tradeoff as the proposal layer's top-k).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cfun_tpu.config import Config


class AugTrainBatch(NamedTuple):
    """An unrotated molded example; the step augments it on device."""
    image: jnp.ndarray   # [1, D, H, W, 1] wire dtype (bf16/f32/int8), UNROTATED
    labels: jnp.ndarray  # [D, H, W] int8 or [D, H, W/2] 4-bit packed uint8
    angle: jnp.ndarray   # [] float32 degrees (epoch-constant)
    fill: jnp.ndarray    # [] float32: wire-domain value of a raw 0 voxel


def rotate_hw_device(vol: jnp.ndarray, angle_deg, fill=0.0) -> jnp.ndarray:
    """Rotate every [H, W] slice of ``vol`` [D, H, W] about the slice
    center by ``angle_deg`` (traced scalar), nearest-neighbor with constant
    ``fill`` outside -- device mirror of ``resample.rotate_hw(order=0)``.
    """
    _, h, w = vol.shape
    theta = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    ys = cos_t * (yy - cy) - sin_t * (xx - cx) + cy
    xs = sin_t * (yy - cy) + cos_t * (xx - cx) + cx
    inside = (ys >= -0.5) & (ys <= h - 0.5) & (xs >= -0.5) & (xs <= w - 0.5)
    # jnp.round == np.round: round-half-to-even (host parity)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w - 1)
    out = vol[:, yi, xi]
    fill = jnp.asarray(fill).astype(vol.dtype)
    return jnp.where(inside[None, :, :], out, fill)


def extended_bbox(labels: jnp.ndarray, frac: float = 0.05) -> jnp.ndarray:
    """Whole-organ bbox of nonzero ``labels`` [D, H, W], extended ``frac``
    per face; [6] float32 (z1, y1, x1, z2, y2, x2), zeros when empty --
    device mirror of ``feeder.np_mask_to_extended_bbox``."""
    nz = labels > 0
    shape = jnp.asarray(labels.shape, jnp.float32)
    axes = [nz.any((1, 2)), nz.any((0, 2)), nz.any((0, 1))]
    lo = jnp.stack([jnp.argmax(a) for a in axes]).astype(jnp.float32)
    hi = jnp.stack([a.shape[0] - jnp.argmax(a[::-1]) for a in axes]
                   ).astype(jnp.float32)
    size = hi - lo
    lo = jnp.floor(jnp.maximum(lo - frac * size, 0.0))
    hi = jnp.ceil(jnp.minimum(hi + frac * size, shape))
    box = jnp.concatenate([lo, hi])
    return jnp.where(axes[0].any(), box, 0.0)


def _random_keep(key, mask: jnp.ndarray, k: int, limit=None,
                 approx: bool = True) -> jnp.ndarray:
    """Boolean [A] selecting up to ``k`` uniformly-random True positions
    of ``mask``; with ``limit`` (traced int) only the first
    ``min(k, limit)`` by random rank survive."""
    score = jnp.where(mask, jax.random.uniform(key, mask.shape), -1.0)
    if approx:
        top, idx = jax.lax.approx_max_k(score, k)
    else:
        top, idx = jax.lax.top_k(score, k)
    ok = top >= 0.0
    if limit is not None:
        ok &= jnp.arange(k) < limit
    # top-k indices are distinct positions, so the scatter is collision-free
    return jnp.zeros(mask.shape, bool).at[idx].set(ok)


def rpn_targets_device(anchors: jnp.ndarray, gt_box: jnp.ndarray,
                       cfg: Config, key):
    """Device mirror of ``targets.build_rpn_targets``: match anchors [A, 6]
    (voxel coords) to the single organ ``gt_box`` [6] (traced), subsample
    to the training quota, emit dense per-anchor deltas.

    Returns (match [A] int8 in {-1, 0, 1}, deltas [A, 6] float32 divided by
    RPN_BBOX_STD_DEV, zero off the positive set)."""
    a = anchors.astype(jnp.float32)
    g = gt_box.astype(jnp.float32)
    lo = jnp.maximum(a[:, :3], g[:3])
    hi = jnp.minimum(a[:, 3:], g[3:])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=1)
    vol_a = jnp.prod(a[:, 3:] - a[:, :3], axis=1)
    vol_g = jnp.prod(g[3:] - g[:3])
    iou = inter / (vol_a + vol_g - inter + 1e-6)

    # an empty gt_box (all zeros: the rotated volume lost every foreground
    # voxel, possible for a corner organ at +-20 deg) must not produce a
    # forced-positive anchor with log(0) deltas -> NaN step; mark the whole
    # item neutral instead (neutral anchors are excluded from both RPN
    # losses, so the step degrades to a no-op for this item)
    valid = vol_g > 0.0

    num = a.shape[0]
    pos = ((iou >= 0.7) | (jnp.arange(num) == jnp.argmax(iou))) & valid
    neg = (iou < 0.3) & ~pos & valid

    quota = cfg.rpn_train_anchors_per_image
    k_pos, k_neg = jax.random.split(key)
    # positives capped at half the quota (host demotes the excess at
    # random, model.py:1128-1134), negatives fill the rest
    keep_pos = _random_keep(k_pos, pos, min(quota // 2, num),
                            approx=cfg.approx_topk)
    n_pos = jnp.sum(keep_pos)
    keep_neg = _random_keep(k_neg, neg, min(quota, num), limit=quota - n_pos,
                            approx=cfg.approx_topk)

    match = jnp.where(keep_pos, jnp.int8(1),
                      jnp.where(keep_neg, jnp.int8(-1), jnp.int8(0)))

    size_a = a[:, 3:] - a[:, :3]
    center_a = a[:, :3] + 0.5 * size_a
    # clamp so an empty gt (masked out above) cannot leak log(0)=-inf into
    # the masked-out lanes (0 * inf = NaN under AD)
    size_g = jnp.maximum(g[3:] - g[:3], 1e-3)
    center_g = g[:3] + 0.5 * size_g
    deltas = jnp.concatenate(
        [(center_g - center_a) / size_a,
         jnp.log(size_g / size_a) * jnp.ones_like(size_a)], axis=1)
    deltas = deltas / jnp.asarray(cfg.rpn_bbox_std, jnp.float32)
    deltas = jnp.where(keep_pos[:, None], deltas, 0.0)
    return match, deltas


def device_augment(batch: AugTrainBatch, anchors: jnp.ndarray, cfg: Config,
                   key):
    """Rotate + re-normalize + GT bbox + RPN targets, all on device.
    Returns a regular ``TrainBatch`` for ``train_forward``."""
    from cfun_tpu.train.step import TrainBatch, unpack_labels_w

    labels = batch.labels
    if labels.shape[-1] == cfg.image_shape[2] // 2:
        labels = unpack_labels_w(labels)
    else:
        labels = labels.astype(jnp.int32)

    image = batch.image
    if image.dtype == jnp.int8:
        image = image.astype(jnp.float32) * (1.0 / cfg.wire_int8_scale)
    else:
        image = image.astype(jnp.float32)

    vol = rotate_hw_device(image[0, ..., 0], batch.angle, batch.fill)
    # host order is rotate THEN z-score (feeder make_item); the wire is an
    # affine image of the raw molded volume with raw-0 mapped to `fill`,
    # and z-scoring is affine-invariant, so re-normalizing here equals
    # zscore(rotate(raw_molded)) exactly
    mean = vol.mean()
    std = vol.std()
    vol = (vol - mean) / jnp.where(std > 0, std, 1.0)

    labels_rot = rotate_hw_device(labels, batch.angle, 0)
    gt_box = extended_bbox(labels_rot)
    match, deltas = rpn_targets_device(anchors, gt_box, cfg, key)

    d, h, w = cfg.image_shape
    norm = jnp.asarray([d, h, w, d, h, w], jnp.float32)
    return TrainBatch(
        image=vol[None, ..., None].astype(jnp.dtype(cfg.compute_dtype)),
        rpn_match=match,
        rpn_deltas=deltas,
        gt_box_norm=gt_box / norm,
        labels=labels_rot,
    )
