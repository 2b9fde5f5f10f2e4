"""Target assignment: RPN anchor targets (host, feeder-side) and the
detection-target layer (device, inside the jit'd train step).

RPN targets follow the LiTS pipeline layout -- computed in data workers, not
in the train loop (SURVEY.md s3.4, LiTS_2017/model.py:1130-1248) -- with one
deviation: instead of the reference's packed [num_train_anchors, 6] delta
rows paired implicitly by ascending anchor index (model.py:1146-1179), we
emit a dense per-anchor [A, 6] target array aligned with the match vector,
which makes the masked loss trivially correct on device.

The detection-target layer replaces the reference's host/GPU hybrid with
data-dependent shapes and skimage mask crops (model.py:414-563) by masked
top-k sampling and on-device nearest crops at fixed capacity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cfun_tpu.config import Config
from cfun_tpu.ops.boxes import box_refinement, pairwise_iou
from cfun_tpu.ops.sample3d import one_hot_crop


# ---------------------------------------------------------------------------
# RPN targets (host-side NumPy; runs in feeder workers)
# ---------------------------------------------------------------------------

def build_rpn_targets(anchors: np.ndarray, gt_box: np.ndarray, cfg: Config,
                      rng: np.random.Generator):
    """Match anchors to the single organ GT box (reference model.py:1090-1181).

    anchors: [A, 6] voxel coords; gt_box: [6] voxel coords.
    Returns (rpn_match [A] int8 in {-1, 0, 1}, rpn_deltas [A, 6] float32
    normalized by RPN_BBOX_STD_DEV, dense per-anchor).
    """
    a = anchors.astype(np.float64)
    g = gt_box.astype(np.float64)
    lo = np.maximum(a[:, :3], g[:3])
    hi = np.minimum(a[:, 3:], g[3:])
    inter = np.prod(np.maximum(hi - lo, 0.0), axis=1)
    vol_a = np.prod(a[:, 3:] - a[:, :3], axis=1)
    vol_g = np.prod(g[3:] - g[:3])
    iou = inter / (vol_a + vol_g - inter + 1e-6)

    match = np.zeros(anchors.shape[0], np.int8)
    match[iou < 0.3] = -1
    match[np.argmax(iou)] = 1  # never leave the GT box unmatched
    match[iou >= 0.7] = 1

    # subsample: positives <= half, then negatives to fill the quota
    # (model.py:1128-1143)
    quota = cfg.rpn_train_anchors_per_image
    pos_ids = np.flatnonzero(match == 1)
    extra = len(pos_ids) - quota // 2
    if extra > 0:
        match[rng.choice(pos_ids, extra, replace=False)] = 0
    neg_ids = np.flatnonzero(match == -1)
    extra = len(neg_ids) - (quota - int(np.sum(match == 1)))
    if extra > 0:
        match[rng.choice(neg_ids, extra, replace=False)] = 0

    # dense per-anchor deltas for the positive set
    size_a = a[:, 3:] - a[:, :3]
    center_a = a[:, :3] + 0.5 * size_a
    size_g = g[3:] - g[:3]
    center_g = g[:3] + 0.5 * size_g
    deltas = np.concatenate(
        [(center_g - center_a) / size_a,
         np.log(size_g / size_a) * np.ones_like(size_a)], axis=1)
    deltas /= np.asarray(cfg.rpn_bbox_std)
    deltas[match != 1] = 0.0
    return match, deltas.astype(np.float32)


# ---------------------------------------------------------------------------
# Detection targets (device)
# ---------------------------------------------------------------------------

class DetectionTargets(NamedTuple):
    rois: jnp.ndarray          # [R, 6] normalized; positives first
    roi_valid: jnp.ndarray     # [R] bool
    class_ids: jnp.ndarray     # [R] int32 (1 = organ FG, 0 = BG/pad)
    deltas: jnp.ndarray        # [R, 6] / bbox_std (positives only)
    pos_rois: jnp.ndarray      # [P, 6] normalized positive subset
    pos_valid: jnp.ndarray     # [P] bool
    masks: jnp.ndarray         # [P, mD, mH, mW, C] one-hot GT crops


def _masked_random_topk(key, candidate: jnp.ndarray, k: int):
    """Uniformly sample up to k True positions; returns (idx [k], ok [k]).
    k may exceed the candidate count (configs with ROI capacity above the
    proposal count); the tail pads invalid."""
    keff = min(k, candidate.shape[0])
    score = jnp.where(candidate, jax.random.uniform(key, candidate.shape), -1.0)
    top, idx = jax.lax.top_k(score, keff)
    ok = top >= 0.0
    if keff < k:
        idx = jnp.concatenate([idx, jnp.zeros(k - keff, idx.dtype)])
        ok = jnp.concatenate([ok, jnp.zeros(k - keff, bool)])
    return idx, ok


def detection_targets(key, proposals: jnp.ndarray, proposal_valid: jnp.ndarray,
                      gt_box_norm: jnp.ndarray, labels: jnp.ndarray,
                      cfg: Config) -> DetectionTargets:
    """Subsample proposals into training ROIs (reference model.py:414-563).

    proposals: [N, 6] normalized (zero-padded); gt_box_norm: [6]; labels:
    [D, H, W] int label volume for on-device GT mask crops.

    The reference computes IoU against NUM_CLASSES-1 *identical* copies of
    the whole-organ box (model.py:1076) and argmax-assigns every positive to
    the first copy, so positive class id is always the first GT class (1) --
    we use the single box directly.
    """
    k_pos, k_neg = jax.random.split(key)
    p_cap = cfg.num_positive_rois
    r_cap = cfg.train_rois_per_image
    n_cap = r_cap - p_cap

    iou = pairwise_iou(proposals, gt_box_norm[None, :])[:, 0]
    is_pos = proposal_valid & (iou >= cfg.detection_target_iou)
    is_neg = proposal_valid & (iou < cfg.detection_target_iou)

    pos_idx, pos_ok = _masked_random_topk(k_pos, is_pos, p_cap)
    n_pos = jnp.sum(pos_ok)

    # negative quota: int(pos / ratio - pos), zero when no positives
    # (model.py:501-513)
    quota = jnp.where(
        n_pos > 0,
        (n_pos.astype(jnp.float32) / cfg.roi_positive_ratio).astype(jnp.int32)
        - n_pos, 0)
    neg_idx, neg_avail = _masked_random_topk(k_neg, is_neg, n_cap)
    neg_ok = neg_avail & (jnp.arange(n_cap) < quota)

    pos_rois = jnp.where(pos_ok[:, None], proposals[pos_idx], 0.0)
    neg_rois = jnp.where(neg_ok[:, None], proposals[neg_idx], 0.0)
    rois = jnp.concatenate([pos_rois, neg_rois], axis=0)
    roi_valid = jnp.concatenate([pos_ok, neg_ok])
    class_ids = jnp.concatenate(
        [pos_ok.astype(jnp.int32), jnp.zeros(n_cap, jnp.int32)])

    deltas = box_refinement(pos_rois, gt_box_norm[None, :].repeat(p_cap, 0))
    deltas = deltas / jnp.asarray(cfg.bbox_std, jnp.float32)
    deltas = jnp.where(pos_ok[:, None], deltas, 0.0)
    deltas = jnp.concatenate([deltas, jnp.zeros((n_cap, 6), jnp.float32)])

    masks = jax.vmap(
        lambda b: one_hot_crop(labels, b, cfg.mask_shape, cfg.num_classes)
    )(pos_rois)
    masks = jnp.where(pos_ok[:, None, None, None, None], masks, 0.0)

    return DetectionTargets(
        rois=jax.lax.stop_gradient(rois),
        roi_valid=roi_valid,
        class_ids=class_ids,
        deltas=jax.lax.stop_gradient(deltas),
        pos_rois=jax.lax.stop_gradient(pos_rois),
        pos_valid=pos_ok,
        masks=jax.lax.stop_gradient(masks),
    )
