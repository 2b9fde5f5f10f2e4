"""The six CFUN losses as masked, fixed-shape jnp functions.

Reference semantics (model.py:804-1000):
  rpn_class   CE over non-neutral anchors
  rpn_bbox    smooth-L1 over positive anchors
  mrcnn_class CE over ROIs with targets binarized to FG/BG (model.py:989)
  mrcnn_bbox  smooth-L1 on positive ROIs, class-specific (binary head)
  mask        voxelwise CE of argmax'd one-hot target vs per-class logits
  mask_edge   3D Sobel gradient-magnitude MSE over positive ROIs x FG classes
              (finetune stage only, model.py:995-998)

Deviation (documented): the reference's heart-variant edge loss computes the
gradient magnitude as sqrt(gx^2 + gy^2 + gx^2) -- the z term repeats x
(model.py:969-972).  We use the correct gx/gy/gz magnitude.  The LiTS
variant's per-class-MSE form is selected by ``edge_per_class=True``.

Empty-selection guards mirror the reference's zero-loss fallbacks
(model.py:871-877 etc.): every masked mean divides by max(count, 1) and an
all-False mask yields 0.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from cfun_tpu.config import Config


def _smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * ax * ax, ax - 0.5)


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _ce_from_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-row cross entropy, integer labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def rpn_class_loss(rpn_match: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """rpn_match: [A] in {-1, 0, 1}; logits: [A, 2]."""
    labels = (rpn_match == 1).astype(jnp.int32)
    return _masked_mean(_ce_from_logits(logits, labels), rpn_match != 0)


def rpn_bbox_loss(rpn_match: jnp.ndarray, target_deltas: jnp.ndarray,
                  pred_deltas: jnp.ndarray) -> jnp.ndarray:
    """Dense per-anchor targets; mean over positive-anchor delta elements."""
    per = _smooth_l1(pred_deltas - target_deltas)
    mask = (rpn_match == 1)[:, None].repeat(6, axis=1)
    return _masked_mean(per, mask)


def mrcnn_class_loss(class_ids: jnp.ndarray, roi_valid: jnp.ndarray,
                     logits: jnp.ndarray) -> jnp.ndarray:
    """class_ids: [R] (FG > 0); logits: [R, 2].  Binarized targets."""
    labels = (class_ids > 0).astype(jnp.int32)
    return _masked_mean(_ce_from_logits(logits, labels), roi_valid)


def mrcnn_bbox_loss(target_deltas: jnp.ndarray, class_ids: jnp.ndarray,
                    roi_valid: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """pred: [R, 2, 6]; positives use the FG row (binary head)."""
    per = _smooth_l1(pred[:, 1, :] - target_deltas)
    mask = (roi_valid & (class_ids > 0))[:, None].repeat(6, axis=1)
    return _masked_mean(per, mask)


def mask_loss(target_onehot: jnp.ndarray, pos_valid: jnp.ndarray,
              logits: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """target_onehot: [P, mD, mH, mW, C] (channels last); logits:
    [P, mD, mH, mW, C].

    Voxelwise CE vs the one-hot target (model.py:909-935); LiTS adds
    per-class weights [1, 1, 100] with torch's weighted-mean semantics
    (sum(w * ce) / sum(w), LiTS_2017/model.py:926-927).

    Written gather-free (logsumexp minus the one-hot dot): per-voxel
    ``take_along_axis`` on 192^3 tensors forces padded transpose layouts
    on TPU (measured 3.4 GB per intermediate at finetune resolution).
    """
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.sum(logits * target_onehot, axis=-1)
    ce = lse - picked  # [P, mD, mH, mW]
    valid = pos_valid[:, None, None, None].astype(ce.dtype)
    if cfg.mask_class_weights is not None:
        wvec = jnp.asarray(cfg.mask_class_weights, ce.dtype)
        w = jnp.sum(target_onehot * wvec, axis=-1) * valid
    else:
        w = jnp.broadcast_to(valid, ce.shape)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def _sobel_kernels() -> np.ndarray:
    """[3, 3, 3, 1, 3] DHWIO kernel computing (gy, gz?, ...) -- three
    orthogonal 3D Sobel derivatives (naming is irrelevant for the
    magnitude), matching the reference stencils (model.py:947-952)."""
    kx = np.array([[[1, 2, 1], [0, 0, 0], [-1, -2, -1]],
                   [[2, 4, 2], [0, 0, 0], [-2, -4, -2]],
                   [[1, 2, 1], [0, 0, 0], [-1, -2, -1]]], np.float32)
    ky = kx.transpose(1, 0, 2)
    kz = kx.transpose(0, 2, 1)
    k = np.stack([kx, ky, kz], axis=-1)  # [3, 3, 3, 3(out)]
    return k[:, :, :, None, :]


_SOBEL = _sobel_kernels()


def _edge_maps(x: jnp.ndarray) -> jnp.ndarray:
    """x: [N, D, H, W] -> gradient components [N, D-2, H-2, W-2, 3]
    (VALID conv, as the reference's unpadded F.conv3d, model.py:967-968)."""
    return jax.lax.conv_general_dilated(
        x[..., None], jnp.asarray(_SOBEL), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)


def mask_edge_loss(target_onehot: jnp.ndarray, pos_valid: jnp.ndarray,
                   mask_probs: jnp.ndarray, cfg: Config,
                   per_class: bool = False) -> jnp.ndarray:
    """Edge-agreement loss over FG classes of positive ROIs.

    target_onehot / mask_probs: [P, m..., C] (channels last).
    Heart form: MSE between gradient magnitudes, summed over the 7 FG
    classes, averaged over ROIs (model.py:938-981).  LiTS form
    (per_class=True): MSE between raw gradient components per class
    (LiTS_2017/model.py:961-974).

    One (ROI, class) pair is processed per ``lax.map`` step, sliced from
    the channels-LAST tensors in place: a channel-first ``moveaxis`` of
    the [P, 192^3, C] stack materializes a 13.5 GB padded copy on TPU
    (measured), and a fully-vectorized form holds every 190^3x3 gradient
    map at once.  The per-pair body is checkpointed so the backward pass
    recomputes the maps.
    """
    p, c = target_onehot.shape[0], target_onehot.shape[-1]

    @jax.checkpoint
    def roi_se(roi):
        # one ROI per step; FG classes ride the conv's batch dim (the
        # channel slice is a plain minor-dim slice, layout-neutral)
        t = jax.lax.dynamic_index_in_dim(target_onehot, roi, 0, False)
        q = jax.lax.dynamic_index_in_dim(mask_probs, roi, 0, False)
        t_fg = jnp.moveaxis(t[..., 1:], -1, 0)   # [C-1, m...] (small tensor)
        q_fg = jnp.moveaxis(q[..., 1:], -1, 0)
        g_true = _edge_maps(t_fg)
        g_pred = _edge_maps(q_fg.astype(jnp.float32))
        if per_class:
            return jnp.sum(jnp.mean((g_pred - g_true) ** 2,
                                    axis=(1, 2, 3, 4)))
        eps = 1e-12  # keeps sqrt' finite on flat regions
        m_true = jnp.sqrt(jnp.sum(g_true ** 2, axis=-1) + eps)
        m_pred = jnp.sqrt(jnp.sum(g_pred ** 2, axis=-1) + eps)
        # sum over classes, mean over voxels (model.py:963-975)
        return jnp.sum(jnp.mean((m_pred - m_true) ** 2, axis=(1, 2, 3)))

    se = jax.lax.map(roi_se, jnp.arange(p))
    pos = pos_valid.astype(se.dtype)
    return jnp.sum(se * pos) / jnp.maximum(jnp.sum(pos), 1.0)


def weighted_total(losses: Dict[str, jnp.ndarray], cfg: Config) -> jnp.ndarray:
    w = cfg.loss_weight_dict
    return sum(w[k] * v for k, v in losses.items())
