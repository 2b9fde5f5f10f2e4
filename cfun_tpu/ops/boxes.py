"""3D box arithmetic as pure jnp functions.

Boxes are ``(z1, y1, x1, z2, y2, x2)`` with the far corner *outside* the box
in voxel coordinates (reference convention, utils.py:122-127).  All functions
are shape-polymorphic over leading dims and contain no data-dependent control
flow, so they trace cleanly under jit/vmap.

Reference semantics reproduced here: IoU (utils.py:50-89, model.py:377-411),
delta application (model.py:155-182), clipping (model.py:185-196), refinement
encoding (utils.py:92-119), 5%-extended GT boxes (model.py:1059-1075).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_volume(boxes: jnp.ndarray) -> jnp.ndarray:
    """Volume of [..., 6] boxes."""
    d = boxes[..., 3] - boxes[..., 0]
    h = boxes[..., 4] - boxes[..., 1]
    w = boxes[..., 5] - boxes[..., 2]
    return d * h * w


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                 eps: float = 1e-6) -> jnp.ndarray:
    """IoU matrix [N, M] between [N, 6] and [M, 6] boxes.

    Matches ``utils.compute_overlaps`` (utils.py:73-89): intersection edges
    clamp at 0, union gets a +eps guard.
    """
    b1 = boxes1[:, None, :]  # [N, 1, 6]
    b2 = boxes2[None, :, :]  # [1, M, 6]
    lo = jnp.maximum(b1[..., :3], b2[..., :3])
    hi = jnp.minimum(b1[..., 3:], b2[..., 3:])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    union = box_volume(boxes1)[:, None] + box_volume(boxes2)[None, :] - inter
    return inter / (union + eps)


def apply_box_deltas(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Apply (dz, dy, dx, log dd, log dh, log dw) refinements (model.py:155-182)."""
    size = boxes[..., 3:] - boxes[..., :3]  # (d, h, w)
    center = boxes[..., :3] + 0.5 * size
    center = center + deltas[..., :3] * size
    size = size * jnp.exp(deltas[..., 3:])
    lo = center - 0.5 * size
    hi = lo + size
    return jnp.concatenate([lo, hi], axis=-1)


def clip_boxes(boxes: jnp.ndarray, window) -> jnp.ndarray:
    """Clamp box corners into ``window`` = (z1, y1, x1, z2, y2, x2)
    (model.py:185-196)."""
    window = jnp.asarray(window, dtype=boxes.dtype)
    lo = jnp.clip(boxes[..., :3], window[:3], window[3:])
    hi = jnp.clip(boxes[..., 3:], window[:3], window[3:])
    return jnp.concatenate([lo, hi], axis=-1)


def box_refinement(boxes: jnp.ndarray, gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """Encode the delta transforming ``boxes`` into ``gt_boxes``
    (utils.py:92-119).  Degenerate (zero-size) boxes are guarded so padded
    rows produce finite garbage that downstream masks discard."""
    size = jnp.maximum(boxes[..., 3:] - boxes[..., :3], 1e-6)
    center = boxes[..., :3] + 0.5 * (boxes[..., 3:] - boxes[..., :3])
    gt_size = jnp.maximum(gt_boxes[..., 3:] - gt_boxes[..., :3], 1e-6)
    gt_center = gt_boxes[..., :3] + 0.5 * (gt_boxes[..., 3:] - gt_boxes[..., :3])
    d_center = (gt_center - center) / size
    d_size = jnp.log(gt_size / size)
    return jnp.concatenate([d_center, d_size], axis=-1)


def extend_box(box: jnp.ndarray, volume_shape, frac: float = 0.05) -> jnp.ndarray:
    """Extend a voxel-coordinate box by ``frac`` of its size per face, floor /
    ceil to integers, clamp to the volume (model.py:1059-1075).

    box: [6] float (z1, y1, x1, z2, y2, x2); volume_shape: (D, H, W).
    """
    size = box[3:] - box[:3]
    lo = jnp.floor(jnp.maximum(box[:3] - frac * size, 0.0))
    limit = jnp.asarray(volume_shape, dtype=box.dtype)
    hi = jnp.ceil(jnp.minimum(box[3:] + frac * size, limit))
    return jnp.concatenate([lo, hi])


def mask_to_bbox(mask: jnp.ndarray) -> jnp.ndarray:
    """Bounding box of the nonzero region of a [D, H, W] mask, far corner
    exclusive (reference ``extract_bboxes``, utils.py:20-47).  Returns zeros
    for an empty mask.  jit-compatible (no data-dependent shapes)."""
    any_z = jnp.any(mask > 0, axis=(1, 2))
    any_y = jnp.any(mask > 0, axis=(0, 2))
    any_x = jnp.any(mask > 0, axis=(0, 1))

    def _first_last(flags):
        n = flags.shape[0]
        idx = jnp.arange(n)
        first = jnp.min(jnp.where(flags, idx, n))
        last = jnp.max(jnp.where(flags, idx, -1))
        return first, last

    z1, z2 = _first_last(any_z)
    y1, y2 = _first_last(any_y)
    x1, x2 = _first_last(any_x)
    nonempty = jnp.any(mask > 0)
    box = jnp.stack([z1, y1, x1, z2 + 1, y2 + 1, x2 + 1]).astype(jnp.float32)
    return jnp.where(nonempty, box, jnp.zeros(6, jnp.float32))


def normalize_boxes(boxes: jnp.ndarray, volume_shape) -> jnp.ndarray:
    """Voxel -> [0, 1] coordinates; ``volume_shape`` = (D, H, W)."""
    d, h, w = volume_shape
    scale = jnp.asarray([d, h, w, d, h, w], dtype=boxes.dtype)
    return boxes / scale


def denormalize_boxes(boxes: jnp.ndarray, volume_shape) -> jnp.ndarray:
    """[0, 1] -> voxel coordinates; ``volume_shape`` = (D, H, W)."""
    d, h, w = volume_shape
    scale = jnp.asarray([d, h, w, d, h, w], dtype=boxes.dtype)
    return boxes * scale
