"""Fixed-capacity greedy 3D NMS, fully on-device.

The reference runs greedy NMS as a NumPy while-loop on the host with
device->host->device round-trips from inside the GPU graph (utils.py:122-157,
call sites model.py:244 and model.py:651).  Here it is a ``lax.scan`` of
``max_out`` pick-the-argmax steps over a precomputed IoU matrix: identical
keep semantics (greedy by descending score, suppress IoU > threshold), but
jit-compatible with static shapes and no host sync.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cfun_tpu.ops.boxes import pairwise_iou

_NEG = -1e30


def masked_nms(boxes: jnp.ndarray,
               scores: jnp.ndarray,
               valid: jnp.ndarray,
               iou_threshold: float,
               max_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over [N, 6] boxes.

    Args:
      boxes: [N, 6] voxel or normalized coordinates.
      scores: [N] ranking scores.
      valid: [N] bool; invalid rows can never be picked.
      iou_threshold: suppress boxes with IoU > threshold vs a picked box
        (strict >, matching utils.py:153).
      max_out: number of picks (static).

    Returns:
      (indices [max_out] int32, keep [max_out] bool).  ``indices`` of
      un-kept slots are arbitrary; gather then mask.
    """
    n = boxes.shape[0]
    live = jnp.where(valid, scores.astype(jnp.float32), _NEG)
    iou = pairwise_iou(boxes.astype(jnp.float32), boxes.astype(jnp.float32))

    def body(live, _):
        i = jnp.argmax(live)
        ok = live[i] > _NEG * 0.5
        suppress = (iou[i] > iou_threshold) | (jnp.arange(n) == i)
        live = jnp.where(ok & suppress, _NEG, live)
        return live, (i.astype(jnp.int32), ok)

    _, (idx, keep) = jax.lax.scan(body, live, None, length=max_out)
    return idx, keep


def nms_gather(boxes: jnp.ndarray,
               idx: jnp.ndarray,
               keep: jnp.ndarray) -> jnp.ndarray:
    """Gather picked boxes, zeroing un-kept slots (zero-padding matches the
    reference's zero-padded proposal tensor, model.py:418-419)."""
    out = boxes[idx]
    return jnp.where(keep[:, None], out, 0.0)
