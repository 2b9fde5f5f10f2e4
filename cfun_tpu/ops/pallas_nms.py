"""Greedy 3D NMS as a single Pallas TPU kernel.

The XLA formulation (ops/nms.py) is a ``lax.scan`` of pick-argmax steps --
semantically right but it compiles to a long sequential HLO loop and
dispatches one iteration per pick.  Here the whole greedy sweep runs inside
one kernel over a precomputed IoU matrix resident in VMEM:

  * candidates are pre-sorted by descending score (the proposal path
    already top-k's, so sorting is free there);
  * one ``fori_loop`` over candidates: a box is kept iff not yet
    suppressed; keeping it ORs its IoU row (> threshold) into the
    suppression bitmap -- exactly greedy NMS on sorted input;
  * the kernel emits a full keep bitmap (vector stores only -- Mosaic
    forbids dynamic lane-offset scalar stores); compaction to the
    fixed-K (indices, mask) contract is a cumsum-scatter in XLA.

VMEM budget: the [N, N] f32 IoU matrix -- 4 MB at N = 1024 (fits easily in
~16 MB); N is padded to a lane multiple.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cfun_tpu.ops.boxes import pairwise_iou

_LANES = 128


def _nms_kernel(iou_row_ref, valid_ref, keep_ref, supp_ref, count_ref, *,
                n: int, k: int, threshold: float):
    """One grid step = one candidate; its IoU row is streamed into VMEM by
    the grid BlockSpec (double-buffered DMA), the suppression bitmap and
    kept counter persist across steps in scratch."""
    i = pl.program_id(0)
    rows = n // _LANES
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    onehot = (row_iota == i // _LANES) & (col_iota == i % _LANES)

    @pl.when(i == 0)
    def _():
        # suppression starts as "invalid" (those rows can never be kept)
        supp_ref[:] = 1.0 - valid_ref[:]
        keep_ref[:] = jnp.zeros_like(keep_ref)
        count_ref[0] = 0

    # scalar read of supp[i] via a masked reduction (keeps the bitmap in
    # VMEM vector tiles; Mosaic forbids dynamic-lane scalar access)
    suppressed = jnp.sum(jnp.where(onehot, supp_ref[:], 0.0)) > 0.5
    kept = jnp.logical_and(jnp.logical_not(suppressed), count_ref[0] < k)

    @pl.when(kept)
    def _():
        row = iou_row_ref[0]  # [rows, LANES]
        supp_ref[:] = jnp.maximum(
            supp_ref[:], (row > threshold).astype(jnp.float32))
        keep_ref[:] = jnp.maximum(keep_ref[:], onehot.astype(jnp.float32))
        count_ref[0] = count_ref[0] + 1


def pallas_sorted_nms(boxes: jnp.ndarray, valid: jnp.ndarray,
                      iou_threshold: float, max_out: int,
                      interpret: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over score-DESCENDING-sorted [N, 6] boxes.

    Returns (indices [max_out] int32 into the sorted array, keep mask
    [max_out] bool) -- same contract as ``masked_nms`` given sorted input.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    tests).
    """
    # outputs are integer indices + a bool mask, so NMS has no tangents to
    # propagate; detaching the inputs makes the kernel safe under
    # jax.grad/jvp (pallas_call has no JVP rule -- the train step's
    # value_and_grad would otherwise assert even though the proposal path
    # stop_gradients its result afterwards)
    boxes = jax.lax.stop_gradient(boxes)
    n_in = boxes.shape[0]
    n = ((n_in + _LANES - 1) // _LANES) * _LANES
    rows = n // _LANES

    iou = pairwise_iou(boxes.astype(jnp.float32), boxes.astype(jnp.float32))
    iou = jnp.pad(iou, ((0, n - n_in), (0, n - n_in)))
    valid_f = jnp.pad(valid.astype(jnp.float32), (0, n - n_in))

    bitmap = pl.pallas_call(
        functools.partial(_nms_kernel, n=n, k=max_out,
                          threshold=float(iou_threshold)),
        grid=(n,),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, rows, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, _LANES), jnp.float32),  # suppression bitmap
            pltpu.SMEM((1,), jnp.int32),              # kept counter
        ],
        interpret=interpret,
    )(iou.reshape(n, rows, _LANES), valid_f.reshape(rows, _LANES))

    # compact the bitmap (kept boxes are in score order already) into the
    # fixed-capacity (indices, mask) contract with a cumsum scatter
    keep_vec = bitmap.reshape(n)[:n_in] > 0.5
    pos = jnp.cumsum(keep_vec.astype(jnp.int32)) - 1
    slot = jnp.where(keep_vec & (pos < max_out), pos, max_out)
    idx = jnp.zeros((max_out,), jnp.int32).at[slot].set(
        jnp.arange(n_in, dtype=jnp.int32), mode="drop")
    total = jnp.minimum(jnp.sum(keep_vec.astype(jnp.int32)), max_out)
    keep = jnp.arange(max_out) < total
    return idx, keep
