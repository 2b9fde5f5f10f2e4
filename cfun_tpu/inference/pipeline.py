"""The detection pipeline: mold -> jit'd device graph -> unmold.

Replaces ``MaskRCNN.detect`` (model.py:1341-1389) and
``unmold_detections`` (model.py:1812-1864).  The device program (one XLA
executable) covers trunk, proposals + NMS, classifier, detection refinement
+ NMS, raw-image mask crops and the U-Net -- the reference's two CPU NMS
round-trips and per-box Python loops are gone.  Host work is only the
initial resize (separable, ~100 ms) and the final box-sized argmax paste.

Output dict matches the reference contract (model.py:1341-1389):
  rois      [N, (y1, x1, z1, y2, x2, z2)] in original voxel coords
  class_ids [num_classes - 1] (the reference hardcodes arange(1, 8),
            model.py:1864)
  scores    [N]
  mask      [H, W, D] int label volume at original resolution
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from cfun_tpu import native
from cfun_tpu.config import Config
from cfun_tpu.data.feeder import mold_volume, normalize_intensity
from cfun_tpu.data.resample import unmold_mask_labels, unmold_overlap_labels
from cfun_tpu.models import cfun
from cfun_tpu.ops.anchors import config_anchors


class Detector:
    """Stateless jit'd detector over a parameter tree."""

    def __init__(self, cfg: Config, params, donate: bool = False):
        self.cfg = cfg
        self.params = params
        self.anchors = jnp.asarray(config_anchors(cfg))
        self._infer = jax.jit(
            functools.partial(cfun.infer_forward, cfg=cfg))
        self.last_timings: Dict[str, float] = {}

    def warmup(self):
        d, h, w = self.cfg.image_shape
        img = jnp.zeros((1, d, h, w, 1), jnp.bfloat16)
        win = jnp.asarray([0, 0, 0, d, h, w], jnp.float32)
        out = self._infer(self.params, img, self.anchors, win)
        jax.block_until_ready(out)

    def detect(self, image_hwd: np.ndarray,
               timings: Optional[dict] = None) -> Dict[str, np.ndarray]:
        """image_hwd: [H, W, D] or [H, W, D, 1] raw volume."""
        cfg = self.cfg
        t0 = time.perf_counter()
        if cfg.pad_shape is None and native.available():
            if image_hwd.ndim == 4:
                image_hwd = image_hwd[..., 0]
            molded = native.mold_resize(image_hwd, cfg.image_shape,
                                        normalize=True)
            d, h, w = cfg.image_shape
            window = np.array([0, 0, 0, d, h, w], np.float32)
        else:
            molded, window, _ = mold_volume(image_hwd, cfg)
            if cfg.pad_shape is None:
                molded = normalize_intensity(molded, cfg)
        t1 = time.perf_counter()

        # bfloat16 on the wire: the graph computes in bf16 anyway, and the
        # host->device link is the latency bottleneck in tunneled setups
        molded_dev = jnp.asarray(
            molded[None, ..., None].astype(ml_dtypes.bfloat16))
        out = self._infer(self.params, molded_dev,
                          self.anchors, jnp.asarray(window))
        detections = np.asarray(out.detections)
        kept = np.asarray(out.det_valid)
        mask_probs = np.asarray(out.mask_probs).astype(np.float32)
        t2 = time.perf_counter()

        result = self.unmold(detections, kept, mask_probs,
                             image_hwd.shape[:3], window)
        t3 = time.perf_counter()
        self.last_timings = {"mold": t1 - t0, "device": t2 - t1,
                             "unmold": t3 - t2, "total": t3 - t0}
        if timings is not None:
            timings.update(self.last_timings)
        return result

    def unmold(self, detections: np.ndarray, kept: np.ndarray,
               mask_probs: np.ndarray, orig_shape_hwd,
               window: np.ndarray) -> Dict[str, np.ndarray]:
        """Reference unmold semantics (model.py:1812-1864): scale boxes from
        the molded window back to original voxels, drop zero-volume boxes,
        trilinear-resize the first detection's mask stack into its box,
        argmax to labels."""
        cfg = self.cfg
        h0, w0, d0 = orig_shape_hwd[0], orig_shape_hwd[1], orig_shape_hwd[2]
        n = int(kept.sum())
        boxes = detections[:n, :6].astype(np.int64)
        class_ids = detections[:n, 6].astype(np.int64)
        scores = detections[:n, 7]

        win = np.asarray(window, np.float64)
        scales = np.array([d0 / (win[3] - win[0]),
                           h0 / (win[4] - win[1]),
                           w0 / (win[5] - win[2])])
        shifts = win[:3]
        boxes = ((boxes - np.concatenate([shifts, shifts]))
                 * np.concatenate([scales, scales])).astype(np.int64)

        volume = ((boxes[:, 3] - boxes[:, 0]) * (boxes[:, 4] - boxes[:, 1])
                  * (boxes[:, 5] - boxes[:, 2]))
        good = volume > 0
        boxes, class_ids, scores = boxes[good], class_ids[good], scores[good]
        masks = mask_probs[:n][good]

        if boxes.shape[0] > 0:
            boxes = np.clip(boxes, 0, np.array([d0, h0, w0, d0, h0, w0]))
            if cfg.name == "lits":
                # overlap-tile averaging over ALL detections
                # (LiTS_2017/utils.py:383-408)
                full = unmold_overlap_labels(masks, boxes, (d0, h0, w0))
            else:
                # single-box paste (heart, model.py:1856-1858)
                full = native.unmold_argmax(masks[0], boxes[0], (d0, h0, w0))
                if full is None:
                    full = unmold_mask_labels(masks[0], boxes[0], (d0, h0, w0))
        else:
            full = np.zeros((d0, h0, w0), np.int16)

        # (z, y, x) -> (y, x, z) box order; [D, H, W] -> [H, W, D] volume
        rois = boxes[:, [1, 2, 0, 4, 5, 3]]
        return {
            "rois": rois,
            "class_ids": np.arange(1, cfg.num_classes),
            "scores": scores,
            "mask": full.transpose(1, 2, 0),
        }
