"""Async host feeder: NIfTI decode, resample, augment, GT/RPN targets.

The train loop consumes ready tensors; all host work runs in background
threads with a bounded prefetch queue -- the LiTS worker-side pattern the
survey flags as the better pipeline (SURVEY.md s3.4, LiTS_2017/model.py:
1147-1248), replacing the heart variant's in-loop ``load_image_gt``
(model.py:1597-1599).

Heart molding (utils.py:389-393 + model.py:1902-1904): trilinear 'self'
resize to (H, W, D) = (320, 320, 192), nearest for the mask, whole-volume
z-score.  LiTS molding (LiTS_2017/model.py:1154-1233): inverted HU window to
[0, 1], center-pad to PAD_IMAGE_SHAPE, nearest resize to IMAGE_SHAPE.

Augmentation: one rotation angle per epoch (a reference quirk kept for
parity, model.py:1555), applied slice-wise in the (H, W) plane with
nearest-neighbor interpolation (imgaug Affine(order=0), model.py:1022).
"""

from __future__ import annotations

import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from cfun_tpu.config import Config
from cfun_tpu.data.resample import pad_resize_nearest, resize, rotate_hw
from cfun_tpu.train.step import TrainBatch
from cfun_tpu.train.targets import build_rpn_targets


# ---------------------------------------------------------------------------
# molding (shared with inference)
# ---------------------------------------------------------------------------

def np_mask_to_extended_bbox(labels_dhw: np.ndarray, frac: float = 0.05
                             ) -> np.ndarray:
    """Whole-organ bbox of nonzero labels, extended 5% per face
    (model.py:1057-1075).  Returns [6] float (z1, y1, x1, z2, y2, x2).

    Axis-wise ``any`` reductions instead of ``np.nonzero`` -- equivalent
    min/max, without materializing the (~50 MB) index arrays."""
    nz = labels_dhw > 0
    axes = [nz.any(axis=(1, 2)), nz.any(axis=(0, 2)), nz.any(axis=(0, 1))]
    if not bool(axes[0].any()):
        return np.zeros(6, np.float32)
    lo = np.array([int(a.argmax()) for a in axes], np.float64)
    hi = np.array([a.size - int(a[::-1].argmax()) for a in axes],
                  np.float64)
    size = hi - lo
    lo = np.floor(np.maximum(lo - frac * size, 0))
    hi = np.ceil(np.minimum(hi + frac * size, labels_dhw.shape))
    return np.concatenate([lo, hi]).astype(np.float32)


def normalize_intensity(image: np.ndarray, cfg: Config) -> np.ndarray:
    """'zscore' (heart, model.py:1902-1904) or the LiTS inverted HU window
    ``clip((x - 300) / -600, 0, 1)`` (LiTS_2017/model.py:1875-1886,
    MIN/MAX bounds deliberately swapped in the reference)."""
    image = image.astype(np.float32)
    if cfg.intensity_norm == "hu_window":
        mn, mx = cfg.hu_window  # (300, -300): inverted on purpose
        out = (image - mn) / (mx - mn)
        return np.clip(out, 0.0, 1.0)
    std = image.std()
    return (image - image.mean()) / (std if std > 0 else 1.0)


def mold_volume(image_hwd: np.ndarray, cfg: Config,
                mask_hwd: Optional[np.ndarray] = None):
    """Host molding: [H, W, D(, 1)] -> device layout [D, H, W] float32 plus
    window (voxel coords of the real image in the molded volume) and the
    molded mask if given.

    Heart: direct trilinear resize, window = full volume.  LiTS: HU window,
    center-pad to cfg.pad_shape, nearest resize, window from pad offsets.
    """
    if image_hwd.ndim == 4:
        image_hwd = image_hwd[..., 0]
    d_t, h_t, w_t = cfg.image_shape

    if cfg.pad_shape is not None:  # LiTS pad-then-resize molding
        from cfun_tpu import native
        pd, ph, pw = cfg.pad_shape  # (D, H, W) pad target
        h0, w0, d0 = image_hwd.shape
        oh, ow, od = (max(0, (ph - h0) // 2), max(0, (pw - w0) // 2),
                      max(0, (pd - d0) // 2))
        # The pad is virtual everywhere: no (646, 646, 536) f32 buffer
        # (0.9 GB) is ever materialized -- nearest resize never mixes pad
        # and interior voxels, so index arithmetic is bit-identical.
        molded_dhw = None
        if cfg.intensity_norm == "hu_window":
            # fused native pass: HU window + virtual pad + nearest resize
            molded_dhw = native.lits_mold(
                image_hwd, (ph, pw, pd), (d_t, h_t, w_t), (oh, ow, od),
                cfg.hu_window)
        if molded_dhw is None:
            normed = normalize_intensity(image_hwd, cfg)
            molded_dhw = pad_resize_nearest(
                normed, (ph, pw, pd), (h_t, w_t, d_t),
                (oh, ow, od)).transpose(2, 0, 1)
        sh, sw, sd = h_t / ph, w_t / pw, d_t / pd
        window = np.array([od * sd, oh * sh, ow * sw,
                           (od + d0) * sd, (oh + h0) * sh, (ow + w0) * sw],
                          np.float32)
        out_mask = None
        if mask_hwd is not None:
            out_mask = native.pad_nearest_labels(
                mask_hwd, (ph, pw, pd), (d_t, h_t, w_t), (oh, ow, od))
            if out_mask is None:
                out_mask = pad_resize_nearest(
                    mask_hwd.astype(np.int32), (ph, pw, pd),
                    (h_t, w_t, d_t), (oh, ow, od)).transpose(2, 0, 1)
        return molded_dhw, window, out_mask  # [D, H, W]

    # heart 'self' molding
    molded = resize(image_hwd.astype(np.float32), (h_t, w_t, d_t), order=1)
    window = np.array([0, 0, 0, d_t, h_t, w_t], np.float32)
    out_mask = None
    if mask_hwd is not None:
        out_mask = np.rint(
            resize(mask_hwd, (h_t, w_t, d_t), order=0)
        ).astype(np.int32).transpose(2, 0, 1)
    return molded.transpose(2, 0, 1), window, out_mask  # [D, H, W]


# ---------------------------------------------------------------------------
# training feeder
# ---------------------------------------------------------------------------

class TrainFeeder:
    """Bounded-prefetch threaded feeder producing :class:`TrainBatch` items."""

    def __init__(self, dataset, cfg: Config, anchors: np.ndarray,
                 seed: int = 0, num_workers: int = 8, prefetch: int = 8,
                 shard_index: int = 0, num_shards: int = 1):
        """``shard_index``/``num_shards``: per-host data sharding for
        multi-process (pod) training -- every host builds the feeder with
        the SAME seed and its own ``shard_index`` (normally
        ``jax.process_index()``), and the identical RNG streams make the
        hosts' id sequences disjoint slices of one global shuffle."""
        assert 0 <= shard_index < num_shards
        self.dataset = dataset
        self.cfg = cfg
        self.anchors = anchors
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.num_shards = num_shards
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        self._pool = ThreadPoolExecutor(max_workers=num_workers)
        self._lock = threading.Lock()
        # cfg.augment_on_device: molded volumes are angle-independent, so
        # they are cached across epochs (the host cost of an epoch drops
        # to ~zero once the dataset has been molded once)
        self._mold_cache: dict = {}

    def _plan(self, steps: int, epoch_index: Optional[int] = None):
        """Deterministic (ids, seeds) for this host's ``steps`` items: the
        global plan covers steps * num_shards items; each shard takes a
        strided slice.

        With ``epoch_index`` the plan derives from ``(seed, epoch)`` instead
        of the feeder's advancing stream, so a run resumed at epoch N draws
        the same shuffle/target-seed sequence the uninterrupted run would
        (resume determinism; the stream form stays for epoch-less callers)."""
        with self._lock:
            rng = (self._rng if epoch_index is None
                   else np.random.default_rng((self._seed, epoch_index)))
            need = steps * self.num_shards
            ids = []
            while len(ids) < need:
                perm = rng.permutation(self.dataset.num_images)
                ids.extend(perm.tolist())
            ids = ids[:need]
            seeds = rng.integers(0, 2**31 - 1, size=need)
        return (ids[self.shard_index::self.num_shards],
                seeds[self.shard_index::self.num_shards])

    def _unrotated_item(self, image_id: int):
        """AugTrainBatch (ops/augment.py) for cfg.augment_on_device: the
        UNROTATED molded volume + labels on the wire, with ``fill`` = the
        wire-domain value of a raw 0 voxel (what rotation pads with on
        device).  Cached across epochs."""
        from cfun_tpu.ops.augment import AugTrainBatch

        cfg = self.cfg
        if cfg.pad_shape is not None:
            raise ValueError(
                "augment_on_device supports the heart molding only "
                "(rotate-after-resize); LiTS rotates the raw volume "
                "before pad+resize molding")
        with self._lock:
            cached = self._mold_cache.get(image_id)
        if cached is not None:
            return cached

        from cfun_tpu import native
        image = self.dataset.load_image(image_id)  # [H, W, D(, 1)]
        mask = self.dataset.load_mask(image_id)    # [H, W, D]
        img2d = image[..., 0] if image.ndim == 4 else image
        labels = None
        if native.available():
            molded = native.mold_resize(img2d, cfg.image_shape,
                                        normalize=False)
            labels = native.pad_nearest_labels(
                mask, mask.shape[:3], cfg.image_shape, (0, 0, 0))
        if labels is None:
            molded, _window, labels = mold_volume(image, cfg, mask)
        # z-score on host (the device re-normalizes after rotating, which
        # is exact because z-scoring is affine-invariant); fill carries
        # where raw 0 lands under this normalization
        m = float(molded.mean())
        s = float(molded.std()) or 1.0
        y = (molded.astype(np.float32) - m) / s
        fill = np.float32((0.0 - m) / s)

        if cfg.train_wire_int8:
            image_out = (np.clip(y, -5.0, 5.0)
                         * cfg.wire_int8_scale).astype(np.int8)
            fill = np.float32(np.clip(fill, -5.0, 5.0))
        elif cfg.compute_dtype == "bfloat16":
            import ml_dtypes
            image_out = y.astype(ml_dtypes.bfloat16)
        else:
            image_out = y
        d, h, w = cfg.image_shape
        if cfg.num_classes <= 16 and w % 2 == 0:
            from cfun_tpu.train.step import pack_labels_w
            labels_out = pack_labels_w(labels)
        else:
            labels_out = labels.astype(np.int8)
        item = AugTrainBatch(image=image_out[None, ..., None],
                             labels=labels_out,
                             angle=np.float32(0.0), fill=fill)
        if cfg.device_mold_cache:
            # pin the molded volume in HBM: later epochs re-send only the
            # 4-byte angle scalar (jnp.asarray in the batch path is a
            # no-op on committed device arrays)
            import jax
            item = item._replace(image=jax.device_put(item.image),
                                 labels=jax.device_put(item.labels))
        with self._lock:
            self._mold_cache[image_id] = item
        return item

    def make_item(self, image_id: int, angle: float,
                  seed: int) -> TrainBatch:
        cfg = self.cfg
        if cfg.augment_on_device:
            # rotation/GT/RPN targets happen on device; `seed` is unused
            # (the subsample RNG folds off the step key)
            return self._unrotated_item(image_id)._replace(
                angle=np.float32(angle))
        image = self.dataset.load_image(image_id)  # [H, W, D, 1]
        mask = self.dataset.load_mask(image_id)    # [H, W, D]

        image_out = None
        if cfg.pad_shape is None:
            # heart path: mold first (matches dataset __getitem__,
            # model.py:1211-1235), rotate after resize (load_image_gt)
            from cfun_tpu import native
            img2d = image[..., 0] if image.ndim == 4 else image
            if cfg.compute_dtype == "bfloat16":
                if cfg.train_wire_int8:
                    # fused native pass straight to the int8 wire (the
                    # numpy quantize fallback below costs 3 extra
                    # full-volume passes on a 1-core host)
                    molded_q8 = native.heart_train_mold_q8(
                        img2d, cfg.image_shape, angle, 5.0,
                        cfg.wire_int8_scale)
                    if molded_q8 is not None:
                        labels = native.heart_train_labels(
                            mask, cfg.image_shape, angle)
                        image_out = molded_q8[None, ..., None]
                if image_out is None:
                    # one fused native pass: resize+rotate+z-score+bf16
                    molded_bf16 = native.heart_train_mold(
                        img2d, cfg.image_shape, angle)
                    if molded_bf16 is not None:
                        labels = native.heart_train_labels(
                            mask, cfg.image_shape, angle)
                        image_out = molded_bf16[None, ..., None]
            if image_out is None:
                if native.available():
                    molded = native.mold_resize(
                        image[..., 0] if image.ndim == 4 else image,
                        cfg.image_shape, normalize=False)
                    # nearest label mold via the virtual-pad kernel with
                    # pad == source shape (a plain resize)
                    labels = native.pad_nearest_labels(
                        mask, mask.shape[:3], cfg.image_shape, (0, 0, 0))
                else:
                    molded, _window, labels = mold_volume(image, cfg, mask)
                if angle != 0.0:
                    # rotate in the (H, W) plane: device layout is [D, H, W]
                    molded = rotate_hw(molded.transpose(1, 2, 0), angle,
                                       order=0).transpose(2, 0, 1)
                    labels = rotate_hw(labels.transpose(1, 2, 0), angle,
                                       order=0).transpose(2, 0, 1)
                molded = normalize_intensity(molded, cfg)
        else:
            # LiTS path: the reference rotates the raw volume, then
            # pad+resize-molds it (LiTS_2017/model.py:1211-1233); both are
            # nearest gathers, so the fused native kernel composes them
            # into ONE index plan straight to the wire dtype -- no rotated
            # raw copy, no molded f32 volume (round-4 weak #2: the
            # separate full-volume rotation pass made LiTS training
            # feeder-bound at real source sizes)
            from cfun_tpu import native
            img = image[..., 0]
            labels = None
            if (cfg.intensity_norm == "hu_window"
                    and cfg.compute_dtype == "bfloat16"):
                pd_, ph, pw = cfg.pad_shape
                h0, w0, d0 = img.shape
                offs = (max(0, (ph - h0) // 2), max(0, (pw - w0) // 2),
                        max(0, (pd_ - d0) // 2))
                pad_hwd = (ph, pw, pd_)
                if cfg.train_wire_int8:
                    molded_q8 = native.lits_train_mold_q8(
                        img, pad_hwd, cfg.image_shape, offs, angle,
                        cfg.hu_window, 5.0, cfg.wire_int8_scale)
                    if molded_q8 is not None:
                        image_out = molded_q8[None, ..., None]
                if image_out is None:
                    molded_bf16 = native.lits_train_mold(
                        img, pad_hwd, cfg.image_shape, offs, angle,
                        cfg.hu_window)
                    if molded_bf16 is not None:
                        image_out = molded_bf16[None, ..., None]
                if image_out is not None:
                    labels = native.lits_train_labels(
                        mask, pad_hwd, cfg.image_shape, offs, angle)
            if image_out is None or labels is None:
                # two-pass fallback (no native library / f32 configs)
                image_out = None
                if angle != 0.0:
                    img = rotate_hw(img, angle, order=0)
                    mask = rotate_hw(mask, angle, order=0)
                molded, _window, labels = mold_volume(img[..., None], cfg,
                                                      mask)

        gt_box = np_mask_to_extended_bbox(labels)
        rng = np.random.default_rng(seed)
        rpn_match, rpn_deltas = build_rpn_targets(self.anchors, gt_box,
                                                  cfg, rng)
        d, h, w = cfg.image_shape
        norm = np.array([d, h, w, d, h, w], np.float32)
        # wire-lean batch: bf16 image when the graph computes bf16 anyway,
        # two 4-bit labels per byte along W (class count <= 16 in both
        # variants) -- quarters the label upload vs int32
        if image_out is None:
            if cfg.compute_dtype == "bfloat16":
                import ml_dtypes
                image_out = molded[None, ..., None].astype(ml_dtypes.bfloat16)
            else:
                image_out = molded[None, ..., None].astype(np.float32)
        if cfg.train_wire_int8 and image_out.dtype != np.int8:
            # halve the image upload again: clip +-5 (z-scored) / the HU
            # window's [0, 1], quantize; the train step dequantizes on
            # device (train_forward)
            q = np.clip(image_out.astype(np.float32), -5.0, 5.0)
            image_out = (q * cfg.wire_int8_scale).astype(np.int8)
        if cfg.num_classes <= 16 and w % 2 == 0:
            from cfun_tpu.train.step import pack_labels_w
            labels_out = pack_labels_w(labels)
        else:
            labels_out = labels.astype(np.int8)
        return TrainBatch(
            image=image_out,
            rpn_match=rpn_match,
            rpn_deltas=rpn_deltas,
            gt_box_norm=(gt_box / norm).astype(np.float32),
            labels=labels_out,
        )

    def epoch(self, angle: float, steps: int,
              epoch_index: Optional[int] = None) -> Iterator[TrainBatch]:
        """Yield ``steps`` batches, cycling a fresh shuffle of the dataset
        (this host's shard of it when num_shards > 1).  ``epoch_index``
        makes the plan a pure function of (seed, epoch) -- see _plan."""
        ids, seeds = self._plan(steps, epoch_index)

        futures = deque()
        it = iter(zip(ids, seeds))
        emitted = 0
        try:
            for _ in range(min(self.prefetch, steps)):
                i, s = next(it)
                futures.append(
                    (i, self._pool.submit(self.make_item, i, angle, int(s))))
            while futures and emitted < steps:
                image_id, fut = futures.popleft()
                try:
                    item = fut.result()
                except Exception as e:
                    # per-volume fault tolerance: a corrupt/failed volume is
                    # skipped with a replacement drawn from the shuffle
                    print(f"[feeder] volume {image_id} failed ({e!r}); "
                          "substituting")
                    sub = int(self._rng.integers(self.dataset.num_images))
                    sseed = int(self._rng.integers(0, 2**31 - 1))
                    futures.append(
                        (sub, self._pool.submit(self.make_item, sub, angle,
                                                sseed)))
                    continue
                yield item
                emitted += 1
                nxt = next(it, None)
                if nxt is not None:
                    futures.append(
                        (nxt[0], self._pool.submit(self.make_item, nxt[0],
                                                   angle, int(nxt[1]))))
        finally:
            for _i, f in futures:
                f.cancel()

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)
