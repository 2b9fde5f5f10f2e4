"""The full CFUN graph: trunk, proposals, ROI pooling, detection, mask.

Replaces the reference's dual-mode ``MaskRCNN.predict`` (model.py:1391-1514)
with pure functions shared by two separately jit'd programs:

  inference:  trunk -> propose -> classifier -> refine_detections -> mask
  training:   trunk -> propose -> detection targets -> classifier + mask

Every formerly-dynamic shape is fixed-capacity with a validity mask; the NMS,
RoIAlign and detection filtering that the reference bounced through host
NumPy (SURVEY.md s3.1-3.2) run on-device inside one XLA program.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cfun_tpu import nn
from cfun_tpu.config import Config
from cfun_tpu.models.fpn import apply_fpn, init_fpn
from cfun_tpu.models.heads import (apply_classifier, apply_mask_head,
                                   init_classifier, init_mask_head)
from cfun_tpu.models.p3d import apply_p3d, init_p3d
from cfun_tpu.models.rpn import apply_rpn, init_rpn
from cfun_tpu.ops.boxes import (apply_box_deltas, clip_boxes,
                                denormalize_boxes, normalize_boxes)
from cfun_tpu.ops.nms import masked_nms, nms_gather
from cfun_tpu.ops.pallas_nms import pallas_sorted_nms
from cfun_tpu.ops.sample3d import roi_align


def _use_pallas_nms(cfg: Config) -> bool:
    if cfg.nms_backend == "pallas":
        return True
    if cfg.nms_backend != "auto":
        return False
    # 'auto' follows the host attachment (benchmarks/nms_timing.py: the
    # kernel is 0.02 ms vs scan's 0.11 ms amortized at K=500, but Pallas
    # grid steps dispatch as separate ~32 ms remote calls on tunneled
    # backends): Pallas on a directly-attached TPU, scan through the axon
    # tunnel and on CPU.  The axon plugin masquerades as platform 'tpu'
    # end to end (default_backend, device.platform, client.platform all
    # say 'tpu'), so the tunnel is only detectable from its environment.
    import os

    import jax

    tunneled = ("axon" in os.environ.get("JAX_PLATFORMS", "").lower()
                or bool(os.environ.get("PALLAS_AXON_POOL_IPS")))
    return jax.default_backend() == "tpu" and not tunneled


def _sorted_nms(boxes, scores_sorted, valid, threshold, max_out, cfg):
    """NMS over score-descending-sorted candidates via the configured
    backend (identical keep semantics)."""
    if _use_pallas_nms(cfg):
        return pallas_sorted_nms(boxes, valid, threshold, max_out)
    return masked_nms(boxes, scores_sorted, valid, threshold, max_out)


def init_params(key, cfg: Config) -> nn.Params:
    kb, kf, kr, kc, km = jax.random.split(key, 5)
    return {
        "backbone": init_p3d(kb, cfg),
        "fpn": init_fpn(kf, cfg),
        "rpn": init_rpn(kr, cfg),
        "classifier": init_classifier(kc, cfg),
        "mask": init_mask_head(km, cfg),
    }


def _dtype(cfg: Config):
    return jnp.dtype(cfg.compute_dtype)


class TrunkOut(NamedTuple):
    p2: jnp.ndarray  # [B, D/8, H/8, W/8, C]
    p3: jnp.ndarray  # [B, D/16, H/16, W/16, C]
    rpn_logits: jnp.ndarray  # [B, A, 2]
    rpn_deltas: jnp.ndarray  # [B, A, 6]


def apply_trunk(params: nn.Params, image: jnp.ndarray, cfg: Config,
                remat: bool = False) -> TrunkOut:
    """image: [B, D, H, W, 1] molded volume."""
    dt = _dtype(cfg)
    c2, c3 = apply_p3d(params["backbone"], image, cfg, dtype=dt, remat=remat)
    p2, p3 = apply_fpn(params["fpn"], c2, c3, dtype=dt)
    l2, d2 = apply_rpn(params["rpn"], p2, cfg.anchor_stride, dtype=dt)
    l3, d3 = apply_rpn(params["rpn"], p3, cfg.anchor_stride, dtype=dt)
    return TrunkOut(p2, p3,
                    jnp.concatenate([l2, l3], axis=1),
                    jnp.concatenate([d2, d3], axis=1))


def propose(rpn_logits: jnp.ndarray, rpn_deltas: jnp.ndarray,
            anchors: jnp.ndarray, cfg: Config,
            proposal_count: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Proposal layer for one image (reference model.py:199-258).

    rpn_logits/deltas: [A, 2] / [A, 6]; anchors: [A, 6] voxel coords.
    Returns (proposals [P, 6] normalized + zero-padded, valid [P] bool).
    """
    scores = jax.nn.softmax(rpn_logits, axis=-1)[:, 1]
    deltas = rpn_deltas * jnp.asarray(cfg.rpn_bbox_std, jnp.float32)

    pre = min(cfg.pre_nms_limit, anchors.shape[0])
    if cfg.approx_topk and pre < anchors.shape[0]:
        top_scores, order = jax.lax.approx_max_k(scores, pre)
    else:
        top_scores, order = jax.lax.top_k(scores, pre)
    boxes = apply_box_deltas(anchors[order], deltas[order])

    d, h, w = cfg.image_shape
    boxes = clip_boxes(boxes, jnp.asarray([0, 0, 0, d, h, w], jnp.float32))

    idx, keep = _sorted_nms(boxes, top_scores, jnp.ones(pre, bool),
                            cfg.rpn_nms_threshold, proposal_count, cfg)
    proposals = nms_gather(boxes, idx, keep)
    return normalize_boxes(proposals, cfg.image_shape), keep


def pyramid_roi_align(boxes: jnp.ndarray, p2: jnp.ndarray, p3: jnp.ndarray,
                      pool_size, chunk: int = 8) -> jnp.ndarray:
    """FPN-level-assigned RoIAlign (reference model.py:292-370).

    boxes: [K, 6] normalized; p2/p3: [D, H, W, C] (batch dim stripped).
    Each box is pooled from both levels and the result selected by the FPN
    assignment rule ``level = clamp(round(4 + log2(dhw)/3), 2, 3)``.

    Boxes are processed in ``chunk``-sized groups under ``lax.map``: the
    backward pass of each gather is a scatter-add into a feature-grad
    buffer, and a fully-vmapped formulation materializes one such buffer
    PER BOX per trilinear corner (tens of GB at LiTS sizes).  The map
    accumulates across chunks into a single carry instead, bounding the
    peak at `chunk` buffers.
    """
    k = boxes.shape[0]
    pad = (-k) % chunk
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))

    def pool_chunk(bc):
        size = jnp.maximum(bc[:, 3:] - bc[:, :3], 1e-9)
        vol = jnp.prod(size, axis=-1)
        level = jnp.clip(jnp.round(4.0 + jnp.log2(vol) / 3.0), 2, 3)
        pooled2 = roi_align(p2, bc, tuple(pool_size))
        pooled3 = roi_align(p3, bc, tuple(pool_size))
        sel = (level == 2)[:, None, None, None, None]
        return jnp.where(sel, pooled2, pooled3)

    out = jax.lax.map(pool_chunk, boxes_p.reshape(-1, chunk, 6))
    return out.reshape(-1, *out.shape[2:])[:k]


def refine_detections(rois: jnp.ndarray, roi_valid: jnp.ndarray,
                      probs: jnp.ndarray, deltas: jnp.ndarray,
                      window, cfg: Config) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Detection layer (reference model.py:584-676), fixed capacity.

    rois: [K, 6] normalized; probs: [K, 2]; deltas: [K, 2, 6];
    window: (z1, y1, x1, z2, y2, x2) voxel coords of the un-padded image.
    Returns (detections [Dmax, 8] = (box, class_id, score) in voxel coords,
    keep [Dmax] bool).  Padded slots have class_id 0 (the reference's
    stop marker, model.py:1827-1829).
    """
    class_ids = jnp.argmax(probs, axis=-1)
    scores = jnp.take_along_axis(probs, class_ids[:, None], axis=1)[:, 0]
    sel_deltas = jnp.take_along_axis(
        deltas, class_ids[:, None, None].repeat(6, -1), axis=1)[:, 0]
    # the reference scales with RPN_BBOX_STD_DEV here (model.py:610)
    refined = apply_box_deltas(rois, sel_deltas *
                               jnp.asarray(cfg.rpn_bbox_std, jnp.float32))
    refined = denormalize_boxes(refined, cfg.image_shape)
    refined = clip_boxes(refined, window)
    refined = jnp.round(refined)

    keep = roi_valid & (class_ids > 0) & (scores >= cfg.detection_min_confidence)
    # Per-class NMS: the classifier head is binary (model.py:1290-1291), so
    # the only FG class is 1 and one masked NMS pass covers it.  Sort by
    # score first (few candidates) so both NMS backends see sorted input.
    sorted_scores, order = jax.lax.top_k(scores, scores.shape[0])
    idx_s, kept = _sorted_nms(refined[order], sorted_scores, keep[order],
                              cfg.detection_nms_threshold,
                              cfg.detection_max_instances, cfg)
    idx = order[idx_s]
    det_boxes = nms_gather(refined, idx, kept)
    det = jnp.concatenate(
        [det_boxes,
         jnp.where(kept, class_ids[idx], 0)[:, None].astype(jnp.float32),
         jnp.where(kept, scores[idx], 0.0)[:, None]], axis=1)
    return det, kept


WIRE_INT8_SCALE = 25.4  # default Config.wire_int8_scale (+-5 sigma z-score)


def uses_overlap_paste(cfg: Config) -> bool:
    """Fast-path unmold variant: the device overlap-tile paste emits ONE
    molded label volume.  Always for LiTS (reference overlap averaging,
    LiTS_2017/utils.py:383-408); for other configs whenever more than one
    instance can be detected (the reference heart path pins 1 instance,
    heart_main.py:416 -- multi-instance heart has no reference counterpart
    and adopts the LiTS averaging semantics, see PARITY.md)."""
    return cfg.fast_unmold and (cfg.name == "lits"
                                or cfg.detection_max_instances > 1)


def overlap_paste_labels(mask_probs: jnp.ndarray, detections: jnp.ndarray,
                         valid: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Device-side overlap-tile mask unmold (LiTS_2017/utils.py:383-408).

    Every valid detection's probability stack is trilinearly resized into
    its box of the molded volume (``jax.image.scale_and_translate`` with
    the same half-pixel convention as the reference's resize -- verified
    to 5e-7), overlapping voxels are averaged by hit count, and the argmax
    labels come back as int8.  This replaces fetching the
    [N, mask..., C] float probability stack over the wire with one packed
    int8 label volume; the only deviation from the reference is that the
    paste happens in molded coordinates (the host nearest-maps back to the
    original geometry) -- pinned by tests/test_detector.py.

    mask_probs: [N, md, mh, mw, C]; detections: [N, 8] molded voxel boxes.
    Returns [D, H, W] int8 labels.
    """
    d, h, w = cfg.image_shape
    n, md, mh, mw, c = mask_probs.shape
    zi = jnp.arange(d, dtype=jnp.float32)
    yi = jnp.arange(h, dtype=jnp.float32)
    xi = jnp.arange(w, dtype=jnp.float32)

    def body(i, carry):
        acc, cnt = carry
        box = detections[i, :6]
        size = jnp.maximum(box[3:] - box[:3], 1.0)
        scale = size / jnp.asarray([md, mh, mw], jnp.float32)
        resized = jax.image.scale_and_translate(
            mask_probs[i].astype(jnp.float32), (d, h, w, c), (0, 1, 2),
            scale, box[:3], method="trilinear", antialias=False)
        inside = ((zi >= box[0]) & (zi < box[3]))[:, None, None] * \
                 ((yi >= box[1]) & (yi < box[4]))[None, :, None] * \
                 ((xi >= box[2]) & (xi < box[5]))[None, None, :]
        v = inside.astype(jnp.float32) * valid[i].astype(jnp.float32)
        return acc + resized * v[..., None], cnt + v

    acc, cnt = jax.lax.fori_loop(
        0, n, body, (jnp.zeros((d, h, w, c), jnp.float32),
                     jnp.zeros((d, h, w), jnp.float32)))
    probs = acc / (cnt[..., None] + 1e-6)
    return jnp.argmax(jnp.clip(probs, 0.0, 1.0), axis=-1).astype(jnp.int8)


class InferOut(NamedTuple):
    detections: jnp.ndarray  # [Dmax, 8] voxel coords
    det_valid: jnp.ndarray   # [Dmax] bool
    # exact path: [Dmax, mD, mH, mW, C] float16 softmax; fast path: None
    mask_probs: jnp.ndarray | None
    # fast path: int8 argmax labels -- heart: [Dmax, 2mD, 2mH, 2mW]
    # (device-side 2x trilinear upsample first); LiTS: [D, H, W] molded
    # overlap-tile paste.  Exact path: None
    mask_labels: jnp.ndarray | None


def infer_forward(params: nn.Params, image: jnp.ndarray, anchors: jnp.ndarray,
                  window: jnp.ndarray, cfg: Config) -> InferOut:
    """Single-volume inference graph (reference call stack SURVEY.md s3.2).

    image: [1, D, H, W, 1]; window: [6] voxel coords of valid region.
    """
    if cfg.wire_image_dtype == "int8":
        image = image.astype(_dtype(cfg)) * (1.0 / cfg.wire_int8_scale)
    if cfg.device_normalize:
        # Re-z-score on device: z-scoring is affine-invariant, so whatever
        # affine the host quantized with (sampled raw stats on the
        # slab-pipelined path), this equals the reference's molded-volume
        # z-score (model.py:1902-1904) up to int8 rounding.
        x = image.astype(jnp.float32)
        mean = jnp.mean(x)
        var = jnp.maximum(jnp.mean(jnp.square(x)) - jnp.square(mean), 1e-12)
        image = ((x - mean) * jax.lax.rsqrt(var)).astype(_dtype(cfg))
    trunk = apply_trunk(params, image, cfg)
    proposals, valid = propose(trunk.rpn_logits[0], trunk.rpn_deltas[0],
                               anchors, cfg, cfg.post_nms_rois_inference)

    # one chunk: the lax.map chunking only bounds BACKWARD scatter-add
    # buffers; forward-only inference pools all rois in one parallel step
    pooled = pyramid_roi_align(proposals, trunk.p2[0], trunk.p3[0],
                               cfg.pool_size, chunk=proposals.shape[0])
    logits, deltas = apply_classifier(params["classifier"], pooled,
                                      dtype=_dtype(cfg))
    probs = jax.nn.softmax(logits, axis=-1)
    detections, kept = refine_detections(proposals, valid, probs, deltas,
                                         window, cfg)

    det_boxes_norm = normalize_boxes(detections[:, :6], cfg.image_shape)
    crops = roi_align(image[0].astype(jnp.float32), det_boxes_norm,
                      tuple(cfg.mask_pool_size))
    mask_logits = apply_mask_head(params["mask"], crops, stage=cfg.stage,
                                  dtype=_dtype(cfg), fused=cfg.pallas_unet)
    mask_probs = jax.nn.softmax(mask_logits, axis=-1)
    if uses_overlap_paste(cfg):
        # multi-instance overlap-tile unmold on device (molded coords)
        labels = overlap_paste_labels(mask_probs, detections, kept, cfg)
        return InferOut(detections, kept, None, labels)
    if cfg.fast_unmold:
        # 2x trilinear upsample + argmax ON DEVICE: only int8 labels cross
        # the wire; the host pastes with a nearest gather.  At finetune the
        # mask is already 2x, so upsampling is skipped there.
        if cfg.stage != "finetune":
            md, mh, mw, c = mask_probs.shape[1:]
            mask_probs = jax.image.resize(
                mask_probs,
                (mask_probs.shape[0], 2 * md, 2 * mh, 2 * mw, c),
                method="trilinear")
        labels = jnp.argmax(mask_probs, axis=-1).astype(jnp.int8)
        return InferOut(detections, kept, None, labels)
    # exact reference semantics: ship the probability stack (float16 on the
    # wire; argmax downstream is insensitive to the rounding)
    return InferOut(detections, kept, mask_probs.astype(jnp.float16), None)


def pack_fast_output(out: InferOut, bits: int = 4) -> jnp.ndarray:
    """Pack the fast-path outputs into ONE int8 wire array so a single D2H
    fetch (one tunnel RPC) carries everything: detections bitcast to bytes,
    the validity mask, and the label volume packed 2 labels/byte at 4 bits
    (num_classes <= 16, heart's 8) or 4 labels/byte at 2 bits
    (num_classes <= 4, LiTS' 3).  The label volume dominates D2H bytes on
    link-bound hosts."""
    det = jax.lax.bitcast_convert_type(
        out.detections.astype(jnp.float32), jnp.int8).reshape(-1)
    val = out.det_valid.astype(jnp.int8)
    flat = out.mask_labels.reshape(-1)
    # contiguous-slice packing: an even/odd stride-2 pack lane-misaligns
    # on TPU and cost ~60 ms at 192^3
    if bits == 2:
        q = flat.shape[0] // 4
        packed = (flat[:q] | (flat[q:2 * q] << 2) | (flat[2 * q:3 * q] << 4)
                  | (flat[3 * q:] << 6))
    else:
        half = flat.shape[0] // 2
        packed = flat[:half] | (flat[half:] << 4)
    return jnp.concatenate([det, val, packed])


def unpack_fast_output(buf, num_det: int, labels_shape, bits: int = 4):
    """Host-side inverse of :func:`pack_fast_output` (NumPy).

    Returns (detections [N, 8] f32, kept [N] bool, labels int8 reshaped to
    ``labels_shape`` -- [N, mask...] per-detection crops or [D, H, W]
    molded overlap labels)."""
    import numpy as np

    det = buf[:num_det * 32].view(np.float32).reshape(num_det, 8)
    kept = buf[num_det * 32:num_det * 33] != 0
    rest = buf[num_det * 33:].view(np.uint8)
    if bits == 2:
        lab = np.empty(rest.size * 4, np.int8)
        n = rest.size
        lab[:n] = rest & 0x03
        lab[n:2 * n] = (rest >> 2) & 0x03
        lab[2 * n:3 * n] = (rest >> 4) & 0x03
        lab[3 * n:] = rest >> 6
    else:
        lab = np.empty(rest.size * 2, np.int8)
        lab[:rest.size] = rest & 0x0F
        lab[rest.size:] = rest >> 4
    return det, kept, lab.reshape(labels_shape)
