"""The jit'd training step: forward, six fused losses, SGD update.

One XLA program replaces the reference's per-step host choreography
(load_image_gt on the host, NumPy NMS mid-graph, skimage mask crops,
.cuda()/.cpu() ping-pong -- SURVEY.md s3.1).  The feeder delivers ready
tensors; everything from the backbone to the optimizer update is device code.

Optimizer semantics match the reference (model.py:1536-1545, 1640-1645):
SGD + momentum 0.9, weight decay 1e-4 on all params except norm layers,
global grad-norm clip 5.0 applied before the decay term is added.

Stage/variant gating (SURVEY.md s2.2 L5) is static: heart trains everything;
LiTS 'beginning' trains detection only (mask head skipped), 'together' /
'finetune' freeze backbone+RPN and train the mask branch only -- expressed
as a trainable-mask over the gradient tree rather than requires_grad
mutation.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from cfun_tpu.config import Config
from cfun_tpu.models import cfun
from cfun_tpu.models.heads import apply_classifier, apply_mask_head
from cfun_tpu.models.cfun import propose, pyramid_roi_align
from cfun_tpu.ops.sample3d import roi_align
from cfun_tpu.train import losses as L
from cfun_tpu.train.targets import detection_targets


class TrainBatch(NamedTuple):
    """One molded training example (batch dim 1 on the image)."""
    image: jnp.ndarray       # [1, D, H, W, 1] float32, z-scored
    rpn_match: jnp.ndarray   # [A] int8 in {-1, 0, 1}
    rpn_deltas: jnp.ndarray  # [A, 6] float32 (dense per-anchor targets)
    gt_box_norm: jnp.ndarray  # [6] normalized whole-organ box
    # [D, H, W] int class labels, or [D, H, W/2] uint8 with two 4-bit
    # labels per byte along W (pack_labels_w) -- halves the per-step
    # label upload on link-bound hosts; unpacked on device by shape
    labels: jnp.ndarray


def pack_labels_w(labels: "np.ndarray"):
    """Host-side: [.., W] int labels (< 16) -> [.., W/2] uint8, low nibble
    = left half of W, high nibble = right half (contiguous-slice packing,
    TPU-lane-friendly to invert)."""
    import numpy as np

    half = labels.shape[-1] // 2
    l8 = labels.astype(np.uint8)
    return l8[..., :half] | (l8[..., half:] << 4)


def unpack_labels_w(packed: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse of :func:`pack_labels_w` -> int32 [.., W]."""
    u = packed.astype(jnp.uint8)
    return jnp.concatenate([u & 0xF, u >> 4], axis=-1).astype(jnp.int32)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def stage_flags(cfg: Config) -> Tuple[bool, bool, bool]:
    """(train_detection, train_mask, edge_loss_on) for this config/stage."""
    if cfg.name == "lits":
        if cfg.stage == "beginning":
            return True, False, False
        return False, True, True
    return True, True, cfg.stage == "finetune"


def trainable_mask(params, cfg: Config):
    """Pytree of bools: which leaves receive gradient updates."""
    train_detection, train_mask_branch, _ = stage_flags(cfg)

    def leaf_mask(path, _leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        spath = "/".join(str(k) for k in keys)
        if spath.endswith("/mean") or spath.endswith("/var"):
            return False  # frozen-BN statistics are constants
        top = keys[0]
        if top in ("backbone", "fpn", "rpn", "classifier"):
            return train_detection
        if top == "mask":
            return train_mask_branch
        return True

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def decay_mask(params):
    """Weight decay on everything except norm-layer parameters (the
    reference filters names containing 'bn', model.py:1538-1541)."""
    def leaf_mask(path, _leaf):
        spath = "/".join(str(getattr(p, "key", p)) for p in path)
        return "bn" not in spath and "stem_bn" not in spath

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def make_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_norm),
        optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask(params)),
        optax.sgd(cfg.learning_rate, momentum=cfg.momentum),
    )
    if cfg.grad_accum_steps > 1:
        # the reference emulates batches by accumulating BATCH_SIZE steps
        # before stepping the optimizer (model.py:1642-1645)
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.grad_accum_steps)
    return opt


def train_forward(params, batch: TrainBatch, anchors: jnp.ndarray,
                  cfg: Config, key, mesh=None
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Forward + all losses for one example.  Returns (total, unweighted).

    ``mesh``: when training on a ('data', 'space') mesh with
    cfg.shard_unet_spatial, the mask U-Net runs as the explicit shard_map
    halo graph with crop D sharded over 'space' (parallel/halo.py)."""
    k_tgt, k_drop = jax.random.split(key)
    train_det, train_mask_branch, edge_on = stage_flags(cfg)

    image = batch.image
    if image.dtype == jnp.int8:
        # int8 train wire (cfg.train_wire_int8): dequantize on device
        image = image.astype(jnp.dtype(cfg.compute_dtype)) * (
            1.0 / cfg.wire_int8_scale)
    trunk = cfun.apply_trunk(params, image, cfg,
                             remat=cfg.remat_trunk)
    proposals, valid = propose(trunk.rpn_logits[0], trunk.rpn_deltas[0],
                               anchors, cfg, cfg.post_nms_rois_training)
    proposals = jax.lax.stop_gradient(proposals)

    labels = batch.labels
    if labels.shape[-1] == cfg.image_shape[2] // 2:
        labels = unpack_labels_w(labels)
    tgt = detection_targets(k_tgt, proposals, valid, batch.gt_box_norm,
                            labels, cfg)

    zero = jnp.zeros((), jnp.float32)
    out = {
        "rpn_class_loss": zero, "rpn_bbox_loss": zero,
        "mrcnn_class_loss": zero, "mrcnn_bbox_loss": zero,
        "mrcnn_mask_loss": zero, "mrcnn_mask_edge_loss": zero,
    }

    if train_det:
        out["rpn_class_loss"] = L.rpn_class_loss(batch.rpn_match,
                                                 trunk.rpn_logits[0])
        out["rpn_bbox_loss"] = L.rpn_bbox_loss(batch.rpn_match,
                                               batch.rpn_deltas,
                                               trunk.rpn_deltas[0])
        pooled = pyramid_roi_align(tgt.rois, trunk.p2[0], trunk.p3[0],
                                   cfg.pool_size)
        logits, deltas_pred = apply_classifier(params["classifier"], pooled,
                                               dtype=jnp.dtype(cfg.compute_dtype))
        out["mrcnn_class_loss"] = L.mrcnn_class_loss(tgt.class_ids,
                                                     tgt.roi_valid, logits)
        out["mrcnn_bbox_loss"] = L.mrcnn_bbox_loss(tgt.deltas, tgt.class_ids,
                                                   tgt.roi_valid, deltas_pred)

    if train_mask_branch:
        crops = roi_align(image[0], tgt.pos_rois,
                          tuple(cfg.mask_pool_size))

        shard_spatial = (mesh is not None and cfg.shard_unet_spatial
                         and mesh.shape.get("space", 1) > 1)
        if shard_spatial:
            from cfun_tpu.parallel.halo import shard_map_unet

            def mask_fn(p, c):
                return shard_map_unet(
                    mesh, p["unet"], c, stage=cfg.stage,
                    dropout_rate=cfg.unet_dropout_rate,
                    dropout_key=k_drop,
                    dtype=jnp.dtype(cfg.compute_dtype))
        else:
            def mask_fn(p, c):
                # head_impl/up_impl='explicit': inside fwd+bwd the
                # phase-decomposed forms cost MORE peak HBM than the
                # explicit graph (the head compile-OOMed heart finetune
                # at +1.35 GiB); the phase forms are the inference choice
                # (models/unet3d.py)
                return apply_mask_head(
                    p, c, stage=cfg.stage,
                    dropout_rate=cfg.unet_dropout_rate,
                    dropout_key=k_drop, dtype=jnp.dtype(cfg.compute_dtype),
                    head_impl="explicit", up_impl="explicit")

        if cfg.remat_unet:
            mask_fn = jax.checkpoint(mask_fn)
        mask_logits = mask_fn(params["mask"], crops)
        if shard_spatial:
            # loss side sharded too: the one-hot GT crops, CE intermediates
            # and Sobel edge maps (GiB-scale at finetune 192^3) stay local
            # to each 'space' shard; parity vs the dense losses is pinned
            # by tests/test_halo.py
            from cfun_tpu.parallel.halo import sharded_mask_losses

            mask_l, edge_l = sharded_mask_losses(
                mesh, tgt.masks, tgt.pos_valid, mask_logits, cfg,
                edge_on=edge_on)
            out["mrcnn_mask_loss"] = mask_l
            if edge_on:
                out["mrcnn_mask_edge_loss"] = edge_l
        else:
            out["mrcnn_mask_loss"] = L.mask_loss(tgt.masks, tgt.pos_valid,
                                                 mask_logits, cfg)
            if edge_on:
                mask_probs = jax.nn.softmax(mask_logits, axis=-1)
                out["mrcnn_mask_edge_loss"] = L.mask_edge_loss(
                    tgt.masks, tgt.pos_valid, mask_probs, cfg,
                    per_class=(cfg.name == "lits"))

    return L.weighted_total(out, cfg), out


def train_forward_any(params, batch, anchors: jnp.ndarray, cfg: Config,
                      key, mesh=None):
    """``train_forward`` that also accepts an :class:`AugTrainBatch`
    (cfg.augment_on_device): rotation + re-normalization + RPN targets run
    on device first (ops/augment.py), then the regular forward."""
    from cfun_tpu.ops.augment import AugTrainBatch, device_augment

    if isinstance(batch, AugTrainBatch):
        k_aug, key = jax.random.split(key)
        batch = device_augment(batch, anchors, cfg, k_aug)
    return train_forward(params, batch, anchors, cfg, key, mesh=mesh)


def batched_train_forward(params, batch, anchors, cfg: Config,
                          key, mesh=None):
    """Mean loss over a stacked TrainBatch/AugTrainBatch (leading axis =
    volumes).

    Used by the data-parallel step (cfun_tpu/parallel/mesh.py): under a
    'data'-sharded batch the mean becomes a psum over ICI via GSPMD.
    """
    keys = jax.random.split(key, batch.image.shape[0])
    totals, parts = jax.vmap(
        lambda b, k: train_forward_any(params, b, anchors, cfg, k, mesh=mesh)
    )(batch, keys)
    return jnp.mean(totals), jax.tree.map(jnp.mean, parts)


def apply_update(cfg: Config, state: TrainState, grads, total, parts
                 ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Shared optimizer-update tail: mask frozen subtrees, SGD update,
    metrics dict.  The single source of truth for stage gating semantics
    (used by both the single-device and the mesh-parallel step)."""
    opt = make_optimizer(cfg, state.params)
    tmask = trainable_mask(state.params, cfg)
    grads = jax.tree.map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, tmask)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    # zero grads keep SGD momentum (and hence updates) at exactly zero
    # for masked leaves except through weight decay -- mask the decayed
    # update only for frozen subtrees to avoid drift
    updates = jax.tree.map(
        lambda u, m: u if m else jnp.zeros_like(u), updates, tmask)
    params = optax.apply_updates(state.params, updates)
    metrics = dict(parts, total_loss=total)
    return TrainState(params, opt_state, state.step + 1), metrics


def make_train_step(cfg: Config, anchors):
    """Returns (init_state_fn, jitted step_fn)."""
    anchors = jnp.asarray(anchors)

    def init_state(params) -> TrainState:
        opt = make_optimizer(cfg, params)
        return TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    def step(state: TrainState, batch: TrainBatch, key):
        (total, parts), grads = jax.value_and_grad(
            train_forward_any, has_aux=True)(state.params, batch, anchors,
                                             cfg, key)
        return apply_update(cfg, state, grads, total, parts)

    return init_state, jax.jit(step, donate_argnums=(0,))
