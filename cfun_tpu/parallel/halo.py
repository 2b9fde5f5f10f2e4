"""Explicit halo-exchange convolutions for spatially-sharded volumes.

The volumetric analogue of sequence/context parallelism (SURVEY.md s2.4):
a CT volume (or U-Net mask crop) is split along one spatial axis across the
'space' mesh axis; each 3D convolution needs ``k // 2`` voxels of neighbor
data at shard edges.  Inside ``jax.shard_map`` these helpers exchange halos
with ``lax.ppermute`` (one hop over ICI, zero-filled at the outer edges --
exactly the zero padding a dense conv would see) and then run a VALID conv
on the sharded axis.

The GSPMD path (parallel/mesh.py) gets this for free from sharding
propagation; the explicit form exists for kernels where hand-scheduling the
exchange matters (overlap with compute, odd paddings) and as the building
block for sharded U-Net levels at finetune-resolution masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from cfun_tpu import nn


def exchange_halo(x: jnp.ndarray, axis_name: str, halo: int,
                  axis: int = 1) -> jnp.ndarray:
    """Concatenate ``halo`` planes from both mesh neighbors along ``axis``.

    x: local shard [..., L, ...].  Outer-edge shards receive zeros (the
    dense-conv zero-padding semantics).  Returns [..., L + 2*halo, ...].
    """
    n = lax.axis_size(axis_name)
    if halo == 0 or n == 1:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (halo, halo)
        return jnp.pad(x, pad)
    idx = [slice(None)] * x.ndim

    # data flowing "down" (to the next shard): our top `halo` planes become
    # the neighbor's lower halo
    idx[axis] = slice(x.shape[axis] - halo, None)
    from_left = lax.ppermute(x[tuple(idx)], axis_name,
                             perm=[(i, i + 1) for i in range(n - 1)])
    # data flowing "up": our first `halo` planes
    idx[axis] = slice(0, halo)
    from_right = lax.ppermute(x[tuple(idx)], axis_name,
                              perm=[(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_left, x, from_right], axis=axis)


def instance_norm_sharded(x: jnp.ndarray, axis_name: str,
                          eps: float = 1e-5) -> jnp.ndarray:
    """Instance norm over spatial dims of a shard split along a spatial
    axis: statistics are psum'd over the mesh axis so the result equals
    the dense ``nn.instance_norm`` of the gathered volume.

    Two-pass (mean, then squared deviations) to match the dense kernel's
    numerics, not E[x^2]-E[x]^2.  Stats reduce in f32; the normalization
    applies in the input dtype (see nn.instance_norm).
    """
    n = lax.psum(x.shape[1] * x.shape[2] * x.shape[3], axis_name)
    s = jnp.sum(x, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
    mean = lax.psum(s, axis_name) / n
    diff = x - mean.astype(x.dtype)
    ss = jnp.sum(jnp.square(diff), axis=(1, 2, 3), keepdims=True,
                 dtype=jnp.float32)
    var = lax.psum(ss, axis_name) / n
    scale = lax.rsqrt(var + eps)
    return diff * scale.astype(x.dtype)


def shard_map_unet(mesh, params: nn.Params, crops: jnp.ndarray, *,
                   stage: str, dropout_rate: float = 0.0, dropout_key=None,
                   dtype=jnp.float32, axis: str = "space") -> jnp.ndarray:
    """Run the mask U-Net with its crops' D axis sharded over ``axis``.

    The assembled spatially-sharded U-Net (SURVEY.md s2.4b): one
    ``jax.shard_map`` whose body is the SAME ``apply_unet`` graph with
    ppermute halo convs and psum instance norms -- the capability the halo
    primitives exist for (training/serving mask resolutions beyond one
    chip's HBM, e.g. finetune 192^3+).  Params and the dropout key are
    replicated; other mesh axes (e.g. 'data') stay in GSPMD auto mode so
    this nests inside the data-parallel train step.
    """
    from jax.sharding import PartitionSpec as P

    from cfun_tpu.models.unet3d import apply_unet

    n_shards = mesh.shape[axis]
    local_d = crops.shape[1] // n_shards
    # 4 stride-2 downsamplings: every level's local plane count must stay
    # even, i.e. local D divisible by 16.  True for all real mask shapes at
    # space=2 (96/2, 192/2, 32/2, 64/2); larger space factors need D to
    # keep up.
    if crops.shape[1] % n_shards or local_d % 16:
        raise ValueError(
            f"shard_map_unet: D={crops.shape[1]} over {n_shards} '{axis}' "
            f"shards gives local D={local_d}; need local D % 16 == 0 so "
            "all four stride-2 context levels stay shard-aligned")
    spec = P(None, axis)
    auto = frozenset(mesh.axis_names) - {axis}
    kw = {"axis_names": {axis}} if auto else {}

    if dropout_key is None:
        def body_det(p, c):
            return apply_unet(p, c, stage=stage, dtype=dtype,
                              axis_name=axis)

        return jax.shard_map(body_det, mesh=mesh, in_specs=(P(), spec),
                             out_specs=spec, **kw)(params, crops)

    def body(p, c, k):
        return apply_unet(p, c, stage=stage, dropout_rate=dropout_rate,
                          dropout_key=k, dtype=dtype, axis_name=axis)

    return jax.shard_map(body, mesh=mesh, in_specs=(P(), spec, P()),
                         out_specs=spec, **kw)(params, crops, dropout_key)


def sharded_mask_losses(mesh, masks: jnp.ndarray, pos_valid: jnp.ndarray,
                        mask_logits: jnp.ndarray, cfg, *, edge_on: bool,
                        axis: str = "space"):
    """Mask CE + Sobel-edge losses with crop D sharded over ``axis``.

    Companion to :func:`shard_map_unet` (``cfg.shard_unet_spatial``): with
    the U-Net's activations sharded over 'space', the LOSS side -- the
    one-hot GT crops [P, mD, mH, mW, C], the CE intermediates and the edge
    gradient maps, several GiB at finetune 192^3 -- was the residual
    replicated memory.  Running the loss math inside the same shard_map
    makes every per-voxel tensor local; only two scalar psums cross ICI.
    The in_spec on ``masks`` also lets GSPMD shard the one-hot crop
    *production* (``targets.detection_targets``) backward from this
    consumer.

    Numerical parity with the dense ``losses.mask_loss`` /
    ``losses.mask_edge_loss`` (same masked-mean semantics, reference
    model.py:909-981) is pinned by tests/test_halo.py.  Returns
    (mask_loss, edge_loss) replicated scalars; edge_loss is 0 when
    ``edge_on`` is False.
    """
    from jax.sharding import PartitionSpec as P

    from cfun_tpu.train import losses as L

    n_shards = mesh.shape[axis]
    p, md = masks.shape[0], masks.shape[1]
    local_d = md // n_shards
    if md % n_shards:
        raise ValueError(
            f"sharded_mask_losses: D={md} not divisible by {n_shards} "
            f"'{axis}' shards")
    per_class = cfg.name == "lits"
    wvec = cfg.mask_class_weights

    def body(t, v, q):
        # t, q: [P, local_d, mH, mW, C] local shards; v: [P] replicated
        # ---- voxelwise CE (losses.mask_loss semantics, gather-free) ----
        ql = q.astype(jnp.float32)
        ce = jax.nn.logsumexp(ql, axis=-1) - jnp.sum(ql * t, axis=-1)
        valid = v[:, None, None, None].astype(ce.dtype)
        if wvec is not None:
            w = jnp.sum(t * jnp.asarray(wvec, ce.dtype), axis=-1) * valid
        else:
            w = jnp.broadcast_to(valid, ce.shape)
        num = lax.psum(jnp.sum(ce * w), axis)
        den = lax.psum(jnp.sum(w), axis)
        mask_l = num / jnp.maximum(den, 1.0)

        if not edge_on:
            return mask_l, jnp.zeros((), jnp.float32)

        # ---- Sobel edge loss (losses.mask_edge_loss semantics) ----
        # dense _edge_maps is a VALID conv: global output centers are
        # 1..D-2.  Each shard computes its local_d centers from a 1-plane
        # halo; the two phantom centers (global 0 and D-1, fed zero halos
        # at the outer edges) are masked out of the sums.
        shard_i = lax.axis_index(axis)
        gidx = shard_i * local_d + jnp.arange(local_d)
        dmask = ((gidx >= 1) & (gidx <= md - 2)).astype(jnp.float32)
        nvox = float((md - 2) * (t.shape[2] - 2) * (t.shape[3] - 2))

        @jax.checkpoint
        def roi_se(roi):
            ti = lax.dynamic_index_in_dim(t, roi, 0, False)
            qi = jax.nn.softmax(
                lax.dynamic_index_in_dim(q, roi, 0, False).astype(
                    jnp.float32), axis=-1)
            t_fg = jnp.moveaxis(ti[..., 1:], -1, 0)  # [C-1, local_d, h, w]
            q_fg = jnp.moveaxis(qi[..., 1:], -1, 0)
            g_true = L._edge_maps(
                exchange_halo(t_fg, axis, 1, axis=1))
            g_pred = L._edge_maps(
                exchange_halo(q_fg, axis, 1, axis=1))
            dm = dmask[None, :, None, None, None]
            if per_class:
                return jnp.sum((g_pred - g_true) ** 2 * dm) / (nvox * 3.0)
            eps = 1e-12
            m_true = jnp.sqrt(jnp.sum(g_true ** 2, axis=-1) + eps)
            m_pred = jnp.sqrt(jnp.sum(g_pred ** 2, axis=-1) + eps)
            return jnp.sum((m_pred - m_true) ** 2
                           * dm[..., 0]) / nvox

        se = lax.psum(lax.map(roi_se, jnp.arange(p)), axis)
        pos = v.astype(se.dtype)
        edge_l = jnp.sum(se * pos) / jnp.maximum(jnp.sum(pos), 1.0)
        return mask_l, edge_l

    spec = P(None, axis)
    auto = frozenset(mesh.axis_names) - {axis}
    kw = {"axis_names": {axis}} if auto else {}
    return jax.shard_map(body, mesh=mesh, in_specs=(spec, P(), spec),
                         out_specs=(P(), P()), **kw)(
        masks, pos_valid, mask_logits)


def halo_conv3d(params: nn.Params, x: jnp.ndarray, axis_name: str,
                stride=1, dtype=jnp.float32, shard_axis: int = 1
                ) -> jnp.ndarray:
    """3D conv over an NDHWC shard split along ``shard_axis`` (1 = D).

    Equivalent to the dense ``nn.conv3d(..., padding='torch')`` on the
    gathered volume, for odd kernels and local sizes divisible by the
    stride.
    """
    w = params["w"]
    k = w.shape[shard_axis - 1]  # kernel size along the sharded spatial axis
    halo = (k - 1) // 2
    x = exchange_halo(x, axis_name, halo, axis=shard_axis)
    pads = []
    for ax, ks in enumerate(w.shape[:3]):
        if ax == shard_axis - 1:
            pads.append((0, 0))  # halo already attached
        else:
            pads.append(((ks - 1) // 2, (ks - 1) // 2))
    return nn.conv3d(params, x, stride=stride, padding=tuple(pads),
                     dtype=dtype)
