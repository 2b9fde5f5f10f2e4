"""Gather-based 3D sampling: trilinear / nearest crops, RoIAlign3D, resizes.

Replaces three host-side ops of the reference with static-shape device code:

* RoIAlign3D -- reference loops over boxes in Python slicing with runtime
  coords + ``F.interpolate(mode='trilinear', align_corners=True)``
  (model.py:265-289).  Semantics preserved exactly: the box is denormalized
  to the feature grid, floor/ceil'd to integers, and the crop is resampled
  with align-corners mapping.
* GT-mask crop-resize -- reference crops with truncated-int coords and
  resizes with skimage order=0 (model.py:481-493); that is the half-pixel
  convention ``src = (i + 0.5) * L / P - 0.5`` with nearest rounding.
* mask unmold resize -- ``F.interpolate(align_corners=False)``
  (utils.py:443-460), i.e. the same half-pixel convention, trilinear.

All functions take NDHWC-minus-batch volumes ``[D, H, W, C]`` and vectorize
over boxes with ``vmap``; coordinates are clamped so out-of-range boxes
degrade gracefully instead of raising (reference wraps a try/except,
model.py:281-287).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _flat_gather(vol: jnp.ndarray, zi, yi, xi) -> jnp.ndarray:
    """Gather vol[zi, yi, xi, :] with int index arrays of any shared shape."""
    d, h, w = vol.shape[:3]
    flat = vol.reshape(d * h * w, *vol.shape[3:])
    idx = (zi * h + yi) * w + xi
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
        *idx.shape, *vol.shape[3:]
    )


def _clamp(v, lo, hi):
    return jnp.clip(v, lo, hi)


def trilinear_sample(vol: jnp.ndarray, z, y, x) -> jnp.ndarray:
    """Trilinear sample ``vol [D, H, W, C]`` at float voxel coords (arrays of
    any shared shape); coords clamped to the valid range."""
    d, h, w = vol.shape[:3]
    z = _clamp(z, 0.0, d - 1.0)
    y = _clamp(y, 0.0, h - 1.0)
    x = _clamp(x, 0.0, w - 1.0)
    z0 = jnp.floor(z).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    z1 = jnp.minimum(z0 + 1, d - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fz = (z - z0).astype(vol.dtype)[..., None]
    fy = (y - y0).astype(vol.dtype)[..., None]
    fx = (x - x0).astype(vol.dtype)[..., None]

    c000 = _flat_gather(vol, z0, y0, x0)
    c001 = _flat_gather(vol, z0, y0, x1)
    c010 = _flat_gather(vol, z0, y1, x0)
    c011 = _flat_gather(vol, z0, y1, x1)
    c100 = _flat_gather(vol, z1, y0, x0)
    c101 = _flat_gather(vol, z1, y0, x1)
    c110 = _flat_gather(vol, z1, y1, x0)
    c111 = _flat_gather(vol, z1, y1, x1)

    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def nearest_sample(vol: jnp.ndarray, z, y, x) -> jnp.ndarray:
    """Nearest-neighbor sample at float voxel coords (round-half-up)."""
    d, h, w = vol.shape[:3]
    zi = _clamp(jnp.floor(z + 0.5).astype(jnp.int32), 0, d - 1)
    yi = _clamp(jnp.floor(y + 0.5).astype(jnp.int32), 0, h - 1)
    xi = _clamp(jnp.floor(x + 0.5).astype(jnp.int32), 0, w - 1)
    return _flat_gather(vol, zi, yi, xi)


def _align_corner_coords(lo, hi, out_size: int):
    """Per-axis sample coords for the reference RoIAlign: crop [lo, hi)
    integer bounds, align-corners mapping onto ``out_size`` points."""
    length = jnp.maximum(hi - lo, 1.0)
    step = (length - 1.0) / max(out_size - 1, 1)
    return lo + jnp.arange(out_size, dtype=jnp.float32) * step


def _axis_weights(coords, size: int) -> jnp.ndarray:
    """Linear-interpolation weight matrix [m, size] for clamped float
    coords: row i holds (1-f) at floor(c_i) and f at floor(c_i)+1 (edge
    rows collapse to a single 1).  Identical math to trilinear_sample's
    per-axis lerp, expressed as a matrix so the 3D resample becomes three
    MXU matmuls instead of eight 3D gathers (which XLA lowers to a
    serial-ish gather loop on TPU -- measured 170 ms for ten
    (32,80,80)-from-(256,320,320) crops vs ~5 ms separable)."""
    c = jnp.clip(coords, 0.0, size - 1.0)
    i0 = jnp.floor(c).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, size - 1)
    f = (c - i0.astype(jnp.float32))[:, None]
    return (jax.nn.one_hot(i0, size, dtype=jnp.float32) * (1.0 - f) +
            jax.nn.one_hot(i1, size, dtype=jnp.float32) * f)


def separable_trilinear(vol: jnp.ndarray, zc, yc, xc) -> jnp.ndarray:
    """Trilinear resample of ``vol [D, H, W, C]`` on a separable grid
    (per-axis coord vectors) via three einsum contractions.  Exactly
    trilinear_sample on meshgrid(zc, yc, xc) up to f32 summation order."""
    d, h, w = vol.shape[:3]
    wz = _axis_weights(zc, d)
    wy = _axis_weights(yc, h)
    wx = _axis_weights(xc, w)
    v = vol.astype(jnp.float32)
    out = jnp.einsum("zD,DHWC->zHWC", wz, v)
    out = jnp.einsum("yH,zHWC->zyWC", wy, out)
    out = jnp.einsum("xW,zyWC->zyxC", wx, out)
    return out.astype(vol.dtype)


def crop_resize_align_corners(vol: jnp.ndarray, box_norm: jnp.ndarray,
                              out_shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Reference RoIAlign3D for one normalized box (model.py:265-289).

    box_norm: [6] in [0, 1].  Returns [*out_shape, C].
    """
    d, h, w = vol.shape[:3]
    scale = jnp.asarray([d, h, w, d, h, w], jnp.float32)
    b = box_norm.astype(jnp.float32) * scale
    lo = jnp.floor(b[:3])
    hi = jnp.ceil(b[3:])
    zc = _align_corner_coords(lo[0], hi[0], out_shape[0])
    yc = _align_corner_coords(lo[1], hi[1], out_shape[1])
    xc = _align_corner_coords(lo[2], hi[2], out_shape[2])
    return separable_trilinear(vol, zc, yc, xc)


def roi_align(vol: jnp.ndarray, boxes: jnp.ndarray,
              out_shape: Tuple[int, int, int]) -> jnp.ndarray:
    """RoIAlign3D over [K, 6] normalized boxes -> [K, *out_shape, C]."""
    return jax.vmap(lambda b: crop_resize_align_corners(vol, b, out_shape))(boxes)


def _halfpix_coords(lo, hi, out_size: int):
    """skimage / torch(align_corners=False) mapping: crop [lo, hi) resized to
    ``out_size`` samples at ``lo + (i + 0.5) * L / P - 0.5``."""
    length = hi - lo
    i = jnp.arange(out_size, dtype=jnp.float32)
    return lo + (i + 0.5) * length / out_size - 0.5


def crop_resize_halfpix(vol: jnp.ndarray, box_vox: jnp.ndarray,
                        out_shape: Tuple[int, int, int],
                        method: str = "nearest") -> jnp.ndarray:
    """Crop ``box_vox`` (voxel coords, float; truncated to ints like the
    reference's ``int()`` casts, model.py:483-488) and resize with the
    half-pixel convention.  method: 'nearest' (skimage order=0) or
    'trilinear' (F.interpolate align_corners=False)."""
    lo = jnp.trunc(box_vox[:3]).astype(jnp.float32)
    hi = jnp.trunc(box_vox[3:]).astype(jnp.float32)
    zc = _halfpix_coords(lo[0], hi[0], out_shape[0])
    yc = _halfpix_coords(lo[1], hi[1], out_shape[1])
    xc = _halfpix_coords(lo[2], hi[2], out_shape[2])
    # clamp inside the crop (skimage edge behavior), then into the volume
    zc = _clamp(zc, lo[0], jnp.maximum(hi[0] - 1, lo[0]))
    yc = _clamp(yc, lo[1], jnp.maximum(hi[1] - 1, lo[1]))
    xc = _clamp(xc, lo[2], jnp.maximum(hi[2] - 1, lo[2]))
    if method == "nearest":
        # gathers keep integer label volumes exact (no float weight pass)
        z, y, x = jnp.meshgrid(zc, yc, xc, indexing="ij")
        return nearest_sample(vol, z, y, x)
    return separable_trilinear(vol, zc, yc, xc)


def resize_trilinear(vol: jnp.ndarray,
                     out_shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Whole-volume trilinear resize, half-pixel convention (the device-side
    equivalent of the reference's skimage 'self'-mode mold resize,
    utils.py:389-393)."""
    d, h, w = vol.shape[:3]
    box = jnp.asarray([0.0, 0.0, 0.0, d, h, w], jnp.float32)
    return crop_resize_halfpix(vol, box, out_shape, method="trilinear")


def one_hot_crop(labels: jnp.ndarray, box_norm: jnp.ndarray,
                 out_shape: Tuple[int, int, int],
                 num_classes: int) -> jnp.ndarray:
    """Crop an integer label volume [D, H, W] to a normalized box, nearest-
    resize to ``out_shape``, one-hot to [*out_shape, num_classes]
    (channels LAST: matching the network output layout avoids the padded
    transpose copies XLA emits for channel-minor big tensors on TPU).

    Equivalent to the reference's per-ROI skimage order=0 crop-resize of the
    8-channel per-class GT mask stack (model.py:481-493) -- but the device
    crops the single int8 label volume and one-hots on the fly, so the host
    never materializes or transfers the mask stack.
    """
    d, h, w = labels.shape[:3]
    scale = jnp.asarray([d, h, w, d, h, w], jnp.float32)
    box = box_norm.astype(jnp.float32) * scale
    crop = crop_resize_halfpix(labels[..., None].astype(jnp.int32), box,
                               out_shape, method="nearest")[..., 0]
    return jax.nn.one_hot(crop, num_classes, axis=-1, dtype=jnp.float32)
