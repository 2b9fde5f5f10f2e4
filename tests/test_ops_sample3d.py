"""Sampling ops vs scipy.ndimage oracles and hand cases."""

import numpy as np
import jax.numpy as jnp
from scipy import ndimage

from cfun_tpu.ops import sample3d as S


def test_trilinear_sample_exact_on_grid():
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(5, 6, 7, 2)).astype(np.float32)
    z, y, x = np.meshgrid(np.arange(5.0), np.arange(6.0), np.arange(7.0),
                          indexing="ij")
    out = np.asarray(S.trilinear_sample(jnp.asarray(vol), z, y, x))
    np.testing.assert_allclose(out, vol, rtol=1e-5)


def test_trilinear_sample_matches_map_coordinates():
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(8, 9, 10, 1)).astype(np.float32)
    pts = rng.uniform(0, 7, size=(50, 3)).astype(np.float32)
    got = np.asarray(S.trilinear_sample(
        jnp.asarray(vol), pts[:, 0], pts[:, 1], pts[:, 2]))[:, 0]
    want = ndimage.map_coordinates(vol[..., 0], pts.T, order=1, mode="nearest")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_crop_resize_align_corners_identity():
    # A box covering the whole volume with out_shape == vol shape must be
    # the identity (align-corners maps ends to ends).
    rng = np.random.default_rng(2)
    vol = rng.normal(size=(6, 6, 6, 3)).astype(np.float32)
    box = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.float32)
    out = np.asarray(S.crop_resize_align_corners(jnp.asarray(vol), box, (6, 6, 6)))
    np.testing.assert_allclose(out, vol, rtol=1e-5)


def test_roi_align_linear_field():
    # On a linear field f(z,y,x) = z, trilinear crop-resize is exact:
    # out[i] = z1f + i * (L - 1) / (P - 1).
    d = h = w = 16
    vol = np.broadcast_to(
        np.arange(d, dtype=np.float32)[:, None, None], (d, h, w)
    )[..., None].copy()
    box = jnp.asarray([[0.25, 0.0, 0.0, 0.75, 1.0, 1.0]], jnp.float32)
    out = np.asarray(S.roi_align(jnp.asarray(vol), box, (4, 4, 4)))[0, :, 0, 0, 0]
    z1f, z2c = np.floor(0.25 * d), np.ceil(0.75 * d)  # 4, 12
    want = z1f + np.arange(4) * (z2c - z1f - 1) / 3.0
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_one_hot_crop_matches_manual_nearest():
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 4, size=(12, 12, 12)).astype(np.int32)
    box = np.array([0.2, 0.1, 0.3, 0.8, 0.9, 0.95], np.float32)
    out = np.asarray(S.one_hot_crop(jnp.asarray(labels), jnp.asarray(box),
                                    (6, 6, 6), 4))
    assert out.shape == (6, 6, 6, 4)  # channels last
    # manual: truncate box to ints, half-pixel nearest resize of the crop
    lo = (box[:3] * 12).astype(np.int64)
    hi = (box[3:] * 12).astype(np.int64)
    crop = labels[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
    want = np.zeros((6, 6, 6), np.int64)
    for axis_coords in [None]:
        zs = np.clip(np.floor((np.arange(6) + 0.5) * crop.shape[0] / 6 - 0.5 + 0.5),
                     0, crop.shape[0] - 1).astype(np.int64)
        ys = np.clip(np.floor((np.arange(6) + 0.5) * crop.shape[1] / 6 - 0.5 + 0.5),
                     0, crop.shape[1] - 1).astype(np.int64)
        xs = np.clip(np.floor((np.arange(6) + 0.5) * crop.shape[2] / 6 - 0.5 + 0.5),
                     0, crop.shape[2] - 1).astype(np.int64)
        want = crop[np.ix_(zs, ys, xs)]
    got_labels = np.argmax(out, axis=-1)
    np.testing.assert_array_equal(got_labels, want)
    # one-hot is exact
    assert np.all(out.sum(axis=-1) == 1)


def test_resize_trilinear_matches_separable_numpy():
    rng = np.random.default_rng(4)
    vol = rng.normal(size=(8, 10, 12, 1)).astype(np.float32)
    out = np.asarray(S.resize_trilinear(jnp.asarray(vol), (4, 5, 6)))[..., 0]

    def resize1d(a, n_out, axis):
        n_in = a.shape[axis]
        src = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
        src = np.clip(src, 0, n_in - 1)
        i0 = np.floor(src).astype(np.int64)
        i1 = np.minimum(i0 + 1, n_in - 1)
        f = src - i0
        a0 = np.take(a, i0, axis=axis)
        a1 = np.take(a, i1, axis=axis)
        shape = [1] * a.ndim
        shape[axis] = n_out
        f = f.reshape(shape)
        return a0 * (1 - f) + a1 * f

    want = resize1d(resize1d(resize1d(vol[..., 0], 4, 0), 5, 1), 6, 2)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_separable_trilinear_matches_gather():
    """The einsum (MXU) trilinear resample equals the 8-corner-gather
    formulation on the same separable grid, including edge clamps and
    degenerate boxes."""
    from cfun_tpu.ops.sample3d import (separable_trilinear,
                                       trilinear_sample,
                                       _align_corner_coords)

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(13, 17, 11, 3)).astype(np.float32))
    cases = [
        (0.0, 13.0, 0.0, 17.0, 0.0, 11.0),     # full volume
        (2.0, 9.0, 3.0, 12.0, 1.0, 8.0),       # interior
        (-2.0, 5.0, -1.0, 20.0, 4.0, 15.0),    # out of range (clamps)
        (4.0, 5.0, 6.0, 7.0, 2.0, 3.0),        # single-voxel
        (5.0, 5.0, 6.0, 6.0, 2.0, 2.0),        # degenerate (hi == lo)
    ]
    for z1, z2, y1, y2, x1, x2 in cases:
        zc = _align_corner_coords(jnp.float32(z1), jnp.float32(z2), 6)
        yc = _align_corner_coords(jnp.float32(y1), jnp.float32(y2), 5)
        xc = _align_corner_coords(jnp.float32(x1), jnp.float32(x2), 4)
        z, y, x = jnp.meshgrid(zc, yc, xc, indexing="ij")
        want = np.asarray(trilinear_sample(vol, z, y, x))
        got = np.asarray(separable_trilinear(vol, zc, yc, xc))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
