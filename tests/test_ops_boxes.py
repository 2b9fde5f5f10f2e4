"""Unit tests for 3D box arithmetic against hand-computed cases and
independent NumPy oracles (reference semantics documented in SURVEY.md s2,
C8/C13/C16/C20)."""

import numpy as np
import jax.numpy as jnp

from cfun_tpu.ops import boxes as B


def test_pairwise_iou_hand_case():
    a = jnp.array([[0, 0, 0, 2, 2, 2]], jnp.float32)
    b = jnp.array([[0, 0, 0, 2, 2, 2], [1, 1, 1, 3, 3, 3],
                   [2, 2, 2, 4, 4, 4]], jnp.float32)
    iou = np.asarray(B.pairwise_iou(a, b))[0]
    assert abs(iou[0] - 1.0) < 1e-5
    assert abs(iou[1] - 1.0 / 15.0) < 1e-5  # inter 1, union 8+8-1
    assert iou[2] == 0.0


def test_pairwise_iou_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    lo = rng.uniform(0, 50, size=(40, 3))
    sz = rng.uniform(1, 30, size=(40, 3))
    b1 = np.concatenate([lo, lo + sz], axis=1).astype(np.float32)
    lo = rng.uniform(0, 50, size=(25, 3))
    sz = rng.uniform(1, 30, size=(25, 3))
    b2 = np.concatenate([lo, lo + sz], axis=1).astype(np.float32)

    got = np.asarray(B.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    want = np.zeros((40, 25))
    for i in range(40):
        for j in range(25):
            lo_ = np.maximum(b1[i, :3], b2[j, :3])
            hi_ = np.minimum(b1[i, 3:], b2[j, 3:])
            inter = np.prod(np.maximum(hi_ - lo_, 0))
            v1 = np.prod(b1[i, 3:] - b1[i, :3])
            v2 = np.prod(b2[j, 3:] - b2[j, :3])
            want[i, j] = inter / (v1 + v2 - inter + 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_deltas_roundtrip():
    rng = np.random.default_rng(1)
    lo = rng.uniform(0, 50, size=(16, 3))
    sz = rng.uniform(2, 30, size=(16, 3))
    src = np.concatenate([lo, lo + sz], axis=1).astype(np.float32)
    lo = rng.uniform(0, 50, size=(16, 3))
    sz = rng.uniform(2, 30, size=(16, 3))
    dst = np.concatenate([lo, lo + sz], axis=1).astype(np.float32)
    deltas = B.box_refinement(jnp.asarray(src), jnp.asarray(dst))
    back = B.apply_box_deltas(jnp.asarray(src), deltas)
    np.testing.assert_allclose(np.asarray(back), dst, rtol=1e-4, atol=1e-3)


def test_clip_boxes():
    bx = jnp.array([[-5, -5, -5, 300, 400, 400]], jnp.float32)
    out = np.asarray(B.clip_boxes(bx, [0, 0, 0, 192, 320, 320]))[0]
    np.testing.assert_allclose(out, [0, 0, 0, 192, 320, 320])


def test_mask_to_bbox_and_extend():
    m = np.zeros((10, 12, 14), np.int32)
    m[2:5, 3:9, 4:10] = 1
    box = np.asarray(B.mask_to_bbox(jnp.asarray(m)))
    np.testing.assert_allclose(box, [2, 3, 4, 5, 9, 10])
    ext = np.asarray(B.extend_box(jnp.asarray(box), (10, 12, 14), 0.05))
    # 5% of (3, 6, 6) -> floors/ceils (reference model.py:1059-1075)
    np.testing.assert_allclose(ext, [1, 2, 3, 6, 10, 11])
    # empty mask -> zero box
    empty = np.asarray(B.mask_to_bbox(jnp.zeros((4, 4, 4), jnp.int32)))
    np.testing.assert_allclose(empty, np.zeros(6))


def test_normalize_denormalize():
    bx = jnp.array([[0, 0, 0, 192, 320, 320]], jnp.float32)
    n = B.normalize_boxes(bx, (192, 320, 320))
    np.testing.assert_allclose(np.asarray(n), [[0, 0, 0, 1, 1, 1]])
    d = B.denormalize_boxes(n, (192, 320, 320))
    np.testing.assert_allclose(np.asarray(d), np.asarray(bx))
