"""NMS vs an independent NumPy greedy oracle; anchor layout invariants."""

import numpy as np
import jax.numpy as jnp

from cfun_tpu.ops.anchors import config_anchors, generate_level_anchors
from cfun_tpu.ops.nms import masked_nms, nms_gather
from cfun_tpu.config import heart_config


def _greedy_nms_oracle(boxes, scores, thresh, max_out):
    """Straightforward greedy NMS (descending score, suppress IoU > t)."""
    order = np.argsort(-scores, kind="stable").tolist()
    keep = []
    while order and len(keep) < max_out:
        i = order.pop(0)
        keep.append(i)
        rest = []
        for j in order:
            lo = np.maximum(boxes[i, :3], boxes[j, :3])
            hi = np.minimum(boxes[i, 3:], boxes[j, 3:])
            inter = np.prod(np.maximum(hi - lo, 0))
            vi = np.prod(boxes[i, 3:] - boxes[i, :3])
            vj = np.prod(boxes[j, 3:] - boxes[j, :3])
            iou = inter / (vi + vj - inter + 1e-6)
            if iou <= thresh:
                rest.append(j)
        order = rest
    return keep


def test_masked_nms_matches_oracle():
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = 60
        lo = rng.uniform(0, 40, size=(n, 3))
        sz = rng.uniform(4, 25, size=(n, 3))
        boxes = np.concatenate([lo, lo + sz], axis=1).astype(np.float32)
        scores = rng.uniform(0, 1, size=n).astype(np.float32)
        idx, keep = masked_nms(jnp.asarray(boxes), jnp.asarray(scores),
                               jnp.ones(n, bool), 0.4, 20)
        got = [int(i) for i, k in zip(np.asarray(idx), np.asarray(keep)) if k]
        want = _greedy_nms_oracle(boxes, scores, 0.4, 20)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_masked_nms_respects_validity():
    boxes = jnp.asarray(np.array([[0, 0, 0, 10, 10, 10],
                                  [20, 20, 20, 30, 30, 30]], np.float32))
    scores = jnp.asarray([0.9, 0.8])
    idx, keep = masked_nms(boxes, scores, jnp.asarray([False, True]), 0.5, 2)
    kept = [int(i) for i, k in zip(np.asarray(idx), np.asarray(keep)) if k]
    assert kept == [1]
    out = np.asarray(nms_gather(boxes, idx, keep))
    assert np.all(out[1] == 0)  # padded slot zeroed


def test_anchor_layout_z_major():
    a = generate_level_anchors(8.0, [1.0], (2, 3, 4), 16, 1)
    assert a.shape == (24, 6)
    # centers: index = (z * 3 + y) * 4 + x, center = idx * stride
    c = (a[:, :3] + a[:, 3:]) / 2
    np.testing.assert_allclose(c[0], [0, 0, 0])
    np.testing.assert_allclose(c[1], [0, 0, 16])   # x fastest
    np.testing.assert_allclose(c[4], [0, 16, 0])   # then y
    np.testing.assert_allclose(c[12], [16, 0, 0])  # then z
    # cube anchors of side `scale` (utils.py:485-487)
    np.testing.assert_allclose(a[:, 3:] - a[:, :3], 8.0)


def test_config_anchor_count_matches_heart():
    cfg = heart_config()
    a = config_anchors(cfg)
    # P2 (24, 40, 40) + P3 (12, 20, 20) = 38400 + 4800
    assert a.shape == (43200, 6)
    assert cfg.num_anchors == 43200
