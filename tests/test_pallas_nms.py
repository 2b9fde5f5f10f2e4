"""Pallas NMS kernel vs the XLA masked_nms (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from cfun_tpu.ops.nms import masked_nms
from cfun_tpu.ops.pallas_nms import pallas_sorted_nms


def _sorted_candidates(seed, n=100):
    rng = np.random.default_rng(seed)
    lo = rng.uniform(0, 60, size=(n, 3))
    sz = rng.uniform(5, 30, size=(n, 3))
    boxes = np.concatenate([lo, lo + sz], axis=1).astype(np.float32)
    scores = np.sort(rng.uniform(size=n).astype(np.float32))[::-1].copy()
    return boxes, scores


def test_pallas_nms_matches_scan_nms():
    for seed in range(3):
        boxes, scores = _sorted_candidates(seed)
        valid = np.ones(len(boxes), bool)
        idx_ref, keep_ref = masked_nms(jnp.asarray(boxes),
                                       jnp.asarray(scores),
                                       jnp.asarray(valid), 0.4, 20)
        idx_pl, keep_pl = pallas_sorted_nms(jnp.asarray(boxes),
                                            jnp.asarray(valid), 0.4, 20,
                                            interpret=True)
        want = [int(i) for i, k in zip(np.asarray(idx_ref),
                                       np.asarray(keep_ref)) if k]
        got = [int(i) for i, k in zip(np.asarray(idx_pl),
                                      np.asarray(keep_pl)) if k]
        assert got == want, f"seed {seed}: {got} != {want}"


def test_pallas_nms_validity_and_capacity():
    boxes, scores = _sorted_candidates(7, n=40)
    valid = np.ones(40, bool)
    valid[0] = False  # top-scoring box masked out
    idx, keep = pallas_sorted_nms(jnp.asarray(boxes), jnp.asarray(valid),
                                  0.99, 4, interpret=True)  # no suppression
    got = [int(i) for i, k in zip(np.asarray(idx), np.asarray(keep)) if k]
    assert got == [1, 2, 3, 4]  # capacity 4, skipping the invalid 0
