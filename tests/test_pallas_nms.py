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


def test_pallas_nms_safe_under_grad():
    """The train step differentiates THROUGH propose() (its result is
    stop_gradient'ed only afterwards); pallas_call has no JVP rule, so the
    kernel must detach its own inputs (regression: the nms_backend='auto'
    rollout asserted inside jax.value_and_grad on the chip)."""
    import jax

    boxes, _ = _sorted_candidates(3, n=40)
    valid = np.ones(40, bool)

    def loss(b):
        idx, keep = pallas_sorted_nms(b, jnp.asarray(valid), 0.4, 8,
                                      interpret=True)
        picked = b[idx] * keep[:, None]  # gradient flows via the gather
        return jnp.sum(picked)

    g = jax.grad(loss)(jnp.asarray(boxes))
    assert g.shape == boxes.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_nms_auto_backend_resolution(monkeypatch):
    """'auto' must NOT pick Pallas through the axon tunnel (the plugin
    masquerades as platform 'tpu'; only the env distinguishes it)."""
    import jax

    from cfun_tpu.config import tiny_config
    from cfun_tpu.models.cfun import _use_pallas_nms

    cfg = tiny_config(nms_backend="auto")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    # CPU test platform: auto -> scan
    assert not _use_pallas_nms(cfg)
    # tunneled chip: still scan, even though default_backend says 'tpu'
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert not _use_pallas_nms(cfg)
    monkeypatch.setenv("JAX_PLATFORMS", "")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    assert not _use_pallas_nms(cfg)
    # directly-attached chip: Pallas
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert _use_pallas_nms(cfg)
    # explicit settings always win
    assert _use_pallas_nms(tiny_config(nms_backend="pallas"))
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not _use_pallas_nms(tiny_config(nms_backend="scan"))
