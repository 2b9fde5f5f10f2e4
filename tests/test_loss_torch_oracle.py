"""Numerical parity of the loss primitives against torch (CPU) oracles.

torch here plays the role of an independent reference implementation of
smooth-L1, cross-entropy, weighted CE, and 3D Sobel convolution -- the same
primitives the reference builds its losses from (model.py:804-1000)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from cfun_tpu.config import tiny_config
from cfun_tpu.train import losses as L


def test_smooth_l1_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 2, size=(40, 6)).astype(np.float32)
    y = rng.normal(0, 2, size=(40, 6)).astype(np.float32)
    got = float(jnp.mean(L._smooth_l1(jnp.asarray(x - y))))
    want = float(torch.nn.functional.smooth_l1_loss(
        torch.from_numpy(x), torch.from_numpy(y)))
    assert abs(got - want) < 1e-6


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(30, 2)).astype(np.float32)
    labels = rng.integers(0, 2, size=30).astype(np.int64)
    got = float(jnp.mean(L._ce_from_logits(jnp.asarray(logits),
                                           jnp.asarray(labels.astype(np.int32)))))
    want = float(torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels)))
    assert abs(got - want) < 1e-5


def test_weighted_mask_ce_matches_torch():
    """LiTS class-weighted CE: torch's sum(w*ce)/sum(w) semantics
    (LiTS_2017/model.py:924-926)."""
    rng = np.random.default_rng(2)
    p, c, m = 2, 3, 5
    logits = rng.normal(size=(p, m, m, m, c)).astype(np.float32)
    labels = rng.integers(0, c, size=(p, m, m, m))
    onehot = np.zeros((p, m, m, m, c), np.float32)
    for cls in range(c):
        onehot[..., cls][labels == cls] = 1.0
    cfg = tiny_config().replace(num_classes=c,
                                mask_class_weights=(1.0, 1.0, 100.0))
    got = float(L.mask_loss(jnp.asarray(onehot), jnp.ones(p, bool),
                            jnp.asarray(logits), cfg))
    want = float(torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).permute(0, 4, 1, 2, 3),
        torch.from_numpy(labels),
        weight=torch.tensor([1.0, 1.0, 100.0])))
    assert abs(got - want) < 1e-4


def test_sobel_edge_maps_match_torch_conv3d():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 9, 9, 9)).astype(np.float32)
    got = np.asarray(L._edge_maps(jnp.asarray(x)))  # [4, 7, 7, 7, 3]
    kernel = np.ascontiguousarray(
        L._SOBEL[:, :, :, 0, :].transpose(3, 0, 1, 2))[:, None]  # [3,1,3,3,3]
    want = torch.nn.functional.conv3d(
        torch.from_numpy(x)[:, None], torch.from_numpy(kernel)).numpy()
    # torch output [4, 3, 7, 7, 7] -> channels-last
    want = want.transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_edge_loss_matches_manual_torch_pipeline():
    """End-to-end heart edge loss vs a torch reimplementation of the same
    (corrected-magnitude) pipeline."""
    rng = np.random.default_rng(4)
    p, c, m = 2, 3, 9
    target = (rng.random(size=(p, m, m, m, c)) > 0.5).astype(np.float32)
    probs = rng.random(size=(p, m, m, m, c)).astype(np.float32)
    cfg = tiny_config().replace(num_classes=c)
    got = float(L.mask_edge_loss(jnp.asarray(target), jnp.ones(p, bool),
                                 jnp.asarray(probs), cfg))

    kernel = torch.from_numpy(np.ascontiguousarray(
        L._SOBEL[:, :, :, 0, :].transpose(3, 0, 1, 2))[:, None])
    total = 0.0
    for i in range(p):
        per_roi = 0.0
        for j in range(1, c):
            gt = torch.from_numpy(target[i, ..., j])[None, None]
            pr = torch.from_numpy(probs[i, ..., j])[None, None]
            g_gt = torch.nn.functional.conv3d(gt, kernel)
            g_pr = torch.nn.functional.conv3d(pr, kernel)
            m_gt = torch.sqrt((g_gt ** 2).sum(dim=1) + 1e-12)
            m_pr = torch.sqrt((g_pr ** 2).sum(dim=1) + 1e-12)
            per_roi += float(torch.mean((m_pr - m_gt) ** 2))
        total += per_roi
    want = total / p
    assert abs(got - want) < 1e-4
