"""Golden-shape tests for the model graph on CPU with a tiny config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfun_tpu.config import tiny_config
from cfun_tpu.models import cfun
from cfun_tpu.models.unet3d import apply_unet, init_unet
from cfun_tpu.ops.anchors import config_anchors


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_config()
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_trunk_shapes(tiny):
    cfg, params = tiny
    img = jnp.zeros((1, *cfg.image_shape, 1), jnp.float32)
    out = cfun.apply_trunk(params, img, cfg)
    d, h, w = cfg.image_shape
    assert out.p2.shape == (1, d // 8, h // 8, w // 8, cfg.fpn_channels)
    assert out.p3.shape == (1, d // 16, h // 16, w // 16, cfg.fpn_channels)
    assert out.rpn_logits.shape == (1, cfg.num_anchors, 2)
    assert out.rpn_deltas.shape == (1, cfg.num_anchors, 6)


def test_unet_shapes_both_stages():
    key = jax.random.PRNGKey(1)
    p = init_unet(key, 1, 4, base=4)
    x = jnp.zeros((2, 16, 16, 16, 1), jnp.float32)
    y = apply_unet(p, x, stage="beginning")
    assert y.shape == (2, 16, 16, 16, 4)
    y = apply_unet(p, x, stage="finetune")
    assert y.shape == (2, 32, 32, 32, 4)


def test_unet_dropout_needs_key():
    p = init_unet(jax.random.PRNGKey(2), 1, 3, base=4)
    x = jnp.ones((1, 16, 16, 16, 1), jnp.float32)
    y0 = apply_unet(p, x, stage="beginning")
    y1 = apply_unet(p, x, stage="beginning", dropout_rate=0.6,
                    dropout_key=jax.random.PRNGKey(3))
    assert y0.shape == y1.shape
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_infer_forward_jits_and_is_finite(tiny):
    cfg, params = tiny
    anchors = jnp.asarray(config_anchors(cfg))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, *cfg.image_shape, 1)).astype(np.float32))
    d, h, w = cfg.image_shape
    window = jnp.asarray([0, 0, 0, d, h, w], jnp.float32)

    fwd = jax.jit(cfun.infer_forward, static_argnames=("cfg",))
    out = fwd(params, img, anchors, window, cfg)
    dmax = cfg.detection_max_instances
    assert out.detections.shape == (dmax, 8)
    assert out.mask_probs.shape == (dmax, *cfg.mask_pool_size, cfg.num_classes)
    assert np.isfinite(np.asarray(out.mask_probs)).all()
    assert np.isfinite(np.asarray(out.detections)).all()
    # mask softmax sums to one (bf16 softmax + f16 wire -> loose tolerance)
    np.testing.assert_allclose(
        np.asarray(out.mask_probs.sum(-1), dtype=np.float32), 1.0, rtol=2e-2)
    # padded detections have class 0
    det = np.asarray(out.detections)
    kept = np.asarray(out.det_valid)
    assert np.all(det[~kept, 6] == 0)


def test_upsample2_conv_residual_matches_explicit():
    """The phase-decomposed finetune upscale head (nn.upsample2_conv_residual)
    computes exactly `up + conv5(up)`, up = nearest-2x upsample -- values AND
    both gradients, at both model class counts (LiTS 3, heart 8) and in both
    compute dtypes (reference mask_branch.py:216-218)."""
    from cfun_tpu import nn

    rng = np.random.default_rng(0)
    for cc, shape in ((3, (2, 6, 8, 10)), (8, (1, 4, 6, 6))):
        x = jnp.asarray(rng.normal(size=(*shape, cc)), jnp.float32)
        p = {"w": jnp.asarray(rng.normal(size=(5, 5, 5, cc, cc)),
                              jnp.float32) * 0.1}

        def explicit(w, v, dt=jnp.float32):
            up = nn.upsample_nearest(v)
            return up + nn.conv3d({"w": w}, up, dtype=dt)

        ref = explicit(p["w"], x)
        out = nn.upsample2_conv_residual(p, x)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=1e-5)

        # gradients (the head trains in the finetune stage)
        g_ref = jax.grad(lambda w, v: jnp.sum(jnp.tanh(explicit(w, v))),
                         argnums=(0, 1))(p["w"], x)
        g_new = jax.grad(
            lambda w, v: jnp.sum(jnp.tanh(
                nn.upsample2_conv_residual({"w": w}, v))),
            argnums=(0, 1))(p["w"], x)
        for a, b in zip(g_ref, g_new):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=1e-4)

        # bf16 compute path stays close to the f32 reference
        out_bf = nn.upsample2_conv_residual(p, x, dtype=jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(out_bf, dtype=np.float32), np.asarray(ref),
            atol=0.15, rtol=0.05)

        # host-numpy param trees (checkpoint loads) must work too
        out_np = nn.upsample2_conv_residual(
            {"w": np.asarray(p["w"])}, x)
        np.testing.assert_allclose(np.asarray(out_np), np.asarray(out),
                                   atol=1e-6)


def test_upsample2_conv_matches_explicit():
    """The phase-decomposed decoder up-conv (nn.upsample2_conv) computes
    exactly `conv3(upsample_nearest(x))` -- values AND both gradients, at
    decoder channel pairs (reference mask_branch.py:150-153), with and
    without bias, plus the bf16 path and host-numpy param trees."""
    from cfun_tpu import nn

    rng = np.random.default_rng(1)
    for ci, co, shape in ((4, 8, (2, 5, 6, 7)), (8, 4, (1, 4, 6, 6))):
        x = jnp.asarray(rng.normal(size=(*shape, ci)), jnp.float32)
        p = {"w": jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)),
                              jnp.float32) * 0.1}

        def explicit(w, v, dt=jnp.float32):
            return nn.conv3d({"w": w}, nn.upsample_nearest(v), dtype=dt)

        ref = explicit(p["w"], x)
        out = nn.upsample2_conv(p, x)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=1e-5)

        # gradients (decoder up-convs train in every stage)
        g_ref = jax.grad(lambda w, v: jnp.sum(jnp.tanh(explicit(w, v))),
                         argnums=(0, 1))(p["w"], x)
        g_new = jax.grad(
            lambda w, v: jnp.sum(jnp.tanh(nn.upsample2_conv({"w": w}, v))),
            argnums=(0, 1))(p["w"], x)
        for a, b in zip(g_ref, g_new):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=1e-4)

        # bf16 compute path stays close to the f32 reference
        out_bf = nn.upsample2_conv(p, x, dtype=jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(out_bf, dtype=np.float32), np.asarray(ref),
            atol=0.15, rtol=0.05)

        # host-numpy param trees (checkpoint loads) must work too
        out_np = nn.upsample2_conv({"w": np.asarray(p["w"])}, x)
        np.testing.assert_allclose(np.asarray(out_np), np.asarray(out),
                                   atol=1e-6)

    # bias form (not used by the U-Net's bias-free convs, but part of the
    # layer contract) and the non-3^3 guard
    pb = {"w": jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)), jnp.float32),
          "b": jnp.asarray(rng.normal(size=(6,)), jnp.float32)}
    xb = jnp.asarray(rng.normal(size=(1, 3, 4, 5, 4)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(nn.upsample2_conv(pb, xb)),
        np.asarray(nn.conv3d(pb, nn.upsample_nearest(xb))),
        atol=5e-5, rtol=1e-5)
    with pytest.raises(ValueError):
        nn.upsample2_conv(
            {"w": jnp.zeros((5, 5, 5, 2, 2), jnp.float32)}, xb[..., :2])


def test_unet_up_impl_phase_matches_explicit():
    """apply_unet(up_impl='phase') -- all four decoder up-convs via the
    phase-decomposed nn.upsample2_conv -- equals the explicit
    upsample->conv graph in every stage (fp-reassociation tolerance)."""
    rng = np.random.default_rng(3)
    p = init_unet(jax.random.PRNGKey(5), 1, 3, base=4)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)), jnp.float32)
    for stage in ("beginning", "together", "finetune"):
        ref = apply_unet(p, x, stage=stage)
        got = apply_unet(p, x, stage=stage, up_impl="phase")
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)
