"""Space-to-depth stem conv must equal the plain stride-2 conv exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfun_tpu import nn


@pytest.mark.parametrize("kernel", [(3, 7, 7), (5, 7, 7), (3, 3, 3)])
def test_s2d_equals_plain_conv(kernel):
    rng = np.random.default_rng(0)
    p = nn.conv3d_init(jax.random.PRNGKey(0), kernel, 1, 6)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 24, 1)).astype(np.float32))
    want = nn.conv3d(p, x, stride=2)
    got = nn.conv3d_stem_s2d(p, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv1ch_custom_vjp_matches_plain():
    rng = np.random.default_rng(2)
    p = nn.conv3d_init(jax.random.PRNGKey(2), 3, 1, 5, bias=False)
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 12, 1)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(nn.conv3d_1ch(p, x)), np.asarray(nn.conv3d(p, x)),
        rtol=1e-5, atol=1e-5)

    def loss_custom(q, v):
        return jnp.sum(nn.conv3d_1ch(q, v) ** 2)

    def loss_plain(q, v):
        return jnp.sum(nn.conv3d(q, v) ** 2)

    gw_c, gx_c = jax.grad(loss_custom, argnums=(0, 1))(p, x)
    gw_p, gx_p = jax.grad(loss_plain, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gw_c["w"]), np.asarray(gw_p["w"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_p),
                               rtol=1e-4, atol=1e-4)


def test_s2d_gradients_match():
    rng = np.random.default_rng(1)
    p = nn.conv3d_init(jax.random.PRNGKey(1), (5, 7, 7), 1, 4)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))

    g_plain = jax.grad(lambda q: jnp.sum(nn.conv3d(q, x, stride=2) ** 2))(p)
    g_s2d = jax.grad(lambda q: jnp.sum(nn.conv3d_stem_s2d(q, x) ** 2))(p)
    np.testing.assert_allclose(np.asarray(g_s2d["w"]),
                               np.asarray(g_plain["w"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_s2d["b"]),
                               np.asarray(g_plain["b"]), rtol=1e-4,
                               atol=1e-5)
