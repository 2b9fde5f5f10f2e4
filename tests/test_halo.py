"""Halo-exchange sharded convs must equal the dense conv on the gathered
volume (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cfun_tpu import nn
from cfun_tpu.parallel.halo import exchange_halo, halo_conv3d


def _mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("space",))


def test_exchange_halo_matches_zero_padding():
    mesh = _mesh(4)
    x = jnp.arange(8 * 2 * 2, dtype=jnp.float32).reshape(1, 8, 2, 2, 1)

    def local(xs):
        return exchange_halo(xs, "space", halo=1, axis=1)

    out = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=P(None, "space", None, None, None),
        out_specs=P(None, "space", None, None, None)))(x)
    out = np.asarray(out)
    # each local shard had D=2 -> padded to 4; gathered D = 16
    assert out.shape == (1, 16, 2, 2, 1)
    xs = np.asarray(x)
    # shard 0: [zeros, x[0:2], x[2]]
    np.testing.assert_array_equal(out[0, 0], 0)
    np.testing.assert_array_equal(out[0, 1:4], xs[0, 0:3])
    # shard 1: [x[1], x[2:4], x[4]]
    np.testing.assert_array_equal(out[0, 4:8], xs[0, 1:5])
    # last shard upper halo is zeros
    np.testing.assert_array_equal(out[0, 15], 0)


def test_halo_conv_matches_dense():
    mesh = _mesh(4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 8, 8, 3)).astype(np.float32))
    params = nn.conv3d_init(jax.random.PRNGKey(0), 3, 3, 5)

    dense = nn.conv3d(params, x)

    def local(xs):
        return halo_conv3d(params, xs, "space")

    sharded = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=P(None, "space", None, None, None),
        out_specs=P(None, "space", None, None, None)))(x)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_halo_conv_stride2_matches_dense():
    mesh = _mesh(4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 32, 8, 8, 2)).astype(np.float32))
    params = nn.conv3d_init(jax.random.PRNGKey(1), 3, 2, 4)

    dense = nn.conv3d(params, x, stride=2)

    def local(xs):
        return halo_conv3d(params, xs, "space", stride=2)

    sharded = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=P(None, "space", None, None, None),
        out_specs=P(None, "space", None, None, None)))(x)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)
