"""Spatially-sharded model execution via GSPMD sharding annotations.

The volumetric analogue of sequence parallelism (SURVEY.md s2.4): the mask
crop (or molded volume) is sharded along D across the 'space' mesh axis;
XLA sharding propagation inserts the halo exchanges the 3D convolutions
need.  These tests pin the capability: sharded execution must be
numerically identical (up to reduction order) to dense execution.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cfun_tpu.models.unet3d import apply_unet, init_unet
from cfun_tpu.models import cfun
from cfun_tpu.config import tiny_config


def _mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("space",))


def test_unet_spatially_sharded_matches_dense():
    mesh = _mesh(4)
    params = init_unet(jax.random.PRNGKey(0), 1, 4, base=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 32, 16, 16, 1)).astype(np.float32))

    dense = apply_unet(params, x, stage="beginning")

    xs = NamedSharding(mesh, P(None, "space", None, None, None))
    repl = NamedSharding(mesh, P())
    fn = jax.jit(lambda p, v: apply_unet(p, v, stage="beginning"),
                 in_shardings=(repl, xs), out_shardings=xs)
    sharded = fn(jax.device_put(params, repl), jax.device_put(x, xs))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)


def test_trunk_spatially_sharded_matches_dense():
    mesh = _mesh(2)
    cfg = tiny_config()
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(1, *cfg.image_shape, 1))
                      .astype(np.float32))

    dense = cfun.apply_trunk(params, img, cfg)

    xs = NamedSharding(mesh, P(None, None, "space", None, None))  # shard H
    repl = NamedSharding(mesh, P())
    fn = jax.jit(lambda p, v: cfun.apply_trunk(p, v, cfg),
                 in_shardings=(repl, xs))
    sharded = fn(jax.device_put(params, repl), jax.device_put(img, xs))
    np.testing.assert_allclose(np.asarray(sharded.rpn_logits),
                               np.asarray(dense.rpn_logits),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sharded.p2), np.asarray(dense.p2),
                               rtol=2e-4, atol=2e-4)
