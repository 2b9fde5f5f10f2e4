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


def test_instance_norm_sharded_matches_dense():
    from cfun_tpu.parallel.halo import instance_norm_sharded

    mesh = _mesh(4)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(2, 16, 4, 4, 6))
                    .astype(np.float32))
    dense = nn.instance_norm(x)
    sharded = jax.jit(jax.shard_map(
        lambda xs: instance_norm_sharded(xs, "space"), mesh=mesh,
        in_specs=P(None, "space", None, None, None),
        out_specs=P(None, "space", None, None, None)))(x)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-5, atol=1e-6)


def test_sharded_unet_matches_dense_both_stages():
    """The ASSEMBLED sharded U-Net (shard_map_unet): ppermute halo convs +
    psum instance norms over 'space' reproduce the dense apply_unet on the
    same crop, for both mask-shape stages (incl. the finetune 2x upscale
    head with its 5^3 conv, halo=2)."""
    from cfun_tpu.models.unet3d import apply_unet, init_unet
    from cfun_tpu.parallel import make_mesh
    from cfun_tpu.parallel.halo import shard_map_unet

    params = init_unet(jax.random.PRNGKey(0), 1, 4, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 32, 1),
                          jnp.float32)
    mesh = make_mesh(8, space=2)
    for stage in ("beginning", "finetune"):
        dense = apply_unet(params, x, stage=stage)
        sharded = jax.jit(
            lambda p, c, s=stage: shard_map_unet(mesh, p, c, stage=s)
        )(params, x)
        assert sharded.shape == dense.shape
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                                   rtol=1e-3, atol=5e-4)


def test_sharded_unet_matches_dense_finetune_depth():
    """Parity at the REAL finetune shard depth (VERDICT r3 #3b): D=192
    over space=2 gives local D=96 -- the actual per-shard plane counts the
    halo exchanges see at every one of the four stride-2 context levels
    (96 -> 48 -> 24 -> 12 local planes).  The 32^3 toy test above cannot
    reach those shard geometries.  H/W and channel width stay small (the
    sharded axis is D only), so this runs in seconds on the CPU mesh."""
    from cfun_tpu.models.unet3d import apply_unet, init_unet
    from cfun_tpu.parallel import make_mesh
    from cfun_tpu.parallel.halo import shard_map_unet

    params = init_unet(jax.random.PRNGKey(3), 1, 4, 2)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 192, 16, 16, 1),
                          jnp.float32)
    mesh = make_mesh(2, space=2)
    dense = apply_unet(params, x, stage="finetune")
    sharded = jax.jit(
        lambda p, c: shard_map_unet(mesh, p, c, stage="finetune")
    )(params, x)
    assert sharded.shape == dense.shape  # (1, 384, 32, 32, 2) upscale head
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-3, atol=5e-4)


def test_sharded_unet_rejects_misaligned_depth():
    import pytest

    from cfun_tpu.models.unet3d import init_unet
    from cfun_tpu.parallel import make_mesh
    from cfun_tpu.parallel.halo import shard_map_unet

    params = init_unet(jax.random.PRNGKey(0), 1, 4, 4)
    x = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    mesh = make_mesh(8, space=4)  # local D = 8, not divisible by 16
    with pytest.raises(ValueError, match="local D"):
        shard_map_unet(mesh, params, x, stage="beginning")


def test_sharded_mask_losses_match_dense():
    """sharded_mask_losses (shard_map over 'space': local CE sums + halo
    Sobel maps + two scalar psums) must equal the dense losses.mask_loss /
    mask_edge_loss on the gathered crops -- values AND logits-gradients,
    for both the heart (magnitude) and LiTS (per-class, weighted-CE)
    forms."""
    from cfun_tpu.config import tiny_config
    from cfun_tpu.parallel import make_mesh
    from cfun_tpu.parallel.halo import sharded_mask_losses
    from cfun_tpu.train import losses as L

    mesh = make_mesh(2, space=2)
    p_rois, d, h, w, c = 2, 16, 8, 8, 3
    rng = np.random.default_rng(7)
    labels = rng.integers(0, c, size=(p_rois, d, h, w))
    masks = jnp.asarray(np.eye(c, dtype=np.float32)[labels])
    logits = jnp.asarray(rng.normal(size=(p_rois, d, h, w, c))
                         .astype(np.float32))
    pos_valid = jnp.asarray([True, False])

    cases = [
        ("heart", tiny_config(), False),
        ("lits", tiny_config().replace(name="lits", stage="finetune",
                                       mask_class_weights=(1.0, 1.0, 100.0)),
         True),
    ]
    for name, cfg, per_class in cases:
        def dense_fn(lg):
            ml = L.mask_loss(masks, pos_valid, lg, cfg)
            el = L.mask_edge_loss(masks, pos_valid,
                                  jax.nn.softmax(lg, axis=-1), cfg,
                                  per_class=per_class)
            return ml + 2.0 * el, (ml, el)

        def shard_fn(lg):
            ml, el = sharded_mask_losses(mesh, masks, pos_valid, lg, cfg,
                                         edge_on=True)
            return ml + 2.0 * el, (ml, el)

        (dv, (dm, de)), dg = jax.value_and_grad(dense_fn, has_aux=True)(
            logits)
        (sv, (sm, se)), sg = jax.value_and_grad(shard_fn, has_aux=True)(
            logits)
        np.testing.assert_allclose(float(sm), float(dm), rtol=1e-5,
                                   err_msg=f"{name} mask loss")
        np.testing.assert_allclose(float(se), float(de), rtol=1e-5,
                                   err_msg=f"{name} edge loss")
        np.testing.assert_allclose(np.asarray(sg), np.asarray(dg),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"{name} grads")


def test_train_step_shard_unet_spatial_matches_gspmd():
    """cfg.shard_unet_spatial swaps the mask branch to the explicit halo
    shard_map inside the full mesh train step (vmap + grad + donation);
    the loss must equal the GSPMD-propagated path."""
    from cfun_tpu.config import tiny_config
    from cfun_tpu.models import cfun
    from cfun_tpu.ops.anchors import config_anchors
    from cfun_tpu.train.loop import make_training_programs
    from tests.test_train_step import _make_batch

    losses = {}
    for flag in (True, False):
        cfg = tiny_config().replace(mask_pool_size=(32, 32, 32),
                                    mask_shape_override=(32, 32, 32),
                                    shard_unet_spatial=flag)
        anchors = config_anchors(cfg)
        params = cfun.init_params(jax.random.PRNGKey(0), cfg)
        prog = make_training_programs(cfg, anchors, (2, 2))
        state = prog.init_state(params)
        batches = [_make_batch(cfg, seed=i) for i in range(2)]
        state, m = prog.step(state, prog.put_batch(batches),
                             jax.random.PRNGKey(3))
        losses[flag] = float(m["total_loss"])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
