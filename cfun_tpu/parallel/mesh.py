"""Mesh construction and the data+spatial-parallel training step.

Design (SURVEY.md s2.4 "TPU-native equivalents"): a 2D logical mesh

    ('data', 'space')

* 'data'  -- batch (whole volumes) sharding: pure data parallelism.  The
  reference emulates batches by gradient accumulation on one GPU
  (model.py:1642-1645); here every mesh row trains a different volume.
* 'space' -- the molded volume's H axis is sharded across chips; XLA GSPMD
  materializes the halo exchanges that 3D convolutions need at shard edges
  over ICI.  This is the volumetric stand-in for sequence/context
  parallelism: it lets one logical step hold volumes / mask crops larger
  than a single chip's HBM.

Parameters and optimizer state stay replicated (the model is ~10M params;
FSDP-style sharding is unnecessary at this width).  Gradients are averaged
over 'data' by the jit'd program itself (mean over the stacked batch +
sharding propagation -> psum over ICI).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cfun_tpu.config import Config
from cfun_tpu.train.step import (TrainBatch, TrainState, apply_update,
                                 batched_train_forward, make_optimizer)


def make_mesh(n_devices: Optional[int] = None,
              space: Optional[int] = None) -> Mesh:
    """Build a ('data', 'space') mesh over the first n devices.

    ``space`` defaults to 2 when the device count is even (so both axes are
    exercised), else 1.  On real TPU slices the (data, space) grid is laid
    out by ``mesh_utils.create_device_mesh`` so the inner 'space' axis (the
    halo-exchange / GSPMD spatial axis, which communicates every conv) rides
    nearest-neighbour ICI links; on CPU meshes a flat reshape is used.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"make_mesh: {n} devices requested but only {len(devices)} "
            f"{devices[0].platform} device(s) are visible. For CPU mesh "
            "testing set JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} "
            "before importing jax (see tests/conftest.py).")
    if space is None:
        space = 2 if n % 2 == 0 and n > 1 else 1
    data, rem = divmod(n, space)
    if rem:
        raise ValueError(
            f"make_mesh: {n} devices do not factor into "
            f"(data={data}, space={space})")
    if devices[0].platform == "tpu":
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_device_mesh((data, space),
                                            devices=devices[:n])
    else:
        arr = np.asarray(devices[:n]).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def put_replicated(tree, sharding: NamedSharding):
    """Place a host pytree fully replicated on a (possibly multi-process)
    mesh.

    ``jax.device_put`` cannot target devices the calling process does not
    address.  On a multi-controller run every process holds the full
    (identical) host value, which *is* the process-local portion of a
    fully-replicated global array, so each leaf is assembled with
    ``jax.make_array_from_process_local_data`` instead.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x), np.shape(x)), tree)


def batch_sharding(mesh: Mesh) -> TrainBatch:
    """Shardings for a stacked TrainBatch (leading axis = volumes).

    image [B, 1, D, H, W, 1]: B over 'data', H over 'space'.
    labels [B, D, H, W]: likewise (crop gathers re-shard as needed).
    Dense anchor targets shard over B only.
    """
    def s(*spec):
        return NamedSharding(mesh, P(*spec))

    return TrainBatch(
        image=s("data", None, None, "space", None, None),
        rpn_match=s("data", None),
        rpn_deltas=s("data", None, None),
        gt_box_norm=s("data", None),
        labels=s("data", None, "space", None),
    )


def aug_batch_sharding(mesh: Mesh):
    """Shardings for a stacked AugTrainBatch (cfg.augment_on_device).

    Volumes shard over 'data' only: the device rotation gathers across the
    full (H, W) plane, so pre-sharding H over 'space' would force an
    all-gather before the first op; the partitioner re-shards the rotated
    result where the conv graph wants it."""
    from cfun_tpu.ops.augment import AugTrainBatch

    def s(*spec):
        return NamedSharding(mesh, P(*spec))

    return AugTrainBatch(image=s("data"), labels=s("data"),
                         angle=s("data"), fill=s("data"))


def stack_batches(batches):
    """Stack per-volume TrainBatch/AugTrainBatch items along a new
    leading axis (preserves the item type)."""
    return type(batches[0])(*(np.stack(x) for x in zip(*batches)))


def make_parallel_train_step(cfg: Config, anchors, mesh: Mesh):
    """(init_state, step) where step consumes a stacked TrainBatch of
    ``mesh.shape['data']`` volumes and performs one psum-mean SGD update."""
    anchors = jnp.asarray(anchors)
    repl = NamedSharding(mesh, P())
    bshard = (aug_batch_sharding(mesh) if cfg.augment_on_device
              else batch_sharding(mesh))

    def init_state(params) -> TrainState:
        # optimizer state is built from the HOST params (zeros_like etc.)
        # so both trees go through the same multi-process-safe placement
        opt = make_optimizer(cfg, params)
        opt_state = opt.init(params)
        return TrainState(put_replicated(params, repl),
                          put_replicated(opt_state, repl),
                          put_replicated(np.zeros((), np.int32), repl))

    def step(state: TrainState, batch: TrainBatch, key):
        (total, parts), grads = jax.value_and_grad(
            batched_train_forward, has_aux=True)(state.params, batch,
                                                 anchors, cfg, key,
                                                 mesh=mesh)
        return apply_update(cfg, state, grads, total, parts)

    step_jit = jax.jit(
        step,
        in_shardings=(repl, bshard, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    return init_state, step_jit
