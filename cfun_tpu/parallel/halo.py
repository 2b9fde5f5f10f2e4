"""Explicit halo-exchange convolutions for spatially-sharded volumes.

The volumetric analogue of sequence/context parallelism (SURVEY.md s2.4):
a CT volume (or U-Net mask crop) is split along one spatial axis across the
'space' mesh axis; each 3D convolution needs ``k // 2`` voxels of neighbor
data at shard edges.  Inside ``jax.shard_map`` these helpers exchange halos
with ``lax.ppermute`` (one hop over ICI, zero-filled at the outer edges --
exactly the zero padding a dense conv would see) and then run a VALID conv
on the sharded axis.

The GSPMD path (parallel/mesh.py) gets this for free from sharding
propagation; the explicit form exists for kernels where hand-scheduling the
exchange matters (overlap with compute, odd paddings) and as the building
block for sharded U-Net levels at finetune-resolution masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from cfun_tpu import nn


def exchange_halo(x: jnp.ndarray, axis_name: str, halo: int,
                  axis: int = 1) -> jnp.ndarray:
    """Concatenate ``halo`` planes from both mesh neighbors along ``axis``.

    x: local shard [..., L, ...].  Outer-edge shards receive zeros (the
    dense-conv zero-padding semantics).  Returns [..., L + 2*halo, ...].
    """
    n = lax.axis_size(axis_name)
    if halo == 0 or n == 1:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (halo, halo)
        return jnp.pad(x, pad)
    idx = [slice(None)] * x.ndim

    # data flowing "down" (to the next shard): our top `halo` planes become
    # the neighbor's lower halo
    idx[axis] = slice(x.shape[axis] - halo, None)
    from_left = lax.ppermute(x[tuple(idx)], axis_name,
                             perm=[(i, i + 1) for i in range(n - 1)])
    # data flowing "up": our first `halo` planes
    idx[axis] = slice(0, halo)
    from_right = lax.ppermute(x[tuple(idx)], axis_name,
                              perm=[(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_left, x, from_right], axis=axis)


def halo_conv3d(params: nn.Params, x: jnp.ndarray, axis_name: str,
                stride=1, dtype=jnp.float32, shard_axis: int = 1
                ) -> jnp.ndarray:
    """3D conv over an NDHWC shard split along ``shard_axis`` (1 = D).

    Equivalent to the dense ``nn.conv3d(..., padding='torch')`` on the
    gathered volume, for odd kernels and local sizes divisible by the
    stride.
    """
    w = params["w"]
    k = w.shape[shard_axis - 1]  # kernel size along the sharded spatial axis
    halo = (k - 1) // 2
    x = exchange_halo(x, axis_name, halo, axis=shard_axis)
    pads = []
    for ax, ks in enumerate(w.shape[:3]):
        if ax == shard_axis - 1:
            pads.append((0, 0))  # halo already attached
        else:
            pads.append(((ks - 1) // 2, (ks - 1) // 2))
    return nn.conv3d(params, x, stride=stride, padding=tuple(pads),
                     dtype=dtype)
