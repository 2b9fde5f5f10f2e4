"""Two-level feature pyramid over the P3D backbone (reference model.py:124-148).

P3 = 3x3 conv(1x1 conv(C3)); P2 = 3x3 conv(1x1 conv(C2) + nearest-up(P3 1x1)).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from cfun_tpu import nn
from cfun_tpu.models.p3d import EXPANSION


def init_fpn(key, cfg) -> nn.Params:
    k = nn.key_iter(key)
    ch0, ch1 = cfg.backbone_channels
    f = cfg.fpn_channels
    return {
        "p3_conv1": nn.conv3d_init(next(k), 1, ch1 * EXPANSION, f),
        "p3_conv2": nn.conv3d_init(next(k), 3, f, f),
        "p2_conv1": nn.conv3d_init(next(k), 1, ch0 * EXPANSION, f),
        "p2_conv2": nn.conv3d_init(next(k), 3, f, f),
    }


def apply_fpn(params: nn.Params, c2: jnp.ndarray, c3: jnp.ndarray,
              dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    p3 = nn.conv3d(params["p3_conv1"], c3, dtype=dtype)
    p2 = nn.conv3d(params["p2_conv1"], c2, dtype=dtype) + nn.upsample_nearest(p3)
    p3 = nn.conv3d(params["p3_conv2"], p3, dtype=dtype)
    p2 = nn.conv3d(params["p2_conv2"], p2, dtype=dtype)
    return p2, p3
