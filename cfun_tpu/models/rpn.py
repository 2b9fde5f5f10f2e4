"""3D Region Proposal Network head (reference model.py:700-743).

Shared 3x3x3 conv -> 1x1x1 class conv (2 per anchor) + 1x1x1 bbox conv
(6 per anchor).  Outputs are flattened z-major -- slot ((z*H + y)*W + x)*A + a
-- which matches :mod:`cfun_tpu.ops.anchors` layout exactly (the reference's
anchor array is y-major, a documented quirk we deliberately fix).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from cfun_tpu import nn


def init_rpn(key, cfg) -> nn.Params:
    k = nn.key_iter(key)
    a = len(cfg.anchor_ratios)
    return {
        "shared": nn.conv3d_init(next(k), 3, cfg.fpn_channels,
                                 cfg.rpn_conv_channels),
        "cls": nn.conv3d_init(next(k), 1, cfg.rpn_conv_channels, 2 * a),
        "bbox": nn.conv3d_init(next(k), 1, cfg.rpn_conv_channels, 6 * a),
    }


def apply_rpn(params: nn.Params, feat: jnp.ndarray, anchor_stride: int = 1,
              dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """feat: [B, D, H, W, C] -> (logits [B, N, 2], deltas [B, N, 6])."""
    x = nn.relu(nn.conv3d(params["shared"], feat, stride=anchor_stride,
                          dtype=dtype))
    b = feat.shape[0]
    logits = nn.conv3d(params["cls"], x, dtype=dtype).reshape(b, -1, 2)
    deltas = nn.conv3d(params["bbox"], x, dtype=dtype).reshape(b, -1, 6)
    return logits.astype(jnp.float32), deltas.astype(jnp.float32)
