"""Pseudo-3D ResNet backbone (two stages), functional form.

Architecture from the reference (backbone.py): a stem C1 = conv(3,7,7)/s2 +
BN + ReLU + maxpool/s2 (1/4 resolution), then two bottleneck stacks C2 (1/8)
and C3 (1/16).  Each bottleneck factorizes the 3x3x3 conv into a spatial
conv_S (1,3,3) and a temporal conv_T (3,1,1) arranged in one of three
spatio-temporal patterns cycled by block index (backbone.py:41):

  ST-A: serial        x -> S -> T
  ST-B: parallel      S(x) + T(x)
  ST-C: serial+skip   S(x) + T(S(x))

First block of each stack expands channels x4 with a stride-2 1x1x1
downsample on the residual path (backbone.py:46-52).  Depths: P3D19 = (2, 3)
(backbone.py:161-164), P3D35 = (4, 5) (LiTS_2017/backbone.py:166-175).

BatchNorm is frozen (see cfun_tpu.nn.frozen_bn).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from cfun_tpu import nn

BACKBONE_DEPTHS = {"P3D19": (2, 3), "P3D35": (4, 5)}
EXPANSION = 4


def _init_bottleneck(keys, c_in: int, planes: int, expand: bool) -> nn.Params:
    ki = iter(keys)
    p = {
        "conv1": nn.conv3d_init(next(ki), 1, c_in, planes),
        "bn1": nn.norm_init(planes),
        "conv_s": nn.conv3d_init(next(ki), (1, 3, 3), planes, planes),
        "bn_s": nn.norm_init(planes),
        "conv_t": nn.conv3d_init(next(ki), (3, 1, 1), planes, planes),
        "bn_t": nn.norm_init(planes),
    }
    c_out = planes * EXPANSION if expand else c_in
    p["conv4"] = nn.conv3d_init(next(ki), 1, planes, c_out)
    p["bn4"] = nn.norm_init(c_out)
    if expand:
        p["down_conv"] = nn.conv3d_init(next(ki), 1, c_in, planes * EXPANSION)
        p["down_bn"] = nn.norm_init(planes * EXPANSION)
    return p


def _apply_bottleneck(p: nn.Params, x: jnp.ndarray, *, st: str, expand: bool,
                      stride: int, dtype) -> jnp.ndarray:
    out = nn.relu(nn.frozen_bn(p["bn1"], nn.conv3d(p["conv1"], x, stride=stride,
                                                   dtype=dtype)))

    def s_branch(v):
        return nn.relu(nn.frozen_bn(p["bn_s"], nn.conv3d(p["conv_s"], v, dtype=dtype)))

    def t_branch(v):
        return nn.relu(nn.frozen_bn(p["bn_t"], nn.conv3d(p["conv_t"], v, dtype=dtype)))

    if st == "A":
        out = t_branch(s_branch(out))
    elif st == "B":
        out = t_branch(out) + s_branch(out)
    else:  # "C"
        s = s_branch(out)
        out = s + t_branch(s)

    out = nn.frozen_bn(p["bn4"], nn.conv3d(p["conv4"], out, dtype=dtype))
    if expand:
        residual = nn.frozen_bn(
            p["down_bn"], nn.conv3d(p["down_conv"], x, stride=2, dtype=dtype))
    else:
        residual = x
    return nn.relu(out + residual)


def init_p3d(key, cfg) -> nn.Params:
    keys = nn.key_iter(key)
    ch0, ch1 = cfg.backbone_channels
    depths = BACKBONE_DEPTHS[cfg.backbone]
    params = {
        "stem_conv": nn.conv3d_init(next(keys), cfg.backbone_stem_kernel,
                                    cfg.image_channels, ch0),
        "stem_bn": nn.norm_init(ch0),
    }
    c_in = ch0
    for stage, (planes, depth) in enumerate(zip((ch0, ch1), depths)):
        blocks = []
        for b in range(depth):
            expand = b == 0
            blocks.append(
                _init_bottleneck([next(keys) for _ in range(5)], c_in, planes,
                                 expand))
            c_in = planes * EXPANSION if expand else c_in
        params[f"c{stage + 2}"] = blocks
    return params


def apply_p3d(params: nn.Params, x: jnp.ndarray, cfg,
              dtype=jnp.float32, remat: bool = False
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, D, H, W, C] molded volume -> (c2_out 1/8, c3_out 1/16).

    remat=True checkpoints each bottleneck block: the backward pass holds
    one block's internal activations at a time instead of the whole
    stack's (needed for P3D35 at LiTS volume sizes on 16 GB chips).
    """
    if x.shape[-1] == 1:
        # space-to-depth stem: identical math, sidesteps the TPU
        # 1-channel-conv dW lane-padding blowup (see nn.conv3d_stem_s2d)
        out = nn.conv3d_stem_s2d(params["stem_conv"], x, dtype=dtype)
    else:
        out = nn.conv3d(params["stem_conv"], x, stride=2, dtype=dtype)
    out = nn.relu(nn.frozen_bn(params["stem_bn"], out))
    out = nn.max_pool(out, 2, 2)

    feats = []
    for stage in (2, 3):
        for b, bp in enumerate(params[f"c{stage}"]):
            st = "ABC"[b % 3]  # block index is 1-based in the reference
            block = functools.partial(_apply_bottleneck, st=st,
                                      expand=(b == 0),
                                      stride=2 if b == 0 else 1, dtype=dtype)
            if remat:
                block = jax.checkpoint(block)
            out = block(bp, out)
        feats.append(out)
    return feats[0], feats[1]
