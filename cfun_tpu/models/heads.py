"""ROI heads: FG/BG classifier + box regressor, and the U-Net mask head.

Classifier (reference model.py:750-784): pyramid-RoIAligned [12^3 x C] crop
-> full-window conv (== matmul on the MXU) -> BN -> ReLU -> 1x1 conv -> BN ->
ReLU -> two linears: 2-way FG/BG logits (the head is instantiated binary,
model.py:1290-1291) and per-class 6-deltas.

Mask head (reference model.py:787-801): THE core CFUN idea -- the mask branch
pools its crop from the RAW 1-channel input volume (model.py:1413), not from
FPN features, and runs the full Modified3DUNet over it.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from cfun_tpu import nn
from cfun_tpu.models.unet3d import apply_unet, init_unet


def init_classifier(key, cfg) -> nn.Params:
    k = nn.key_iter(key)
    pd, ph, pw = cfg.pool_size
    c = cfg.fpn_channels
    fc = cfg.fc_size
    return {
        "conv1": nn.conv3d_init(next(k), (pd, ph, pw), c, fc),
        "bn1": nn.norm_init(fc),
        "conv2": nn.conv3d_init(next(k), 1, fc, fc),
        "bn2": nn.norm_init(fc),
        "cls": nn.linear_init(next(k), fc, 2),
        "bbox": nn.linear_init(next(k), fc, 2 * 6),
    }


def apply_classifier(params: nn.Params, pooled: jnp.ndarray,
                     dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pooled: [N, pd, ph, pw, C] -> (class_logits [N, 2], deltas [N, 2, 6]).

    The full-window conv1 is algebraically a dense layer over the flattened
    crop; we evaluate it as a single matmul so it lands on the MXU as one
    [N, pd*ph*pw*C] x [pd*ph*pw*C, fc] contraction.
    """
    n = pooled.shape[0]
    w = params["conv1"]["w"]
    flat_w = w.reshape(-1, w.shape[-1])
    x = jnp.dot(pooled.reshape(n, -1).astype(dtype), flat_w.astype(dtype))
    x = (x + params["conv1"]["b"].astype(dtype))[:, None, None, None, :]
    x = nn.relu(nn.frozen_bn(params["bn1"], x, eps=1e-3))
    x = nn.relu(nn.frozen_bn(params["bn2"],
                             nn.conv3d(params["conv2"], x, dtype=dtype),
                             eps=1e-3))
    x = x.reshape(n, -1)
    logits = nn.linear(params["cls"], x, dtype=dtype).astype(jnp.float32)
    deltas = nn.linear(params["bbox"], x, dtype=dtype).astype(jnp.float32)
    return logits, deltas.reshape(n, 2, 6)


def init_mask_head(key, cfg) -> nn.Params:
    return {"unet": init_unet(key, cfg.image_channels, cfg.num_classes,
                              cfg.unet_base_channels)}


def apply_mask_head(params: nn.Params, crops: jnp.ndarray, *, stage: str,
                    dropout_rate: float = 0.0, dropout_key=None,
                    dtype=jnp.float32, fused: bool = False,
                    head_impl: str = "phase",
                    up_impl: str = "phase") -> jnp.ndarray:
    """crops: [N, D, H, W, 1] raw-image crops -> logits
    [N, D', H', W', num_classes] (D' = 2D in finetune), in the compute
    dtype (an f32 copy of a [4, 192^3, 8] stack is ~1 GB; consumers
    upcast inside their reductions instead).

    ``fused=True`` (inference only, Config.pallas_unet): lower to the
    fused Pallas conv+IN+LReLU graph (models/unet3d.py::apply_unet_fused).

    ``head_impl``: finetune upscale-head schedule -- 'phase' (default,
    the 39x inference form) or 'explicit' (the train step's choice: lower
    peak HBM inside fwd+bwd; see models/unet3d.py).

    ``up_impl``: decoder up-conv schedule -- 'phase' (default: large
    up-convs lower to nn.upsample2_conv, 2.3x on the LiTS l3 block) or
    'explicit' (the train step's choice, matching head_impl).
    """
    if fused:
        from cfun_tpu.models.unet3d import apply_unet_fused
        # the fused kernel computes in bf16 and has no dropout path --
        # reject rather than silently change semantics
        if dropout_rate and dropout_key is not None:
            raise ValueError("fused=True has no dropout path (inference "
                             "only); got dropout_rate > 0 with a key")
        if jnp.dtype(dtype) != jnp.bfloat16:
            raise ValueError(f"fused=True computes in bfloat16; config "
                             f"compute dtype is {jnp.dtype(dtype)}")
        return apply_unet_fused(params["unet"], crops, stage=stage,
                                dtype=dtype)
    return apply_unet(params["unet"], crops, stage=stage,
                      dropout_rate=dropout_rate, dropout_key=dropout_key,
                      dtype=dtype, head_impl=head_impl, up_impl=up_impl)
