"""Modified 3D U-Net mask branch, functional form.

Architecture from the reference (mask_branch.py:11-220): a 5-level context
pathway (stride-2 3x3x3 convs, residual blocks, InstanceNorm + LeakyReLU,
channel Dropout3d) and a 4-level localization pathway (nearest-upsample +
conv) with skip concatenations, deep supervision (ds2/ds3 1x1 convs upsampled
and summed into the output), and -- in the 'finetune' stage -- an extra 2x
upscale head that doubles the output resolution (mask_branch.py:216-218).

Faithfully-kept quirks of the reference graph:
  * ``norm_lrelu_conv_cN`` is applied TWICE with the SAME weights inside each
    context level's residual block (mask_branch.py:141-143 etc.);
  * ``context_1`` taps the pre-norm activation (mask_branch.py:134);
  * all convs are bias-free.

The finetune upscale head's parameters always exist in the tree so stage
transitions load the same checkpoint structure (SURVEY.md s7 "stage
polymorphism").
"""

from __future__ import annotations

import jax.numpy as jnp

from cfun_tpu import nn


def init_unet(key, c_in: int, n_classes: int, base: int) -> nn.Params:
    k = nn.key_iter(key)

    def c3(ci, co):
        return nn.conv3d_init(next(k), 3, ci, co, bias=False)

    def c1(ci, co):
        return nn.conv3d_init(next(k), 1, ci, co, bias=False)

    return {
        # context pathway
        "c1_1": c3(c_in, base),
        "c1_2": c3(base, base),
        "c1_lrelu_conv": c3(base, base),
        "c2_down": c3(base, base * 2),
        "c2_conv": c3(base * 2, base * 2),
        "c3_down": c3(base * 2, base * 4),
        "c3_conv": c3(base * 4, base * 4),
        "c4_down": c3(base * 4, base * 8),
        "c4_conv": c3(base * 8, base * 8),
        "c5_down": c3(base * 8, base * 16),
        "c5_conv": c3(base * 16, base * 16),
        # localization pathway
        "l0_up_conv": c3(base * 16, base * 8),
        "l0_conv": c1(base * 8, base * 8),
        "l1_conv": c3(base * 16, base * 16),
        "l1_reduce": c1(base * 16, base * 8),
        "l1_up_conv": c3(base * 8, base * 4),
        "l2_conv": c3(base * 8, base * 8),
        "l2_reduce": c1(base * 8, base * 4),
        "l2_up_conv": c3(base * 4, base * 2),
        "l3_conv": c3(base * 4, base * 4),
        "l3_reduce": c1(base * 4, base * 2),
        "l3_up_conv": c3(base * 2, base),
        "l4_conv": c3(base * 2, base * 2),
        "l4_out": c1(base * 2, n_classes),
        # deep supervision + finetune upscale head
        "ds2": c1(base * 8, n_classes),
        "ds3": c1(base * 4, n_classes),
        "out_upscale": nn.conv3d_init(next(k), 5, n_classes, n_classes,
                                      bias=False),
    }


def _norm_lrelu_conv(p, x, dtype):
    return nn.conv3d(p, nn.leaky_relu(nn.instance_norm(x)), dtype=dtype)


def _conv_norm_lrelu(p, x, dtype):
    return nn.leaky_relu(nn.instance_norm(nn.conv3d(p, x, dtype=dtype)))


def _norm_lrelu_upscale_conv_norm_lrelu(p, x, dtype):
    x = nn.upsample_nearest(nn.leaky_relu(nn.instance_norm(x)))
    return nn.leaky_relu(nn.instance_norm(nn.conv3d(p, x, dtype=dtype)))


def apply_unet(params: nn.Params, x: jnp.ndarray, *, stage: str,
               dropout_rate: float = 0.0, dropout_key=None,
               dtype=jnp.float32) -> jnp.ndarray:
    """x: [B, D, H, W, c_in] crop -> class logits [B, D', H', W', n_classes]
    where D' = D (or 2D in finetune)."""
    det = dropout_key is None or dropout_rate == 0.0
    dkeys = nn.key_iter(dropout_key) if not det else None

    def drop(v):
        if det:
            return v
        return nn.channel_dropout(next(dkeys), v, dropout_rate, False)

    # ---- level 1 context
    if x.shape[-1] == 1:
        # memory-safe VJP for the 1-channel entry conv (see nn.conv3d_1ch)
        out = nn.conv3d_1ch(params["c1_1"], x, dtype=dtype)
    else:
        out = nn.conv3d(params["c1_1"], x, dtype=dtype)
    residual = out
    out = nn.leaky_relu(out)
    out = nn.conv3d(params["c1_2"], out, dtype=dtype)
    out = drop(out)
    out = nn.conv3d(params["c1_lrelu_conv"], nn.leaky_relu(out), dtype=dtype)
    out = out + residual
    context_1 = nn.leaky_relu(out)  # pre-norm tap (mask_branch.py:134)
    out = nn.leaky_relu(nn.instance_norm(out))

    # ---- levels 2-5 context (shared-weight double conv per level)
    contexts = []
    for lvl in (2, 3, 4, 5):
        out = nn.conv3d(params[f"c{lvl}_down"], out, stride=2, dtype=dtype)
        residual = out
        out = _norm_lrelu_conv(params[f"c{lvl}_conv"], out, dtype)
        out = drop(out)
        out = _norm_lrelu_conv(params[f"c{lvl}_conv"], out, dtype)
        out = out + residual
        if lvl < 5:
            out = nn.leaky_relu(nn.instance_norm(out))
            contexts.append(out)
    context_2, context_3, context_4 = contexts

    # ---- level 0 localization
    out = _norm_lrelu_upscale_conv_norm_lrelu(params["l0_up_conv"], out, dtype)
    out = nn.conv3d(params["l0_conv"], out, dtype=dtype)
    out = nn.leaky_relu(nn.instance_norm(out))

    # ---- decoder
    out = jnp.concatenate([out, context_4], axis=-1)
    out = _conv_norm_lrelu(params["l1_conv"], out, dtype)
    out = nn.conv3d(params["l1_reduce"], out, dtype=dtype)
    out = _norm_lrelu_upscale_conv_norm_lrelu(params["l1_up_conv"], out, dtype)

    out = jnp.concatenate([out, context_3], axis=-1)
    out = _conv_norm_lrelu(params["l2_conv"], out, dtype)
    ds2 = out
    out = nn.conv3d(params["l2_reduce"], out, dtype=dtype)
    out = _norm_lrelu_upscale_conv_norm_lrelu(params["l2_up_conv"], out, dtype)

    out = jnp.concatenate([out, context_2], axis=-1)
    out = _conv_norm_lrelu(params["l3_conv"], out, dtype)
    ds3 = out
    out = nn.conv3d(params["l3_reduce"], out, dtype=dtype)
    out = _norm_lrelu_upscale_conv_norm_lrelu(params["l3_up_conv"], out, dtype)

    out = jnp.concatenate([out, context_1], axis=-1)
    out = _conv_norm_lrelu(params["l4_conv"], out, dtype)
    out_pred = nn.conv3d(params["l4_out"], out, dtype=dtype)

    # ---- deep supervision
    ds2_up = nn.upsample_nearest(nn.conv3d(params["ds2"], ds2, dtype=dtype))
    ds3_c = nn.conv3d(params["ds3"], ds3, dtype=dtype)
    out = out_pred + nn.upsample_nearest(ds2_up + ds3_c)

    if stage == "finetune":
        up = nn.upsample_nearest(out)
        out = up + nn.conv3d(params["out_upscale"], up, dtype=dtype)
    return out
