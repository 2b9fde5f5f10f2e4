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

import jax
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


def apply_unet_fused(params: nn.Params, x: jnp.ndarray, *, stage: str,
                     dtype=jnp.bfloat16, interpret: bool = False,
                     min_fused_voxels: int = 4096) -> jnp.ndarray:
    """Inference-path U-Net over fused Pallas conv+IN+LReLU kernels.

    Same graph as :func:`apply_unet` (deterministic / no-dropout form),
    with every stride-1 3^3 conv that meets ``min_fused_voxels`` lowered to
    ``ops.pallas_conv.fused_conv3d``: the preceding InstanceNorm + LeakyReLU
    ride into the conv as a per-(batch, channel) affine (nearest-upsample
    commutes with both), and the conv emits its output moments so the NEXT
    InstanceNorm needs no reduction pass.  Stride-2 downs, 1x1 convs and
    the finetune 5^3 upscale head stay XLA (tiny or differently-shaped).

    Opt-in (Config.pallas_unet), inference only -- no VJP is defined.
    Parity vs apply_unet is pinned by tests/test_pallas_conv.py.
    """
    from cfun_tpu.ops.pallas_conv import (fused_conv3d, identity_affine,
                                          in_affine_from_sums)

    b = x.shape[0]

    def nsp(t):
        return t.shape[1] * t.shape[2] * t.shape[3]

    def can_fuse(t):
        return t.shape[-1] > 1 and nsp(t) >= min_fused_voxels

    def in_affine(t):
        """(scale, shift) of IN(t) via an XLA reduction (used where the
        producing op was not a fused conv)."""
        mean = jnp.mean(t, axis=(1, 2, 3), dtype=jnp.float32)
        var = jnp.mean(
            jnp.square(t.astype(jnp.float32) - mean[:, None, None, None, :]),
            axis=(1, 2, 3))
        scale = jax.lax.rsqrt(var + 1e-5)
        return scale, -mean * scale

    def conv(p, v, stride=1):
        return nn.conv3d(p, v, stride=stride, dtype=dtype)

    def fconv(p, v, affine=None, pre_lrelu=True):
        """Fused conv; falls back to the XLA composition at tiny sizes."""
        if affine is None:
            affine = identity_affine(b, v.shape[-1])
        if can_fuse(v):
            return fused_conv3d(v, p["w"], affine[0], affine[1],
                                pre_lrelu=pre_lrelu, out_dtype=dtype,
                                interpret=interpret)
        sc, sh = affine
        act = v.astype(jnp.float32) * sc[:, None, None, None, :] + \
            sh[:, None, None, None, :]
        if pre_lrelu:
            act = nn.leaky_relu(act)
        y = conv(p, act.astype(dtype))
        s = jnp.stack([jnp.sum(y, axis=(1, 2, 3), dtype=jnp.float32),
                       jnp.sum(jnp.square(y.astype(jnp.float32)),
                               axis=(1, 2, 3))], axis=1)
        return y, s

    def apply_affine_lrelu(v, sums):
        sc, sh = in_affine_from_sums(sums, nsp(v))
        out = v.astype(jnp.float32) * sc[:, None, None, None, :] + \
            sh[:, None, None, None, :]
        return nn.leaky_relu(out).astype(v.dtype)

    # ---- level 1 context
    out = nn.conv3d_1ch(params["c1_1"], x, dtype=dtype)
    residual = out
    out, _ = fconv(params["c1_2"], out)               # lrelu folded in
    out, _ = fconv(params["c1_lrelu_conv"], out)
    out = out + residual
    context_1 = nn.leaky_relu(out)
    aff = in_affine(out)

    # ---- levels 2-5 context
    contexts = []
    for lvl in (2, 3, 4, 5):
        down_in = nn.leaky_relu(nn.instance_norm(out)) if lvl > 2 else \
            (out.astype(jnp.float32) * aff[0][:, None, None, None, :] +
             aff[1][:, None, None, None, :])
        if lvl == 2:
            down_in = nn.leaky_relu(down_in).astype(dtype)
        out = conv(params[f"c{lvl}_down"], down_in, stride=2)
        residual = out
        o1, s1 = fconv(params[f"c{lvl}_conv"], out, affine=in_affine(out))
        o2, _ = fconv(params[f"c{lvl}_conv"], o1,
                      affine=in_affine_from_sums(s1, nsp(o1)))
        out = o2 + residual
        if lvl < 5:
            contexts.append(nn.leaky_relu(nn.instance_norm(out)))
    context_2, context_3, context_4 = contexts

    def up_conv(p, v, affine):
        # lrelu(IN(v)) -> upsample -> conv: affine+lrelu commute with
        # nearest-upsample, so upsample RAW and fold them into the kernel
        vu = nn.upsample_nearest(v)
        return fconv(p, vu, affine=affine)

    # ---- level 0 localization
    out, s = up_conv(params["l0_up_conv"], out, in_affine(out))
    out = apply_affine_lrelu(out, s)
    out = conv(params["l0_conv"], out)
    out = nn.leaky_relu(nn.instance_norm(out))

    # ---- decoder
    def decode(cat, conv_p, reduce_p, upconv_p):
        o, s = fconv(conv_p, cat, pre_lrelu=False)
        o = apply_affine_lrelu(o, s)
        ds = o
        o = conv(reduce_p, o)
        o, s = up_conv(upconv_p, o, in_affine(o))
        return apply_affine_lrelu(o, s), ds

    out = jnp.concatenate([out, context_4], axis=-1)
    out, _ = decode(out, params["l1_conv"], params["l1_reduce"],
                    params["l1_up_conv"])
    out = jnp.concatenate([out, context_3], axis=-1)
    out, ds2 = decode(out, params["l2_conv"], params["l2_reduce"],
                      params["l2_up_conv"])
    out = jnp.concatenate([out, context_2], axis=-1)
    out, ds3 = decode(out, params["l3_conv"], params["l3_reduce"],
                      params["l3_up_conv"])

    out = jnp.concatenate([out, context_1], axis=-1)
    o, s = fconv(params["l4_conv"], out, pre_lrelu=False)
    out = apply_affine_lrelu(o, s)
    out_pred = conv(params["l4_out"], out)

    # ---- deep supervision
    ds2_up = nn.upsample_nearest(conv(params["ds2"], ds2))
    ds3_c = conv(params["ds3"], ds3)
    out = out_pred + nn.upsample_nearest(ds2_up + ds3_c)

    if stage == "finetune":
        out = nn.upsample2_conv_residual(params["out_upscale"], out,
                                         dtype=dtype)
    return out


def apply_unet(params: nn.Params, x: jnp.ndarray, *, stage: str,
               dropout_rate: float = 0.0, dropout_key=None,
               dtype=jnp.float32, axis_name: str | None = None,
               head_impl: str = "explicit",
               up_impl: str = "explicit") -> jnp.ndarray:
    """x: [B, D, H, W, c_in] crop -> class logits [B, D', H', W', n_classes]
    where D' = D (or 2D in finetune).

    ``axis_name``: when set, ``x`` is a per-device shard split along D over
    that mesh axis (inside ``jax.shard_map``): every conv exchanges halos
    with ``lax.ppermute`` and instance norms psum their spatial statistics,
    so the sharded graph computes exactly the dense graph (the volumetric
    analogue of sequence parallelism, SURVEY.md s2.4b).  The graph
    structure is ONE definition for both paths -- parity by construction.
    """
    det = dropout_key is None or dropout_rate == 0.0
    dkeys = nn.key_iter(dropout_key) if not det else None

    if axis_name is None:
        def conv(p, v, stride=1):
            return nn.conv3d(p, v, stride=stride, dtype=dtype)

        inorm = nn.instance_norm
    else:
        from cfun_tpu.parallel.halo import halo_conv3d, instance_norm_sharded

        def conv(p, v, stride=1):
            return halo_conv3d(p, v, axis_name, stride=stride, dtype=dtype)

        def inorm(v):
            return instance_norm_sharded(v, axis_name)

    def drop(v):
        if det:
            return v
        # channel masks have no spatial extent, so the same key gives every
        # 'space' shard the identical mask
        return nn.channel_dropout(next(dkeys), v, dropout_rate, False)

    def norm_lrelu_conv(p, v):
        return conv(p, nn.leaky_relu(inorm(v)))

    def conv_norm_lrelu(p, v):
        return nn.leaky_relu(inorm(conv(p, v)))

    def norm_lrelu_upscale_conv_norm_lrelu(p, v):
        nsp = v.shape[1] * v.shape[2] * v.shape[3]
        v = nn.leaky_relu(inorm(v))
        if axis_name is None and up_impl == "phase" and nsp >= 2048:
            # INFERENCE decoder up-convs: `upsample -> 3^3 conv` as one
            # phase-decomposed conv + depth-to-space (nn.upsample2_conv):
            # 8x the MXU output lanes at the decoder's narrow channel
            # counts and no materialized 2x tensor.  Measured per level
            # (benchmarks/unet_levels.json, LiTS finetune shapes): l3
            # 23.0 -> 10.2 ms, l2 3.2 -> 2.8 ms, but the tiny deep
            # levels LOSE (l1 0.14 -> 0.84 ms: at 4x10x10 the 8x-wide
            # conv is all padding), hence the spatial-size gate.  The
            # TRAIN step keeps the explicit form (same reasoning as
            # head_impl below); the sharded path's halo bookkeeping also
            # stays explicit.
            return nn.leaky_relu(inorm(nn.upsample2_conv(p, v, dtype=dtype)))
        v = nn.upsample_nearest(v)
        return nn.leaky_relu(inorm(conv(p, v)))

    # ---- level 1 context
    if x.shape[-1] == 1 and axis_name is None:
        # memory-safe VJP for the 1-channel entry conv (see nn.conv3d_1ch)
        out = nn.conv3d_1ch(params["c1_1"], x, dtype=dtype)
    else:
        out = conv(params["c1_1"], x)
    residual = out
    out = nn.leaky_relu(out)
    out = conv(params["c1_2"], out)
    out = drop(out)
    out = conv(params["c1_lrelu_conv"], nn.leaky_relu(out))
    out = out + residual
    context_1 = nn.leaky_relu(out)  # pre-norm tap (mask_branch.py:134)
    out = nn.leaky_relu(inorm(out))

    # ---- levels 2-5 context (shared-weight double conv per level)
    contexts = []
    for lvl in (2, 3, 4, 5):
        out = conv(params[f"c{lvl}_down"], out, stride=2)
        residual = out
        out = norm_lrelu_conv(params[f"c{lvl}_conv"], out)
        out = drop(out)
        out = norm_lrelu_conv(params[f"c{lvl}_conv"], out)
        out = out + residual
        if lvl < 5:
            out = nn.leaky_relu(inorm(out))
            contexts.append(out)
    context_2, context_3, context_4 = contexts

    # ---- level 0 localization
    out = norm_lrelu_upscale_conv_norm_lrelu(params["l0_up_conv"], out)
    out = conv(params["l0_conv"], out)
    out = nn.leaky_relu(inorm(out))

    # ---- decoder
    out = jnp.concatenate([out, context_4], axis=-1)
    out = conv_norm_lrelu(params["l1_conv"], out)
    out = conv(params["l1_reduce"], out)
    out = norm_lrelu_upscale_conv_norm_lrelu(params["l1_up_conv"], out)

    out = jnp.concatenate([out, context_3], axis=-1)
    out = conv_norm_lrelu(params["l2_conv"], out)
    ds2 = out
    out = conv(params["l2_reduce"], out)
    out = norm_lrelu_upscale_conv_norm_lrelu(params["l2_up_conv"], out)

    out = jnp.concatenate([out, context_2], axis=-1)
    out = conv_norm_lrelu(params["l3_conv"], out)
    ds3 = out
    out = conv(params["l3_reduce"], out)
    out = norm_lrelu_upscale_conv_norm_lrelu(params["l3_up_conv"], out)

    out = jnp.concatenate([out, context_1], axis=-1)
    out = conv_norm_lrelu(params["l4_conv"], out)
    out_pred = conv(params["l4_out"], out)

    # ---- deep supervision
    ds2_up = nn.upsample_nearest(conv(params["ds2"], ds2))
    ds3_c = conv(params["ds3"], ds3)
    out = out_pred + nn.upsample_nearest(ds2_up + ds3_c)

    if stage == "finetune":
        if axis_name is None and head_impl == "phase":
            # INFERENCE head: `up + conv(up)` phase-decomposed into one
            # 3^3 conv + depth-to-space -- skips writing and re-reading
            # the 2x-upsampled class-channel tensor, whose C=classes
            # lane-pads to 128 on TPU (nn.upsample2_conv_residual;
            # 100 -> 2.6 ms kernel, benchmarks/unet_segments.json).
            # The TRAIN step keeps the explicit form: inside fwd+bwd the
            # phase form's depth-to-space VJP costs MORE peak HBM
            # (+1.35 GiB, an on-chip compile OOM at heart finetune's
            # 15.3 GB) than the saved `up` buffer.
            out = nn.upsample2_conv_residual(params["out_upscale"], out,
                                             dtype=dtype)
        else:
            # explicit form: train step (memory-bounded, see above) and
            # the sharded path (its big tensor is already D-sharded and
            # halo_conv3d owns the halo bookkeeping)
            up = nn.upsample_nearest(out)
            out = up + conv(params["out_upscale"], up)
    return out
