"""Minimal functional NN layer library.

All layers are (init, apply) pairs over plain nested-dict parameter pytrees:
no module objects, no tracing-time mutation -- the idiomatic-JAX functional
core that replaces the reference's torch.nn modules.  Conv padding uses
torch-style explicit symmetric padding so strided convs align exactly with
the reference architecture's downsampling/skip geometry.

Initialization mirrors the reference's post-build pass (model.py:1306-1319):
conv weights Xavier-uniform with zero bias, linears N(0, 0.01), norm scale 1 /
bias 0.  BatchNorm is *frozen*: the reference always runs BN in eval mode
(TRAIN_BN=False, model.py:1297-1304 + 1400-1406), so here it is a pure
scale-shift with constant (mean 0, var 1) statistics kept in the tree for
checkpoint compatibility; gamma/beta remain trainable.

Compute dtype: convolutions cast inputs/weights to ``dtype`` (bfloat16 on
TPU) and accumulate in float32 on the MXU via ``preferred_element_type``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

Params = dict

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _triple(v):
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v, v)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def conv3d_init(key, kernel, c_in: int, c_out: int, bias: bool = True) -> Params:
    kd, kh, kw = _triple(kernel)
    fan_in = kd * kh * kw * c_in
    fan_out = kd * kh * kw * c_out
    limit = math.sqrt(6.0 / (fan_in + fan_out))  # xavier_uniform
    p = {"w": jax.random.uniform(key, (kd, kh, kw, c_in, c_out),
                                 jnp.float32, -limit, limit)}
    if bias:
        p["b"] = jnp.zeros((c_out,), jnp.float32)
    return p


def linear_init(key, c_in: int, c_out: int) -> Params:
    return {
        "w": 0.01 * jax.random.normal(key, (c_in, c_out), jnp.float32),
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def norm_init(c: int) -> Params:
    """Frozen-BN parameter block (stats are non-trainable constants)."""
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def conv3d(p: Params, x: jnp.ndarray, stride=1, padding="torch",
           kernel=None, dtype=jnp.float32) -> jnp.ndarray:
    """3D conv over NDHWC input.

    padding: 'torch' = symmetric (k-1)//2 per axis (matches torch p=k//2 for
    odd kernels), explicit list of (lo, hi), or 'VALID'.
    """
    w = p["w"]
    if padding == "torch":
        pads = tuple(((s - 1) // 2, (s - 1) // 2) for s in w.shape[:3])
    elif padding == "VALID":
        pads = ((0, 0), (0, 0), (0, 0))
    else:
        pads = padding
    # conv runs natively in `dtype`: the TPU MXU accumulates bf16 products
    # in f32 internally, and keeping in/out dtypes equal gives the VJP
    # consistent operand types (f32 preferred_element_type over bf16 inputs
    # breaks the transpose rule in this JAX version)
    out = lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype),
        window_strides=_triple(stride),
        padding=pads,
        dimension_numbers=_DN,
    )
    if "b" in p:
        out = out + p["b"].astype(dtype)
    return out


def conv3d_stem_s2d(p: Params, x: jnp.ndarray,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Stride-2 single-input-channel conv via space-to-depth.

    Mathematically identical to ``conv3d(p, x, stride=2, padding='torch')``
    for C_in == 1: the padded volume is rearranged into 2x2x2 blocks
    (8 channels at half resolution) and convolved VALID/stride-1 with the
    correspondingly re-indexed kernel K'[t, eps] = w[2t + eps].

    Why: on TPU the backward (dW) pass of a 1-channel conv lays the input
    out with the channel dim lane-padded to 128 -- a 13.4 GB temp for a
    256x320x320 volume, the dominant memory term of the whole train step.
    The s2d form measures 1.8 GB.  Requires padded spatial dims to be even
    (true for all /16-divisible configs).
    """
    w = p["w"]
    kd, kh, kw = w.shape[:3]
    assert w.shape[3] == 1, "s2d stem path is for C_in == 1"
    pads = [((k - 1) // 2,) * 2 for k in (kd, kh, kw)]
    x = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
    b, d, h, wd, _ = x.shape
    assert d % 2 == 0 and h % 2 == 0 and wd % 2 == 0, \
        "padded spatial dims must be even for the s2d stem"
    xs = x.reshape(b, d // 2, 2, h // 2, 2, wd // 2, 2)
    xs = xs.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
        b, d // 2, h // 2, wd // 2, 8)

    td, th, tw = (kd + 1) // 2, (kh + 1) // 2, (kw + 1) // 2
    wp = jnp.pad(w, [(0, 2 * td - kd), (0, 2 * th - kh), (0, 2 * tw - kw),
                     (0, 0), (0, 0)])
    ws = wp.reshape(td, 2, th, 2, tw, 2, w.shape[-1])
    ws = ws.transpose(0, 2, 4, 1, 3, 5, 6).reshape(td, th, tw, 8,
                                                   w.shape[-1])
    out = lax.conv_general_dilated(
        xs.astype(dtype), ws.astype(dtype), (1, 1, 1),
        ((0, 0), (0, 0), (0, 0)), dimension_numbers=_DN)
    if "b" in p:
        out = out + p["b"].astype(dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv1ch_s1(w: jnp.ndarray, x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Stride-1 'torch'-padded conv for C_in == 1 with a layout-safe VJP.

    The default dW rule lane-pads the 1-channel input to 128 on TPU
    (see conv3d_stem_s2d); here dW is a static sum of shifted-slice
    contractions (einsum -> MXU matmuls) with no padded temps, and dX is
    the standard flipped-kernel conv over the C_out-channel cotangent.
    """
    pads = tuple(((k - 1) // 2, (k - 1) // 2) for k in w.shape[:3])
    return lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1, 1), pads,
        dimension_numbers=_DN)


def _conv1ch_s1_fwd(w, x, dtype):
    return _conv1ch_s1(w, x, dtype), (w, x)


def _conv1ch_s1_bwd(dtype, res, g):
    w, x = res
    kd, kh, kw = w.shape[:3]
    pads = [((k - 1) // 2, (k - 1) // 2) for k in (kd, kh, kw)]
    g32 = g.astype(jnp.float32)

    # dX: correlate the cotangent with the flipped kernel (C_out in lanes)
    w_flip = jnp.flip(w.astype(jnp.float32), axis=(0, 1, 2))
    w_t = jnp.swapaxes(w_flip, 3, 4)  # [kd, kh, kw, C_out, 1]
    dx = lax.conv_general_dilated(g32, w_t, (1, 1, 1), pads,
                                  dimension_numbers=_DN)

    # dW: 27 (k^3) shifted-slice contractions, each a [N] x [N, C] matmul
    xp = jnp.pad(x.astype(jnp.float32)[..., 0],
                 [(0, 0)] + [tuple(p) for p in pads])
    b, d, h, wd, c_out = g.shape
    rows = []
    for a in range(kd):
        for bb in range(kh):
            for cc in range(kw):
                xs = lax.dynamic_slice(
                    xp, (0, a, bb, cc), (b, d, h, wd))
                rows.append(jnp.einsum("bdhw,bdhwc->c", xs, g32))
    dw = jnp.stack(rows).reshape(kd, kh, kw, 1, c_out)
    return dw.astype(w.dtype), dx.astype(x.dtype)


_conv1ch_s1.defvjp(_conv1ch_s1_fwd, _conv1ch_s1_bwd)


def conv3d_1ch(p: Params, x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Stride-1 conv over a single-channel volume (U-Net first layer) with
    the memory-safe custom VJP; bias handled outside the custom rule."""
    out = _conv1ch_s1(p["w"], x, dtype)
    if "b" in p:
        out = out + p["b"].astype(dtype)
    return out


def linear(p: Params, x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    out = jnp.dot(x.astype(dtype), p["w"].astype(dtype))
    return out + p["b"].astype(dtype)


def frozen_bn(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Eval-mode batch norm: affine transform with stored statistics."""
    inv = lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"] * inv).astype(x.dtype)
    shift = (p["bias"] - p["mean"] * p["scale"] * inv).astype(x.dtype)
    return x * scale + shift


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parameter-free instance norm over spatial dims (torch InstanceNorm3d
    default affine=False, mask_branch.py:28 etc.).

    Statistics reduce in f32 (tiny [B, C] tensors); the normalization is
    applied in the input dtype so no f32 copy of the activation is ever
    materialized (at 4 x 96^3 x 20ch each such copy is 283 MB)."""
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
    diff = x - mean.astype(x.dtype)
    var = jnp.mean(jnp.square(diff), axis=(1, 2, 3), keepdims=True,
                   dtype=jnp.float32)
    scale = lax.rsqrt(var + eps)
    return diff * scale.astype(x.dtype)


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, negative_slope * x)


def max_pool(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        (1, window, window, window, 1),
        (1, stride, stride, stride, 1),
        "VALID",
    )


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest x2 upsampling of NDHWC via repeat."""
    for axis in (1, 2, 3):
        x = jnp.repeat(x, factor, axis=axis)
    return x


def upsample2_conv_residual(p: Params, x: jnp.ndarray,
                            dtype=jnp.float32) -> jnp.ndarray:
    """``up + conv3d(p, up)`` with ``up = upsample_nearest(x)`` -- the
    finetune 2x upscale head (reference mask_branch.py:216-218) -- as one
    phase-decomposed conv, without ever materializing ``up``.

    Why it matters: ``up`` is the model's largest activation (heart
    finetune [N, 192^3, 8], LiTS [N, 64, 160, 160, 3]) at a class-count
    channel width, which lane-pads to 128 on TPU -- writing it, reading it
    twice (residual add + conv input), and holding it for the VJP is pure
    HBM traffic the algebra below deletes.  Measured on the LiTS head
    (benchmarks/unet_segments.json): explicit form 100 ms kernel time.

    Derivation (per axis, size n -> 2n, odd k): ``up[2i+q] = x[i]``, so a
    correlation with ``W' = w + delta_center`` (the residual folded into
    the center tap) over ``up`` equals, on the dilation-2 grid of ``x``, a
    (k+1)-tap correlation with ``K[t] = W'[t] + W'[t-1]`` (W' zero-padded)
    and symmetric padding k//2 + 1 -- verified tap-by-tap for k=5 /
    pad 2 ('torch'): K has 6 taps, padding (3, 3), output size exactly 2n.
    The lhs-dilated conv with K still lowers poorly at class-count
    channels (59 ms measured), so the phases are decomposed by hand: on
    the dilation-2 grid, output phase q (per axis) taps K at strides of
    2 -- ``K_q[delta] = K[2*delta + k//2 + 1 - q]`` -- making the whole
    head ONE stride-1 3^3 conv with C_out = 8 * classes (the MXU sees 8x
    the lanes) followed by a depth-to-space interleave.
    """
    w = jnp.asarray(p["w"], jnp.float32)  # [kd, kh, kw, cin, cout]
    # (jnp.asarray, not .astype: callers may pass host-numpy param trees)
    kd, kh, kw, ci, co = w.shape
    if (kd, kh, kw) != (5, 5, 5):
        # the phase-slice arithmetic below ([:3] taps, (1,1) padding) is
        # the k=5 instance of the derivation; other sizes would return
        # shape-correct but WRONG logits silently
        raise ValueError(f"upsample2_conv_residual implements the k=5 "
                         f"head (reference mask_branch.py:216-218); got "
                         f"kernel {(kd, kh, kw)}")
    w = w.at[kd // 2, kh // 2, kw // 2].add(jnp.eye(ci, co, dtype=w.dtype))
    for ax in range(3):
        lo = [(0, 0)] * 5
        hi = [(0, 0)] * 5
        lo[ax] = (1, 0)
        hi[ax] = (0, 1)
        w = jnp.pad(w, lo) + jnp.pad(w, hi)  # K[t] = W'[t] + W'[t-1]
    # phase kernels: K_q[delta] = K[2*delta + k//2 + 1 - q] per axis,
    # delta in {-1, 0, 1} -- strided slices of the composed kernel.
    # Channel order (qd, qh, qw, cout), phase-major, matches the
    # depth-to-space reshape below.
    c = kd // 2 + 1  # composed-kernel center offset (3 for k=5)
    phases = []
    for qd in (0, 1):
        for qh in (0, 1):
            for qw in (0, 1):
                phases.append(w[c - 2 - qd::2, :, :][:3][:,
                              c - 2 - qh::2, :][:, :3][:, :,
                              c - 2 - qw::2][:, :, :3])
    wp = jnp.concatenate(phases, axis=-1)  # [3, 3, 3, ci, 8*co]
    n, d, h, ww_, _ = x.shape
    y = lax.conv_general_dilated(
        x.astype(dtype), wp.astype(dtype),
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=_DN,
    )  # [n, d, h, w, 8*co]
    y = y.reshape(n, d, h, ww_, 2, 2, 2, co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(n, 2 * d, 2 * h, 2 * ww_, co)


def upsample2_conv(p: Params, x: jnp.ndarray,
                   dtype=jnp.float32) -> jnp.ndarray:
    """``conv3d(p, upsample_nearest(x))`` for a 3^3 SAME kernel as one
    phase-decomposed conv + depth-to-space, never materializing the
    2x-upsampled input -- the decoder up-conv of the mask U-Net
    (reference mask_branch.py:150-153, ``norm_lrelu_upscale_conv...``).

    Per axis: ``up[2i+q] = x[i]``, so the 3-tap correlation at output
    2i+q collapses to two source taps --
    q=0: ``w0*x[i-1] + (w1+w2)*x[i]``; q=1: ``(w0+w1)*x[i] + w2*x[i+1]``
    (the composed 4-tap kernel K[t] = w[t] + w[t-1] strided by phase).
    Embedding each phase's 2 taps in a zero-padded 3-tap kernel keeps all
    8 phases in ONE stride-1 3^3 conv with C_out = 8*cout (8x the MXU
    lanes at the U-Net's narrow channel counts), followed by a
    depth-to-space interleave.  Differs from the explicit form only by
    fp reassociation of the folded tap sums.
    """
    w = jnp.asarray(p["w"], jnp.float32)  # [3, 3, 3, ci, co]
    if w.shape[:3] != (3, 3, 3):
        raise ValueError(f"upsample2_conv implements the k=3 up-conv; "
                         f"got kernel {w.shape[:3]}")
    co = w.shape[-1]
    for ax in range(3):
        lo = [(0, 0)] * 5
        hi = [(0, 0)] * 5
        lo[ax] = (1, 0)
        hi[ax] = (0, 1)
        w = jnp.pad(w, lo) + jnp.pad(w, hi)  # K[t] = w[t] + w[t-1]

    def phase(k, ax, q):
        # phase q keeps K[q::2] (2 taps) at window positions {0,1} (q=0)
        # / {1,2} (q=1) of a zero-padded 3-tap kernel
        taps = lax.slice_in_dim(k, q, q + 3, stride=2, axis=ax)
        pad = [(0, 0)] * 5
        pad[ax] = (q, 1 - q)
        return jnp.pad(taps, pad)

    phases = []
    for qd in (0, 1):
        wd = phase(w, 0, qd)
        for qh in (0, 1):
            wh = phase(wd, 1, qh)
            for qw in (0, 1):
                phases.append(phase(wh, 2, qw))
    wp = jnp.concatenate(phases, axis=-1)  # [3, 3, 3, ci, 8*co]
    n, d, h, ww_, _ = x.shape
    y = lax.conv_general_dilated(
        x.astype(dtype), wp.astype(dtype),
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=_DN,
    )  # [n, d, h, w, 8*co], phase-major channel order
    y = y.reshape(n, d, h, ww_, 2, 2, 2, co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    out = y.reshape(n, 2 * d, 2 * h, 2 * ww_, co)
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


def channel_dropout(key, x: jnp.ndarray, rate: float,
                    deterministic: bool) -> jnp.ndarray:
    """torch Dropout3d: zero entire channels (mask_branch.py:19)."""
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, (x.shape[0], 1, 1, 1, x.shape[-1]))
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# key utilities
# ---------------------------------------------------------------------------

def key_iter(key):
    """Infinite deterministic key splitter."""
    while True:
        key, sub = jax.random.split(key)
        yield sub
