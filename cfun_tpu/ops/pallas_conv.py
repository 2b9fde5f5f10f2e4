"""Fused Pallas TPU kernel: pre-affine + LeakyReLU + 3x3x3 conv (+ output
moment emission) for the mask U-Net's hot levels.

Reference counterpart: the cuDNN conv stacks of the Modified3DUNet
(reference mask_branch.py:11-220), where every conv / InstanceNorm /
LeakyReLU is a separate kernel with its own HBM round trip.  This kernel
fuses ALL of it for the dominant stride-1 3^3 convs:

    y = conv3x3x3( mask * lrelu( x * scale + shift ) )          (one pass)
    sums = [sum(y), sum(y^2)] per (batch, out-channel)          (for free)

* ``scale``/``shift`` carry the InstanceNorm of the PREVIOUS op's output
  (its moments were emitted by the previous fused call), so norm + lrelu
  never materialize in HBM.
* The emitted moments give the NEXT InstanceNorm without a separate
  reduction pass over the conv output.

Layout (chosen for Mosaic's vector-layout rules -- no lane<->sublane
reshapes anywhere): volumes run through the kernel as [B, D+2, H, C, W+2]
with W on the TPU lanes and C on sublanes.  The conv is one MXU
contraction per kernel z-plane:

    acc[c_out, h, w] += W2[dz][c_out, 9*C] . P[dz][h, 9*C, w]

with P built from 9 sublane/lane shifted slices of the halo'd window --
contraction depth 9*C_in (288 at 32 channels) and lane width W (80-128),
vs C_in-deep / C_out-wide for the naive per-offset form.  The H halo
comes from neighbouring grid blocks (3 z-plane views x 3 H-tile views of
the same array); H-edge/W-pad/z-pad validity is masked in-kernel because
the pre-affine must not leak into the conv's zero padding.

Inference-path only (no custom VJP); training keeps XLA convs.  Opt-in via
``Config.pallas_unet`` -- on tunneled backends each pallas_call dispatches
as a remote call (~32 ms, see CLAUDE.md), so the fused graph only pays off
on directly-attached chips.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for auto-picking the H tile (per-core VMEM is ~16 MB; leave
# headroom for Pallas' own double buffering)
_VMEM_BUDGET = 8 * 1024 * 1024


def _lanes(n: int, dtype_bytes: int = 2) -> int:
    """Physical lane footprint of a minor dim (padded to 128)."""
    return ((n + 127) // 128) * 128


def _kernel(scale_ref, shift_ref, *refs, H, W, C, C_out, Ht, T, D,
            pre_lrelu, alpha, out_dtype):
    views = refs[:9]          # [dz*3 + (dh+1)]: (1,1,Ht,C,W+2) blocks
    w_ref = refs[9]           # [C_out, 27*C]
    y_ref, stats_ref = refs[10], refs[11]
    act_s, p_s = refs[12], refs[13]

    t = pl.program_id(1)
    z = pl.program_id(2)

    # assemble the halo'd window [3, Ht+2, C, W+2] from neighbour blocks
    for dz in range(3):
        prev = views[dz * 3 + 0]      # H tile t-1 (index clamped)
        cur = views[dz * 3 + 1]
        nxt = views[dz * 3 + 2]
        act_s[dz, 0] = prev[0, 0, Ht - 1]
        act_s[dz, 1:Ht + 1] = cur[0, 0]
        act_s[dz, Ht + 1] = nxt[0, 0, 0]

    # pad-validity over (z-plane, H row, W col): the affine must not turn
    # conv zero-padding (or clamped-view garbage rows) into nonzero values
    zi = jax.lax.broadcasted_iota(jnp.int32, (3, Ht + 2, C, W + 2), 0)
    hi = jax.lax.broadcasted_iota(jnp.int32, (3, Ht + 2, C, W + 2), 1)
    wi = jax.lax.broadcasted_iota(jnp.int32, (3, Ht + 2, C, W + 2), 3)
    grow = t * Ht + hi - 1
    valid = ((z + zi >= 1) & (z + zi <= D) &
             (grow >= 0) & (grow < H) &
             (wi >= 1) & (wi <= W))

    act = act_s[:].astype(jnp.float32) * scale_ref[0] + shift_ref[0]
    if pre_lrelu:
        act = jnp.where(act >= 0, act, alpha * act)
    act_s[:] = jnp.where(valid, act, 0.0).astype(jnp.bfloat16)

    @pl.when((t == 0) & (z == 0))
    def _():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    # one 2D MXU matmul per output row: P_h [27C, W] built from 27
    # sublane/lane-shifted slices of the window; K = 27*C_in, N = W
    # (Mosaic handles only 2D dots -- 3D forms lower via unsupported
    # lane-merge reshapes)
    def row(h, carry):
        s0, s1 = carry
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    j = dz * 9 + dy * 3 + dx
                    p_s[j * C:(j + 1) * C, :] = (
                        act_s[dz, h + dy, :, dx:dx + W])
        out_h = jax.lax.dot_general(
            w_ref[:], p_s[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y_ref[0, 0, h] = out_h.astype(out_dtype)
        return s0 + out_h, s1 + jnp.square(out_h)

    zero = jnp.zeros((C_out, W), jnp.float32)
    s0, s1 = jax.lax.fori_loop(0, Ht, row, (zero, zero))
    stats_ref[0, 0] += s0
    stats_ref[0, 1] += s1


def _pick_h_tile(H, W, C, C_out):
    """Largest divisor of H fitting the VMEM budget (lane-padded sizes)."""
    wl = _lanes(W + 2)
    for ht in sorted({d for d in range(1, H + 1) if H % d == 0},
                     reverse=True):
        act = 3 * (ht + 2) * C * wl * 2
        p = 27 * C * _lanes(W) * 2
        yblk = C_out * ht * _lanes(W) * 2 * 2
        views = 9 * 2 * ht * C * wl * 2   # double-buffered blocks
        if act + p + yblk + views <= _VMEM_BUDGET:
            return ht
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("pre_lrelu", "alpha", "out_dtype", "h_tile",
                     "interpret"))
def fused_conv3d(x: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
                 shift: jnp.ndarray, *, pre_lrelu: bool = True,
                 alpha: float = 0.01, out_dtype=jnp.bfloat16,
                 h_tile: Optional[int] = None,
                 interpret: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ``conv3d(lrelu(x * scale + shift))`` with output moments.

    x: [B, D, H, W, C_in]; w: [3, 3, 3, C_in, C_out] (bias-free, as all
    U-Net convs are); scale/shift: [B, C_in] f32 (identity = ones/zeros).
    Returns (y [B, D, H, W, C_out] ``out_dtype``, sums [B, 2, C_out] f32
    where sums[:, 0] = sum(y), sums[:, 1] = sum(y^2) over spatial dims).
    """
    B, D, H, W, C = x.shape
    assert w.shape[:4] == (3, 3, 3, C), f"3x3x3 kernel expected, {w.shape}"
    C_out = w.shape[-1]
    Ht = h_tile or _pick_h_tile(H, W, C, C_out)
    T = H // Ht
    assert H % Ht == 0

    # z/W zero-pad, then channel-sublane layout [B, D+2, H, C, W+2]
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (1, 1), (0, 0), (1, 1), (0, 0)))
    xt = jnp.transpose(xp, (0, 1, 2, 4, 3))
    # [C_out, (dz*9 + dy*3 + dx)*C + ci]
    w2 = jnp.transpose(w.astype(jnp.bfloat16),
                       (4, 0, 1, 2, 3)).reshape(C_out, 27 * C)

    def view_spec(dz, dh):
        return pl.BlockSpec(
            (1, 1, Ht, C, W + 2),
            lambda b, t, z, dz=dz, dh=dh: (
                b, z + dz, jnp.clip(t + dh, 0, T - 1), 0, 0),
            memory_space=pltpu.VMEM)

    grid = (B, T, D)
    kernel = functools.partial(
        _kernel, H=H, W=W, C=C, C_out=C_out, Ht=Ht, T=T, D=D,
        pre_lrelu=pre_lrelu, alpha=alpha, out_dtype=out_dtype)

    yt, stats = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, C, 1), lambda b, t, z: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda b, t, z: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            *[view_spec(dz, dh) for dz in range(3) for dh in (-1, 0, 1)],
            pl.BlockSpec((C_out, 27 * C), lambda b, t, z: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Ht, C_out, W),
                         lambda b, t, z: (b, z, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C_out, W), lambda b, t, z: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, H, C_out, W), out_dtype),
            jax.ShapeDtypeStruct((B, 2, C_out, W), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, Ht + 2, C, W + 2), jnp.bfloat16),  # window
            pltpu.VMEM((27 * C, W), jnp.bfloat16),            # row patches
        ],
        interpret=interpret,
    )(scale.astype(jnp.float32)[..., None],
      shift.astype(jnp.float32)[..., None],
      *([xt] * 9), w2)
    y = jnp.transpose(yt, (0, 1, 2, 4, 3))
    return y, jnp.sum(stats, axis=-1)


def in_affine_from_sums(sums: jnp.ndarray, n_spatial: int,
                        eps: float = 1e-5
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """InstanceNorm as a per-(batch, channel) affine from emitted moments:
    returns (scale, shift) with IN(x) = x * scale + shift."""
    mean = sums[:, 0] / n_spatial
    var = sums[:, 1] / n_spatial - jnp.square(mean)
    scale = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return scale, -mean * scale


def identity_affine(b: int, c: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.ones((b, c), jnp.float32), jnp.zeros((b, c), jnp.float32)
