"""Pallas TPU kernels: 3x3x3 conv as output-block GEMMs in s2d form.

Why: any channels-last tensor with C < 128 is lane-padded to 128 in HBM,
and XLA's direct 3D conv at the U-Net's top levels (C=16..32 on 128^3
grids) cannot fill the 128-lane MXU with a 16-wide contraction/output.
Re-blocking so one GEMM row computes a 2x2x2 *block* of output voxels
turns the conv into [H/2*W/2, 8C] x [8C, 8C'] matmuls with every
dimension >= 128 — full MXU tiles at a fixed FLOP redundancy.

Two formulations:
- padded-frame (8 taps, `blocked_conv3x3`): input zero-padded by 1 then
  s2d'd so every patch is the concat of 8 unit-shifted s2d voxels. The
  reinterleave/pad HBM round-trips around the kernel cost more than the
  matmuls — kept for the standalone conv API and as the reference form.
- ALIGNED (27 taps, `blocked_conv_s2d_aligned`): consumes the aligned s2d
  tensor directly; depth shifts come from three clamped row specs, H/W
  shifts are roll+mask reads inside VMEM. 27/8 more matmul work but no
  layout round-trip — the production path (ops.s2d_ops.conv3x3_s2d),
  measured ~2.5x faster end-to-end on v5e.
"""

from __future__ import annotations

import functools
import itertools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_blocked_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Cin,Cout) -> (8, 8*Cin, 8*Cout): per-shift GEMM weights.

    Index layout: shift s=(sz,sy,sx) selects the matrix; input channels are
    the s2d parity-major (pz0,py0,px0,ci) order, output channels the s2d
    (qz,qy,qx,co) order. For output sub-voxel q and kernel tap k, the
    padded patch coordinate is p = q + k in 0..3, split s = p >> 1,
    p0 = p & 1.
    """
    cin, cout = w.shape[3], w.shape[4]
    # static tap-selection tensor: T[s, p0, q, k] = 1 iff padded patch
    # coordinate p = q + k satisfies s = p >> 1 and p0 = p & 1 (per axis)
    global _TAP_TABLE
    if _TAP_TABLE is None:
        t = np.zeros((8, 8, 8, 27), np.float32)
        for q in itertools.product(range(2), repeat=3):
            for ki, kk in enumerate(itertools.product(range(3), repeat=3)):
                p = tuple(q[i] + kk[i] for i in range(3))
                s = tuple(v >> 1 for v in p)
                p0 = tuple(v & 1 for v in p)
                si = 4 * s[0] + 2 * s[1] + s[2]
                pi = 4 * p0[0] + 2 * p0[1] + p0[2]
                qi = 4 * q[0] + 2 * q[1] + q[2]
                t[si, pi, qi, ki] = 1.0
        _TAP_TABLE = t
    table = jnp.asarray(_TAP_TABLE, w.dtype)
    wb = jnp.einsum("kio,spqk->spioq", w.reshape(27, cin, cout), table)
    # (s, p0, cin, cout, q) -> (s, p0*cin, q*cout)
    return wb.transpose(0, 1, 2, 4, 3).reshape(8, 8 * cin, 8 * cout)


_TAP_TABLE = None


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, D/2, H/2, W/2, 8C), parity-major channels."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, d // 2, h // 2, w // 2, 8 * c)


def depth_to_space(x: jnp.ndarray, cout: int) -> jnp.ndarray:
    b, d2, h2, w2, _ = x.shape
    x = x.reshape(b, d2, h2, w2, 2, 2, 2, cout)
    return x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d2 * 2, h2 * 2, w2 * 2, cout)


def _conv_kernel(x_lo_ref, x_hi_ref, w_ref, out_ref, acc_ref):
    """One (batch, depth-row) step: s2d output row Z from s2d rows Z, Z+1.

    Slice-then-dot ordering matters: slicing H first (row subrange) and
    feeding the W subrange slice straight into dot_general lets Mosaic fuse
    the shifted read into the matmul operand (no materialized copies).
    """
    h2 = out_ref.shape[2]
    w2 = out_ref.shape[3]

    rows = (x_lo_ref[0, 0], x_hi_ref[0, 0])   # each (H2+1, W2+1, 8C)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for sz in range(2):
        base = rows[sz]
        for sy in range(2):
            r = base[sy:sy + h2]              # (H2, W2+1, 8C)
            for sx in range(2):
                sl = r[:, sx:sx + w2, :]
                tap = 4 * sz + 2 * sy + sx
                acc_ref[...] += jax.lax.dot_general(
                    sl, w_ref[tap], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    out_ref[0, 0] = acc_ref[...].astype(out_ref.dtype)


def make_blocked_weights_aligned(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Cin,Cout) -> (27, 8*Cin, 8*Cout) GEMM weights for the ALIGNED
    27-tap formulation: tap (r,u,v) in {-1,0,1}^3 shifts whole s2d blocks;
    input parity p, output parity q and kernel index k relate per axis by
    k = 2*shift + p - q + 1 (k in 0..2)."""
    cin, cout = w.shape[3], w.shape[4]
    global _TAP_TABLE27
    if _TAP_TABLE27 is None:
        t = np.zeros((27, 8, 8, 27), np.float32)
        shifts = [(-1, 0, 1)[i] for i in range(3)]
        import itertools as it

        for ti, (rz, ry, rx) in enumerate(it.product(shifts, repeat=3)):
            for p in it.product(range(2), repeat=3):
                for q in it.product(range(2), repeat=3):
                    ks = [2 * r + pp - qq + 1 for r, pp, qq in
                          zip((rz, ry, rx), p, q)]
                    if all(0 <= kv <= 2 for kv in ks):
                        ki = 9 * ks[0] + 3 * ks[1] + ks[2]
                        pi = 4 * p[0] + 2 * p[1] + p[2]
                        qi = 4 * q[0] + 2 * q[1] + q[2]
                        t[ti, pi, qi, ki] = 1.0
        _TAP_TABLE27 = t
    table = jnp.asarray(_TAP_TABLE27, w.dtype)
    wb = jnp.einsum("kio,tpqk->tpioq", w.reshape(27, cin, cout), table)
    return wb.transpose(0, 1, 2, 4, 3).reshape(27, 8 * cin, 8 * cout)


_TAP_TABLE27 = None


def _roll_mask(x, shift: int, axis: int):
    """Shifted read with zero boundary: out[i] = x[i + shift] (zero outside),
    built from pltpu.roll + an iota mask (Mosaic-friendly; pad/concat are
    not supported on non-trivial dims inside kernels)."""
    if shift == 0:
        return x
    n = x.shape[axis]
    amt = (-shift) % n
    # Mosaic only rotates 32-bit data (bf16 packs SUBLANE pairs, so a
    # bitcast trick would roll W in units of 2): rotate in f32
    orig_dtype = x.dtype
    xr = x.astype(jnp.float32) if orig_dtype == jnp.bfloat16 else x
    rolled = pltpu.roll(xr, amt, axis)
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if shift > 0:
        mask = ids < (n - shift)
    else:
        mask = ids >= (-shift)
    out = jnp.where(mask, rolled, jnp.zeros_like(rolled))
    return out.astype(orig_dtype)


def _make_aligned_kernel(h2: int, w2: int, cin: int):
    """Kernel over ALIGNED s2d rows: out row Z = sum over 27 block-shift taps
    of (shifted slab) @ W_tap. Block shifts in D come from the three row
    specs; H/W shifts are roll+mask reads. No reinterleave tensor ever
    exists — the 27/8 extra matmul work is far cheaper than the HBM
    round-trip + layout conversions it replaces."""

    def kernel(x_m1_ref, x_0_ref, x_p1_ref, w_ref, out_ref, acc_ref):
        z = pl.program_id(1)
        n_z = pl.num_programs(1)
        row_m1 = x_m1_ref[0, 0] * jnp.where(z > 0, 1.0, 0.0).astype(x_m1_ref.dtype)
        row_0 = x_0_ref[0, 0]
        row_p1 = x_p1_ref[0, 0] * jnp.where(z < n_z - 1, 1.0, 0.0).astype(
            x_p1_ref.dtype
        )
        rows = {-1: row_m1, 0: row_0, 1: row_p1}

        acc_ref[...] = jnp.zeros_like(acc_ref)
        tap = 0
        for r in (-1, 0, 1):
            base = rows[r]
            for u in (-1, 0, 1):
                su = _roll_mask(base, u, 0)
                for v in (-1, 0, 1):
                    sl = _roll_mask(su, v, 1)
                    acc_ref[...] += jax.lax.dot_general(
                        sl, w_ref[tap], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    tap += 1
        out_ref[0, 0] = acc_ref[...].astype(out_ref.dtype)

    return kernel


def _make_padded27_kernel(h2: int, w2: int):
    """27-tap kernel over a spatially PRE-PADDED aligned-s2d tensor: every
    block shift is a static slice of the (H2+2, W2+2) slabs, which Mosaic
    fuses straight into the matmul operands — no roll/mask VPU work at all
    (the rolls were the bottleneck: 35% -> ~70% MXU on the level-1 shape)."""

    def kernel(x_m1_ref, x_0_ref, x_p1_ref, w_ref, out_ref, acc_ref):
        rows = (x_m1_ref[0, 0], x_0_ref[0, 0], x_p1_ref[0, 0])
        acc_ref[...] = jnp.zeros_like(acc_ref)
        tap = 0
        for r in range(3):
            base = rows[r]
            for u in range(3):
                su = base[u:u + h2]
                for v in range(3):
                    sl = su[:, v:v + w2, :]
                    acc_ref[...] += jax.lax.dot_general(
                        sl, w_ref[tap], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    tap += 1
        out_ref[0, 0] = acc_ref[...].astype(out_ref.dtype)

    return kernel


def blocked_conv_s2d_padded27(xs: jnp.ndarray, wblk: jnp.ndarray, cin: int,
                              cout8: int, out_dtype, interpret: bool) -> jnp.ndarray:
    """Blocked conv on aligned s2d input (B, D2, H2, W2, 8cin): spatial
    zero-pad by one block per side (pure XLA pad, lane layout untouched),
    then the padded-27-tap kernel. Same weights as the aligned form
    (make_blocked_weights_aligned)."""
    bsz, d2, h2, w2, c8 = xs.shape
    xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        _make_padded27_kernel(h2, w2),
        grid=(bsz, d2),
        in_specs=[
            pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8), lambda b, z: (b, z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8), lambda b, z: (b, z + 1, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8), lambda b, z: (b, z + 2, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, c8, cout8), lambda b, z: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h2, w2, cout8),
                               lambda b, z: (b, z, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d2, h2, w2, cout8), out_dtype),
        scratch_shapes=[pltpu.VMEM((h2, w2, cout8), jnp.float32)],
        interpret=interpret,
    )(xp, xp, xp, wblk)


def blocked_conv_s2d_aligned(xs: jnp.ndarray, wblk: jnp.ndarray, cin: int,
                             cout8: int, out_dtype, interpret: bool) -> jnp.ndarray:
    """Blocked conv consuming the ALIGNED s2d tensor (B, D2, H2, W2, 8cin)."""
    bsz, d2, h2, w2, c8 = xs.shape

    def clamp_lo(b, z):
        return (b, jnp.maximum(z - 1, 0), 0, 0, 0)

    def clamp_hi(b, z):
        return (b, jnp.minimum(z + 1, d2 - 1), 0, 0, 0)

    return pl.pallas_call(
        _make_aligned_kernel(h2, w2, cin),
        grid=(bsz, d2),
        in_specs=[
            pl.BlockSpec((1, 1, h2, w2, c8), clamp_lo, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h2, w2, c8), lambda b, z: (b, z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h2, w2, c8), clamp_hi, memory_space=pltpu.VMEM),
            pl.BlockSpec((27, c8, cout8), lambda b, z: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h2, w2, cout8),
                               lambda b, z: (b, z, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d2, h2, w2, cout8), out_dtype),
        scratch_shapes=[pltpu.VMEM((h2, w2, cout8), jnp.float32)],
        interpret=interpret,
    )(xs, xs, xs, wblk)


def _blocked_conv_s2d(xs: jnp.ndarray, wblk: jnp.ndarray, cout8: int,
                      out_dtype, interpret: bool) -> jnp.ndarray:
    bsz, d2p, h2p, w2p, c8 = xs.shape
    d2, h2, w2 = d2p - 1, h2p - 1, w2p - 1
    return pl.pallas_call(
        _conv_kernel,
        grid=(bsz, d2),
        in_specs=[
            pl.BlockSpec((1, 1, h2p, w2p, c8), lambda b, z: (b, z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h2p, w2p, c8), lambda b, z: (b, z + 1, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c8, cout8), lambda b, z: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h2, w2, cout8),
                               lambda b, z: (b, z, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d2, h2, w2, cout8), out_dtype),
        scratch_shapes=[pltpu.VMEM((h2, w2, cout8), jnp.float32)],
        interpret=interpret,
    )(xs, xs, wblk)


def _forward(x, w, out_dtype, interpret):
    bsz, d, h, w_dim, cin = x.shape
    cout = w.shape[-1]
    # pad tiny channel counts (e.g. the 2-channel stem) so 8*cin fills lanes
    if cin < 16:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, 16 - cin),))
        w = jnp.pad(w, ((0, 0),) * 3 + ((0, 16 - cin), (0, 0)))
        cin = 16
    wblk = make_blocked_weights(w.astype(jnp.float32)).astype(jnp.bfloat16)
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xs = space_to_depth(xp)
    out_s2d = _blocked_conv_s2d(xs, wblk, 8 * cout, out_dtype, interpret)
    return depth_to_space(out_s2d, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def blocked_conv3x3(x: jnp.ndarray, w: jnp.ndarray, out_dtype=jnp.bfloat16,
                    interpret: bool = False) -> jnp.ndarray:
    """3x3x3 stride-1 'same' conv, NDHWC, via the blocked-GEMM Pallas kernel.

    Differentiable: dx reuses the same kernel with spatially-flipped,
    in/out-transposed weights; dw falls back to XLA's conv weight-grad.
    """
    return _forward(x, w, out_dtype, interpret)


def _fwd(x, w, out_dtype, interpret):
    return _forward(x, w, out_dtype, interpret), (x, w)


def _bwd(out_dtype, interpret, res, g):
    x, w = res
    # dx: correlate g with flipped weights, channels transposed
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _forward(g.astype(jnp.bfloat16), w_flip, jnp.float32, interpret)
    dx = dx[..., : x.shape[-1]].astype(x.dtype)
    # dw: XLA's conv weight-grad (different GEMM shape; XLA handles it fine)
    _, w_vjp = jax.vjp(
        lambda wv: jax.lax.conv_general_dilated(
            x.astype(jnp.float32), wv, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ),
        w.astype(jnp.float32),
    )
    (dw,) = w_vjp(g.astype(jnp.float32))
    return dx, dw.astype(w.dtype)


blocked_conv3x3.defvjp(_fwd, _bwd)


def fast_conv_supported(shape, cin: int, cout: int, kernel_size, stride) -> bool:
    """Applicability: k3 s1, even spatial dims, channel counts where the
    blocked GEMM beats XLA's direct conv, VMEM-fitting slabs."""
    if tuple(kernel_size) != (3, 3, 3) or tuple(stride) != (1, 1, 1):
        return False
    d, h, w = shape
    if d % 2 or h % 2 or w % 2 or min(d, h, w) < 8:
        return False
    if cin > 64 or cout > 64 or cout < 8:
        return False

    def pad_to(v, m):
        return (v + m - 1) // m * m

    cin_eff = max(cin, 16)
    h2, w2 = h // 2, w // 2
    # VMEM estimate with Mosaic (8,128) tiling padding: 2 input specs x
    # double buffering, double-buffered output, f32 accumulator, weights
    slab = (h2 + 1) * pad_to(w2 + 1, 8) * pad_to(8 * cin_eff, 128) * 2
    out_b = h2 * pad_to(w2, 8) * pad_to(8 * cout, 128) * 2
    acc = h2 * pad_to(w2, 8) * pad_to(8 * cout, 128) * 4
    wbytes = 8 * 8 * cin_eff * 8 * cout * 2
    return 4 * slab + 2 * out_b + acc + wbytes < 11 * 1024 * 1024


def reference_conv3x3(x, w, b=None):
    """lax direct conv (parity oracle and fallback)."""
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        out = out + b
    return out
