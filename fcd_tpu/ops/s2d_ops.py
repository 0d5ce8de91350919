"""Space-to-depth-resident ops for the lane-padding-bound U-Net levels.

On TPU, any channels-last tensor with C < 128 is physically padded to 128
lanes in HBM (T(8,128) tiling) — a (B,128^3,16) activation occupies ~1 GB
and every elementwise pass moves all of it. The top U-Net levels are
therefore HBM-bound on padding, not compute (profiled: enc1+dec1 = ~39 ms
of a 58 ms MS_DSA_NET forward). These ops keep whole residual blocks
resident in the s2d layout (B, D/2, H/2, W/2, 8C) — lane-dense for
C >= 16 — so convs run on the blocked-GEMM Pallas kernel and every
norm/act/residual pass moves 8x fewer bytes.

Layout convention: parity-major channel groups, group g = 4*pz + 2*py + px
holding the original channels of the voxel at intra-block parity
(pz, py, px) (same as kernels.block_conv.space_to_depth).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from fcd_tpu.kernels.block_conv import (
    _blocked_conv_s2d,
    depth_to_space,
    make_blocked_weights,
    space_to_depth,
)


def to_s2d(x: jnp.ndarray) -> jnp.ndarray:
    return space_to_depth(x)


def from_s2d(xs: jnp.ndarray, c: int) -> jnp.ndarray:
    return depth_to_space(xs, c)


def reinterleave_to_padded(xs: jnp.ndarray, c: int) -> jnp.ndarray:
    """Aligned s2d -> s2d of the zero-padded (by 1 voxel) volume.

    For output group g' with parity bits b', the source is the complement
    group, spatially shifted back by (1 - b') blocks. Pure slice+pad+concat
    at lane-dense layouts.
    """
    b, d2, h2, w2, c8 = xs.shape
    parts = []
    for g_out in range(8):
        bz, by, bx = (g_out >> 2) & 1, (g_out >> 1) & 1, g_out & 1
        g_src = (4 * (1 - bz) + 2 * (1 - by) + (1 - bx))
        src = xs[..., g_src * c:(g_src + 1) * c]
        pad = [(0, 0)]
        for bit in (bz, by, bx):
            pad.append((1, 0) if bit == 0 else (0, 1))
        pad.append((0, 0))
        parts.append(jnp.pad(src, pad))
    return jnp.concatenate(parts, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_s2d(xs: jnp.ndarray, w: jnp.ndarray, out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """3x3x3 'same' conv on an aligned-s2d tensor: reinterleave + blocked-GEMM
    Pallas kernel. Output is aligned s2d of the conv output (8*cout channels).
    w: (3, 3, 3, cin, cout)."""
    return _conv3x3_s2d_fwd_impl(xs, w, out_dtype)


def _conv_form() -> str:
    """Which blocked-conv formulation conv3x3_s2d uses (FCD_S2D_CONV):

    'padded27' (default): XLA spatial zero-pad of the aligned s2d tensor
    (no lane manipulation) + 27-tap kernel whose shifts are static slices
    fused into the matmul operands. No VPU shift work.
    'aligned': 27-tap roll+mask kernel on the unpadded tensor (VPU-bound
    shift construction; the round-1 form).
    '8tap': reinterleave (lane-granular slice+pad+concat — slow in XLA)
    feeding the 8-tap kernel; 2.37x FLOP redundancy but loses to the
    reinterleave cost. Kept for A/B reference.
    """
    import os

    return os.environ.get("FCD_S2D_CONV", "padded27")


def _conv3x3_s2d_fwd_impl(xs, w, out_dtype):
    from fcd_tpu.kernels.block_conv import (
        blocked_conv_s2d_aligned,
        blocked_conv_s2d_padded27,
        make_blocked_weights_aligned,
    )

    cin, cout = w.shape[3], w.shape[4]
    interpret = jax.default_backend() != "tpu"   # CPU tests run interpreted
    form = _conv_form()
    if form == "8tap":
        wblk = make_blocked_weights(w.astype(jnp.float32)).astype(jnp.bfloat16)
        xp = reinterleave_to_padded(xs.astype(jnp.bfloat16), cin)
        return _blocked_conv_s2d(xp, wblk, 8 * cout, out_dtype, interpret)
    wblk = make_blocked_weights_aligned(w.astype(jnp.float32)).astype(jnp.bfloat16)
    if form == "padded27":
        return blocked_conv_s2d_padded27(xs.astype(jnp.bfloat16), wblk, cin,
                                         8 * cout, out_dtype, interpret)
    return blocked_conv_s2d_aligned(xs.astype(jnp.bfloat16), wblk, cin,
                                    8 * cout, out_dtype, interpret)


def _conv3x3_s2d_fwd(xs, w, out_dtype):
    return _conv3x3_s2d_fwd_impl(xs, w, out_dtype), (xs, w)


def _conv3x3_s2d_bwd(out_dtype, res, g):
    xs, w = res
    cin, cout = w.shape[3], w.shape[4]
    # dx: conv of g with spatially-flipped, channel-transposed weights
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dxs = _conv3x3_s2d_fwd_impl(g, w_flip, jnp.float32).astype(xs.dtype)
    # dw: XLA conv weight-grad on the de-s2d'd tensors (backward-only cost)
    x_full = from_s2d(xs.astype(jnp.float32), cin)
    g_full = from_s2d(g.astype(jnp.float32), cout)
    _, w_vjp = jax.vjp(
        lambda wv: jax.lax.conv_general_dilated(
            x_full, wv, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ),
        w.astype(jnp.float32),
    )
    (dw,) = w_vjp(g_full)
    return dxs, dw.astype(w.dtype)


conv3x3_s2d.defvjp(_conv3x3_s2d_fwd, _conv3x3_s2d_bwd)


def conv1x1_s2d(xs: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """1x1x1 conv in s2d: one dense matmul with a block-diagonal (per-group)
    weight. w: (cin, cout) or (1,1,1,cin,cout)."""
    if w.ndim == 5:
        w = w[0, 0, 0]
    cin, cout = w.shape
    wbig = jnp.zeros((8 * cin, 8 * cout), w.dtype)
    for g in range(8):
        wbig = wbig.at[g * cin:(g + 1) * cin, g * cout:(g + 1) * cout].set(w)
    return jnp.einsum("bdhwk,kc->bdhwc", xs, wbig.astype(xs.dtype),
                      preferred_element_type=jnp.float32).astype(xs.dtype)


def instance_norm_s2d(xs: jnp.ndarray, c: int, eps: float = 1e-5) -> jnp.ndarray:
    """Instance norm over (spatial x parity groups) per true channel, without
    materializing any lane-sparse intermediate: spatial sums give (B, 8c)
    which is tiny to regroup."""
    b = xs.shape[0]
    n = xs.shape[1] * xs.shape[2] * xs.shape[3] * 8
    xf = xs.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2, 3))                   # (B, 8c)
    s2 = jnp.sum(jnp.square(xf), axis=(1, 2, 3))
    s1 = s1.reshape(b, 8, c).sum(axis=1)               # (B, c)
    s2 = s2.reshape(b, 8, c).sum(axis=1)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)                   # (B, c)
    shift = -mean * scale
    scale8 = jnp.tile(scale, (1, 8))[:, None, None, None, :]
    shift8 = jnp.tile(shift, (1, 8))[:, None, None, None, :]
    return (xf * scale8 + shift8).astype(xs.dtype)


def leaky_relu_s2d(xs: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    return jax.nn.leaky_relu(xs, negative_slope=negative_slope)


def max_pool_2x_s2d_exit(xs: jnp.ndarray, c: int) -> jnp.ndarray:
    """2x max pool consuming an s2d tensor: max over the 8 parity groups ->
    the pooled volume at the s2d grid resolution, dense exit for the next
    (half-resolution) level. Returns (B, D/2, H/2, W/2, C)."""
    b, d2, h2, w2, c8 = xs.shape
    v = xs.reshape(b, d2, h2, w2, 8, c)
    return jnp.max(v, axis=4)


def upsample2x_into_s2d(x: jnp.ndarray, w: jnp.ndarray,
                        b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Transposed conv k2 s2 emitting directly into s2d layout: every output
    2x2x2 block depends on exactly one input voxel, so the whole op is one
    matmul [.., cin] x [cin, 8*cout] — no spatial rearrangement at all.
    w: (2, 2, 2, cin, cout) (DHWIO with flax ConvTranspose orientation)."""
    cin, cout = w.shape[3], w.shape[4]
    # lax.conv_transpose flips the kernel: output sub-voxel (qz,qy,qx)
    # uses tap (1-qz, 1-qy, 1-qx)
    wf = jnp.flip(w, axis=(0, 1, 2))
    wm = wf.reshape(8, cin, cout).transpose(1, 0, 2).reshape(cin, 8 * cout)
    out = jnp.einsum("bdhwc,ck->bdhwk", x, wm.astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + jnp.tile(b, 8).astype(out.dtype)
    return out


def s2d_supported(shape: Sequence[int], cin: int, cout: int) -> bool:
    """Eligibility of a residual block for s2d-resident execution."""
    from fcd_tpu.kernels.block_conv import fast_conv_supported

    return fast_conv_supported(shape, cin, cout, (3, 3, 3), (1, 1, 1))
