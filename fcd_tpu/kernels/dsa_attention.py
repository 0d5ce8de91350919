"""Fused dual-self-attention (DSA) Pallas TPU kernel.

Replaces the ~20 fusion-hostile HLOs of the einsum formulation
(fcd_tpu.ops.attention.DSA; reference math:
networks/ms_dsa_net/conv_blocks.py:211-359) with two Pallas passes over
token tiles plus tiny XLA glue on (C,C)/(C,P)-sized tensors:

Phase A — one reduction pass over the post-LN tokens accumulates
  - qk_raw (C, C) = q^T k              (channel affinity, unnormalized)
  - q2, k2 (C,)   = column sums of squares (for the l2 normalization —
                    the normalizers are global over N, so
                    qn^T kn = diag(rsqrt(q2)) qk_raw diag(rsqrt(k2)))
  - kp, vp (C, P) = k^T EF, v_sa^T EF  (the learned sequence projection)

Glue (XLA, tiny) — per-head softmax of the channel affinity, assembled
into a block-diagonal (C, C) matrix; per-head projected keys/values
masked into full-width (C, P)/(P, C) operands.

Phase B — one map pass over token tiles: channel attention is a single
(T, C) x (C, C) GEMM against the block-diagonal attention, spatial
attention is per-head (T, C) x (C, P) -> softmax over P -> (T, P) x (P, C)
GEMMs whose operands are zero outside the head's rows/columns — so every
GEMM keeps full 128-lane operands and no (T, c<128) lane-sparse
intermediate ever exists. Output assembly is head-major, matching
ops.attention.DSA exactly.

Dropout on the attention matrices (train mode) is not expressible here
without in-kernel RNG bookkeeping; callers fall back to the einsum path
when attention dropout is active.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12  # matches ops.attention._l2_normalize


def _pick_tile(n: int) -> int:
    """Token-tile size: bounded VMEM, N must tile evenly (4096 A/B'd vs
    1024 on v5e in-model: 0.91 vs 0.97 ms phase B at the level-3 shape)."""
    for t in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return min(t, n)
    return n


def _token_prologue(x_ref, pe_ref, lns_ref, lnb_ref, ln_eps: float):
    """Raw-token prologue shared by both phases: (+pos-embed,) LayerNorm.

    Returns (t, xln): the residual base (tokens + pe, f32) and the
    normalized tokens in the input dtype. With no LN refs, x IS already
    post-LN and passes through."""
    x = x_ref[0]                       # (T, C)
    if lns_ref is None:
        return None, x
    t = x.astype(jnp.float32)
    if pe_ref is not None:
        t = t + pe_ref[...].astype(jnp.float32)
    mu = jnp.mean(t, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(t), axis=-1, keepdims=True) - jnp.square(mu)
    xln = (t - mu) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + ln_eps)
    xln = xln * lns_ref[0] + lnb_ref[0]
    return t, xln.astype(x.dtype)


def _phase_a_kernel(*refs, v_sa_slot: int, has_pe: bool, has_ln: bool,
                    ln_eps: float):
    idx = 0
    x_ref = refs[idx]; idx += 1
    pe_ref = None
    lns_ref = lnb_ref = None
    if has_pe:
        pe_ref = refs[idx]; idx += 1
    if has_ln:
        lns_ref, lnb_ref = refs[idx], refs[idx + 1]; idx += 2
    w_ref, ef_ref = refs[idx], refs[idx + 1]; idx += 2
    qk_ref, q2_ref, k2_ref, kp_ref, vp_ref = refs[idx:idx + 5]

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        qk_ref[...] = jnp.zeros_like(qk_ref)
        q2_ref[...] = jnp.zeros_like(q2_ref)
        k2_ref[...] = jnp.zeros_like(k2_ref)
        kp_ref[...] = jnp.zeros_like(kp_ref)
        vp_ref[...] = jnp.zeros_like(vp_ref)

    _, x = _token_prologue(x_ref, pe_ref, lns_ref, lnb_ref, ln_eps)
    ef = ef_ref[...]                   # (T, P)

    def proj(slot):
        return jax.lax.dot_general(
            x, w_ref[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    q = proj(0)
    k = proj(1)
    qk_ref[0] += jax.lax.dot_general(
        q, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    q2_ref[0] += jnp.sum(jnp.square(q), axis=0, keepdims=True)
    k2_ref[0] += jnp.sum(jnp.square(k), axis=0, keepdims=True)
    kb = k.astype(x.dtype)
    kp_ref[0] += jax.lax.dot_general(
        kb, ef, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    if v_sa_slot >= 0:
        v_sa = proj(v_sa_slot).astype(x.dtype)
        vp_ref[0] += jax.lax.dot_general(
            v_sa, ef, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _phase_b_kernel(*refs, sa_type: str, num_heads: int,
                    v_ca_slot: int, v_sa_slot: int, has_pe: bool,
                    has_ln: bool, has_res: bool, ln_eps: float):
    idx = 0
    x_ref = refs[idx]; idx += 1
    pe_ref = None
    lns_ref = lnb_ref = gamma_ref = None
    if has_pe:
        pe_ref = refs[idx]; idx += 1
    if has_ln:
        lns_ref, lnb_ref = refs[idx], refs[idx + 1]; idx += 2
    if has_res:
        gamma_ref = refs[idx]; idx += 1
    w_ref, qn_ref, abig_ref, kbig_ref, vbig_ref = refs[idx:idx + 5]
    out_ref = refs[idx + 5]

    tbase, x = _token_prologue(x_ref, pe_ref, lns_ref, lnb_ref, ln_eps)

    def proj(slot):
        return jax.lax.dot_general(
            x, w_ref[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = None

    if sa_type in ("channel", "parallel"):
        v_ca = proj(v_ca_slot).astype(x.dtype)
        out = jax.lax.dot_general(
            v_ca, abig_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if sa_type != "channel":
        qn = (proj(0) * qn_ref[0]).astype(x.dtype)   # (T, C), per-col scaled
        sa_acc = None
        for j in range(num_heads):
            s = jax.lax.dot_general(
                qn, kbig_ref[0, j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (T, P)
            s = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            part = jax.lax.dot_general(
                s, vbig_ref[0, j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (T, C), head-j cols
            sa_acc = part if sa_acc is None else sa_acc + part
        if sa_type == "serial":
            # spatial output re-read as the values of channel attention
            out = jax.lax.dot_general(
                sa_acc.astype(x.dtype), abig_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif out is None:
            out = sa_acc
        else:
            out = out + sa_acc

    if has_res:
        # residual epilogue: out = (tokens + pe) + gamma * attn — the
        # post-attention token tensor never round-trips HBM separately
        out = tbase + gamma_ref[0] * out
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "sa_type", "interpret", "ln_eps"),
)
def dsa_fused(
    xln: jnp.ndarray,           # (B, N, C) tokens — post-LN, or RAW with ln_*
    w_qkvv: jnp.ndarray,        # (num_slots, C, C) projection weights
    ef: jnp.ndarray,            # (N, P) learned sequence projection
    temperature: jnp.ndarray,   # (h,) channel-attention temperature
    temperature2: jnp.ndarray,  # (h,) spatial-attention temperature
    *,
    num_heads: int,
    sa_type: str = "parallel",
    ln_scale: jnp.ndarray = None,   # (C,) fuse LayerNorm into the kernels:
    ln_bias: jnp.ndarray = None,    # xln is then the RAW token tensor
    ln_eps: float = 1e-5,
    pos_embed: jnp.ndarray = None,  # (N, C) fused pos-embed add
    res_gamma: jnp.ndarray = None,  # (C,) fused residual: out = t + gamma*attn
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused DSA forward. Returns (B, N, C), head-major assembly —
    numerically equivalent (eval mode) to ops.attention.DSA.

    With ln_scale/ln_bias the input is the RAW token tensor and both
    phases apply (pos-embed +) LayerNorm in their VMEM prologue; with
    res_gamma phase B emits the transformer residual directly — the
    normalized tokens and the attention output never round-trip HBM
    (the separate LN pass costs ~2.5 ms/volume at the level-3 shape)."""
    b, n, c = xln.shape
    p = ef.shape[1]
    h = num_heads
    ch = c // h
    tile = _pick_tile(n)
    nt = n // tile
    dtype = xln.dtype
    has_ln = ln_scale is not None
    has_pe = pos_embed is not None
    has_res = res_gamma is not None
    assert has_ln or (not has_pe and not has_res)

    v_ca_slot = 2
    v_sa_slot = {"parallel": 3, "spatial": 2, "serial": 2, "channel": -1}[sa_type]

    ef_b = ef.astype(dtype)
    w_b = w_qkvv.astype(dtype)

    tok_specs = [pl.BlockSpec((1, tile, c), lambda bb, t: (bb, t, 0),
                              memory_space=pltpu.VMEM)]
    tok_inputs = [xln]
    if has_pe:
        tok_specs.append(pl.BlockSpec((tile, c), lambda bb, t: (t, 0),
                                      memory_space=pltpu.VMEM))
        tok_inputs.append(pos_embed.astype(jnp.float32))
    if has_ln:
        aff = pl.BlockSpec((1, c), lambda bb, t: (0, 0),
                           memory_space=pltpu.VMEM)
        tok_specs += [aff, aff]
        tok_inputs += [ln_scale.reshape(1, c).astype(jnp.float32),
                       ln_bias.reshape(1, c).astype(jnp.float32)]

    # ---- Phase A: global reductions over tokens ----
    qk_raw, q2, k2, kp, vp = pl.pallas_call(
        functools.partial(_phase_a_kernel, v_sa_slot=v_sa_slot,
                          has_pe=has_pe, has_ln=has_ln, ln_eps=ln_eps),
        grid=(b, nt),
        in_specs=tok_specs + [
            pl.BlockSpec(w_qkvv.shape, lambda bb, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, p), lambda bb, t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, c), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, p), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, p), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c, p), jnp.float32),
            jax.ShapeDtypeStruct((b, c, p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*tok_inputs, w_b, ef_b)

    # ---- Glue: tiny per-head softmax + block-structured operands ----
    qnorm = jax.lax.rsqrt(q2[:, 0, :] + _EPS)          # (B, C)
    knorm = jax.lax.rsqrt(k2[:, 0, :] + _EPS)
    qk_n = qk_raw * qnorm[:, :, None] * knorm[:, None, :]

    # per-head channel attention, assembled block-diagonal (transposed so
    # phase B computes out = v @ abig with out[n, c] = sum_d A[c, d] v[n, d])
    abig = jnp.zeros((b, c, c), jnp.float32)
    for j in range(h):
        blk = qk_n[:, j * ch:(j + 1) * ch, j * ch:(j + 1) * ch]
        aj = jax.nn.softmax(blk * temperature[j], axis=-1)
        abig = abig.at[:, j * ch:(j + 1) * ch, j * ch:(j + 1) * ch].set(
            jnp.swapaxes(aj, 1, 2))

    # per-head spatial operands: keys masked to head rows (with the
    # temperature folded in), values transposed into head columns
    kbig = jnp.zeros((b, h, c, p), jnp.float32)
    vbig = jnp.zeros((b, h, p, c), jnp.float32)
    for j in range(h):
        sl = slice(j * ch, (j + 1) * ch)
        kbig = kbig.at[:, j, sl, :].set(kp[:, sl, :] * temperature2[j])
        vbig = vbig.at[:, j, :, sl].set(jnp.swapaxes(vp[:, sl, :], 1, 2))

    qn_row = qnorm[:, None, :]                          # (B, 1, C)

    res_specs, res_inputs = [], []
    if has_res:
        res_specs.append(pl.BlockSpec((1, c), lambda bb, t: (0, 0),
                                      memory_space=pltpu.VMEM))
        res_inputs.append(res_gamma.reshape(1, c).astype(jnp.float32))

    # ---- Phase B: per-tile outputs ----
    # collapse the batch dim into the kernel grid; per-batch operands
    out = pl.pallas_call(
        functools.partial(_phase_b_kernel, sa_type=sa_type, num_heads=h,
                          v_ca_slot=v_ca_slot, v_sa_slot=v_sa_slot,
                          has_pe=has_pe, has_ln=has_ln, has_res=has_res,
                          ln_eps=ln_eps),
        grid=(b, nt),
        in_specs=tok_specs + res_specs + [
            pl.BlockSpec(w_qkvv.shape, lambda bb, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, c), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, c, p), lambda bb, t: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, p, c), lambda bb, t: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda bb, t: (bb, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*tok_inputs, *res_inputs, w_b,
      qn_row.astype(jnp.float32),
      abig.astype(dtype),
      kbig.astype(dtype),
      vbig.astype(dtype))
    return out


def dsa_fused_supported(n: int, c: int, p: int, num_heads: int) -> bool:
    """Shape gate: per-head width and the projection must be lane-tileable,
    heads must divide channels, and a token tile must exist."""
    if c % num_heads or c < 8 or c > 512:
        return False
    if p < 8 or p > 512:
        return False
    return n % _pick_tile(n) == 0
