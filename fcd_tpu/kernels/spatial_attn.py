"""Fused spatial-attention tail for the TRAIN path (custom VJP).

The v2 tokens-resident DSA (ops.attention._dsa_tokens_resident) computes
spatial attention as two token-major GEMMs around a segmented softmax:

    logits = qn @ kpb            (B, N, h*P)   kpb: block-expanded keys
    attn   = softmax_per_head(logits); dropout
    out    = attn @ vpb          (B, N, C)     vpb: block-expanded values

XLA materializes the (B, N, h*P) attention matrix in HBM twice per
direction (67 MB at the level-3 train shape) and lowers the second GEMM
with an N-minor layout measured at 0.81 ms — 8x its bandwidth cost
(probe: /tmp/probe_spatial_attn variants all >= 0.45 ms; the
materialization IS the floor of any XLA form). These kernels keep the
attention matrix in VMEM per token tile: one pass forward, one pass
backward (recomputing softmax and the dropout mask from the same
hardware-RNG seed), with the d_kpb/d_vpb reductions accumulated across
tiles in the kernel.

Dropout: pltpu.prng_random_bits seeded per (batch, tile) — same
Bernoulli(rate) marginal as the einsum path's jax.random stream, a
different stream (precedent: FCD_RBG_DROPOUT). The backward regenerates
the identical mask from the identical seed.

Reference math: networks/ms_dsa_net/conv_blocks.py:316-359 (SpatialAttention
forward under autograd).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fcd_tpu import flags as _fcd_flags


def _pick_tile(n: int) -> int:
    for t in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return min(t, n)
    return n


def _seg_softmax(logits, h: int, p: int):
    """Per-head softmax over lane segments of width p (f32 in VMEM)."""
    outs = []
    for j in range(h):
        s = logits[:, j * p:(j + 1) * p]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        outs.append(e / jnp.sum(e, axis=-1, keepdims=True))
    return jnp.concatenate(outs, axis=-1)


def _drop_mask(seed_ref, bb, t, nt, shape, rate: float):
    """Deterministic per-(batch, tile) Bernoulli keep-mask from the
    hardware PRNG; the backward regenerates the identical mask."""
    pltpu.prng_seed(seed_ref[0] + bb * nt + t)
    bits = pltpu.prng_random_bits(shape)
    thresh = min(int(rate * 4294967296.0), 4294967295)
    return bits.astype(jnp.uint32) >= jnp.uint32(thresh)


def _make_fwd_kernel(h: int, p: int, rate: float, nt: int):
    def kernel(seed_ref, qn_ref, kpb_ref, vpb_ref, out_ref):
        bb = pl.program_id(0)
        t = pl.program_id(1)
        qn = qn_ref[0]                                   # (T, C)
        logits = jax.lax.dot_general(
            qn, kpb_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (T, h*p)
        attn = _seg_softmax(logits, h, p)
        if rate > 0.0:
            keep = _drop_mask(seed_ref, bb, t, nt, attn.shape, rate)
            attn = jnp.where(keep, attn * (1.0 / (1.0 - rate)), 0.0)
        out = jax.lax.dot_general(
            attn.astype(qn.dtype), vpb_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (T, C)
        out_ref[0] = out.astype(out_ref.dtype)

    return kernel


def _make_bwd_kernel(h: int, p: int, rate: float, nt: int):
    def kernel(seed_ref, qn_ref, kpb_ref, vpb_ref, g_ref,
               dqn_ref, dkpb_ref, dvpb_ref):
        bb = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            dkpb_ref[...] = jnp.zeros_like(dkpb_ref)
            dvpb_ref[...] = jnp.zeros_like(dvpb_ref)

        qn = qn_ref[0]
        g = g_ref[0].astype(jnp.float32)                 # (T, C)
        logits = jax.lax.dot_general(
            qn, kpb_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        soft = _seg_softmax(logits, h, p)                # pre-dropout
        if rate > 0.0:
            keep = _drop_mask(seed_ref, bb, t, nt, soft.shape, rate)
            inv = 1.0 / (1.0 - rate)
            attn = jnp.where(keep, soft * inv, 0.0)
        else:
            attn = soft
        ab = attn.astype(qn.dtype)
        # d_vpb += attn^T g  (accumulated across tiles)
        dvpb_ref[0] += jax.lax.dot_general(
            ab, g.astype(qn.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # d_attn = g vpb^T
        da = jax.lax.dot_general(
            g.astype(qn.dtype), vpb_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (T, h*p)
        if rate > 0.0:
            da = jnp.where(keep, da * inv, 0.0)
        # softmax backward per head segment
        parts = []
        for j in range(h):
            s = soft[:, j * p:(j + 1) * p]
            d = da[:, j * p:(j + 1) * p]
            parts.append(s * (d - jnp.sum(d * s, axis=-1, keepdims=True)))
        ds = jnp.concatenate(parts, axis=-1)             # (T, h*p) f32
        dsb = ds.astype(qn.dtype)
        # d_qn = ds kpb^T
        dqn = jax.lax.dot_general(
            dsb, kpb_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dqn_ref[0] = dqn.astype(dqn_ref.dtype)
        # d_kpb += qn^T ds
        dkpb_ref[0] += jax.lax.dot_general(
            qn, dsb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return kernel


def _common_specs(b, n, c, hp, tile, dtype):
    tok = pl.BlockSpec((1, tile, c), lambda bb, t: (bb, t, 0),
                       memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, c, hp), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, hp, c), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return tok, kspec, vspec, seed


def spatial_attn_fwd_pallas(qn, kpb, vpb, seed, h: int, rate: float, *,
                            interpret: bool = False):
    """qn: (B, N, C); kpb: (B, C, h*P) block-expanded keys (temperature
    folded); vpb: (B, h*P, C); seed: (1,) int32. Returns (B, N, C)."""
    b, n, c = qn.shape
    hp = kpb.shape[2]
    p = hp // h
    tile = _pick_tile(n)
    nt = n // tile
    tok, kspec, vspec, seedspec = _common_specs(b, n, c, hp, tile, qn.dtype)
    return pl.pallas_call(
        _make_fwd_kernel(h, p, rate, nt),
        grid=(b, nt),
        in_specs=[seedspec, tok, kspec, vspec],
        out_specs=tok,
        out_shape=jax.ShapeDtypeStruct((b, n, c), qn.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed, qn, kpb.astype(qn.dtype), vpb.astype(qn.dtype))


def spatial_attn_bwd_pallas(qn, kpb, vpb, seed, g, h: int, rate: float, *,
                            interpret: bool = False):
    b, n, c = qn.shape
    hp = kpb.shape[2]
    p = hp // h
    tile = _pick_tile(n)
    nt = n // tile
    tok, kspec, vspec, seedspec = _common_specs(b, n, c, hp, tile, qn.dtype)
    acc_k = pl.BlockSpec((1, c, hp), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
    acc_v = pl.BlockSpec((1, hp, c), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
    dqn, dkpb, dvpb = pl.pallas_call(
        _make_bwd_kernel(h, p, rate, nt),
        grid=(b, nt),
        in_specs=[seedspec, tok, kspec, vspec, tok],
        out_specs=[tok, acc_k, acc_v],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qn.dtype),
            jax.ShapeDtypeStruct((b, c, hp), jnp.float32),
            jax.ShapeDtypeStruct((b, hp, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed, qn, kpb.astype(qn.dtype), vpb.astype(qn.dtype), g)
    return dqn, dkpb, dvpb


def spatial_attn_supported(n: int, c: int, hp: int) -> bool:
    tile = _pick_tile(n)
    if n % tile:
        return False
    cl = max(c, 128)
    hpl = max(hp, 128)
    slab = tile * cl * 2 + tile * hpl * 4 * 2 + cl * hpl * 2 * 2
    return slab < 80 * 1024 * 1024 and hp % min(hp, 128) == 0


# ---------------------------------------------------------------------------
# custom-VJP wrapper (XLA fallback mirrors the kernel math; its dropout
# stream differs — rate>0 parity is statistical, owned by the TPU smoke)
# ---------------------------------------------------------------------------

def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _use_kernel(n, c, hp) -> bool:
    return (jax.default_backend() == "tpu"
            and _fcd_flags.get("FCD_SPATTN_KERNEL") != "0"
            and spatial_attn_supported(n, c, hp))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def spatial_attn_train(qn, kpb, vpb, seed, h: int, rate: float):
    """Differentiable fused spatial-attention tail. seed: (1,) int32
    (ignored when rate == 0)."""
    return _fwd_impl(qn, kpb, vpb, seed, h, rate)


def _fwd_impl(qn, kpb, vpb, seed, h, rate):
    b, n, c = qn.shape
    hp = kpb.shape[2]
    if _use_kernel(n, c, hp):
        return spatial_attn_fwd_pallas(qn, kpb, vpb, seed, h, rate,
                                       interpret=_interp())
    p = hp // h
    logits = jnp.einsum("bnc,bcq->bnq", qn.astype(jnp.float32),
                        kpb.astype(jnp.float32))
    attn = jax.nn.softmax(logits.reshape(b, n, h, p), axis=-1)
    attn = attn.reshape(b, n, hp)
    if rate > 0.0:
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
        keep = jax.random.bernoulli(key, 1.0 - rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - rate), 0.0)
    out = jnp.einsum("bnq,bqc->bnc", attn.astype(qn.dtype),
                     vpb.astype(qn.dtype))
    return out.astype(qn.dtype)


def _fwd_rule(qn, kpb, vpb, seed, h, rate):
    return _fwd_impl(qn, kpb, vpb, seed, h, rate), (qn, kpb, vpb, seed)


def _bwd_rule(h, rate, res, g):
    qn, kpb, vpb, seed = res
    b, n, c = qn.shape
    hp = kpb.shape[2]
    if _use_kernel(n, c, hp):
        dqn, dkpb, dvpb = spatial_attn_bwd_pallas(
            qn, kpb, vpb, seed, g.astype(qn.dtype), h, rate,
            interpret=_interp())
        return (dqn, dkpb.astype(kpb.dtype), dvpb.astype(vpb.dtype),
                np.zeros(seed.shape, jax.dtypes.float0))
    # XLA mirror (same dropout stream as the fallback forward)
    p = hp // h
    logits = jnp.einsum("bnc,bcq->bnq", qn.astype(jnp.float32),
                        kpb.astype(jnp.float32))
    soft = jax.nn.softmax(logits.reshape(b, n, h, p), axis=-1)
    soft = soft.reshape(b, n, hp)
    if rate > 0.0:
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
        keep = jax.random.bernoulli(key, 1.0 - rate, soft.shape)
        inv = 1.0 / (1.0 - rate)
        attn = jnp.where(keep, soft * inv, 0.0)
    else:
        attn = soft
    gf = g.astype(jnp.float32)
    dvpb = jnp.einsum("bnq,bnc->bqc", attn, gf)
    da = jnp.einsum("bnc,bqc->bnq", gf, vpb.astype(jnp.float32))
    if rate > 0.0:
        da = jnp.where(keep, da * inv, 0.0)
    da4 = da.reshape(b, n, h, p)
    s4 = soft.reshape(b, n, h, p)
    ds = (s4 * (da4 - jnp.sum(da4 * s4, axis=-1, keepdims=True))
          ).reshape(b, n, hp)
    dqn = jnp.einsum("bnq,bcq->bnc", ds, kpb.astype(jnp.float32))
    dkpb = jnp.einsum("bnc,bnq->bcq", qn.astype(jnp.float32), ds)
    return (dqn.astype(qn.dtype), dkpb.astype(kpb.dtype),
            dvpb.astype(vpb.dtype), np.zeros(seed.shape, jax.dtypes.float0))


spatial_attn_train.defvjp(_fwd_rule, _bwd_rule)
