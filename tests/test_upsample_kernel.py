"""Pallas s2d-to-s2d upsample kernel (kernels/upsample.py) and the
manual adjoint of upsample2x_s2d_to_s2d.

Reference semantics: transposed conv k2 s2 (conv_blocks.py:548-557
upsample path) expressed on the s2d lattice.
"""

import numpy as np
import jax
import jax.numpy as jnp

from fcd_tpu.ops.s2d_ops import (
    _upsample_wm,
    conv1x1_s2d,
    from_s2d,
    upsample2x_s2d_to_s2d,
)
from fcd_tpu.kernels.upsample import upsample_s2d_pallas

CIN, COUT = 8, 4


def _xla_ref(ys, w, b=None):
    wm = _upsample_wm(w, CIN)
    out = from_s2d(conv1x1_s2d(ys, wm), 8 * COUT)
    if b is not None:
        out = out + jnp.tile(b, 8).astype(out.dtype)
    return out


def test_upsample_kernel_forward_parity():
    rng = np.random.RandomState(0)
    ys = jnp.asarray(rng.randn(2, 3, 5, 4, 8 * CIN).astype(np.float32))
    w = jnp.asarray(rng.randn(2, 2, 2, CIN, COUT).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(COUT).astype(np.float32))
    wm = _upsample_wm(w.astype(jnp.bfloat16), CIN)
    interp = jax.default_backend() != "tpu"
    for bias in (None, b):
        got = upsample_s2d_pallas(ys.astype(jnp.bfloat16), wm, CIN, COUT,
                                  bias=bias, out_dtype=jnp.float32,
                                  interpret=interp)
        ref = _xla_ref(ys.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       bias).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=2e-2)


def test_upsample_adjoint_matches_autodiff():
    rng = np.random.RandomState(1)
    ys = jnp.asarray(rng.randn(1, 2, 3, 4, 8 * CIN).astype(np.float32))
    w = jnp.asarray(rng.randn(2, 2, 2, CIN, COUT).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(COUT).astype(np.float32))

    def loss_new(ys_, w_):
        o = upsample2x_s2d_to_s2d(ys_, CIN, w_, b)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def loss_ref(ys_, w_):
        return jnp.sum(jnp.sin(_xla_ref(ys_, w_, b).astype(jnp.float32)))

    g_new = jax.grad(loss_new, argnums=(0, 1))(ys, w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(ys, w)
    for a, r in zip(g_new, g_ref):
        rel = float(jnp.abs(a - r).max() / (jnp.abs(r).max() + 1e-9))
        assert rel < 1e-5, rel


def test_upsample_pad_kernel_parity():
    """Padded-chain kernel: PADDED coarse -> PADDED fine, zero edges,
    interior equal to the XLA s2d-to-s2d upsample."""
    from fcd_tpu.kernels.upsample import upsample_s2d_pad

    rng = np.random.RandomState(2)
    ys = jnp.asarray(rng.randn(2, 4, 5, 4, 8 * CIN).astype(np.float32))
    w = jnp.asarray(rng.randn(2, 2, 2, CIN, COUT).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(COUT).astype(np.float32))
    ysp = jnp.pad(ys, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    wm = _upsample_wm(w.astype(jnp.bfloat16), CIN)
    interp = jax.default_backend() != "tpu"
    for bias in (None, b):
        got = upsample_s2d_pad(ysp.astype(jnp.bfloat16), wm, CIN, COUT,
                               bias, out_dtype=jnp.float32,
                               interpret=interp)
        ref = upsample2x_s2d_to_s2d(
            ys.astype(jnp.bfloat16), CIN, w.astype(jnp.bfloat16), bias
        ).astype(jnp.float32)
        got = np.asarray(got)
        assert got.shape[1] == ref.shape[1] + 2
        np.testing.assert_array_equal(got[:, 0], 0.0)
        np.testing.assert_array_equal(got[:, -1], 0.0)
        np.testing.assert_allclose(got[:, 1:-1], np.asarray(ref),
                                   rtol=0, atol=2e-2)


def test_upsample_pad_wrapper_fallback_parity():
    """The s2d_ops wrapper (XLA fallback path off-TPU) keeps the same
    contract: padded in, padded out, interior exact."""
    from fcd_tpu.ops.s2d_ops import upsample2x_s2d_to_s2d_pad

    rng = np.random.RandomState(3)
    ys = jnp.asarray(rng.randn(1, 4, 4, 4, 8 * CIN).astype(np.float32))
    w = jnp.asarray(rng.randn(2, 2, 2, CIN, COUT).astype(np.float32) * 0.1)
    ysp = jnp.pad(ys, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    got = np.asarray(upsample2x_s2d_to_s2d_pad(
        ys.astype(jnp.bfloat16), CIN, w.astype(jnp.bfloat16), None,
        in_padded=False))
    got2 = np.asarray(upsample2x_s2d_to_s2d_pad(
        ysp.astype(jnp.bfloat16), CIN, w.astype(jnp.bfloat16), None,
        in_padded=True))
    ref = np.asarray(upsample2x_s2d_to_s2d(
        ys.astype(jnp.bfloat16), CIN, w.astype(jnp.bfloat16), None))
    np.testing.assert_array_equal(got[:, 0], 0.0)
    np.testing.assert_array_equal(got[:, -1], 0.0)
    np.testing.assert_allclose(got[:, 1:-1], ref, rtol=0, atol=2e-2)
    np.testing.assert_allclose(got2, got, rtol=0, atol=0)


def test_upsample_pad_kernel_lane_half_parity():
    """ci large enough that 4*ci is lane-tileable: the kernel fetches only
    the needed pz lane-half of each slab. Same numerics."""
    from fcd_tpu.kernels.upsample import upsample_s2d_pad

    ci, co = 32, 16
    rng = np.random.RandomState(4)
    ys = jnp.asarray(rng.randn(1, 4, 3, 3, 8 * ci).astype(np.float32))
    w = jnp.asarray(rng.randn(2, 2, 2, ci, co).astype(np.float32) * 0.1)
    ysp = jnp.pad(ys, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    wm = _upsample_wm(w.astype(jnp.bfloat16), ci)
    interp = jax.default_backend() != "tpu"
    got = np.asarray(upsample_s2d_pad(
        ysp.astype(jnp.bfloat16), wm, ci, co, None,
        out_dtype=jnp.float32, interpret=interp))
    ref = np.asarray(upsample2x_s2d_to_s2d(
        ys.astype(jnp.bfloat16), ci, w.astype(jnp.bfloat16), None)
    ).astype(np.float32)
    np.testing.assert_array_equal(got[:, 0], 0.0)
    np.testing.assert_array_equal(got[:, -1], 0.0)
    np.testing.assert_allclose(got[:, 1:-1], ref, rtol=0, atol=2e-2)


def test_upsample_pad_grad_matches_unpadded():
    """The padded upsample's manual adjoint equals the unpadded op's
    grads on the interior, with zero edge cotangents."""
    from fcd_tpu.ops.s2d_ops import upsample2x_s2d_to_s2d_pad

    rng = np.random.RandomState(5)
    ys = jnp.asarray(rng.randn(1, 2, 3, 4, 8 * CIN).astype(np.float32))
    w = jnp.asarray(rng.randn(2, 2, 2, CIN, COUT).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(COUT).astype(np.float32))
    ysp = jnp.pad(ys, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))

    def f_ref(ys_, w_, b_):
        o = upsample2x_s2d_to_s2d(ys_, CIN, w_, b_)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def f_pad(ysp_, w_, b_):
        o = upsample2x_s2d_to_s2d_pad(ysp_, CIN, w_, b_, in_padded=True)
        return jnp.sum(jnp.sin(o.astype(jnp.float32))[:, 1:-1])

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(ys, w, b)
    g_pad = jax.grad(f_pad, argnums=(0, 1, 2))(ysp, w, b)
    gy = np.asarray(g_pad[0])
    np.testing.assert_array_equal(gy[:, 0], 0.0)
    np.testing.assert_array_equal(gy[:, -1], 0.0)
    for a, r in [(gy[:, 1:-1], np.asarray(g_ref[0])),
                 (np.asarray(g_pad[1]), np.asarray(g_ref[1])),
                 (np.asarray(g_pad[2]), np.asarray(g_ref[2]))]:
        rel = np.abs(a - r).max() / (np.abs(r).max() + 1e-9)
        assert rel < 1e-5, rel
