"""Pallas pool-backward kernel (kernels/pool.py) parity vs the XLA
backward of max_pool_2x_s2d_exit, including tie semantics (even split
among equal maxima — jnp.max-identical)."""

import numpy as np
import jax
import jax.numpy as jnp

from fcd_tpu.ops.s2d_ops import _pool_max, max_pool_2x_s2d_exit
from fcd_tpu.kernels.pool import pool_bwd_pallas


import pytest


@pytest.mark.parametrize("g_dtype", [jnp.float32, jnp.bfloat16])
def test_pool_bwd_kernel_parity_with_ties(g_dtype):
    """Both cotangent dtypes: f32 and the production amp path's bf16
    (the kernel computes the scale in f32 and stores in g's dtype)."""
    rng = np.random.RandomState(0)
    c = 16
    xs = jnp.asarray(rng.randint(0, 4, (2, 6, 6, 6, 8 * c))
                     .astype(np.float32)).astype(jnp.bfloat16)
    m = _pool_max(xs, c)
    g = jnp.asarray(rng.randn(2, 6, 6, 6, c).astype(np.float32)).astype(
        g_dtype)
    eqs = [xs[..., i * c:(i + 1) * c] == m for i in range(8)]
    cnt = sum(e.astype(jnp.float32) for e in eqs)
    scale = g.astype(jnp.float32) / cnt
    ref = jnp.concatenate([jnp.where(e, scale, 0.0) for e in eqs],
                          -1).astype(xs.dtype)
    got = pool_bwd_pallas(xs, m, g, c,
                          interpret=jax.default_backend() != "tpu")
    assert got.dtype == xs.dtype
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_pool_vjp_through_public_op():
    rng = np.random.RandomState(1)
    c = 8
    xs = jnp.asarray(rng.randint(0, 3, (1, 4, 4, 4, 8 * c))
                     .astype(np.float32))

    def f(x):
        return jnp.sum(jnp.sin(max_pool_2x_s2d_exit(x, c)))

    def f_ref(x):
        v = x.reshape(x.shape[:4] + (8, c))
        return jnp.sum(jnp.sin(jnp.max(v, axis=4)))

    g = jax.grad(f)(xs)
    g_ref = jax.grad(f_ref)(xs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=0, atol=1e-6)
