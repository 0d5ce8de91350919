"""Blocked-GEMM conv kernel: parity with lax conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcd_tpu.kernels.block_conv import (
    blocked_conv3x3,
    fast_conv_supported,
    make_blocked_weights,
    reference_conv3x3,
)


@pytest.mark.parametrize("cin,cout", [(16, 16), (2, 16), (32, 16), (16, 32)])
def test_blocked_conv_matches_lax(cin, cout):
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (3, 3, 3, cin, cout), jnp.float32) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8, cin), jnp.float32)
    ref = np.asarray(reference_conv3x3(x, w))
    got = np.asarray(blocked_conv3x3(x, w, jnp.float32, True))
    # kernel computes in bf16: tolerance accordingly
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=0.03 * scale)


def test_blocked_conv_gradients_match():
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (3, 3, 3, 16, 16), jnp.float32) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8, 16), jnp.float32)
    t = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 8, 16), jnp.float32)

    def loss_fast(x, w):
        return jnp.sum(blocked_conv3x3(x, w, jnp.float32, True) * t)

    def loss_ref(x, w):
        return jnp.sum(reference_conv3x3(x, w) * t)

    gx_f, gw_f = jax.grad(loss_fast, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=0.05 * float(jnp.abs(gx_r).max()))
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               atol=0.05 * float(jnp.abs(gw_r).max()))


def test_blocked_weights_shape():
    w = jnp.zeros((3, 3, 3, 16, 24))
    wb = make_blocked_weights(w)
    assert wb.shape == (8, 128, 192)


def test_fast_conv_supported_rules():
    assert fast_conv_supported((128, 128, 128), 16, 16, (3, 3, 3), (1, 1, 1))
    assert fast_conv_supported((128, 128, 128), 2, 16, (3, 3, 3), (1, 1, 1))
    assert not fast_conv_supported((128, 128, 128), 16, 16, (3, 3, 3), (2, 2, 2))
    assert not fast_conv_supported((127, 128, 128), 16, 16, (3, 3, 3), (1, 1, 1))
    assert not fast_conv_supported((32, 32, 32), 128, 128, (3, 3, 3), (1, 1, 1))
    assert not fast_conv_supported((16, 16, 16), 16, 2, (3, 3, 3), (1, 1, 1))
