"""Fused Pallas volume-exit kernel (kernels/d2s_exit.py) parity.

The kernel replaces the s2d sliding-window tail (coverage multiply +
depth_to_space + boundary-layout copies) with one pass emitting the
volume as (D, H, W*O) f32 — the C-order bytes of the (D, H, W, O)
volume. Reference: MONAI sliding_window_inference output semantics
(/root/reference/train.py:148-165); the layout freedom mirrors torch's
channels-first memory, which is likewise a host-side view away from
NIfTI axis order.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fcd_tpu.kernels.block_conv import depth_to_space
from fcd_tpu.kernels.d2s_exit import d2s_exit_flat, d2s_exit_supported


@pytest.mark.parametrize("shape", [(5, 7, 6, 2), (4, 4, 4, 1), (3, 5, 9, 3)])
def test_exit_kernel_bit_parity(shape):
    d2, h2, w2, o = shape
    rng = np.random.RandomState(0)
    acc = jnp.asarray(rng.randn(d2, h2, w2, 8 * o).astype(np.float32))
    inv = jnp.asarray(rng.rand(d2, h2, w2, 8 * o).astype(np.float32) + 0.5)
    ref = depth_to_space((acc * inv)[None], o)[0]
    ref_flat = np.asarray(ref).reshape(2 * d2, 2 * h2, 2 * w2 * o)
    got = np.asarray(d2s_exit_flat(
        jnp.transpose(acc, (0, 1, 3, 2)), jnp.transpose(inv, (0, 1, 3, 2)),
        o, interpret=jax.default_backend() != "tpu"))
    assert got.shape == ref_flat.shape
    np.testing.assert_array_equal(got, ref_flat)


def test_exit_supported_gate():
    assert d2s_exit_supported(91, 109, 91, 2)      # the bench volume
    assert not d2s_exit_supported(91, 109, 200, 2)  # W over one lane tile


def test_sliding_window_flat_output_matches_default():
    """flat_output=True returns the same volume as the default 4-D path
    (as a free reshape), through the real sliding-window engine."""
    from fcd_tpu.infer.sliding_window import sliding_window_inference

    rng = np.random.RandomState(1)
    vol = jnp.asarray(rng.rand(24, 20, 24, 2).astype(np.float32))

    def predictor(p):  # s2d logits: identity-ish projection of the patch
        b, d2, h2, w2, c8 = p.shape
        return jnp.concatenate([p, -p], axis=-1).astype(jnp.float32)

    kwargs = dict(
        roi_size=(16, 16, 16), out_channels=4, sw_batch=1, overlap=0.25,
        blend="constant", compute_dtype=jnp.float32, patch_s2d=True,
        s2d_logits=True)
    out4 = sliding_window_inference(vol, predictor, **kwargs)
    out_flat = sliding_window_inference(vol, predictor, flat_output=True,
                                        **kwargs)
    assert out_flat.ndim == 3
    np.testing.assert_allclose(
        np.asarray(out_flat).reshape(np.asarray(out4).shape),
        np.asarray(out4), rtol=0, atol=1e-6)
