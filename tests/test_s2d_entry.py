"""Pallas volume-entry s2d kernel: bit-parity vs the reshape form.

The kernel replaces the one-hot-conv entry transform of the sliding
window (and the train image pre-jit): reference space_to_depth is the
pure-permutation definition, so equality must be exact.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fcd_tpu.kernels.block_conv import space_to_depth
from fcd_tpu.kernels.s2d_entry import s2d_entry, s2d_entry_supported


@pytest.mark.parametrize("shape", [(8, 10, 6, 2), (6, 6, 8, 1),
                                   (10, 8, 12, 2), (12, 12, 12, 4)])
def test_entry_kernel_bit_parity(shape):
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(*shape), jnp.float32)
    ref = space_to_depth(vol[None].astype(jnp.bfloat16))[0]
    got = s2d_entry(vol, interpret=True)
    assert got.shape == ref.shape
    assert np.array_equal(np.asarray(ref, np.float32),
                          np.asarray(got, np.float32))


def test_entry_supported_gate():
    assert s2d_entry_supported(182, 218, 182, 2)
    assert s2d_entry_supported(128, 128, 128, 2)
    assert not s2d_entry_supported(181, 218, 182, 2)   # odd depth
    assert not s2d_entry_supported(128, 128, 512, 2)   # W*C too wide


def test_entry_batched_fold():
    # the train pre-jit folds batch into depth: pairs stay within samples
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(3, 4, 6, 6, 2), jnp.float32)
    ref = space_to_depth(img.astype(jnp.bfloat16))
    out = s2d_entry(img.reshape(12, 6, 6, 2), interpret=True)
    out = out.reshape(3, 2, 3, 3, 16)
    assert np.array_equal(np.asarray(ref, np.float32),
                          np.asarray(out, np.float32))


def test_entry_slice_form_bit_parity(monkeypatch):
    """FCD_ENTRY_SLICE (W-pair lane packing + stride-2 slices + lane
    concat) is bit-identical to the one-hot-conv form and the reference
    reshape form across shapes/channel counts."""
    from fcd_tpu.kernels.block_conv import space_to_depth_fast

    rng = np.random.RandomState(7)
    for shape in [(1, 12, 10, 14, 2), (4, 8, 8, 8, 2),
                  (2, 6, 6, 6, 1), (1, 4, 6, 8, 4)]:
        x = jnp.asarray(rng.rand(*shape).astype(np.float32))
        ref = np.asarray(space_to_depth(x))
        monkeypatch.setenv("FCD_ENTRY_SLICE", "1")
        a = np.asarray(space_to_depth_fast(x))
        monkeypatch.setenv("FCD_ENTRY_SLICE", "0")
        b = np.asarray(space_to_depth_fast(x))
        assert np.array_equal(a, ref), shape
        assert np.array_equal(b, ref), shape
