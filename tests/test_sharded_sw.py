"""Patch-grid-sharded sliding window on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcd_tpu.infer.sliding_window import sliding_window_inference
from fcd_tpu.parallel.mesh import make_mesh
from fcd_tpu.parallel.sw import sharded_sliding_window_inference


def _predictor(patches):
    c0, c1 = patches[..., 0], patches[..., 1]
    return jnp.stack([2 * c0 - c1, c0 + c1], axis=-1)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, ("data",))


def test_sharded_matches_single_device(mesh):
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(24, 30, 20, 2).astype(np.float32))
    want = sliding_window_inference(
        vol, _predictor, roi_size=(16, 16, 16), out_channels=2,
        sw_batch=2, overlap=0.25,
    )
    got = sharded_sliding_window_inference(
        vol, _predictor, mesh, roi_size=(16, 16, 16), out_channels=2,
        sw_batch=2, overlap=0.25,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sharded_gaussian_blend(mesh):
    rng = np.random.RandomState(1)
    vol = jnp.asarray(rng.rand(20, 20, 34, 2).astype(np.float32))
    got = sharded_sliding_window_inference(
        vol, _predictor, mesh, roi_size=(16, 16, 16), out_channels=2,
        sw_batch=1, overlap=0.25, blend="gaussian",
    )
    want = np.asarray(_predictor(vol))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_sharded_patch_s2d_matches_dense(mesh):
    from fcd_tpu.kernels.block_conv import depth_to_space

    rng = np.random.RandomState(2)
    vol = jnp.asarray(rng.rand(24, 32, 24, 2).astype(np.float32))

    def s2d_predictor(patches_s2d):
        return _predictor(depth_to_space(patches_s2d, 2))

    got = sharded_sliding_window_inference(
        vol, s2d_predictor, mesh, roi_size=(16, 16, 16), out_channels=2,
        sw_batch=2, overlap=0.25, patch_s2d=True,
    )
    want = np.asarray(_predictor(vol))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
