"""Sliding-window engine tests: grid parity and blending equivalence."""

import numpy as np
import jax.numpy as jnp

from fcd_tpu.infer.sliding_window import (
    dense_patch_starts,
    gaussian_importance,
    sliding_window_inference,
)


def test_dense_patch_starts_cover_and_clamp():
    starts = dense_patch_starts((182, 218, 182), (128, 128, 128), 0.25)
    # interval = 96 -> per-axis starts [0, 54] or [0, 90] clamped to dim-roi
    ax0 = sorted(set(starts[:, 0]))
    assert ax0[0] == 0 and ax0[-1] == 182 - 128
    # every voxel covered
    for dim, col in ((182, 0), (218, 1), (182, 2)):
        axis_starts = sorted(set(starts[:, col]))
        covered_end = 0
        for s in axis_starts:
            assert s <= covered_end  # no gaps
            covered_end = max(covered_end, s + 128)
        assert covered_end == dim


def test_dense_patch_starts_small_volume():
    starts = dense_patch_starts((64, 64, 64), (128, 128, 128), 0.25)
    assert starts.shape == (1, 3) and (starts == 0).all()


def test_gaussian_importance_peak_center():
    imp = gaussian_importance((8, 8, 8))
    assert imp.max() == 1.0
    assert np.unravel_index(imp.argmax(), imp.shape) in [(3, 3, 3), (4, 4, 4)]
    assert imp.min() > 0


def _voxelwise_predictor(patches):
    # voxelwise linear map: out0 = 2*c0 - c1, out1 = c0 + c1
    c0, c1 = patches[..., 0], patches[..., 1]
    return jnp.stack([2 * c0 - c1, c0 + c1], axis=-1)


def test_blending_matches_direct_forward_constant():
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(24, 30, 20, 2).astype(np.float32))
    out = sliding_window_inference(
        vol, _voxelwise_predictor, roi_size=(16, 16, 16), out_channels=2,
        sw_batch=4, overlap=0.25, blend="constant",
    )
    want = np.asarray(_voxelwise_predictor(vol))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_blending_matches_direct_forward_gaussian():
    rng = np.random.RandomState(1)
    vol = jnp.asarray(rng.rand(20, 24, 28, 2).astype(np.float32))
    out = sliding_window_inference(
        vol, _voxelwise_predictor, roi_size=(16, 16, 16), out_channels=2,
        sw_batch=3, overlap=0.25, blend="gaussian",
    )
    want = np.asarray(_voxelwise_predictor(vol))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


def test_small_volume_padding_roundtrip():
    rng = np.random.RandomState(2)
    vol = jnp.asarray(rng.rand(10, 12, 40, 2).astype(np.float32))
    out = sliding_window_inference(
        vol, _voxelwise_predictor, roi_size=(16, 16, 16), out_channels=2,
        sw_batch=2, overlap=0.25,
    )
    assert out.shape == (10, 12, 40, 2)
    want = np.asarray(_voxelwise_predictor(vol))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_patch_s2d_gather_matches_dense():
    from fcd_tpu.infer.sliding_window import patch_s2d_compatible
    from fcd_tpu.kernels.block_conv import depth_to_space

    rng = np.random.RandomState(3)
    vol = jnp.asarray(rng.rand(24, 32, 24, 2).astype(np.float32))
    assert patch_s2d_compatible(vol.shape[:3], (16, 16, 16), 0.25)

    def s2d_predictor(patches_s2d):
        dense = depth_to_space(patches_s2d, 2)
        return _voxelwise_predictor(dense)

    got = sliding_window_inference(
        vol, s2d_predictor, roi_size=(16, 16, 16), out_channels=2,
        sw_batch=2, overlap=0.25, patch_s2d=True,
    )
    want = np.asarray(_voxelwise_predictor(vol))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_patch_s2d_compatibility_rules():
    from fcd_tpu.infer.sliding_window import patch_s2d_compatible

    assert patch_s2d_compatible((182, 218, 182), (128, 128, 128), 0.25)
    assert not patch_s2d_compatible((183, 218, 182), (128, 128, 128), 0.25)
    assert not patch_s2d_compatible((182, 218, 182), (127, 128, 128), 0.25)


def test_s2d_blend_matches_dense_blend():
    """s2d-space blending (s2d patches in, s2d logits out, lane-dense
    accumulators) is bit-equivalent to the dense engine."""
    import numpy as np
    import jax.numpy as jnp

    from fcd_tpu.infer.sliding_window import sliding_window_inference
    from fcd_tpu.kernels.block_conv import depth_to_space, space_to_depth

    o = 2
    wm = jnp.asarray(np.random.RandomState(1).rand(3, o).astype(np.float32))

    def pred_dense(p):
        return jnp.einsum("bdhwc,co->bdhwo", p.astype(jnp.float32), wm)

    def pred_s2d(p):
        return space_to_depth(pred_dense(depth_to_space(p, 3)))

    vol = jnp.asarray(
        np.random.RandomState(0).rand(48, 64, 40, 3).astype(np.float32))
    kw = dict(roi_size=(32, 32, 32), out_channels=o, sw_batch=1,
              overlap=0.25, blend="gaussian", compute_dtype=jnp.float32)
    ref = sliding_window_inference(vol, pred_dense, **kw)
    got = sliding_window_inference(vol, pred_s2d, patch_s2d=True,
                                   s2d_logits=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_bucketed_matches_exact_and_bounds_compiles():
    """Volume-shape bucketing (SURVEY §7 hard part (d), VERDICT r2 item 4):
    4 distinct volume shapes -> at most 2 dynamic-grid compilations, and
    each bucketed output equals the exact engine's."""
    from fcd_tpu.infer.sliding_window import (
        _sliding_window_jit,
        sliding_window_inference_bucketed,
    )

    rng = np.random.RandomState(0)
    shapes = [(20, 24, 22), (22, 20, 24), (24, 22, 20), (21, 23, 19)]
    before = _sliding_window_jit._cache_size()
    for shape in shapes:
        vol = jnp.asarray(rng.rand(*shape, 2), jnp.float32)
        got = sliding_window_inference_bucketed(
            vol, _voxelwise_predictor, roi_size=(16, 16, 16), out_channels=2,
            sw_batch=2, overlap=0.25, bucket_multiple=8, slot_multiple=8,
        )
        want = sliding_window_inference(
            vol, _voxelwise_predictor, roi_size=(16, 16, 16), out_channels=2,
            sw_batch=2, overlap=0.25,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
    n_compiles = _sliding_window_jit._cache_size() - before
    assert n_compiles <= 2, f"{n_compiles} compilations for 4 shapes"


def test_bucketed_static_engine_matches_exact():
    """engine='static' (bucket-padded volume, ORIGINAL grid as static
    starts): exact same math and patch set as the exact engine — outputs
    match at the original voxels across mixed shapes."""
    from fcd_tpu.infer.sliding_window import sliding_window_inference_bucketed

    rng = np.random.RandomState(2)
    for shape in [(20, 24, 22), (21, 23, 19)]:
        vol = jnp.asarray(rng.rand(*shape, 2), jnp.float32)
        got = sliding_window_inference_bucketed(
            vol, _voxelwise_predictor, roi_size=(16, 16, 16), out_channels=2,
            sw_batch=2, overlap=0.25, bucket_multiple=8, engine="static",
        )
        want = sliding_window_inference(
            vol, _voxelwise_predictor, roi_size=(16, 16, 16), out_channels=2,
            sw_batch=2, overlap=0.25,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_bucketed_small_volume_and_gaussian():
    """Bucketing composes with <roi volumes (symmetric pad) and gaussian
    blending."""
    from fcd_tpu.infer.sliding_window import sliding_window_inference_bucketed

    rng = np.random.RandomState(1)
    vol = jnp.asarray(rng.rand(10, 30, 12, 2), jnp.float32)
    got = sliding_window_inference_bucketed(
        vol, _voxelwise_predictor, roi_size=(16, 16, 16), out_channels=2,
        sw_batch=2, overlap=0.25, blend="gaussian", bucket_multiple=8,
    )
    want = sliding_window_inference(
        vol, _voxelwise_predictor, roi_size=(16, 16, 16), out_channels=2,
        sw_batch=2, overlap=0.25, blend="gaussian",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_trainer_auto_bucket_policy():
    """ModelTrainer.inference: first N distinct shapes exact, later new
    shapes bucketed (sw_bucket='auto')."""
    from unittest import mock

    from fcd_tpu.config import get_default_params
    from fcd_tpu.train.trainer import ModelTrainer

    params = get_default_params()
    params.update(model_type="BASEUNET", patch_size=16, feature_size=4,
                  chans_in=2, chans_out=2, use_amp=False, mesh_data=1,
                  sw_batch_size=2, sw_bucket_auto_shapes=2)
    tr = ModelTrainer(params, verbose=False)
    rng = np.random.RandomState(0)
    calls = {"exact": 0, "bucket": 0}
    import fcd_tpu.train.trainer as trainer_mod
    from fcd_tpu.infer import sliding_window as sw_mod

    real_exact = trainer_mod.sliding_window_inference
    real_bucket = sw_mod.sliding_window_inference_bucketed

    def spy_exact(*a, **k):
        calls["exact"] += 1
        return real_exact(*a, **k)

    def spy_bucket(*a, **k):
        calls["bucket"] += 1
        return real_bucket(*a, **k)

    with mock.patch.object(trainer_mod, "sliding_window_inference",
                           spy_exact), \
            mock.patch.object(sw_mod, "sliding_window_inference_bucketed",
                              spy_bucket):
        for shape in [(20, 20, 20), (20, 20, 20), (22, 20, 20),
                      (24, 20, 20), (26, 20, 20)]:
            out = tr.inference(rng.rand(*shape, 2).astype(np.float32))
            assert out.shape == (*shape, 2)
    assert calls["exact"] == 3  # two distinct shapes (one repeated)
    assert calls["bucket"] == 2  # every later NEW shape


def test_patch_pad_gather_matches_unpadded():
    """patch_pad=True gathers padded-chain s2d patches; with a predictor
    honoring the convention the blended output is identical."""
    from fcd_tpu.kernels.block_conv import depth_to_space

    rng = np.random.RandomState(7)
    vol = jnp.asarray(rng.rand(24, 32, 24, 2).astype(np.float32))

    def s2d_predictor(patches_s2d):
        dense = depth_to_space(patches_s2d, 2)
        return _voxelwise_predictor(dense)

    def s2d_predictor_padded(patches_s2d):
        return s2d_predictor(patches_s2d[:, 1:-1])

    ref = sliding_window_inference(
        vol, s2d_predictor, roi_size=(16, 16, 16), out_channels=2,
        sw_batch=2, overlap=0.25, patch_s2d=True,
    )
    got = sliding_window_inference(
        vol, s2d_predictor_padded, roi_size=(16, 16, 16), out_channels=2,
        sw_batch=2, overlap=0.25, patch_s2d=True, patch_pad=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=0)


def test_bucketed_s2d_logits_matches_exact():
    """The bucketed engine's s2d blending path (the one real s2d models
    route through) matches the exact engine bit-for-bit, including the
    fused flat exit (bucket-shaped output + free view back)."""
    from fcd_tpu.infer.sliding_window import sliding_window_inference_bucketed
    from fcd_tpu.kernels.block_conv import depth_to_space, space_to_depth

    o = 2
    wm = jnp.asarray(np.random.RandomState(1).rand(2, o).astype(np.float32))

    def pred_s2d(p):
        dense = depth_to_space(p, 2)
        out = jnp.einsum("bdhwc,co->bdhwo", dense, wm)
        return space_to_depth(out)

    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(24, 32, 24, 2).astype(np.float32))
    ref = np.asarray(sliding_window_inference(
        vol, pred_s2d, roi_size=(16, 16, 16), out_channels=o,
        sw_batch=2, overlap=0.25, patch_s2d=True, s2d_logits=True))
    got = np.asarray(sliding_window_inference_bucketed(
        vol, pred_s2d, roi_size=(16, 16, 16), out_channels=o,
        sw_batch=2, overlap=0.25, patch_s2d=True, s2d_logits=True,
        bucket_multiple=8))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)

    flat = np.asarray(sliding_window_inference_bucketed(
        vol, pred_s2d, roi_size=(16, 16, 16), out_channels=o,
        sw_batch=2, overlap=0.25, patch_s2d=True, s2d_logits=True,
        bucket_multiple=8, flat_output=True))
    db, hb = flat.shape[:2]
    wb = flat.shape[2] // o
    view = flat.reshape(db, hb, wb, o)[:24, :32, :24]
    np.testing.assert_allclose(view, ref, rtol=0, atol=1e-6)
