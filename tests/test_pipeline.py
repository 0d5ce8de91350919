"""Data pipeline tests: preprocessing, sampling, device augmentation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import ndimage

from fcd_tpu.data.augment import augment_batch, scheduled_probs
from fcd_tpu.data.preprocess import (
    invert_to_grid,
    percentile_scale,
    replace_nan,
    resample_spacing,
    resample_to_match,
    scale_channels,
)
from fcd_tpu.data.sampling import PosNegCropSampler


def test_replace_nan():
    x = np.array([1.0, np.nan, 3.0])
    np.testing.assert_array_equal(replace_nan(x), [1.0, 0.0, 3.0])


def test_percentile_scale_range_and_clip():
    rng = np.random.RandomState(0)
    x = rng.randn(20, 20, 20) * 100
    y = percentile_scale(x, 0.5, 99.5, 0, 1, clip=True)
    assert y.min() >= 0 and y.max() <= 1
    lo, hi = np.percentile(x, 0.5), np.percentile(x, 99.5)
    mid = (lo + hi) / 2
    yi = percentile_scale(np.array([[[mid]]]) + x * 0, 0.5, 99.5)  # uniform -> b_min
    y2 = percentile_scale(x, 0.5, 99.5, 0, 1, clip=False)
    assert y2.max() > 1  # outliers beyond p99.5


def test_scale_channels_independent():
    rng = np.random.RandomState(1)
    x = np.stack([rng.rand(8, 8, 8), rng.rand(8, 8, 8) * 50 + 100], axis=-1)
    y = scale_channels(x)
    for c in range(2):
        assert y[..., c].min() == pytest.approx(0, abs=1e-6)
        assert y[..., c].max() == pytest.approx(1, abs=1e-6)


def test_resample_to_match_identity_and_shift():
    rng = np.random.RandomState(2)
    vol = rng.rand(10, 12, 14).astype(np.float32)
    eye = np.eye(4)
    out = resample_to_match(vol, eye, vol.shape, eye, order=0)
    np.testing.assert_array_equal(out, vol)
    # destination grid shifted by +2 voxels in world x
    dst_aff = eye.copy()
    dst_aff[0, 3] = 2.0
    out = resample_to_match(vol, eye, vol.shape, dst_aff, order=0)
    np.testing.assert_array_equal(out[:8], vol[2:])


def test_resample_spacing_halves_shape():
    vol = np.random.RandomState(3).rand(16, 16, 16).astype(np.float32)
    aff = np.diag([1.0, 1.0, 1.0, 1.0])
    out, new_aff = resample_spacing(vol, aff, (2.0, 2.0, 2.0), order=1)
    assert out.shape == (8, 8, 8)
    assert np.linalg.norm(new_aff[:3, 0]) == pytest.approx(2.0)


def test_invert_to_grid_roundtrip():
    vol = np.zeros((12, 12, 12, 2), np.float32)
    vol[4:8, 4:8, 4:8, 1] = 1.0
    aff = np.eye(4)
    # resample to 0.75mm grid and back
    up, up_aff = resample_spacing(vol[..., 1], aff, (0.75, 0.75, 0.75), order=0)
    back = invert_to_grid(up[..., None], up_aff, vol.shape[:3], aff, order=0)
    assert (back[..., 0] != vol[..., 1]).mean() < 0.02


def test_pos_neg_sampler_centers():
    label = np.zeros((32, 32, 32), np.float32)
    label[20:24, 20:24, 20:24] = 1
    sampler = PosNegCropSampler((16, 16, 16), pos=1, neg=1)
    fg, bg = sampler.precompute(label)
    rng = np.random.RandomState(0)
    starts = sampler.sample_centers(label.shape, fg, bg, 200, rng)
    assert starts.min() >= 0
    assert (starts <= 16).all()  # 32 - 16
    # roughly half the crops must contain foreground (pos=neg=1)
    contains_fg = 0
    for s in starts:
        crop = label[s[0]:s[0]+16, s[1]:s[1]+16, s[2]:s[2]+16]
        contains_fg += crop.sum() > 0
    assert 0.4 < contains_fg / 200


def test_crop_shape_and_padding():
    sampler = PosNegCropSampler((16, 16, 16))
    vol = np.random.RandomState(0).rand(10, 20, 20, 2)
    out = sampler.crop(vol, np.array([0, 2, 2]))
    assert out.shape == (16, 16, 16, 2)


def test_augment_batch_shapes_and_determinism():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 16, 16, 16, 2).astype(np.float32))
    lbl = jnp.asarray((rng.rand(2, 16, 16, 16, 1) > 0.8).astype(np.float32))
    key = jax.random.PRNGKey(0)
    a1, l1 = augment_batch(img, lbl, key, jnp.float32(0.0), jnp.float32(0.0))
    a2, l2 = augment_batch(jnp.array(img), jnp.array(lbl), key,
                           jnp.float32(0.0), jnp.float32(0.0))
    assert a1.shape == img.shape and l1.shape == lbl.shape
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # labels stay binary under flips+nearest rotation
    assert set(np.unique(np.asarray(l1))) <= {0.0, 1.0}


def test_augment_gridmask_masks_when_prob_one():
    img = jnp.ones((1, 24, 24, 24, 1), jnp.float32)
    lbl = jnp.zeros((1, 24, 24, 24, 1), jnp.float32)
    zeros = []
    for s in range(5):
        a, _ = augment_batch(jnp.array(img), jnp.array(lbl), jax.random.PRNGKey(s),
                             jnp.float32(0.0), jnp.float32(1.0))
        zeros.append(float((np.asarray(a) == 0).mean()))
    # gridmask with ratio .5 masks a substantial fraction of the volume
    assert max(zeros) > 0.3


def test_augment_coarse_dropout_zeroes_blocks():
    img = jnp.ones((1, 32, 32, 32, 1), jnp.float32)
    lbl = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    a, _ = augment_batch(img, lbl, jax.random.PRNGKey(3),
                         jnp.float32(1.0), jnp.float32(0.0))
    frac = float((np.asarray(a) == 0).mean())
    assert 0.01 < frac <= 5 * (16 ** 3) / (32 ** 3) + 1e-6


def test_scheduled_probs_ramp():
    params = {"max_epochs": 100, "coarse_dropout_max_prob": 0.4,
              "coarse_dropout_start_epoch": 20, "gridmask_max_prob": 0.6,
              "gridmask_start_epoch": 0}
    assert scheduled_probs(params, 0) == (0.0, 0.0)
    cd, gm = scheduled_probs(params, 60)
    assert cd == pytest.approx(0.4 * 0.5)
    assert gm == pytest.approx(0.6 * 0.6)
    cd, gm = scheduled_probs(params, 100)
    assert cd == pytest.approx(0.4)
    assert gm == pytest.approx(0.6)
