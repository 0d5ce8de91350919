"""Bit-level parity of the surface-distance engine vs the reference
implementation (/root/reference/brats, DeepMind surface-distance port)."""

import sys
import types

import numpy as np
import pytest

from fcd_tpu.metrics.surface_distance import (
    compute_average_surface_distance,
    compute_dice_coefficient,
    compute_robust_hausdorff,
    compute_surface_dice_at_tolerance,
    compute_surface_distances,
)

REF_DIR = "/root/reference/brats"


@pytest.fixture(scope="module")
def ref_sd():
    """Import the reference sd_metrics with shims for old scipy/numpy APIs."""
    from scipy import ndimage

    if not hasattr(ndimage, "filters"):
        ndimage.filters = types.SimpleNamespace(correlate=ndimage.correlate)
    if not hasattr(ndimage, "morphology"):
        ndimage.morphology = types.SimpleNamespace(
            distance_transform_edt=ndimage.distance_transform_edt
        )
    if not hasattr(np, "Inf"):
        np.Inf = np.inf
    sys.path.insert(0, REF_DIR)
    import importlib

    import lookup_tables  # noqa: F401

    spec = importlib.util.spec_from_file_location(
        "ref_sd_metrics", REF_DIR + "/sd_metrics.py"
    )
    mod = importlib.util.module_from_spec(spec)
    # satisfy its relative import of lookup_tables
    mod.__dict__["lookup_tables"] = lookup_tables
    src = open(REF_DIR + "/sd_metrics.py").read().replace(
        "from . import lookup_tables", "import lookup_tables"
    )
    exec(compile(src, REF_DIR + "/sd_metrics.py", "exec"), mod.__dict__)
    return mod


def _random_blob(shape, seed, p=0.5, smooth=2):
    from scipy import ndimage

    rng = np.random.RandomState(seed)
    x = rng.rand(*shape)
    x = ndimage.gaussian_filter(x, smooth)
    return x > np.quantile(x, p)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("spacing", [(1.0, 1.0, 1.0), (0.7, 1.3, 2.1)])
def test_parity_random_blobs(ref_sd, seed, spacing):
    gt = _random_blob((24, 28, 20), seed, p=0.55)
    pred = _random_blob((24, 28, 20), seed + 100, p=0.6)

    mine = compute_surface_distances(gt, pred, spacing)
    theirs = ref_sd.compute_surface_distances(gt, pred, spacing)

    # our native C++ EDT (fcdops.cpp::edt_3d) matches scipy's to ~1e-12 but
    # not bit-for-bit, so surfels tied in distance may sort in a different
    # order than the reference; canonicalize (distance, area) pairs before
    # the element-wise comparison — the engine's outputs are (distance,
    # area) multisets, and every derived metric is order-insensitive
    def _canon(sd, dkey, akey):
        d, a = sd[dkey], sd[akey]
        order = np.lexsort((a, np.round(d, 6)))
        return d[order], a[order]

    for dkey, akey in (
        ("distances_gt_to_pred", "surfel_areas_gt"),
        ("distances_pred_to_gt", "surfel_areas_pred"),
    ):
        md, ma = _canon(mine, dkey, akey)
        td, ta = _canon(theirs, dkey, akey)
        np.testing.assert_allclose(md, td, rtol=1e-9, atol=1e-12, err_msg=dkey)
        np.testing.assert_allclose(ma, ta, rtol=1e-9, atol=1e-12, err_msg=akey)

    for pct in (95, 99, 50):
        assert compute_robust_hausdorff(mine, pct) == pytest.approx(
            ref_sd.compute_robust_hausdorff(theirs, pct), abs=1e-9
        )
    np.testing.assert_allclose(
        compute_average_surface_distance(mine),
        ref_sd.compute_average_surface_distance(theirs),
        rtol=1e-9,
    )
    assert compute_surface_dice_at_tolerance(mine, 1.0) == pytest.approx(
        ref_sd.compute_surface_dice_at_tolerance(theirs, 1.0), abs=1e-12
    )


def test_empty_masks(ref_sd):
    z = np.zeros((8, 8, 8), bool)
    blob = np.zeros((8, 8, 8), bool)
    blob[2:5, 2:5, 2:5] = True

    mine = compute_surface_distances(z, z, (1, 1, 1))
    assert all(len(v) == 0 for v in mine.values())

    mine = compute_surface_distances(blob, z, (1, 1, 1))
    theirs = ref_sd.compute_surface_distances(blob, z, (1, 1, 1))
    assert compute_robust_hausdorff(mine, 95) == np.inf
    for key in mine:
        np.testing.assert_allclose(mine[key], theirs[key])


def test_dice_coefficient(ref_sd):
    a = _random_blob((16, 16, 16), 5)
    b = _random_blob((16, 16, 16), 6)
    assert compute_dice_coefficient(a, b) == pytest.approx(
        ref_sd.compute_dice_coefficient(a, b)
    )
    assert np.isnan(compute_dice_coefficient(np.zeros((4, 4, 4), bool),
                                             np.zeros((4, 4, 4), bool)))


def test_generated_lut_exact_match():
    sys.path.insert(0, REF_DIR)
    import lookup_tables as ref_lut

    from fcd_tpu.metrics.mc_tables import neighbour_code_to_normals

    mine = neighbour_code_to_normals()
    for code in range(256):
        a = sorted(
            tuple(np.abs(np.round(v, 9))) for v in np.asarray(mine[code], float)
            if np.linalg.norm(v) > 0
        )
        b = sorted(
            tuple(np.abs(np.round(v, 9))) for v in np.asarray(ref_lut.neighbour_code_to_normals[code], float)
            if np.linalg.norm(v) > 0
        )
        assert a == b, f"code {code}"
