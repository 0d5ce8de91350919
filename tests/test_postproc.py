"""Post-processing parity vs scipy and the reference semantics."""

import numpy as np
import pytest
from scipy import ndimage

from fcd_tpu.postproc import native
from fcd_tpu.postproc.morphology import (
    binary_dilation,
    binary_erosion,
    binary_fill_holes,
    binary_opening,
    connected_components,
)
from fcd_tpu.postproc.segment import evaluate_fp, post_process_segment


def _blob(shape, seed, p=0.6):
    rng = np.random.RandomState(seed)
    x = ndimage.gaussian_filter(rng.rand(*shape), 1.5)
    return x > np.quantile(x, p)


def test_native_lib_builds():
    assert native.get_lib() is not None, "C++ ops failed to build"


@pytest.mark.parametrize("connectivity,rank_conn", [(6, 1), (18, 2), (26, 3)])
def test_connected_components_partition_matches_scipy(connectivity, rank_conn):
    mask = _blob((20, 22, 18), 0)
    mine = connected_components(mask, connectivity)
    ref, n_ref = ndimage.label(mask, structure=ndimage.generate_binary_structure(3, rank_conn))
    assert mine.max() == n_ref
    # same partition: bijection between label sets
    pairs = set(zip(mine.ravel().tolist(), ref.ravel().tolist()))
    mine_to_ref = {}
    for a, b in pairs:
        assert mine_to_ref.setdefault(a, b) == b  # injective both ways
    assert len({b for _, b in pairs}) == len(mine_to_ref)


def test_connected_components_raster_order_numbering():
    mask = np.zeros((5, 5, 5), np.uint8)
    mask[4, 4, 4] = 1  # later in raster order
    mask[0, 0, 0] = 1
    labels = connected_components(mask, 26)
    assert labels[0, 0, 0] == 1
    assert labels[4, 4, 4] == 2


@pytest.mark.parametrize("iterations", [1, 2])
def test_morphology_matches_scipy(iterations):
    mask = _blob((16, 18, 14), 1)
    for structure in (ndimage.generate_binary_structure(3, 1),
                      ndimage.generate_binary_structure(3, 2),
                      np.ones((3, 3, 3), np.uint8)):
        np.testing.assert_array_equal(
            binary_dilation(mask, structure, iterations),
            ndimage.binary_dilation(mask, structure=structure, iterations=iterations),
        )
        np.testing.assert_array_equal(
            binary_erosion(mask, structure, iterations),
            ndimage.binary_erosion(mask, structure=structure, iterations=iterations),
        )


def test_opening_and_fill_holes_match_scipy():
    mask = _blob((16, 16, 16), 2, p=0.5)
    np.testing.assert_array_equal(
        binary_opening(mask, iterations=1),
        ndimage.binary_dilation(ndimage.binary_erosion(mask)),
    )
    # put a definite hole in a solid cube
    cube = np.zeros((12, 12, 12), bool)
    cube[2:10, 2:10, 2:10] = True
    cube[5:7, 5:7, 5:7] = False
    for structure in (None, np.ones((5, 5, 5), np.uint8)):
        want = ndimage.binary_fill_holes(
            cube, structure=structure if structure is not None else None
        )
        np.testing.assert_array_equal(binary_fill_holes(cube, structure), want)


def _reference_post_process(mask, l_min):
    """Direct transcription of utils/utils_common.py:10-33 using scipy."""
    output_msk = np.zeros_like(mask, dtype=np.int64)
    morphed = ndimage.binary_opening(mask, iterations=1)
    morphed = ndimage.binary_fill_holes(morphed, structure=np.ones((5, 5, 5))).astype(int)
    lab_img, _ = ndimage.label(morphed, structure=np.ones((3, 3, 3)))
    lab_val = np.unique(lab_img)
    sizes = ndimage.labeled_comprehension(morphed, lab_img, lab_val, np.sum, float, 0)
    if l_min == -1:
        l_min = np.max(sizes)
    for i in range(len(sizes)):
        if sizes[i] >= l_min and lab_val[i] != 0:
            output_msk[lab_img == lab_val[i]] = 1
    return output_msk


@pytest.mark.parametrize("l_min", [1, 10, 50, -1])
def test_post_process_segment_parity(l_min):
    mask = _blob((24, 24, 24), 3, p=0.7)
    got, labels = post_process_segment(mask, l_min)
    want = _reference_post_process(mask, l_min)
    np.testing.assert_array_equal(got, want)
    assert (labels > 0).sum() == got.sum()


def test_evaluate_fp():
    cc = np.zeros((8, 8, 8), np.int32)
    cc[0:2, 0:2, 0:2] = 1      # overlaps gt
    cc[5:7, 5:7, 5:7] = 2      # does not
    gt = np.zeros((8, 8, 8))
    gt[0:2, 0:2, 0:2] = 1
    assert evaluate_fp(cc, gt) == 1


@pytest.mark.parametrize("sampling", [(1.0, 1.0, 1.0), (0.7, 1.3, 2.0)])
def test_native_edt_parity(sampling):
    """fcdops.cpp::edt_3d vs scipy.ndimage.distance_transform_edt."""
    from fcd_tpu.postproc.native import native_edt

    rng = np.random.RandomState(3)
    for shape in [(7, 9, 11), (24, 18, 30), (1, 5, 5)]:
        m = rng.rand(*shape) > 0.7
        ours = native_edt(m, sampling)
        assert ours is not None, "native lib unavailable"
        ref = ndimage.distance_transform_edt(m, sampling=sampling)
        np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_native_edt_no_zero_voxel():
    from fcd_tpu.postproc.native import native_edt

    out = native_edt(np.ones((4, 4, 4), bool), (1.0, 1.0, 1.0))
    assert np.isinf(out).all()


def test_native_neighbour_code_parity():
    """fcdops.cpp::neighbour_code_3d vs scipy correlate with the bit kernel."""
    from fcd_tpu.metrics.surface_distance import _CODE_KERNEL
    from fcd_tpu.postproc.native import native_neighbour_code

    rng = np.random.RandomState(4)
    for shape in [(6, 7, 8), (16, 12, 10)]:
        m = (rng.rand(*shape) > 0.5).astype(np.uint8)
        ours = native_neighbour_code(m)
        assert ours is not None
        ref = ndimage.correlate(m, _CODE_KERNEL, mode="constant", cval=0)
        np.testing.assert_array_equal(ours, ref)
