"""Native rasterizer: builds, fills like cv2, row extents correct."""
import numpy as np
import pytest

from masklab_tpu.native import (fill_polygon_native, load,
                                row_extents_native)


@pytest.fixture(scope='module')
def lib():
    lib = load()
    if lib is None:
        pytest.skip('no C++ toolchain available')
    return lib


def test_fill_rect_matches_cv2(lib):
    import cv2
    pts = np.asarray([[5, 3], [20, 3], [20, 12], [5, 12]], np.float64)
    ours = np.zeros((16, 24), np.uint8)
    assert fill_polygon_native(ours, pts)
    ref = np.zeros((16, 24), np.uint8)
    cv2.fillPoly(ref, [pts.astype(np.int32)], 1)
    # identical up to boundary pixels
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.sum() <= 2 * (np.ptp(pts[:, 0]) + np.ptp(pts[:, 1]))
    assert ours[7, 12] == 1 and ours[0, 0] == 0


def test_fill_triangle_interior(lib):
    pts = np.asarray([[2, 2], [30, 2], [2, 30]], np.float64)
    mask = np.zeros((32, 32), np.uint8)
    fill_polygon_native(mask, pts)
    assert mask[5, 5] == 1          # interior
    assert mask[31, 31] == 0        # outside the hypotenuse
    assert mask.sum() > 300


def test_row_extents(lib):
    mask = np.zeros((8, 16), np.uint8)
    mask[2, 3:9] = 1
    mask[5, 0] = 1
    x_min, x_max = row_extents_native(mask)
    assert x_min[2] == 3 and x_max[2] == 8
    assert x_min[5] == 0 and x_max[5] == 0
    assert x_min[0] == -1 and x_max[0] == -1
