"""Native geomlib vs numpy reference semantics."""

import numpy as np
import pytest

from open3dsot_tpu import native
from open3dsot_tpu.geometry import Box, PointCloud, Quaternion, points_utils


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("geomlib build unavailable")
    return True


class TestCropCanonical:
    def test_matches_generate_subwindow(self, have_native):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-10, 10, size=(5000, 3)).astype(np.float32)
        box = Box(
            rng.uniform(-3, 3, 3), rng.uniform(1, 3, 3),
            Quaternion(axis=[0, 0, 1], radians=rng.uniform(-np.pi, np.pi)),
        )
        scale, offset = 1.25, 2.0
        # reference path
        want = points_utils.generate_subwindow(
            PointCloud(pts.T.astype(np.float64)), box, scale=scale, offset=offset
        ).points.T

        # native fused path: AABB of the canonical scaled box + offset
        box_tmp = points_utils.transform_box(box, box)
        box_tmp.wlh = box_tmp.wlh * scale
        maxi = np.max(box_tmp.corners(), 1) + offset
        got = native.crop_canonical(
            pts, box.rotation_matrix.T, box.center, maxi
        )
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-4)

    def test_in_box_mask(self, have_native):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-4, 4, size=(2000, 3)).astype(np.float32)
        box = Box([0.5, -0.5, 0], [2, 3, 1.5], Quaternion(axis=[0, 0, 1], degrees=30))
        want = points_utils.points_in_box(box, pts.T.astype(np.float64), 1.25)
        half = np.array([box.wlh[1], box.wlh[0], box.wlh[2]]) * 1.25 / 2
        got = native.points_in_box_native(pts, box.rotation_matrix.T, box.center, half)
        assert (got == want).mean() > 0.999  # f32 rounding at the boundary only

    def test_box_cloud(self, have_native):
        rng = np.random.default_rng(2)
        pts = rng.uniform(-4, 4, size=(100, 3)).astype(np.float32)
        box = Box([1, 2, 0], [2, 3, 1.5], Quaternion(axis=[0, 0, 1], degrees=-20))
        want = points_utils.get_point_to_box_distance(pts.astype(np.float64), box)
        kp = np.concatenate([box.center.reshape(1, 3), box.corners().T], axis=0)
        got = native.box_cloud_native(pts, kp)
        assert np.allclose(got, want, atol=1e-4)
