"""Metrics: IoU overlap math + Success/Precision AUC."""

import math

import numpy as np

from open3dsot_tpu.geometry import Box, Quaternion
from open3dsot_tpu.geometry.iou import (
    convex_intersection_area,
    estimateAccuracy,
    estimateOverlap,
    polygon_area,
)
from open3dsot_tpu.utils.metrics import Precision, Success


UNIT_SQ = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)


class TestPolygonClip:
    def test_identical(self):
        assert math.isclose(convex_intersection_area(UNIT_SQ, UNIT_SQ), 1.0)

    def test_half_overlap(self):
        shifted = UNIT_SQ + np.array([0.5, 0.0])
        assert math.isclose(convex_intersection_area(UNIT_SQ, shifted), 0.5)

    def test_disjoint(self):
        far = UNIT_SQ + np.array([5.0, 0.0])
        assert convex_intersection_area(UNIT_SQ, far) == 0.0

    def test_rotated_45(self):
        # unit square vs itself rotated 45 deg about its center: area = 2(sqrt2 - 1)
        c = np.array([0.5, 0.5])
        th = np.pi / 4
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        rot = (UNIT_SQ - c) @ R.T + c
        expected = 2 * (math.sqrt(2) - 1)
        assert math.isclose(convex_intersection_area(UNIT_SQ, rot), expected, rel_tol=1e-9)

    def test_clockwise_input_ok(self):
        assert math.isclose(convex_intersection_area(UNIT_SQ[::-1], UNIT_SQ), 1.0)

    def test_area(self):
        assert math.isclose(polygon_area(UNIT_SQ * 3), 9.0)


class TestOverlap:
    def make_box(self, center, wlh=(2, 2, 2), deg=0.0):
        return Box(center, wlh, Quaternion(axis=[0, 0, 1], degrees=deg))

    def test_identical_3d_z_up(self):
        b = self.make_box([0, 0, 0])
        # the reference's vertical-extent quirk measures [center-h, center]; for
        # two identical boxes the IoU is still exactly 1
        assert math.isclose(estimateOverlap(b, b, dim=3, up_axis=(0, 0, 1)), 1.0)

    def test_identical_2d(self):
        b = self.make_box([1, 2, 3], deg=33.0)
        assert math.isclose(estimateOverlap(b, b, dim=2, up_axis=(0, 0, 1)), 1.0)

    def test_half_shift_2d(self):
        a = self.make_box([0, 0, 0])
        b = self.make_box([1, 0, 0])
        # 2x2 squares shifted by 1: inter 2, union 6
        assert math.isclose(estimateOverlap(a, b, dim=2, up_axis=(0, 0, 1)), 2 / 6)

    def test_3d_z_shift_uses_reference_formula(self):
        a = self.make_box([0, 0, 0])
        b = self.make_box([0, 0, 1])
        # reference: up_max = min(0,1)=0; up_min = max(0-2, 1-2)=-1 -> dz=1
        # inter = 4*1=4; union = 8+8-4=12
        assert math.isclose(estimateOverlap(a, b, dim=3, up_axis=(0, 0, 1)), 4 / 12)

    def test_camera_mode_y_up(self):
        # KITTI camera-mode boxes carry the pi/2 x-rotation (kitti.py:162-165)
        q = Quaternion(axis=[0, 1, 0], degrees=15) * Quaternion(
            axis=[1, 0, 0], degrees=90
        )
        b = Box([0, 0, 0], [2, 3, 2], q)
        assert math.isclose(estimateOverlap(b, b, dim=2, up_axis=(0, -1, 0)), 1.0)
        shifted = Box([50, 0, 0], [2, 3, 2], q)
        assert estimateOverlap(b, shifted, dim=2, up_axis=(0, -1, 0)) == 0.0

    def test_accuracy(self):
        a = self.make_box([0, 0, 0])
        b = self.make_box([3, 4, 12])
        assert math.isclose(estimateAccuracy(a, b, dim=3), 13.0)
        # reference quirk (metrics.py:31-33): dim=2 selects the component(s)
        # where up_axis is nonzero — i.e. the VERTICAL distance, |dz| here
        assert math.isclose(estimateAccuracy(a, b, dim=2, up_axis=(0, 0, 1)), 12.0)


class TestAUCMetrics:
    def test_success_perfect(self):
        s = Success()
        s.update(np.ones(10))
        assert math.isclose(s.compute(), 100.0)

    def test_success_zero(self):
        s = Success()
        s.update(np.zeros(10))
        # only threshold 0 is satisfied -> first trapezoid contributes
        # 0.5*(1+0)*(1/20) per unit... matches torch.trapz of [1,0,...,0]
        expected = np.trapezoid([1.0] + [0.0] * 20, x=np.linspace(0, 1, 21)) * 100
        assert math.isclose(s.compute(), expected)

    def test_precision_known_value(self):
        p = Precision()
        vals = np.array([0.0, 1.0, 2.0])
        p.update(vals)
        x = np.linspace(0, 2, 21)
        curve = [(vals <= t).mean() for t in x]
        expected = np.trapezoid(curve, x=x) * 100 / 2
        assert math.isclose(p.compute(), expected)

    def test_merge_equals_concat(self):
        rng = np.random.default_rng(0)
        a_vals, b_vals = rng.uniform(0, 1, 50), rng.uniform(0, 1, 30)
        s1, s2, s_all = Success(), Success(), Success()
        s1.update(a_vals)
        s2.update(b_vals)
        s_all.update(np.concatenate([a_vals, b_vals]))
        s1.merge(s2)
        assert math.isclose(s1.compute(), s_all.compute())

    def test_state_roundtrip(self):
        s = Success()
        s.update([0.3, 0.7])
        s2 = Success()
        s2.load_state(s.state())
        assert math.isclose(s.compute(), s2.compute())

    def test_empty_returns_zero(self):
        assert Success().compute() == 0.0
        assert Precision().compute() == 0.0
