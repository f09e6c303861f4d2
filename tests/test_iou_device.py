"""Golden tests: device metrics (geometry/iou_device.py) vs the host
estimateOverlap/estimateAccuracy (geometry/iou.py), which are themselves
live-parity-tested against the reference's shapely metrics."""

from __future__ import annotations

import numpy as np
import pytest

from open3dsot_tpu.geometry import rigid
from open3dsot_tpu.geometry.data_classes import Box
from open3dsot_tpu.geometry.iou import estimateAccuracy, estimateOverlap
from open3dsot_tpu.geometry.iou_device import overlap_accuracy, up_index
from open3dsot_tpu.geometry.quaternion import Quaternion

Z_UP = (0, 0, 1)
CAM_UP = (0, -1, 0)


def _host_box(params, wlh, up_axis):
    A = rigid.up_frame(up_axis)
    A_np = None if A is None else np.asarray(A)
    return Box(
        list(params[:3]),
        list(wlh),
        Quaternion(matrix=rigid.rotation_from_theta(params[3], A_np)),
    )


def _compare(params_a, wlh_a, params_b, wlh_b, up_axis, dim, atol=3e-4):
    iou_d, dist_d = overlap_accuracy(
        params_a, wlh_a, params_b, wlh_b, dim=dim, up_idx=up_index(up_axis)
    )
    iou_d, dist_d = np.asarray(iou_d), np.asarray(dist_d)
    flat_a = params_a.reshape(-1, 4)
    flat_b = params_b.reshape(-1, 4)
    fw_a = wlh_a.reshape(-1, 3)
    fw_b = wlh_b.reshape(-1, 3)
    for i in range(len(flat_a)):
        box_a = _host_box(flat_a[i], fw_a[i], up_axis)
        box_b = _host_box(flat_b[i], fw_b[i], up_axis)
        iou_h = estimateOverlap(box_a, box_b, dim=dim, up_axis=up_axis)
        dist_h = estimateAccuracy(box_a, box_b, dim=dim, up_axis=up_axis)
        assert abs(iou_d.reshape(-1)[i] - iou_h) < atol, (
            f"pair {i}: device iou {iou_d.reshape(-1)[i]} vs host {iou_h} "
            f"(dim={dim}, up={up_axis})"
        )
        assert abs(dist_d.reshape(-1)[i] - dist_h) < atol


def _random_pairs(rng, n, spread=1.5):
    params_a = np.concatenate(
        [
            rng.normal(scale=2.0, size=(n, 3)),
            rng.uniform(-np.pi, np.pi, size=(n, 1)),
        ],
        axis=-1,
    ).astype(np.float32)
    # b boxes near a so a good fraction genuinely overlaps
    params_b = params_a + np.concatenate(
        [
            rng.normal(scale=spread, size=(n, 3)),
            rng.uniform(-np.pi, np.pi, size=(n, 1)),
        ],
        axis=-1,
    ).astype(np.float32)
    wlh_a = rng.uniform(0.5, 3.0, size=(n, 3)).astype(np.float32)
    wlh_b = rng.uniform(0.5, 3.0, size=(n, 3)).astype(np.float32)
    return params_a, wlh_a, params_b.astype(np.float32), wlh_b


@pytest.mark.parametrize("up_axis", [Z_UP, CAM_UP])
@pytest.mark.parametrize("dim", [2, 3])
def test_random_pairs_match_host(up_axis, dim):
    rng = np.random.default_rng(0)
    pa, wa, pb, wb = _random_pairs(rng, 64)
    _compare(pa, wa, pb, wb, up_axis, dim)


def test_identical_boxes_score_one():
    p = np.array([[1.0, 2.0, 3.0, 0.7]], np.float32)
    w = np.array([[1.5, 3.0, 1.2]], np.float32)
    iou, dist = overlap_accuracy(p, w, p, w, dim=3, up_idx=2)
    assert np.allclose(np.asarray(iou), 1.0, atol=1e-6)
    assert np.allclose(np.asarray(dist), 0.0)


def test_disjoint_and_contained():
    pa = np.array([[0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]], np.float32)
    wa = np.array([[2.0, 4.0, 2.0], [4.0, 6.0, 4.0]], np.float32)
    pb = np.array([[50.0, 0.0, 0.0, 0.3], [0.0, 0.0, 0.0, np.pi / 4]], np.float32)
    wb = np.array([[2.0, 4.0, 2.0], [1.0, 1.0, 1.0]], np.float32)
    _compare(pa, wa, pb, wb, Z_UP, 2)
    _compare(pa, wa, pb, wb, Z_UP, 3)
    iou, _ = overlap_accuracy(pa, wa, pb, wb, dim=2, up_idx=2)
    assert float(np.asarray(iou)[0]) == 0.0  # disjoint


def test_rotated_45_half_geometry():
    # unit squares rotated 45 deg about the same center: analytic overlap
    pa = np.array([[0.0, 0.0, 0.0, 0.0]], np.float32)
    pb = np.array([[0.0, 0.0, 0.0, np.pi / 4]], np.float32)
    w = np.array([[1.0, 1.0, 1.0]], np.float32)
    _compare(pa, w, pb, w, Z_UP, 2, atol=1e-5)


def test_accuracy_dim2_uses_up_component_only():
    # reference quirk: dim=2 distance is |delta center_up| (metrics.py:27-33)
    pa = np.array([[0.0, 0.0, 1.0, 0.0]], np.float32)
    pb = np.array([[3.0, 4.0, 2.5, 0.0]], np.float32)
    w = np.array([[1.0, 1.0, 1.0]], np.float32)
    _, dist = overlap_accuracy(pa, w, pb, w, dim=2, up_idx=2)
    assert np.allclose(np.asarray(dist), 1.5, atol=1e-6)
    _, dist_cam = overlap_accuracy(pa, w, pb, w, dim=2, up_idx=1)
    assert np.allclose(np.asarray(dist_cam), 4.0, atol=1e-6)


def test_nonfinite_scores_zero():
    pa = np.array([[np.nan, 0.0, 0.0, 0.0]], np.float32)
    pb = np.array([[0.0, 0.0, 0.0, 0.0]], np.float32)
    w = np.array([[1.0, 1.0, 1.0]], np.float32)
    iou, _ = overlap_accuracy(pa, w, pb, w, dim=3, up_idx=2)
    assert float(np.asarray(iou)[0]) == 0.0


def test_vertical_extent_quirk():
    # same footprint, b floats 0.5 above a: reference measures spans as
    # [center_up - h, center_up], not the true box extent
    pa = np.array([[0.0, 0.0, 0.0, 0.0]], np.float32)
    pb = np.array([[0.0, 0.0, 0.5, 0.0]], np.float32)
    w = np.array([[2.0, 2.0, 1.0]], np.float32)
    _compare(pa, w, pb, w, Z_UP, 3, atol=1e-5)
    iou, _ = overlap_accuracy(pa, w, pb, w, dim=3, up_idx=2)
    # overlap span = [max(-1, -0.5), min(0, 0.5)] = [-0.5, 0] -> h=0.5
    # inter = 4*0.5 = 2; union = 4 + 4 - 2 = 6
    assert np.allclose(np.asarray(iou), 2.0 / 6.0, atol=1e-6)
