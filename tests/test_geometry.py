"""Geometry core: quaternion, Box, points_utils, rigid-op consistency."""

import math

import numpy as np
import pytest

from open3dsot_tpu.geometry import Box, PointCloud, Quaternion
from open3dsot_tpu.geometry import points_utils


def random_z_box(rng, center_scale=5.0):
    center = rng.uniform(-center_scale, center_scale, 3)
    size = rng.uniform(0.5, 3.0, 3)
    theta = rng.uniform(-np.pi, np.pi)
    return Box(center, size, Quaternion(axis=[0, 0, 1], radians=theta))


class TestQuaternion:
    def test_identity(self):
        q = Quaternion()
        assert np.allclose(q.rotation_matrix, np.eye(3))
        assert q.radians == 0.0

    def test_axis_angle_roundtrip(self):
        for theta in [-3.0, -1.0, 0.5, 2.0, 3.1]:
            q = Quaternion(axis=[0, 0, 1], radians=theta)
            assert math.isclose(q.radians * q.axis[-1], theta, abs_tol=1e-9)

    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            ax = rng.normal(size=3)
            ax /= np.linalg.norm(ax)
            theta = rng.uniform(-np.pi, np.pi)
            q = Quaternion(axis=ax, radians=theta)
            q2 = Quaternion(matrix=q.rotation_matrix)
            assert np.allclose(q2.rotation_matrix, q.rotation_matrix, atol=1e-9)

    def test_compose_matches_matrix_product(self):
        q1 = Quaternion(axis=[0, 0, 1], degrees=30)
        q2 = Quaternion(axis=[0, 1, 0], degrees=45)
        assert np.allclose(
            (q1 * q2).rotation_matrix, q1.rotation_matrix @ q2.rotation_matrix
        )

    def test_inverse(self):
        q = Quaternion(axis=[1, 2, 3], degrees=77)
        assert np.allclose((q * q.inverse).rotation_matrix, np.eye(3), atol=1e-12)

    def test_degrees_sign_convention(self):
        # theta = degrees * axis[-1] must recover a signed z-rotation
        q = Quaternion(axis=[0, 0, 1], degrees=-60)
        assert math.isclose(q.degrees * q.axis[-1], -60, abs_tol=1e-9)


class TestBox:
    def test_corners_axis_aligned(self):
        box = Box([0, 0, 0], [2, 4, 1], Quaternion())  # w=2 (y), l=4 (x), h=1 (z)
        c = box.corners()
        assert c.shape == (3, 8)
        assert np.max(c[0]) == 2.0 and np.min(c[0]) == -2.0  # l/2 along x
        assert np.max(c[1]) == 1.0 and np.min(c[1]) == -1.0  # w/2 along y
        assert np.max(c[2]) == 0.5 and np.min(c[2]) == -0.5  # h/2 along z

    def test_bottom_corners_are_bottom(self):
        box = Box([1, 2, 3], [2, 4, 1], Quaternion(axis=[0, 0, 1], degrees=30))
        bc = box.bottom_corners()
        assert bc.shape == (3, 4)
        assert np.allclose(bc[2], 3 - 0.5)

    def test_rotate_translate_roundtrip(self):
        box = random_z_box(np.random.default_rng(0))
        orig = box.copy()
        q = Quaternion(axis=[0, 0, 1], degrees=90)
        box.rotate(q)
        box.rotate(q.inverse)
        assert np.allclose(box.center, orig.center)
        assert np.allclose(box.corners(), orig.corners())

    def test_encode_decode(self):
        box = Box([1, 2, 3], [2, 3, 4], Quaternion(axis=[0, 0, 1], degrees=10))
        box2 = Box.decode(box.encode())
        assert np.allclose(box2.center, box.center)
        assert np.allclose(box2.corners(), box.corners())


class TestPointsUtils:
    def test_regularize_downsample_shape(self):
        pts = np.random.randn(100, 3)
        out, idx = points_utils.regularize_pc(pts, 32)
        assert out.shape == (32, 3)
        assert idx.shape == (32,)

    def test_regularize_upsample_with_replacement(self):
        pts = np.random.randn(5, 3)
        out, idx = points_utils.regularize_pc(pts, 16)
        assert out.shape == (16, 3)

    def test_regularize_too_few_returns_zeros(self):
        pts = np.random.randn(2, 3)
        out, idx = points_utils.regularize_pc(pts, 8)
        assert idx is None
        assert np.all(out == 0)

    def test_regularize_seeded_deterministic(self):
        pts = np.random.randn(50, 3)
        a, ia = points_utils.regularize_pc(pts, 20, seed=1)
        b, ib = points_utils.regularize_pc(pts, 20, seed=1)
        assert np.array_equal(ia, ib)
        assert np.array_equal(a, b)

    def test_crop_axis_aligned(self):
        box = Box([0, 0, 0], [2, 2, 2], Quaternion())
        pts = np.array([[0, 0, 0], [0.9, 0.9, 0.9], [5, 5, 5], [-1.5, 0, 0]]).T
        pc = PointCloud(pts.astype(float))
        cropped = points_utils.crop_pc_axis_aligned(pc, box)
        assert cropped.nbr_points() == 2

    def test_get_in_box_mask_oriented(self):
        # box rotated 45deg: the point (1.2, 0, 0) is outside an l=2 box
        # rotated by 45 but inside its AABB
        box = Box([0, 0, 0], [2, 2, 2], Quaternion(axis=[0, 0, 1], degrees=45))
        pts = np.array([[0, 0, 0], [1.2, 0, 0], [1.2, 1.2, 0]]).T
        mask = points_utils.get_in_box_mask(PointCloud(pts.astype(float)), box)
        assert mask.tolist() == [True, True, False]

    def test_points_in_box_wlh_factor(self):
        box = Box([0, 0, 0], [2, 2, 2], Quaternion())
        pts = np.array([[1.1, 0, 0]]).T.astype(float)
        assert not points_utils.points_in_box(box, pts, 1.0)[0]
        assert points_utils.points_in_box(box, pts, 1.25)[0]

    def test_getOffsetBB_simple_translation(self):
        rng = np.random.default_rng(1)
        box = random_z_box(rng)
        off = np.array([0.5, -0.2, 0.0])
        new_box = points_utils.getOffsetBB(box, off.copy(), degrees=True, limit_box=False)
        # offset is in the box's local frame
        expected = box.center + box.rotation_matrix @ np.array([0.5, -0.2, 0.0])
        assert np.allclose(new_box.center, expected)

    def test_getOffsetBB_rotation_only(self):
        box = Box([1, 1, 0], [2, 2, 2], Quaternion(axis=[0, 0, 1], degrees=10))
        new_box = points_utils.getOffsetBB(box, [0.0, 0.0, 0.0, 20.0], degrees=True, limit_box=False)
        assert math.isclose(
            new_box.orientation.degrees * new_box.orientation.axis[-1], 30.0, abs_tol=1e-6
        )
        assert np.allclose(new_box.center, box.center)

    def test_cropAndCenterPC_canonicalizes(self):
        rng = np.random.default_rng(2)
        box = random_z_box(rng)
        # points exactly at box center + corners
        pts = np.concatenate([box.center.reshape(3, 1), box.corners() * 0.99 + 0.01 * box.center.reshape(3, 1)], axis=1)
        pc = PointCloud(pts)
        cropped, new_box = points_utils.cropAndCenterPC(pc, box, offset=0.1, scale=1.0)
        assert np.allclose(new_box.center, 0)
        # center point maps to origin
        assert np.any(np.all(np.abs(cropped.points) < 1e-9, axis=0))

    def test_generate_subwindow_canonical_frame(self):
        rng = np.random.default_rng(3)
        box = random_z_box(rng)
        pts = box.center.reshape(3, 1) + np.zeros((3, 1))
        pc = PointCloud(pts.astype(float))
        sub = points_utils.generate_subwindow(pc, box, scale=1.25, offset=2)
        # the box center must map to the origin of the subwindow frame
        # (f32 tolerance: the fused native path stores float32)
        assert np.allclose(sub.points[:, 0], 0, atol=1e-5)

    def test_transform_box_roundtrip_theta(self):
        rng = np.random.default_rng(4)
        a, ref = random_z_box(rng), random_z_box(rng)
        t = points_utils.transform_box(a, ref)
        # angle difference preserved
        ta = a.orientation.radians * a.orientation.axis[-1]
        tr = ref.orientation.radians * ref.orientation.axis[-1]
        tt = t.orientation.radians * t.orientation.axis[-1]
        assert math.isclose(
            math.sin(tt), math.sin(ta - tr), abs_tol=1e-9
        )

    def test_box_cloud_host(self):
        box = Box([0, 0, 0], [2, 2, 2], Quaternion())
        bc = points_utils.get_point_to_box_distance(np.zeros((1, 3)), box)
        assert bc.shape == (1, 9)
        assert math.isclose(bc[0, 0], 0.0, abs_tol=1e-12)
        assert np.allclose(bc[0, 1:], math.sqrt(3.0))

    def test_apply_augmentation_preserves_outside_points(self):
        box = Box([0, 0, 0], [2, 2, 2], Quaternion())
        pts = np.array([[0, 0, 0], [10, 10, 10]]).T.astype(float)
        pc = PointCloud(pts)
        new_pc, new_box = points_utils.apply_augmentation(pc, box)
        assert np.allclose(new_pc.points[:, 1], [10, 10, 10])


class TestRigidJnp:
    """Device-side rigid math must agree with the host Box path."""

    def test_get_offset_box_matches_host(self):
        import jax.numpy as jnp
        from open3dsot_tpu.geometry import rigid

        rng = np.random.default_rng(5)
        for _ in range(5):
            ref = random_z_box(rng)
            ref_theta = ref.orientation.radians * ref.orientation.axis[-1]
            ref_params = np.append(ref.center, ref_theta)
            off = rng.uniform(-1, 1, 4)
            out = rigid.get_offset_box(jnp.asarray(ref_params)[None], jnp.asarray(off)[None])[0]
            host = points_utils.getOffsetBB(
                ref, [off[0], off[1], off[2], off[3]], degrees=False, use_z=True, limit_box=False
            )
            assert np.allclose(np.asarray(out[:3]), host.center, atol=1e-5)
            host_theta = host.orientation.radians * host.orientation.axis[-1]
            assert math.isclose(math.sin(float(out[3])), math.sin(host_theta), abs_tol=1e-5)

    def test_remove_then_apply_roundtrip(self):
        import jax.numpy as jnp
        from open3dsot_tpu.geometry import rigid

        rng = np.random.default_rng(6)
        pts = jnp.asarray(rng.normal(size=(2, 16, 3)))
        box = jnp.asarray(rng.uniform(-1, 1, size=(2, 4)))
        back = rigid.apply_transform_points(rigid.remove_transform_points(pts, box), box)
        assert np.allclose(np.asarray(back), np.asarray(pts), atol=1e-6)

    def test_box_cloud_matches_host(self):
        import jax.numpy as jnp
        from open3dsot_tpu.geometry import rigid

        rng = np.random.default_rng(7)
        box = random_z_box(rng)
        theta = box.orientation.radians * box.orientation.axis[-1]
        params = np.append(box.center, theta)
        pts = rng.normal(size=(8, 3))
        bc_dev = rigid.box_cloud(
            jnp.asarray(pts)[None], jnp.asarray(params)[None], jnp.asarray(box.wlh)[None]
        )[0]
        bc_host = points_utils.get_point_to_box_distance(pts, box)
        assert np.allclose(np.asarray(bc_dev), bc_host, atol=1e-5)

    def test_points_in_box_matches_host(self):
        import jax.numpy as jnp
        from open3dsot_tpu.geometry import rigid

        rng = np.random.default_rng(8)
        box = random_z_box(rng)
        theta = box.orientation.radians * box.orientation.axis[-1]
        params = np.append(box.center, theta)
        pts = box.center[None, :] + rng.normal(size=(64, 3))
        mask_dev = rigid.points_in_box(
            jnp.asarray(pts)[None], jnp.asarray(params)[None], jnp.asarray(box.wlh)[None], 1.25
        )[0]
        mask_host = points_utils.points_in_box(box, pts.T, 1.25)
        assert np.array_equal(np.asarray(mask_dev), mask_host)

    def test_get_offset_points_matches_box_motion(self):
        import jax.numpy as jnp
        from open3dsot_tpu.geometry import rigid

        # moving the ref-box corner points by a motion offset must land them
        # on the corners of the moved box
        rng = np.random.default_rng(9)
        ref = rng.uniform(-1, 1, 4)
        off = rng.uniform(-1, 1, 4)
        wlh = np.array([1.5, 2.5, 1.0])
        corners0 = rigid.box_corners(jnp.asarray(ref)[None], jnp.asarray(wlh)[None])
        moved_box = rigid.get_offset_box(jnp.asarray(ref)[None], jnp.asarray(off)[None])
        corners1 = rigid.box_corners(moved_box, jnp.asarray(wlh)[None])
        corners_moved = rigid.get_offset_points(
            corners0, jnp.asarray(ref)[None], jnp.asarray(off)[None]
        )
        assert np.allclose(np.asarray(corners_moved), np.asarray(corners1), atol=1e-5)
