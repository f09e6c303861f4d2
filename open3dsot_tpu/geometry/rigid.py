"""Batched, jittable rigid-transform math (jnp, device side).

4-DoF boxes on device are (cx, cy, cz, theta_z) float arrays. These are the
TPU-native equivalents of the reference's tensorized helpers
(/root/reference/datasets/points_utils.py:364-451) plus fixed-shape versions
of the host geometry used inside the jitted track-step (BoxCloud, in-box
masks, subwindow canonicalization as masks over padded point sets).
All functions are pure, batched over a leading B axis, and static-shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def rotz(t: jnp.ndarray) -> jnp.ndarray:
    """(...,) angles -> (..., 3, 3) rotation matrices about +z."""
    c, s = jnp.cos(t), jnp.sin(t)
    zeros, ones = jnp.zeros_like(t), jnp.ones_like(t)
    rows = [
        jnp.stack([c, -s, zeros], axis=-1),
        jnp.stack([s, c, zeros], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def roty(t: jnp.ndarray) -> jnp.ndarray:
    """(...,) angles -> (..., 3, 3) rotation matrices about +y."""
    c, s = jnp.cos(t), jnp.sin(t)
    zeros, ones = jnp.zeros_like(t), jnp.ones_like(t)
    rows = [
        jnp.stack([c, zeros, s], axis=-1),
        jnp.stack([zeros, ones, zeros], axis=-1),
        jnp.stack([-s, zeros, c], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def get_offset_points(points: jnp.ndarray, ref_box: jnp.ndarray, offset_box: jnp.ndarray) -> jnp.ndarray:
    """Move points rigidly by an offset expressed in the ref box frame.

    points (B, N, 3); ref_box, offset_box (B, 4). Mirrors the reference's
    get_offset_points_tensor (points_utils.py:390-415): canonicalize to the
    ref frame, rotate by offset theta, translate by offset center, un-canonicalize.
    """
    ref_center = ref_box[:, :3]
    rot = rotz(-ref_box[:, 3])  # (B,3,3) world->ref
    p = points - ref_center[:, None, :]
    p = jnp.einsum("bnj,bkj->bnk", p, rot, precision=_HI)  # p @ rot.T
    rot_off = rotz(offset_box[:, 3])
    p = jnp.einsum("bnj,bkj->bnk", p, rot_off, precision=_HI)
    p = p + offset_box[:, None, :3]
    p = jnp.einsum("bnj,bjk->bnk", p, rot, precision=_HI)  # p @ rot (inverse of rot.T)
    return p + ref_center[:, None, :]


def get_offset_box(ref_box: jnp.ndarray, offset_box: jnp.ndarray) -> jnp.ndarray:
    """Compose a 4-DoF offset onto a 4-DoF box (B, 4) -> (B, 4).

    Mirrors get_offset_box_tensor (points_utils.py:418-434).
    """
    rot = rotz(ref_box[:, 3])  # (B,3,3)
    new_center = jnp.einsum("bij,bj->bi", rot, offset_box[:, :3], precision=_HI) + ref_box[:, :3]
    new_angle = ref_box[:, 3] + offset_box[:, 3]
    return jnp.concatenate([new_center, new_angle[:, None]], axis=-1)


def remove_transform_points(points: jnp.ndarray, ref_box: jnp.ndarray) -> jnp.ndarray:
    """Canonicalize points (B, N, 3) into the ref box frame (B, 4).

    Mirrors remove_transform_points_tensor (points_utils.py:437-451).
    """
    rot = rotz(-ref_box[:, 3])
    p = points - ref_box[:, None, :3]
    return jnp.einsum("bnj,bkj->bnk", p, rot, precision=_HI)


def apply_transform_points(points: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Inverse of remove_transform_points: box frame -> world."""
    rot = rotz(box[:, 3])
    p = jnp.einsum("bnj,bkj->bnk", points, rot, precision=_HI)
    return p + box[:, None, :3]


def box_corners(box: jnp.ndarray, wlh: jnp.ndarray, wlh_factor: float = 1.0) -> jnp.ndarray:
    """(B, 4) boxes + (B, 3) sizes -> (B, 8, 3) corners.

    Corner ordering matches the host Box.corners() convention
    (data_classes.py:226-250): first four forward, last four backward.
    """
    w, l, h = wlh[:, 0] * wlh_factor, wlh[:, 1] * wlh_factor, wlh[:, 2] * wlh_factor
    sx = jnp.asarray([1, 1, 1, 1, -1, -1, -1, -1], dtype=box.dtype)
    sy = jnp.asarray([1, -1, -1, 1, 1, -1, -1, 1], dtype=box.dtype)
    sz = jnp.asarray([1, 1, -1, -1, 1, 1, -1, -1], dtype=box.dtype)
    corners = jnp.stack(
        [
            l[:, None] / 2 * sx[None, :],
            w[:, None] / 2 * sy[None, :],
            h[:, None] / 2 * sz[None, :],
        ],
        axis=-1,
    )  # (B, 8, 3) in box frame
    return apply_transform_points(corners, box)


def box_cloud(points: jnp.ndarray, box: jnp.ndarray, wlh: jnp.ndarray) -> jnp.ndarray:
    """BoxCloud (B, N, 9): distance from each point to box center + 8 corners.

    Device-side equivalent of get_point_to_box_distance (points_utils.py:127-143).
    """
    corners = box_corners(box, wlh)  # (B, 8, 3)
    keypoints = jnp.concatenate([box[:, None, :3], corners], axis=1)  # (B, 9, 3)
    diff = points[:, :, None, :] - keypoints[:, None, :, :]  # (B, N, 9, 3)
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)


def points_in_box(points: jnp.ndarray, box: jnp.ndarray, wlh: jnp.ndarray,
                  wlh_factor: float = 1.0) -> jnp.ndarray:
    """Inclusive in-box mask (B, N) for (B, N, 3) points and (B, 4) boxes."""
    local = remove_transform_points(points, box)  # (B, N, 3)
    half = jnp.stack([wlh[:, 1], wlh[:, 0], wlh[:, 2]], axis=-1) * (wlh_factor / 2.0)
    return jnp.all(jnp.abs(local) <= half[:, None, :], axis=-1)
