"""Batched, jittable rigid-transform math (jnp, device side).

4-DoF boxes on device are (cx, cy, cz, theta) float arrays with rotation
matrix `A @ Rz(theta)` where `A` is a constant change-of-basis for the
dataset's up convention:

- z-up (velodyne, up_axis=[0,0,1]): A = I, theta is the usual z-yaw.
- camera mode (up_axis=[0,-1,0], reference cfgs/P2B_Car.yaml:15-16): KITTI
  camera boxes are Quaternion(axis=[0,1,0], ry) * Quaternion(axis=[1,0,0],
  pi/2) (kitti.py:162-164), i.e. Ry(ry) @ Rx(pi/2) = Rx(pi/2) @ Rz(-ry) —
  the same A·Rz(theta) family with A = Rx(pi/2), theta = -ry. Composing a
  local-z offset delta (getOffsetBB semantics, points_utils.py:43-85) is
  theta += delta in BOTH conventions, so the whole scan-tracker recurrence
  is up-axis-generic given A.

These are the TPU-native equivalents of the reference's tensorized helpers
(/root/reference/datasets/points_utils.py:364-451) plus fixed-shape versions
of the host geometry used inside the jitted track-step (BoxCloud, in-box
masks, subwindow canonicalization as masks over padded point sets).
All functions are pure, batched over a leading B axis, and static-shape.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


def up_frame(up_axis) -> Optional[jnp.ndarray]:
    """Constant basis A for a config's up_axis (None = identity = z-up)."""
    up = np.asarray(up_axis, dtype=np.float64)
    up = up / np.linalg.norm(up)
    if np.allclose(up, [0, 0, 1]):
        return None
    if np.allclose(up, [0, -1, 0]):
        # Rx(pi/2): maps box-local +z to world (0,-1,0)
        return jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    raise ValueError(f"unsupported up_axis {up_axis!r}; expected [0,0,1] or [0,-1,0]")


def theta_from_rotation(rotation_matrix: np.ndarray, A=None) -> float:
    """Recover theta with R = A @ Rz(theta) from a host rotation matrix."""
    R = np.asarray(rotation_matrix, dtype=np.float64)
    if A is not None:
        R = np.asarray(A, dtype=np.float64).T @ R
    return float(np.arctan2(R[1, 0], R[0, 0]))


def rotation_from_theta(theta: float, A=None) -> np.ndarray:
    """Host-side inverse of theta_from_rotation: A @ Rz(theta) as numpy."""
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    if A is not None:
        R = np.asarray(A, dtype=np.float64) @ R
    return R


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


def get_offset_points(points: jnp.ndarray, ref_box: jnp.ndarray,
                      offset_box: jnp.ndarray, A=None) -> jnp.ndarray:
    """Move points rigidly by an offset expressed in the ref box frame.

    points (B, N, 3); ref_box, offset_box (B, 4). Mirrors the reference's
    get_offset_points_tensor (points_utils.py:390-415): canonicalize to the
    ref frame, rotate by offset theta, translate by offset center, un-canonicalize.
    """
    local = remove_transform_points(points, ref_box, A=A)
    rot_off = rotz(offset_box[:, 3])
    local = jnp.einsum("bnj,bkj->bnk", local, rot_off, precision=_HI)
    local = local + offset_box[:, None, :3]
    return apply_transform_points(local, ref_box, A=A)


def get_offset_box(ref_box: jnp.ndarray, offset_box: jnp.ndarray, A=None) -> jnp.ndarray:
    """Compose a 4-DoF offset onto a 4-DoF box (B, 4) -> (B, 4).

    Mirrors get_offset_box_tensor (points_utils.py:418-434); theta composition
    is additive in both up conventions (see module docstring).
    """
    rot = rotz(ref_box[:, 3])  # (B,3,3)
    off = jnp.einsum("bij,bj->bi", rot, offset_box[:, :3], precision=_HI)
    if A is not None:
        off = jnp.einsum("ij,bj->bi", A.astype(off.dtype), off, precision=_HI)
    new_center = off + ref_box[:, :3]
    new_angle = ref_box[:, 3] + offset_box[:, 3]
    return jnp.concatenate([new_center, new_angle[:, None]], axis=-1)


def remove_transform_points(points: jnp.ndarray, ref_box: jnp.ndarray, A=None) -> jnp.ndarray:
    """Canonicalize points (B, N, 3) into the ref box frame (B, 4).

    Mirrors remove_transform_points_tensor (points_utils.py:437-451).
    """
    p = points - ref_box[:, None, :3]
    if A is not None:
        # local = Rz(-t) A^T p  (row form: p @ A @ Rz(-t)^T)
        p = jnp.einsum("bnj,jk->bnk", p, A.astype(p.dtype), precision=_HI)
    rot = rotz(-ref_box[:, 3])
    return jnp.einsum("bnj,bkj->bnk", p, rot, precision=_HI)


def apply_transform_points(points: jnp.ndarray, box: jnp.ndarray, A=None) -> jnp.ndarray:
    """Inverse of remove_transform_points: box frame -> world."""
    rot = rotz(box[:, 3])
    p = jnp.einsum("bnj,bkj->bnk", points, rot, precision=_HI)
    if A is not None:
        p = jnp.einsum("bnj,kj->bnk", p, A.astype(p.dtype), precision=_HI)
    return p + box[:, None, :3]


def box_corners(box: jnp.ndarray, wlh: jnp.ndarray, wlh_factor: float = 1.0, A=None) -> jnp.ndarray:
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
    return apply_transform_points(corners, box, A=A)


def box_cloud(points: jnp.ndarray, box: jnp.ndarray, wlh: jnp.ndarray, A=None) -> jnp.ndarray:
    """BoxCloud (B, N, 9): distance from each point to box center + 8 corners.

    Device-side equivalent of get_point_to_box_distance (points_utils.py:127-143).
    """
    corners = box_corners(box, wlh, A=A)  # (B, 8, 3)
    keypoints = jnp.concatenate([box[:, None, :3], corners], axis=1)  # (B, 9, 3)
    diff = points[:, :, None, :] - keypoints[:, None, :, :]  # (B, N, 9, 3)
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)


def points_in_box(points: jnp.ndarray, box: jnp.ndarray, wlh: jnp.ndarray,
                  wlh_factor: float = 1.0, A=None, strict: bool = False) -> jnp.ndarray:
    """In-box mask (B, N) for (B, N, 3) points and (B, 4) boxes.

    Inclusive (<=) by default, matching nuscenes points_in_box (the motion
    sampler's labels); strict (<) matches get_in_box_mask's AABB comparison
    (the siamese sampler's seg labels) — the reference uses BOTH, and the
    difference is an exact-parity surface (CLAUDE.md)."""
    local = remove_transform_points(points, box, A=A)  # (B, N, 3)
    half = jnp.stack([wlh[:, 1], wlh[:, 0], wlh[:, 2]], axis=-1) * (wlh_factor / 2.0)
    a = jnp.abs(local)
    h = half[:, None, :]
    return jnp.all(a < h if strict else a <= h, axis=-1)


def limit_box_offset(offset: jnp.ndarray, wlh: jnp.ndarray, use_z: bool,
                     redraw: jnp.ndarray | None = None) -> jnp.ndarray:
    """Device emulation of getOffsetBB's limit_box branch
    (/root/reference/datasets/points_utils.py:70-76).

    The reference rescues wild predictions: an x/y offset component exceeding
    the box extent (note: POSITIVE overshoot only — the reference compares
    the signed offset, a quirk preserved here) is re-drawn from the host's
    global ``np.random.uniform(-1, 1)``; an overshooting z is set to exactly
    0. On device the x/y replacement is `redraw` (B, 2) — real U(-1, 1)
    draws from a jax PRNG for distribution-faithful lost-track recovery
    (the scan trackers fold a per-step key; see
    scan_matching.make_match_step) — or 0.0 (the uniform's mean) when
    ``redraw is None``, which keeps the trajectory fully deterministic
    (config.limit_box_redraw='zero'). Host-vs-scan drift of both modes is
    measured in benchmarks/drift_benchmark.py.

    offset (B, 4) = (dx, dy, dz, dtheta) box-local; wlh (B, 3).
    """
    zero = jnp.zeros_like(offset[:, 0])
    rx = zero if redraw is None else redraw[:, 0]
    ry = zero if redraw is None else redraw[:, 1]
    dx = jnp.where(offset[:, 0] > wlh[:, 0], rx, offset[:, 0])
    dy = jnp.where(offset[:, 1] > jnp.minimum(wlh[:, 1], 2.0), ry, offset[:, 1])
    dz = offset[:, 2]
    if use_z:
        dz = jnp.where(dz > wlh[:, 2], zero, dz)
    return jnp.stack([dx, dy, dz, offset[:, 3]], axis=-1)


def wrap_angle(t: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles into (-pi, pi].

    The host box_to_params / transform_box path extracts theta from a
    quaternion (points_utils.py:329-338 here; reference sampler.py:148-156),
    which always lands in (-pi, pi]. Device theta math that SUBTRACTS or
    ADDS raw angles (box - ref, flip +pi composition) must wrap the result
    the same way or heading regression targets come out off by 2*pi for
    headings crossing the +/-pi cut (ADVICE r2, high)."""
    return jnp.pi - jnp.mod(jnp.pi - t, 2.0 * jnp.pi)


def transform_box_params(box: jnp.ndarray, ref_box: jnp.ndarray, A=None) -> jnp.ndarray:
    """Express a 4-DoF box in another box's frame (B, 4) -> (B, 4).

    Device equivalent of points_utils.transform_box (host: translate by
    -ref.center, rotate by ref.rotation^-1): local center = Rz(-t_ref) A^T
    (c - c_ref), local theta = theta - theta_ref (z-rotations compose
    additively in both up conventions), wrapped into (-pi, pi] to match the
    host quaternion angle extraction.
    """
    local_c = remove_transform_points(box[:, None, :3], ref_box, A=A)[:, 0]
    local_t = wrap_angle(box[:, 3] - ref_box[:, 3])
    return jnp.concatenate([local_c, local_t[:, None]], axis=-1)
