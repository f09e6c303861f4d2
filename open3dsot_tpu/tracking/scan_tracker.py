"""Fully on-device tracklet tracker (lax.scan over frames).

The reference evaluates tracklets with a per-frame host loop: numpy
crop/canonicalize + a batch-of-1 GPU forward per frame
(/root/reference/models/base_model.py:59-86) — the FPS bottleneck called out
in SURVEY §3.2. This module moves the ENTIRE per-frame pipeline for M2-Track
onto the device: raw frames are padded once to a fixed (T, P, 3) tensor, and
one jitted `lax.scan` performs, per step,

  crop (masked AABB in the ref-box frame)  ->  fixed-size resample
  ->  prior-targetness / timestamp channels (+ BoxCloud)  ->  forward
  ->  4-DoF box composition  (the carry)

so a tracklet costs ONE device dispatch instead of T host round-trips.

Differences vs the host fidelity path (tracking/eval.py): resampling is a
deterministic cyclic fill of the cropped points instead of the reference's
seeded `np.random.choice` (base_model.py:271-277) — same point *set*,
different multiset when up/down-sampling, so metrics can differ at the
decimal level. Use the host path for checkpoint-parity evaluation and this
path for throughput.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from open3dsot_tpu.geometry import rigid
from open3dsot_tpu.geometry.iou import estimateAccuracy, estimateOverlap
from open3dsot_tpu.geometry import points_utils
from open3dsot_tpu.geometry.data_classes import Box
from open3dsot_tpu.geometry.quaternion import Quaternion


def _select_fixed(points: jnp.ndarray, valid: jnp.ndarray, n: int) -> jnp.ndarray:
    """Pick exactly n rows from the valid subset of (P, C) points.

    Valid rows are taken in index order and repeated cyclically when fewer
    than n (the reference zero-pads below 3 points and random-resamples
    otherwise; cyclic fill is the deterministic, shape-static equivalent).
    Returns (n, C); all-invalid input returns zeros.
    """
    P = points.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
    key = jnp.where(valid, iota, iota + P)
    order = -jax.lax.top_k(-key, min(n, P))[0]  # first min(n,P) valid-first indices
    count = jnp.sum(valid.astype(jnp.int32))
    safe_count = jnp.maximum(count, 1)
    pick = jnp.arange(n, dtype=jnp.int32) % jnp.minimum(safe_count, P)
    idx = jnp.take(order, jnp.minimum(pick, order.shape[0] - 1))
    idx = jnp.where(idx < P, idx, 0)
    out = jnp.take(points, idx, axis=0)
    return jnp.where(count > 0, out, jnp.zeros_like(out))


class M2ScanTracker:
    """Batched-per-tracklet on-device tracker for M2-Track."""

    def __init__(self, model, variables, config, max_points: int = 4096,
                 frame_bucket: int = 16):
        self.model = model
        self.variables = variables
        self.config = config
        self.max_points = max_points
        self.frame_bucket = frame_bucket
        self.box_aware = bool(getattr(config, "box_aware", False))
        n = config.point_sample_size
        scale, offset = float(config.bb_scale), float(config.bb_offset)

        def step(variables, wlh, carry, xs):
            ref_box = carry  # (4,) world frame
            prev_pts, prev_valid, this_pts, this_valid, step_idx = xs

            # canonicalize both frames into the ref-box frame (subwindow crop,
            # cf. generate_subwindow, points_utils.py:218-250)
            def crop(pts, pad_valid):
                local = rigid.remove_transform_points(pts[None], ref_box[None])[0]
                half = jnp.stack([wlh[1], wlh[0], wlh[2]]) * (scale / 2.0) + offset
                inside = jnp.all((local < half) & (local > -half), axis=-1)
                return local, inside & pad_valid

            prev_local, prev_ok = crop(prev_pts, prev_valid)
            this_local, this_ok = crop(this_pts, this_valid)
            prev_sel = _select_fixed(prev_local, prev_ok, n)  # (n, 3)
            this_sel = _select_fixed(this_local, this_ok, n)

            canonical = jnp.zeros((1, 4), prev_sel.dtype)
            seg_mask_prev = rigid.points_in_box(
                prev_sel[None], canonical, wlh[None], 1.25
            )[0].astype(prev_sel.dtype)
            # soft prior-targetness after the first tracked frame
            # (base_model.py:282-284)
            soft = jnp.where(seg_mask_prev > 0.5, 0.8, 0.2)
            seg_mask_prev = jnp.where(step_idx == 0, seg_mask_prev, soft)
            seg_mask_this = jnp.full((n,), 0.5, prev_sel.dtype)

            ts_prev = jnp.zeros((n, 1), prev_sel.dtype)
            ts_this = jnp.full((n, 1), 0.1, prev_sel.dtype)
            prev_stack = jnp.concatenate([prev_sel, ts_prev, seg_mask_prev[:, None]], axis=-1)
            this_stack = jnp.concatenate([this_sel, ts_this, seg_mask_this[:, None]], axis=-1)
            points = jnp.concatenate([prev_stack, this_stack], axis=0)[None]  # (1, 2n, 5)

            batch = {"points": points}
            if self.box_aware:
                bc_prev = rigid.box_cloud(prev_sel[None], canonical, wlh[None])[0]
                bc = jnp.concatenate([bc_prev, jnp.zeros_like(bc_prev)], axis=0)
                batch["candidate_bc"] = bc[None]

            output = model.apply(variables, batch, train=False)
            pred = output["estimation_boxes"]  # (1, 4) offset in ref frame
            new_ref = rigid.get_offset_box(ref_box[None], pred)[0]
            return new_ref, new_ref

        def track_fn(variables, pts, valid, wlh, init_box):
            """pts (T, P, 3), valid (T, P), wlh (3,), init_box (4,) ->
            predicted world boxes (T-1, 4)."""
            xs = (
                pts[:-1],
                valid[:-1],
                pts[1:],
                valid[1:],
                jnp.arange(pts.shape[0] - 1),
            )
            _, boxes = jax.lax.scan(partial(step, variables, wlh), init_box, xs)
            return boxes

        self._track = jax.jit(track_fn)

    # --- host-side driver -------------------------------------------------
    def _pad_sequence(self, sequence):
        T = len(sequence)
        P = self.max_points
        bucket = self.frame_bucket
        T_pad = max(2, -(-T // bucket) * bucket)
        pts = np.zeros((T_pad, P, 3), np.float32)
        valid = np.zeros((T_pad, P), bool)
        ref_box0 = sequence[0]["3d_bbox"]
        for t, frame in enumerate(sequence):
            # pre-crop to a generous window around the first box to bound P
            p = frame["pc"].points.T.astype(np.float32)  # (M, 3)
            if len(p) > P:
                center = ref_box0.center[None, :]
                d = np.max(np.abs(p - center), axis=1)
                p = p[np.argsort(d, kind="stable")[:P]]
            pts[t, : len(p)] = p
            valid[t, : len(p)] = True
        return pts, valid, T_pad

    def evaluate_one_sequence(self, sequence, config):
        T = len(sequence)
        first_box = sequence[0]["3d_bbox"]
        theta0 = first_box.orientation.radians * first_box.orientation.axis[-1]
        init_params = np.append(first_box.center, theta0).astype(np.float32)
        wlh = first_box.wlh.astype(np.float32)

        pts, valid, _ = self._pad_sequence(sequence)
        boxes = np.asarray(
            self._track(
                self.variables,
                jnp.asarray(pts),
                jnp.asarray(valid),
                jnp.asarray(wlh),
                jnp.asarray(init_params),
            )
        )[: T - 1]

        results_bbs = [first_box]
        for t in range(T - 1):
            cx, cy, cz, th = (float(v) for v in boxes[t])
            results_bbs.append(
                Box([cx, cy, cz], wlh.tolist(), Quaternion(axis=[0, 0, 1], radians=th))
            )
        ious, distances = [], []
        for t in range(T):
            gt = sequence[t]["3d_bbox"]
            ious.append(
                estimateOverlap(gt, results_bbs[t], dim=config.IoU_space, up_axis=config.up_axis)
            )
            distances.append(
                estimateAccuracy(gt, results_bbs[t], dim=config.IoU_space, up_axis=config.up_axis)
            )
        return ious, distances, results_bbs


def evaluate_dataset_scan(model, variables, test_sampler, config,
                          max_points: int = 4096,
                          max_tracklets: Optional[int] = None):
    """Scan-tracker dataset evaluation; returns (success, precision)."""
    from open3dsot_tpu.utils.metrics import Precision, Success

    tracker = M2ScanTracker(model, variables, config, max_points=max_points)
    success, precision = Success(), Precision()
    n = len(test_sampler)
    if max_tracklets is not None:
        n = min(n, max_tracklets)
    for i in range(n):
        seq = test_sampler[i]
        ious, distances, _ = tracker.evaluate_one_sequence(seq, config)
        success.update(ious)
        precision.update(distances)
    return success.compute(), precision.compute()
