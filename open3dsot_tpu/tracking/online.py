"""Online (streaming) tracking API — the serving-side counterpart of the
offline scan trackers.

The reference can only evaluate a tracklet it already has in full
(/root/reference/models/base_model.py:59-86 iterates a stored sequence); a
deployed tracker instead receives frames one at a time, for many objects at
once. This module provides that surface, TPU-style:

- a fixed pool of `max_streams` slots so the per-frame step compiles ONCE to
  a static (B, P, 3) shape and every dispatch advances ALL active streams;
- device-resident recurrent state (carried box, previous frame, per-slot
  frame counter, template buffers) — each `step()` ships only the NEW frame
  per slot (P*3 floats) host->device and returns 4 floats per slot;
- the per-frame step function is THE SAME ONE the offline scan trackers run
  inside `lax.scan` (scan_tracker.make_m2_step / scan_matching.
  make_match_step), so online trajectories equal the offline scan
  trajectories to compile-level float reassociation (~1e-6 per step; the
  M2 path measures bit-exact on CPU) — tests/test_online.py;
- slot resets (new tracklet enters) are a second jitted function taking the
  slot index as a traced scalar — one compile serves any slot;
- pass `mesh=` to shard the slot axis over a device mesh (GSPMD; the fused
  SA kernels carry custom partitioning rules, ops/partition.py) — serving
  capacity scales with chips while the API stays identical.

Matching models online are restricted to reference_BB='previous_result'
(the gt modes need per-frame ground truth, which does not exist at serving
time); all four shape_aggregation template modes run on device ('all'
keeps its per-slot template key reservoir as device state).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from open3dsot_tpu.geometry import points_utils, rigid
from open3dsot_tpu.tracking.scan_tracker import pad_frame as _pad_one


class _OnlineBase:
    """Slot pool + device-state plumbing shared by both model families."""

    def __init__(self, model, variables, config, max_streams: int,
                 max_points: int, mesh=None, transfer_dtype=None):
        self.model = model
        self.variables = variables
        self.config = config
        self.max_streams = int(max_streams)
        self.max_points = int(max_points)
        # 'int16' ships each step's frame points fixed-point (halved H2D
        # bytes, dequantized in-jit) — same scheme as the offline scan
        # trackers (config.transfer_quant, utils/quant.py)
        if transfer_dtype is None:
            transfer_dtype = getattr(config, "transfer_quant", None)
        self.transfer_dtype = transfer_dtype
        A = rigid.up_frame(config.up_axis)
        self._A = A
        self._A_np = None if A is None else np.asarray(A)
        self._active = np.zeros((self.max_streams,), bool)
        self._state = None  # device pytree, built by subclass
        # multi-chip serving: shard the SLOT axis over the mesh's data axis
        # (GSPMD — the fused SA custom calls have partitioning rules,
        # ops/partition.py, so one jit serves any device count, like the
        # reference's DDP property /root/reference/main.py:82)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            if self.max_streams % mesh.devices.size:
                raise ValueError(
                    f"max_streams={self.max_streams} must be divisible by "
                    f"the mesh size {mesh.devices.size}"
                )
            self._slot_sharding = NamedSharding(mesh, PartitionSpec("data"))
        else:
            self._slot_sharding = None

    def _place(self, tree):
        """Commit slot-major arrays to the mesh (no-op without a mesh)."""
        if self._slot_sharding is None:
            return jax.tree_util.tree_map(jnp.asarray, tree)
        return jax.device_put(tree, self._slot_sharding)

    def _make_advance_q(self, advance):
        """int16-transfer entry: per-sample dequantize (utils/quant.py) on
        device, then advance."""
        from open3dsot_tpu.utils.quant import dequantize

        @jax.jit
        def advance_q(variables, state, scale, off, q, valid):
            return advance(variables, state, dequantize(q, scale, off), valid)

        return advance_q

    # -- slot bookkeeping ---------------------------------------------------
    def _check_slot(self, slot):
        # negative slots would silently alias another stream via numpy
        # negative indexing; out-of-range would raise a raw IndexError
        if not (isinstance(slot, (int, np.integer))
                and 0 <= slot < self.max_streams):
            raise ValueError(
                f"slot must be an int in [0, {self.max_streams}) — got {slot!r}"
            )

    def free_slots(self):
        return [i for i in range(self.max_streams) if not self._active[i]]

    def stop(self, slot: int):
        """Release a slot (its state is left in place but ignored)."""
        self._active[slot] = False

    def _init_params(self, box):
        theta0 = rigid.theta_from_rotation(box.rotation_matrix, self._A_np)
        return np.append(box.center, theta0).astype(np.float32)

    # -- serving API ----------------------------------------------------------
    def step(self, frames: Dict[int, np.ndarray]) -> Dict[int, np.ndarray]:
        """Advance every active stream by one frame.

        frames maps slot -> (N_i, 3) world-frame points of that stream's new
        frame; every active slot must be fed (a missed sensor frame should be
        sent as an empty array — the trackers already handle zero-point
        frames like the datasets' missing-frame fallback). Returns
        slot -> predicted world-frame (cx, cy, cz, theta) for the new frame.
        """
        missing = [s for s in range(self.max_streams)
                   if self._active[s] and s not in frames]
        if missing:
            raise ValueError(f"active slots {missing} got no frame")
        P = self.max_points
        pts = np.zeros((self.max_streams, P, 3), np.float32)
        valid = np.zeros((self.max_streams, P), bool)
        for slot, p in frames.items():
            self._check_slot(slot)
            if not self._active[slot]:
                raise ValueError(f"slot {slot} is not active; call reset()")
            pts[slot], valid[slot] = _pad_one(p, P)
        if self.transfer_dtype is None:
            self._state, boxes = self._advance(
                self.variables, self._state,
                self._place(pts), self._place(valid)
            )
        else:
            from open3dsot_tpu.utils.quant import quantize_per_sample

            q, scale, off = quantize_per_sample(pts, valid)
            # scale/off are slot-leading like q — commit them to the mesh's
            # slot sharding too (a replicated default would make GSPMD insert
            # a reshard before the per-slot dequant broadcast)
            self._state, boxes = self._advance_q(
                self.variables, self._state, self._place(scale),
                self._place(off), self._place(q), self._place(valid)
            )
        boxes = np.asarray(boxes)
        return {slot: boxes[slot] for slot in frames}

    def current_box(self, slot: int) -> np.ndarray:
        """Last predicted (or initial) world-frame params of a slot."""
        return np.asarray(self._state["ref"][slot])


class OnlineM2Tracker(_OnlineBase):
    """Streaming M2-Track: `reset(slot, first_points, first_box)` then one
    `step({slot: new_points})` per incoming frame."""

    def __init__(self, model, variables, config, max_streams: int = 8,
                 max_points: int = 1024, mesh=None, transfer_dtype=None):
        super().__init__(model, variables, config, max_streams, max_points,
                         mesh=mesh, transfer_dtype=transfer_dtype)
        from open3dsot_tpu.tracking.scan_tracker import make_m2_step

        step = make_m2_step(model, config, self._A,
                            bool(getattr(config, "box_aware", False)))
        B, P = self.max_streams, self.max_points
        self._state = self._place({
            "ref": np.zeros((B, 4), np.float32),
            "prev_pts": np.zeros((B, P, 3), np.float32),
            "prev_valid": np.zeros((B, P), bool),
            "idx": np.zeros((B,), np.int32),
            "wlh": np.ones((B, 3), np.float32),
        })

        @jax.jit
        def advance(variables, state, new_pts, new_valid):
            xs = (state["prev_pts"], state["prev_valid"], new_pts, new_valid,
                  state["idx"][:, None])  # per-slot counter, (B,1) broadcast
            new_ref, _ = step(variables, state["wlh"], state["ref"], xs)
            new_state = dict(
                ref=new_ref, prev_pts=new_pts, prev_valid=new_valid,
                idx=state["idx"] + 1, wlh=state["wlh"],
            )
            return new_state, new_ref

        @jax.jit
        def reset_slot(state, slot, pts, valid, wlh, init):
            return dict(
                ref=state["ref"].at[slot].set(init),
                prev_pts=state["prev_pts"].at[slot].set(pts),
                prev_valid=state["prev_valid"].at[slot].set(valid),
                idx=state["idx"].at[slot].set(0),
                wlh=state["wlh"].at[slot].set(wlh),
            )

        self._advance = advance
        self._advance_q = self._make_advance_q(advance)
        self._reset_slot = reset_slot

    def reset(self, slot: int, points: np.ndarray, box):
        """Start tracking in `slot`: `points` is the first frame's (N, 3)
        cloud, `box` the first-frame geometry.Box (as in the reference eval
        loop, results_bbs[0] is the given first box)."""
        self._check_slot(slot)
        pts, valid = _pad_one(points, self.max_points)
        self._state = self._reset_slot(
            self._state, slot, jnp.asarray(pts), jnp.asarray(valid),
            jnp.asarray(box.wlh, jnp.float32),
            jnp.asarray(self._init_params(box)),
        )
        self._active[slot] = True


class OnlineMatchTracker(_OnlineBase):
    """Streaming P2B/BAT. The first-frame template crop is computed once at
    `reset` (host, like the offline tracker) and carried on device."""

    def __init__(self, model, variables, config, max_streams: int = 8,
                 max_points: int = 1024, first_crop_points: int = 1024,
                 mesh=None, transfer_dtype=None, template_pool: int = 4096):
        super().__init__(model, variables, config, max_streams, max_points,
                         mesh=mesh, transfer_dtype=transfer_dtype)
        from open3dsot_tpu.tracking.scan_matching import (
            make_match_step,
            parse_agg_mode,
        )

        if "PREVIOUS_RESULT" not in config.reference_BB.upper():
            raise ValueError(
                f"online tracking requires reference_BB='previous_result' "
                f"(got {config.reference_BB!r}): the gt modes need per-frame "
                f"ground truth, which does not exist at serving time"
            )
        agg_mode = parse_agg_mode(config.shape_aggregation)
        is_bat = hasattr(model.net, "bc_channel") or model.name == "bat"
        step = make_match_step(model, config, self._A, is_bat, agg_mode,
                               gt_mode=False)
        self.first_crop_points = int(first_crop_points)
        B, P, P1 = self.max_streams, self.max_points, self.first_crop_points
        pooled = agg_mode == "all"
        # limit_box 'uniform' re-draws key off a per-slot step count, so the
        # carry (and the slot state) gains 'age' even without the reservoir
        aged = pooled or (
            bool(getattr(config, "limit_box", False))
            and str(getattr(config, "limit_box_redraw",
                            "uniform")) == "uniform")
        state = {
            "ref": np.zeros((B, 4), np.float32),
            "prev_pts": np.zeros((B, P, 3), np.float32),
            "prev_valid": np.zeros((B, P), bool),
            "first_pts": np.zeros((B, P1, 3), np.float32),
            "first_valid": np.zeros((B, P1), bool),
            "wlh": np.ones((B, 3), np.float32),
        }
        if pooled:
            # 'all' carries the per-slot template key reservoir (see
            # scan_matching.make_match_step) as device-resident state;
            # key -inf marks an empty slot, 'age' is the per-slot step
            # count the priority keys derive from (so a slot's pool
            # depends only on its own history: online == offline)
            C = int(getattr(config, "template_pool", template_pool))
            state["pool_pts"] = np.zeros((B, C, 3), np.float32)
            state["pool_key"] = np.full((B, C), -np.inf, np.float32)
        if aged:
            state["age"] = np.zeros((B,), np.int32)
        self._state = self._place(state)

        @jax.jit
        def advance(variables, state, new_pts, new_valid):
            xs = (state["prev_pts"], state["prev_valid"], new_pts, new_valid)
            carry = (state["ref"], state["wlh"])
            if pooled:
                carry = carry + (state["pool_pts"], state["pool_key"],
                                 state["age"])
            elif aged:
                carry = carry + (state["age"],)
            new_carry, _ = step(
                variables, state["wlh"], state["first_pts"],
                state["first_valid"], carry, xs
            )
            new_ref, new_wlh = new_carry[:2]
            new_state = dict(state, ref=new_ref, wlh=new_wlh,
                             prev_pts=new_pts, prev_valid=new_valid)
            if pooled:
                new_state.update(pool_pts=new_carry[2], pool_key=new_carry[3],
                                 age=new_carry[4])
            elif aged:
                new_state.update(age=new_carry[2])
            return new_state, new_ref

        @jax.jit
        def reset_slot(state, slot, pts, valid, fpts, fvalid, wlh, init):
            new = dict(
                state,
                ref=state["ref"].at[slot].set(init),
                prev_pts=state["prev_pts"].at[slot].set(pts),
                prev_valid=state["prev_valid"].at[slot].set(valid),
                first_pts=state["first_pts"].at[slot].set(fpts),
                first_valid=state["first_valid"].at[slot].set(fvalid),
                wlh=state["wlh"].at[slot].set(wlh),
            )
            if pooled:
                # a fresh stream starts with an EMPTY reservoir (keys -inf)
                new.update(
                    pool_key=state["pool_key"].at[slot].set(-jnp.inf),
                )
            if aged:
                new.update(age=state["age"].at[slot].set(0))
            return new

        self._advance = advance
        self._advance_q = self._make_advance_q(advance)
        self._reset_slot = reset_slot

    def reset(self, slot: int, pc, box):
        """Start tracking in `slot`: `pc` is the first frame's PointCloud (or
        (N, 3) array), `box` the first-frame geometry.Box. Computes the
        constant first-frame template crop exactly like the offline tracker
        (MatchScanTracker._prepare)."""
        self._check_slot(slot)
        from open3dsot_tpu.geometry.data_classes import PointCloud

        cfg = self.config
        if not isinstance(pc, PointCloud):
            pc = PointCloud(np.asarray(pc, np.float32).reshape(-1, 3).T)
        crop, _ = points_utils.cropAndCenterPC(
            pc, box, scale=cfg.model_bb_scale, offset=cfg.model_bb_offset,
        )
        P1 = self.first_crop_points
        fp = crop.points.T.astype(np.float32)[:P1]
        fpts = np.zeros((P1, 3), np.float32)
        fvalid = np.zeros((P1,), bool)
        fpts[: len(fp)] = fp
        fvalid[: len(fp)] = True
        pts, valid = _pad_one(pc.points.T, self.max_points)
        self._state = self._reset_slot(
            self._state, slot, jnp.asarray(pts), jnp.asarray(valid),
            jnp.asarray(fpts), jnp.asarray(fvalid),
            jnp.asarray(box.wlh, jnp.float32),
            jnp.asarray(self._init_params(box)),
        )
        self._active[slot] = True


def make_online_tracker(model, variables, config, **kw):
    """Factory: the right online tracker for the config's model family."""
    if getattr(model, "name", "") == "m2track" or not hasattr(
        config, "search_size"
    ):
        return OnlineM2Tracker(model, variables, config, **kw)
    return OnlineMatchTracker(model, variables, config, **kw)
