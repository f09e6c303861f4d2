"""On-device batched tracklet tracker for the matching models (P2B / BAT).

Mirrors the eval semantics of MatchingBaseModel
(/root/reference/models/base_model.py:166-247) but runs the whole tracklet
on device in one `lax.scan`. Supported modes:

- shape_aggregation 'firstandprevious' (shipped configs), 'first',
  'previous', and 'all' run on device. 'all' (the reference's unboundedly
  growing template merge, base_model.py:190-194) carries a fixed-capacity
  key RESERVOIR of every previous frame's crop through the scan: under
  capacity the pool is the exact merged cloud; on overflow an
  exactly-uniform subsample of all points seen — the distribution the
  reference resamples its unbounded merge from (the host tracker remains
  the exact-semantics path). Note the reference's 'previous' branch
  is dead code (the `hape_aggregation` typo at base_model.py:186 raises
  AttributeError); we implement the evident intent, matching our host path.
- reference_BB 'previous_result' (shipped configs), 'previous_gt', and
  'current_gt' all run on device: the gt modes ship the per-frame gt box
  params/wlh as (tiny) extra scan inputs, crop the search region around the
  gt box, and compose the predicted offset onto it (base_model.py:198-221 +
  evaluate_one_sample:54) — while the carried prediction chain still feeds
  template generation, as in the reference loop.

Scan recurrence:

- the first-frame template crop is CONSTANT per tracklet (results_bbs[0] is
  the gt box), so it is cropped once on the host and carried as a fixed
  padded buffer;
- per step, the previous frame is cropped+canonicalized around the carried
  predicted box (cropAndCenterPC semantics: canonical AABB with
  model_bb_scale/offset), merged with the first-frame crop, and resampled to
  template_size; the search region crops the current frame with
  search_bb_scale/offset to search_size;
- BAT additionally computes the template BoxCloud against the canonical
  model box on device (bat.py:41-55);
- the argmax-objectness proposal composes onto the carried box (degrees /
  use_z handled; limit_box configs use the deterministic re-draw emulation
  rigid.limit_box_offset — the reference draws uniform(-1,1) from the host
  global RNG, points_utils.py:70-76 — drift measured in
  benchmarks/drift_benchmark.py);
- camera-mode (y-up) configs are supported via the A-basis box
  parameterization (geometry/rigid.py): boxes are (c, theta) with rotation
  A @ Rz(theta), so the same scan recurrence serves P2B_Car's camera
  coordinates (cfgs/P2B_Car.yaml:15-16).

Resampling uses the deterministic cyclic fill (see scan_tracker.py notes);
use tracking/eval.py for seeded-RNG fidelity.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from open3dsot_tpu.geometry import points_utils, rigid
from open3dsot_tpu.geometry.data_classes import Box
from open3dsot_tpu.geometry.iou import estimateAccuracy, estimateOverlap
from open3dsot_tpu.geometry.quaternion import Quaternion
from open3dsot_tpu.tracking.scan_tracker import (
    _counts,
    _expand_counts,
    _pack_transfer,
    _select_fixed,
    _TransferDispatchMixin,
    pad_frame,
)


def parse_agg_mode(shape_aggregation: str) -> str:
    """Parse shape_aggregation with the reference's substring precedence
    (base_model.py:177-194): firstandprevious > first > previous > all.
    'all' merges every previous frame's template crop; on device it runs
    over a fixed-capacity key reservoir carried through the scan (see
    make_match_step) — under capacity the pool is the exact merged cloud,
    on overflow an exactly-uniform subsample of it (the distribution the
    reference's unbounded host merge is resampled from)."""
    agg = shape_aggregation.upper()
    if "FIRSTANDPREVIOUS" in agg:
        return "firstandprevious"
    if "FIRST" in agg:
        return "first"
    if "PREVIOUS" in agg:
        return "previous"
    if "ALL" in agg:
        return "all"
    raise ValueError(
        f"unknown shape_aggregation {shape_aggregation!r} (expected "
        f"firstandprevious/first/previous/all)"
    )


def make_match_step(model, config, A, is_bat, agg_mode, gt_mode):
    """Build the single-frame P2B/BAT step used by BOTH the offline scan
    tracker (inside `lax.scan`) and the online serving tracker
    (tracking/online.py) — sharing one function makes their trajectories
    exactly equal by construction.

    Returns step(variables, wlh, first_pts, first_valid, carry, xs) with
    carry = (ref_box (B, 4), ref_wlh (B, 3)) — plus, when agg_mode='all',
    (pool_pts (B, C, 3), pool_key (B, C) f32, age (B,) int32): the key
    reservoir of all previous template crops (priority keys descending,
    -inf = empty slot) and each row's step count. When limit_box is active
    with limit_box_redraw='uniform' (and agg_mode != 'all'), the carry is
    (ref_box, ref_wlh, age (B,) int32) — the step count keys the U(-1,1)
    outlier re-draws.
    ref_box/ref_wlh are the results_bbs chain's box
    AND its dimensions, because getOffsetBB copies the anchor's wlh onto
    each prediction (points_utils.py:43-85): under previous_result the
    chain keeps the first box's wlh, under the gt modes each prediction
    takes its per-frame gt anchor's — and xs = (prev_pts, prev_valid,
    this_pts, this_valid[, gt_params_t, gt_wlh_t]); mirrors
    MatchingBaseModel.build_input_dict + evaluate_one_sample
    (/root/reference/models/base_model.py:166-247, 44-57). `wlh` (the
    first box's) is accepted for signature stability but the template
    crop/BoxCloud use the CARRIED wlh, as the reference does.
    """
    m_scale = float(config.model_bb_scale)
    m_offset = float(config.model_bb_offset)
    s_scale = float(config.search_bb_scale)
    s_offset = float(config.search_bb_offset)
    t_size = int(config.template_size)
    s_size = int(config.search_size)
    resample = getattr(config, "scan_resample", "strided")
    # 'all'-mode reservoir priorities: a fixed base key (echoing the
    # reference's seeded eval resampling, base_model.py:228-231 seed=1)
    # folded with each slot's step count — deterministic across runs
    pool_base_key = jax.random.PRNGKey(1) if agg_mode == "all" else None
    degrees = bool(config.degrees)
    use_z = bool(config.use_z)
    limit_box = bool(getattr(config, "limit_box", False))
    # limit_box outlier re-draws: 'uniform' = real U(-1,1) from a jax key
    # folded with the per-row step count (distribution-faithful to the
    # reference's host np.random.uniform; same draw for equal-age rows, so
    # online == offline holds under staggered stream starts exactly like
    # the 'all' reservoir keys); 'zero' = deterministic mean substitution
    lb_uniform = limit_box and str(
        getattr(config, "limit_box_redraw", "uniform")) == "uniform"
    lb_base_key = jax.random.PRNGKey(2) if lb_uniform else None
    need_age = (agg_mode == "all") or lb_uniform

    def crop_local(pts, pad_valid, ref_box, half):
        local = rigid.remove_transform_points(pts, ref_box, A=A)
        inside = jnp.all(
            (local < half[:, None, :]) & (local > -half[:, None, :]), axis=-1
        )
        return local, inside & pad_valid

    def step(variables, wlh, first_pts, first_valid, carry, xs):
        # results_bbs[t-1]: the prediction chain's box and its wlh (equal to
        # the first box's under previous_result; the previous gt anchor's
        # under the gt modes). Under agg_mode='all' the carry additionally
        # holds the template point RESERVOIR: a fixed-capacity uniform
        # sample of every previous frame's template crop (canonical), kept
        # as (points, priority keys, per-row step count).
        if agg_mode == "all":
            ref_box, carry_wlh, pool_pts, pool_key, age = carry
        elif need_age:
            ref_box, carry_wlh, age = carry
        else:
            ref_box, carry_wlh = carry
        entry_age = age if need_age else None  # pre-increment: the draw key
        prev_pts, prev_valid, this_pts, this_valid = xs[:4]
        B = ref_box.shape[0]
        half_wlh = jnp.stack(
            [carry_wlh[:, 1], carry_wlh[:, 0], carry_wlh[:, 2]], axis=-1
        ) / 2.0

        # template crops use the carried prediction (results_bbs chain)
        # in every reference_BB mode (base_model.py:166-194)
        m_half = half_wlh * m_scale + m_offset
        if agg_mode == "first":
            # constant first-frame crop; XLA hoists it out of the scan
            template = _select_fixed(first_pts, first_valid, t_size,
                                     mode=resample)
        else:
            prev_local, prev_ok = crop_local(prev_pts, prev_valid,
                                             ref_box, m_half)
            if agg_mode == "previous":
                template = _select_fixed(prev_local, prev_ok, t_size,
                                         mode=resample)
            elif agg_mode == "all":
                # reference 'all' (base_model.py:190-194): the template for
                # frame t merges the crops of frames 0..t-1, each canonical
                # to its own result box — an unboundedly growing cloud the
                # reference resamples to template_size uniformly each frame.
                # Static shapes forbid the unbounded merge, so the carry
                # holds a KEY RESERVOIR (bottom-k sketch): every crop point
                # draws an iid uniform priority key and the pool keeps the
                # top-C keys. While the stream fits (N <= C) the pool IS the
                # exact merged cloud; on overflow it is an exactly-uniform
                # C-subset of all N points seen — the same marginal the
                # reference's uniform resample draws from (a drop-oldest
                # ring would bias toward recent frames). Keys derive from
                # fold_in(key, per-row age), so a slot's pool depends only
                # on its own step count: online == offline stays exact even
                # with staggered stream starts.
                P = prev_pts.shape[1]
                C = pool_pts.shape[1]
                u = jax.vmap(
                    lambda a: jax.random.uniform(
                        jax.random.fold_in(pool_base_key, a), (P,))
                )(age)
                allk = jnp.concatenate(
                    [pool_key, jnp.where(prev_ok, u, -jnp.inf)], axis=1)
                allp = jnp.concatenate([pool_pts, prev_local], axis=1)
                pool_key, topi = jax.lax.top_k(allk, C)
                pool_pts = jnp.take_along_axis(allp, topi[:, :, None], axis=1)
                age = age + 1
                # descending keys put valid points first: a prefix mask
                template = _select_fixed(pool_pts, pool_key > -jnp.inf,
                                         t_size, mode=resample)
            else:  # firstandprevious: first crop (constant) U prev crop
                merged_pts = jnp.concatenate([first_pts, prev_local], axis=1)
                merged_ok = jnp.concatenate([first_valid, prev_ok], axis=1)
                template = _select_fixed(merged_pts, merged_ok, t_size,
                                         mode=resample)  # (B, t, 3)

        # search region: around the carried box, or around the per-frame
        # gt box in the gt reference_BB modes (base_model.py:208-216)
        if gt_mode:
            search_ref, ref_wlh = xs[4], xs[5]
            s_half_wlh = jnp.stack(
                [ref_wlh[:, 1], ref_wlh[:, 0], ref_wlh[:, 2]], axis=-1
            ) / 2.0
        else:
            search_ref, s_half_wlh = ref_box, half_wlh
        s_half = s_half_wlh * s_scale + s_offset
        this_local, this_ok = crop_local(this_pts, this_valid,
                                         search_ref, s_half)
        search = _select_fixed(this_local, this_ok, s_size, mode=resample)  # (B, s, 3)

        batch = {"template_points": template, "search_points": search}
        if is_bat:
            # template BoxCloud against the canonical template box, whose
            # dims are the carried prediction's (bat.py:41-55)
            canonical = jnp.zeros((B, 4), template.dtype)
            batch["points2cc_dist_t"] = rigid.box_cloud(template, canonical,
                                                        carry_wlh)

        output = model.apply(variables, batch, train=False)
        boxes = output["estimation_boxes"]  # (B, K, 5)
        best = jnp.argmax(boxes[:, :, 4], axis=1)  # (B,)
        est = jnp.take_along_axis(boxes, best[:, None, None], axis=1)[:, 0, :4]
        theta = jnp.deg2rad(est[:, 3]) if degrees else est[:, 3]
        dz = est[:, 2] if use_z else jnp.zeros_like(est[:, 2])
        offset = jnp.stack([est[:, 0], est[:, 1], dz, theta], axis=-1)
        if limit_box:
            # outlier-prediction rescue (rigid.limit_box_offset; reference
            # points_utils.py:70-76): x/y re-draws come from a real U(-1,1)
            # keyed on the per-row step count ('uniform', default), or the
            # deterministic 0 substitution ('zero')
            redraw = None
            if lb_uniform:
                redraw = jax.vmap(
                    lambda a: jax.random.uniform(
                        jax.random.fold_in(lb_base_key, a), (2,),
                        minval=-1.0, maxval=1.0)
                )(entry_age)
            offset = rigid.limit_box_offset(
                offset, ref_wlh if gt_mode else carry_wlh, use_z,
                redraw=redraw,
            )
        # the offset composes onto the search reference box — the carried
        # prediction OR the gt box in gt modes (evaluate_one_sample:54) —
        # and the new prediction inherits that anchor's wlh
        new_ref = rigid.get_offset_box(search_ref, offset, A=A)
        new_wlh = ref_wlh if gt_mode else carry_wlh
        if agg_mode == "all":
            return (new_ref, new_wlh, pool_pts, pool_key, age), new_ref
        if need_age:
            return (new_ref, new_wlh, entry_age + 1), new_ref
        return (new_ref, new_wlh), new_ref

    return step


class MatchScanTracker(_TransferDispatchMixin):
    """Batched on-device tracker for P2B/BAT (template modes
    firstandprevious/first/previous/all; reference_BB modes previous_result/
    previous_gt/current_gt). 'all' carries a fixed-capacity key reservoir
    of every previous frame's template crop through the scan
    (`template_pool` points per tracklet; under capacity it holds the
    exact merged cloud, on overflow an exactly-uniform subsample of the
    reference's unbounded host merge, base_model.py:190-194; the host
    tracker remains the exact-semantics path)."""

    def __init__(self, model, variables, config, max_points: int = 4096,
                 first_crop_points: int = 1024, frame_bucket: int = 16,
                 mesh=None, transfer_dtype=None, template_pool: int = 4096):
        # 'int16' ships fixed-point frame points (halved H2D bytes,
        # dequantized in-jit, utils/quant.py); None = exact f32
        if transfer_dtype is None:
            transfer_dtype = getattr(config, "transfer_quant", None)
        self.transfer_dtype = transfer_dtype
        # mode parsing mirrors the reference's substring precedence
        # (base_model.py:177-194, 208-216 / models/matching_base.py)
        agg_mode = parse_agg_mode(config.shape_aggregation)
        ref_mode_s = config.reference_BB.upper()
        if "PREVIOUS_RESULT" in ref_mode_s:
            ref_mode = "previous_result"
        elif "PREVIOUS_GT" in ref_mode_s:
            ref_mode = "previous_gt"
        elif "CURRENT_GT" in ref_mode_s:
            ref_mode = "current_gt"
        else:
            raise ValueError(
                f"unknown reference_BB {config.reference_BB!r}"
            )
        self._agg_mode = agg_mode
        self._ref_mode = ref_mode
        self._gt_mode = ref_mode != "previous_result"
        lb_uniform = bool(getattr(config, "limit_box", False)) and str(
            getattr(config, "limit_box_redraw", "uniform")) == "uniform"
        if bool(getattr(config, "limit_box", False)):
            # the scan path replaces the reference's host-RNG uniform(-1,1)
            # re-draw with a jax-PRNG U(-1,1) ('uniform', distribution-
            # faithful) or a deterministic 0 ('zero') — not bit-equal to the
            # host stream; drift measured in benchmarks/drift_benchmark.py
            mode = "uniform" if lb_uniform else "zero"
            print(
                f"[scan_matching] limit_box active: scan-path offset "
                f"re-draws use the '{mode}' device emulation (distribution-"
                "level vs reference; use tracking/eval.py for exact "
                "host-RNG semantics)"
            )
        # up-axis basis: None (z-up) or Rx(pi/2) for camera mode
        # (P2B_Car.yaml:15-16); raises on unsupported axes
        A = rigid.up_frame(config.up_axis)
        self._A = A
        self._A_np = None if A is None else np.asarray(A)
        self.model = model
        self.variables = variables
        self.config = config
        self.max_points = max_points
        self.first_crop_points = first_crop_points
        self.frame_bucket = frame_bucket
        template_pool = int(getattr(config, "template_pool", template_pool))
        self.template_pool = template_pool
        self._scorer = None  # built lazily by dispatch_scored
        self.is_bat = hasattr(model.net, "bc_channel") or model.name == "bat"

        gt_mode = self._gt_mode
        step = make_match_step(model, config, A, self.is_bat,
                               self._agg_mode, gt_mode)

        def track_fn(variables, pts, counts, wlh, init_box, first_pts,
                     first_count, *gt_args):
            # masks travel as prefix counts (scan_tracker._counts) and are
            # re-expanded on device
            valid = _expand_counts(counts, pts.shape[2])
            first_valid = _expand_counts(first_count, first_pts.shape[1])
            xs = (
                jnp.swapaxes(pts[:, :-1], 0, 1),
                jnp.swapaxes(valid[:, :-1], 0, 1),
                jnp.swapaxes(pts[:, 1:], 0, 1),
                jnp.swapaxes(valid[:, 1:], 0, 1),
            )
            if gt_mode:
                gt_params, gt_wlh = gt_args
                sl = slice(None, -1) if ref_mode == "previous_gt" else slice(1, None)
                xs = xs + (
                    jnp.swapaxes(gt_params[:, sl], 0, 1),
                    jnp.swapaxes(gt_wlh[:, sl], 0, 1),
                )
            carry0 = (init_box, wlh)
            if agg_mode == "all":
                # empty reservoir: all keys -inf (see make_match_step)
                B = pts.shape[0]
                C = int(template_pool)
                carry0 = carry0 + (
                    jnp.zeros((B, C, 3), pts.dtype),
                    jnp.full((B, C), -jnp.inf, jnp.float32),
                    jnp.zeros((B,), jnp.int32),
                )
            elif lb_uniform:
                # per-row step count: the limit_box re-draw key source
                carry0 = carry0 + (jnp.zeros((pts.shape[0],), jnp.int32),)
            _, boxes = jax.lax.scan(
                partial(step, variables, wlh, first_pts, first_valid),
                carry0, xs
            )
            return jnp.swapaxes(boxes, 0, 1)  # (B, T-1, 4)

        if self.transfer_dtype is not None:
            from open3dsot_tpu.tracking.scan_tracker import _dequant_entry

            # (scale, off, q) replace pts; scale (B,) / off (B, 3) are
            # batch-leading, hence BATCHED under shard_map (only the
            # variables are replicated)
            entry_fn, n_extra = _dequant_entry(track_fn), 2
        else:
            entry_fn, n_extra = track_fn, 0
        if mesh is None:
            self._track = jax.jit(entry_fn)
            self._mesh_size = 1
        else:
            # shard the tracklet batch over the 'data' mesh axis — the frame
            # recurrence is serial, so tracklets are the unit of parallelism
            # (B/num_devices per chip, replicated params, no collectives in
            # the scan body); shard_map so the fused Pallas SA kernels run
            # per device on a multi-chip mesh (same design as M2ScanTracker)
            from open3dsot_tpu.parallel import shard_map_batch

            self._track = jax.jit(
                shard_map_batch(entry_fn, mesh, n_replicated=1,
                                n_batched=(8 if self._gt_mode else 6) + n_extra)
            )
            self._mesh_size = mesh.devices.size

    # --- host driver ------------------------------------------------------
    def _bucket_len(self, T: int) -> int:
        return max(2, -(-T // self.frame_bucket) * self.frame_bucket)

    def _prepare(self, sequences: Sequence[list]):
        B_real = len(sequences)
        # pad the batch to a mesh-divisible size by repeating the last tracklet
        pad = (-B_real) % self._mesh_size
        sequences = list(sequences) + [sequences[-1]] * pad
        B = len(sequences)
        T_pad = max(self._bucket_len(len(s)) for s in sequences)
        P, P1 = self.max_points, self.first_crop_points
        cfg = self.config
        pts = np.zeros((B, T_pad, P, 3), np.float32)
        valid = np.zeros((B, T_pad, P), bool)
        first_pts = np.zeros((B, P1, 3), np.float32)
        first_count = np.zeros((B,), np.int32)
        wlh = np.zeros((B, 3), np.float32)
        init = np.zeros((B, 4), np.float32)
        for b, seq in enumerate(sequences):
            first_box = seq[0]["3d_bbox"]
            wlh[b] = first_box.wlh
            theta0 = rigid.theta_from_rotation(first_box.rotation_matrix, self._A_np)
            init[b] = np.append(first_box.center, theta0)
            # constant first-frame template crop (host, once per tracklet)
            crop, _ = points_utils.cropAndCenterPC(
                seq[0]["pc"], first_box,
                scale=cfg.model_bb_scale, offset=cfg.model_bb_offset,
            )
            fp = crop.points.T.astype(np.float32)[:P1]
            first_pts[b, : len(fp)] = fp
            first_count[b] = len(fp)
            for t, frame in enumerate(seq):
                pts[b, t], valid[b, t] = pad_frame(frame["pc"].points.T, P)
        return (sequences, B_real, T_pad,
                pts, valid, wlh, init, first_pts, first_count)

    def track_batch(self, sequences: Sequence[list]) -> List[np.ndarray]:
        (sequences, B_real, T_pad, pts, valid, wlh, init,
         first_pts, first_count) = self._prepare(sequences)
        from open3dsot_tpu.tracking.scan_tracker import _gt_arrays

        gt = (_gt_arrays(sequences, T_pad, self._A_np)
              if self._gt_mode else ())
        boxes = np.asarray(
            self._dispatch_track(pts, valid, wlh, init,
                                 first_pts, first_count, *gt)
        )
        return [
            boxes[b, : len(seq) - 1]
            for b, seq in enumerate(sequences[:B_real])
        ]

    def dispatch_scored(self, sequences: Sequence[list], prep_cache=None,
                        cache_key=None):
        """Dispatch tracking + on-device trajectory scoring; no host sync.

        Returns (iou_dev (B_real, T_pad), dist_dev) device arrays; see
        scan_tracker.pipelined_scores for the overlapped eval loop.
        prep_cache/cache_key cache the padded host arrays across calls (see
        scan_tracker.M2ScanTracker.dispatch_scored).
        """
        from open3dsot_tpu.tracking.scan_tracker import _make_scorer

        if prep_cache is not None and cache_key in prep_cache:
            (sequences, B_real, T_pad, packed, counts, wlh, init,
             first_pts, first_count, gt_params, gt_wlh) = prep_cache[cache_key]
        else:
            (sequences, B_real, T_pad, pts, valid, wlh, init,
             first_pts, first_count) = self._prepare(sequences)
            from open3dsot_tpu.tracking.scan_tracker import _gt_arrays

            gt_params, gt_wlh = _gt_arrays(sequences, T_pad, self._A_np)
            # cache the TRANSFER form (variables-independent; int16 halves
            # the cache's resident bytes; masks cached as prefix counts)
            packed = _pack_transfer(self.transfer_dtype, pts, valid)
            counts = _counts(valid)
            if prep_cache is not None:
                prep_cache[cache_key] = (
                    sequences, B_real, T_pad, packed, counts, wlh, init,
                    first_pts, first_count, gt_params, gt_wlh,
                )
        gt = (gt_params, gt_wlh) if self._gt_mode else ()
        boxes = self._dispatch_packed(packed, counts, wlh, init,
                                      first_pts, first_count, *gt)
        if self._scorer is None:
            self._scorer = _make_scorer(self.config)
        if self._gt_mode:
            # getOffsetBB copies the anchor's wlh onto the prediction
            # (points_utils.py:43-85): in the gt modes the anchor is the
            # per-frame gt box, so score with ITS dimensions
            pred_wlh = np.empty_like(gt_wlh)
            pred_wlh[:, 0] = wlh
            pred_wlh[:, 1:] = (gt_wlh[:, :-1] if self._ref_mode == "previous_gt"
                               else gt_wlh[:, 1:])
        else:
            pred_wlh = wlh
        iou, dist = self._scorer(
            boxes, jnp.asarray(init), jnp.asarray(pred_wlh),
            jnp.asarray(gt_params), jnp.asarray(gt_wlh),
        )
        return iou[:B_real], dist[:B_real]

    def evaluate_sequences(self, sequences, config):
        all_boxes = self.track_batch(sequences)
        return [
            _score(seq, boxes, config) for seq, boxes in zip(sequences, all_boxes)
        ]

    def evaluate_one_sequence(self, sequence, config):
        return self.evaluate_sequences([sequence], config)[0]


def _score(sequence, boxes, config):
    first_box = sequence[0]["3d_bbox"]
    A = rigid.up_frame(config.up_axis)
    A_np = None if A is None else np.asarray(A)
    ref = config.reference_BB.upper()
    results_bbs = [first_box]
    for t in range(len(sequence) - 1):
        cx, cy, cz, th = (float(v) for v in boxes[t])
        # the prediction inherits its anchor's wlh (getOffsetBB copies the
        # ref box dims, points_utils.py:43-85): the carried chain keeps the
        # first box's, the gt modes take the per-frame gt anchor's
        if "PREVIOUS_GT" in ref:
            wlh = sequence[t]["3d_bbox"].wlh
        elif "CURRENT_GT" in ref:
            wlh = sequence[t + 1]["3d_bbox"].wlh
        else:
            wlh = first_box.wlh
        results_bbs.append(
            Box([cx, cy, cz], np.asarray(wlh).tolist(),
                Quaternion(matrix=rigid.rotation_from_theta(th, A_np)))
        )
    ious, distances = [], []
    for t, frame in enumerate(sequence):
        gt = frame["3d_bbox"]
        ious.append(estimateOverlap(gt, results_bbs[t], dim=config.IoU_space,
                                    up_axis=config.up_axis))
        distances.append(estimateAccuracy(gt, results_bbs[t], dim=config.IoU_space,
                                          up_axis=config.up_axis))
    return ious, distances, results_bbs


def evaluate_dataset_scan_matching(model, variables, test_sampler, config,
                                   max_points: int = 4096,
                                   batch_tracklets: int = 8,
                                   max_tracklets: Optional[int] = None,
                                   tracker: Optional["MatchScanTracker"] = None,
                                   device_metrics: bool = True,
                                   pipeline_depth: int = 3,
                                   shard_across_processes: bool = False,
                                   prep_cache: Optional[dict] = None,
                                   prep_store_path: Optional[str] = None,
                                   results_writer=None):
    """Batched scan eval over a whole dataset; returns (success, precision).

    Pass a prebuilt `tracker` to reuse its compiled scan across calls
    (in-training validation); its variables are swapped for the given ones.
    Configs the scan path cannot serve (e.g. unsupported up_axis) fall back
    to the host fidelity tracker with a logged warning.

    device_metrics / pipeline_depth / shard_across_processes / prep_cache as
    in scan_tracker.evaluate_dataset_scan.
    """
    from open3dsot_tpu.tracking.scan_tracker import (
        _bucketed_batches,
        _merge_process_metrics,
        pipelined_scores,
    )
    from open3dsot_tpu.utils.metrics import Precision, Success

    if tracker is None:
        try:
            tracker = MatchScanTracker(model, variables, config, max_points=max_points)
        except (AssertionError, ValueError) as e:
            print(f"[scan_matching] scan path unavailable ({e}); "
                  f"falling back to the host tracker")
            from open3dsot_tpu.tracking.eval import evaluate_dataset

            return evaluate_dataset(
                model, variables, test_sampler, config,
                max_tracklets=max_tracklets,
                shard_across_processes=shard_across_processes,
            )
    else:
        tracker.variables = variables
    success, precision = Success(), Precision()
    n = len(test_sampler)
    if max_tracklets is not None:
        n = min(n, max_tracklets)
    if results_writer is not None:
        # results-saving mode: order-preserving index batches, host-scored
        # (the writer needs the Box trajectories on the host anyway)
        from open3dsot_tpu.tracking.scan_tracker import _scan_eval_with_writer

        if prep_store_path is not None:
            print("[scan eval] --eval_prep_cache is ignored with "
                  "--save_results: the writer path needs real host frames, "
                  "which a warm PackedPrepStore does not hold")
        return _scan_eval_with_writer(
            tracker, test_sampler, config, n, batch_tracklets,
            shard_across_processes, results_writer, success, precision)
    if prep_cache is None and prep_store_path is not None:
        from open3dsot_tpu.tracking.prep_store import eval_store

        prep_cache = eval_store(prep_store_path, config, tracker, n,
                                batch_tracklets, shard_across_processes)
    if not device_metrics and getattr(prep_cache, "stub_sequences", False):
        # host-scored paths need real frames; a warm PackedPrepStore only
        # has length stubs — ignore it rather than crash on stub access
        prep_cache = None
    if prep_cache is not None and "batches" in prep_cache:
        batches = prep_cache["batches"]
    else:
        batches = _bucketed_batches(test_sampler, n, tracker, batch_tracklets,
                                    shard_across_processes)
        if prep_cache is not None:
            prep_cache["batches"] = batches
    if device_metrics:
        for ious, distances in pipelined_scores(tracker, batches,
                                                depth=pipeline_depth,
                                                prep_cache=prep_cache):
            success.update(ious)
            precision.update(distances)
    else:
        for batch in batches:
            for ious, distances, _ in tracker.evaluate_sequences(batch, config):
                success.update(ious)
                precision.update(distances)
    _merge_process_metrics(success, precision, shard_across_processes)
    return success.compute(), precision.compute()
