"""Fully on-device, batched tracklet tracker (lax.scan over frames).

The reference evaluates tracklets with a per-frame host loop: numpy
crop/canonicalize + a batch-of-1 GPU forward per frame
(/root/reference/models/base_model.py:59-86) — the FPS bottleneck called out
in SURVEY §3.2. This module moves the ENTIRE per-frame pipeline for M2-Track
onto the device and batches B tracklets through one jitted
`lax.scan`: per step,

  crop (masked AABB in each ref-box frame)  ->  fixed-size resample
  ->  prior-targetness / timestamp channels (+ BoxCloud)  ->  forward (B)
  ->  4-DoF box composition  (the carry, one box per tracklet)

so B tracklets cost ONE device dispatch total. The tracklet recurrence is
inherently serial in time (box t depends on box t-1, SURVEY §5), so batching
across tracklets is exactly where the parallelism lives; sharding the batch
axis over a mesh extends this to multi-chip eval.

Differences vs the host fidelity path (tracking/eval.py): resampling is a
deterministic cyclic fill of the cropped points instead of the reference's
seeded `np.random.choice` (base_model.py:271-277) — same point *set*,
different multiset when up/down-sampling, so metrics can differ at the
decimal level. Use the host path for checkpoint-parity evaluation and this
path for throughput.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from open3dsot_tpu.geometry import rigid
from open3dsot_tpu.geometry.iou import estimateAccuracy, estimateOverlap
from open3dsot_tpu.geometry.data_classes import Box
from open3dsot_tpu.geometry.quaternion import Quaternion


def _select_fixed(points: jnp.ndarray, valid: jnp.ndarray, n: int,
                  mode: str = "strided") -> jnp.ndarray:
    """Pick exactly n rows from the valid subset of (B, P, C) points.

    Deterministic, shape-static stand-in for the reference's random
    re-sampling (np.random.choice without replacement when downsampling,
    with replacement when upsampling — points_utils.py:24-40):

    - mode='strided' (default): downsampling takes evenly-spaced valid rows
      (index order), the closest deterministic analogue of a uniform random
      subset — point clouds are stored in scan/generation order, so the
      'first' prefix is spatially biased while strides keep proportional
      coverage. Upsampling cycles evenly through the valid rows.
    - mode='first': the round-1 behavior (first-n valid rows, cyclic fill).

    Returns (B, n, C); an all-invalid row returns zeros.
    """
    B, P, _ = points.shape
    count = jnp.sum(valid.astype(jnp.int32), axis=1, keepdims=True)  # (B, 1)
    safe = jnp.maximum(count, 1)
    ar = jnp.arange(n, dtype=jnp.int32)[None, :]
    capped = jnp.minimum(safe, P)
    if mode == "strided":
        # evenly spaced over the valid list when downsampling; even cyclic
        # coverage when upsampling (floor(i*count/n) vs i % count). The keys
        # are the indices themselves (already sorted), so the k-th valid
        # index is an order statistic of the cumulative count — one fused
        # compare+reduce, no sort (2.4x faster than a full top_k at
        # B=128, P=n=1024 on v5e).
        vpos = jnp.where(capped >= n, (ar * capped) // n, ar % capped)
        cs = jnp.cumsum(valid.astype(jnp.int32), axis=1)  # (B, P)
        # index of the k-th valid row = #{p : cs[p] <= k}
        idx = jnp.sum((cs[:, :, None] <= vpos[:, None, :]).astype(jnp.int32), axis=1)
        idx = jnp.minimum(idx, P - 1).astype(jnp.int32)
    else:
        iota = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)
        key = jnp.where(valid, iota, iota + P)
        order = -jax.lax.top_k(-key, min(n, P))[0]  # (B, min(n,P)) valid-first
        pick = ar % capped  # (B, n)
        pick = jnp.minimum(pick, order.shape[1] - 1)
        idx = jnp.take_along_axis(order, pick, axis=1)
        idx = jnp.where(idx < P, idx, 0)
    out = jnp.take_along_axis(points, idx[..., None], axis=1)
    return jnp.where(count[..., None] > 0, out, jnp.zeros_like(out))


def _dequant_entry(track_fn):
    """Wrap a track_fn to accept (variables, scale, off, q, *rest) with the
    per-sample dequantization (utils/quant.py) running on device in-jit."""
    from open3dsot_tpu.utils.quant import dequantize

    def entry(variables, scale, off, q, *rest):
        return track_fn(variables, dequantize(q, scale, off), *rest)

    return entry


def pad_frame(p: np.ndarray, P: int):
    """Pad/truncate one frame's (N, 3) points to (P, 3) + validity mask —
    THE single truncation policy shared by the offline scan trackers and the
    online serving tracker (their trajectory-equality tests depend on it).
    Frames larger than P keep the P points closest (L-inf) to the median:
    the standard pipeline preload-crops each frame around its gt box
    (kitti.py:180-182), so the median tracks the object."""
    p = np.asarray(p, np.float32).reshape(-1, 3)
    if len(p) > P:
        center = np.median(p, axis=0, keepdims=True)
        d = np.max(np.abs(p - center), axis=1)
        p = p[np.argsort(d, kind="stable")[:P]]
    out = np.zeros((P, 3), np.float32)
    valid = np.zeros((P,), bool)
    out[: len(p)] = p
    valid[: len(p)] = True
    return out, valid


def _pack_transfer(transfer_dtype, pts, valid):
    """Host-side transfer packing of padded frame points: () around the f32
    array as-is, or the ('int16') per-sample fixed-point triple
    (utils/quant.py) ordered for the _dequant_entry signature.
    Variables-independent, so prep caches store the packed form and
    repeated evals skip re-quantization too."""
    if transfer_dtype is None:
        return (np.asarray(pts),)
    from open3dsot_tpu.utils.quant import quantize_per_sample

    q, scale, off = quantize_per_sample(pts, valid)
    return (scale, off, q)


def _counts(valid: np.ndarray) -> np.ndarray:
    """Per-frame valid-point counts. `pad_frame` (and the matching tracker's
    first-crop fill) write validity as a PREFIX mask, so the (..., P) bool
    array is fully encoded by its (...,) int32 row counts — that is what
    crosses the H2D link (P× fewer mask bytes; the jitted entries expand the
    mask back with one iota compare on device). A non-prefix mask would be
    silently re-expanded as a different valid set on device (wrong crops /
    quant ranges), so it is rejected loudly here: rows must be monotone
    non-increasing (no True after a False)."""
    v = np.asarray(valid, bool)
    if v.shape[-1] > 1 and np.any(v[..., 1:] & ~v[..., :-1]):
        raise ValueError(
            "_counts: validity mask is not a prefix mask; the count encoding "
            "would change the valid set on device")
    return np.ascontiguousarray(v.sum(axis=-1, dtype=np.int32))


def _expand_counts(counts: jnp.ndarray, P: int) -> jnp.ndarray:
    """In-jit inverse of `_counts`: (...,) int32 -> (..., P) prefix mask."""
    return jnp.arange(P, dtype=jnp.int32) < counts[..., None]


class _TransferDispatchMixin:
    """Shared compiled-scan dispatch used by both scan trackers: packs the
    points per self.transfer_dtype (the mask arg bounds the quantization
    range), collapses the validity mask to per-frame counts for the wire,
    and invokes self._track."""

    def _dispatch_track(self, pts, valid, *rest):
        packed = _pack_transfer(self.transfer_dtype, pts, valid)
        return self._dispatch_packed(packed, _counts(valid), *rest)

    def _dispatch_packed(self, packed, counts, *rest):
        args = [jnp.asarray(a) for a in (*packed, counts, *rest)]
        return self._track(self.variables, *args)


def _gt_arrays(sequences, T_pad: int, A_np):
    """Ground-truth (B, T_pad, 4) params + (B, T_pad, 3) wlh for scoring.

    Padded frames repeat the last gt box; callers slice [:len(seq)]."""
    B = len(sequences)
    gt_params = np.zeros((B, T_pad, 4), np.float32)
    gt_wlh = np.ones((B, T_pad, 3), np.float32)
    for b, seq in enumerate(sequences):
        for t, frame in enumerate(seq):
            gt = frame["3d_bbox"]
            theta = rigid.theta_from_rotation(gt.rotation_matrix, A_np)
            gt_params[b, t] = np.append(gt.center, theta)
            gt_wlh[b, t] = gt.wlh
        if len(seq) < T_pad:
            gt_params[b, len(seq):] = gt_params[b, len(seq) - 1]
            gt_wlh[b, len(seq):] = gt_wlh[b, len(seq) - 1]
    return gt_params, gt_wlh


def _make_scorer(config):
    """Jitted whole-trajectory scorer: (boxes (B,T-1,4), init (B,4),
    wlh, gt_params (B,T,4), gt_wlh (B,T,3)) -> (iou, dist) (B,T).

    wlh is (B, 3) when every predicted box keeps the first-frame dimensions
    (previous_result chains — getOffsetBB copies the ref box's wlh), or a
    per-frame (B, T, 3) array when the anchor varies (the matching gt
    reference_BB modes anchor on per-frame gt boxes).

    Frame 0 scores the gt box against itself (results_bbs[0] IS the first
    gt box in the reference loop, base_model.py:59-86) — exactly 1.0 / 0.0.
    """
    from open3dsot_tpu.geometry.iou_device import overlap_accuracy, up_index

    dim = int(config.IoU_space)
    up_idx = up_index(config.up_axis)

    @jax.jit
    def score(boxes, init, wlh, gt_params, gt_wlh):
        preds = jnp.concatenate([init[:, None, :], boxes], axis=1)  # (B,T,4)
        if wlh.ndim == 3:
            pred_wlh = wlh
        else:
            pred_wlh = jnp.broadcast_to(wlh[:, None, :], gt_wlh.shape)
        return overlap_accuracy(
            gt_params, gt_wlh, preds, pred_wlh, dim=dim, up_idx=up_idx
        )

    return score


def pipelined_scores(tracker, batches, depth: int = 3, prep_cache=None):
    """Yield per-tracklet (ious, distances) with `depth` batches in flight.

    While the device tracks batch j, the host pads batch j+1 and bins batch
    j-depth's fetched scores — the host's per-frame work (numpy padding,
    metric binning) overlaps device compute instead of serializing with it,
    and only two (B, T) scalar arrays cross the tunnel per batch.

    prep_cache: optional dict; per-batch padded arrays are stored under
    (\"prep\", j) and reused on later calls over the same batches (repeated
    in-training validation) — the host then does no padding work at all.
    """
    from collections import deque

    q: deque = deque()

    def drain():
        seqs, (iou_d, dist_d) = q.popleft()
        iou, dist = np.asarray(iou_d), np.asarray(dist_d)
        for b, seq in enumerate(seqs):
            T = len(seq)
            yield iou[b, :T], dist[b, :T]

    for j, seqs in enumerate(batches):
        key = None if prep_cache is None else ("prep", j)
        q.append((list(seqs),
                  tracker.dispatch_scored(seqs, prep_cache, key)))
        if len(q) > depth:
            yield from drain()
    while q:
        yield from drain()


def make_m2_step(model, config, A, box_aware, compute_dtype=None):
    """Build the single-frame M2-Track step used by BOTH the offline scan
    tracker (inside `lax.scan`) and the online serving tracker
    (tracking/online.py) — sharing one function makes their trajectories
    exactly equal by construction.

    Returns step(variables, wlh, carry, xs) with carry = ref_box (B, 4)
    world-frame and xs = (prev_pts, prev_valid, this_pts, this_valid,
    step_idx); mirrors MotionBaseModel.build_input_dict + evaluate_one_sample
    (/root/reference/models/base_model.py:255-303, 44-57).
    """
    resample = getattr(config, "scan_resample", "strided")
    n = config.point_sample_size
    scale, offset = float(config.bb_scale), float(config.bb_offset)
    use_z = bool(getattr(config, "use_z", True))
    limit_box = bool(getattr(config, "limit_box", False))
    lb_uniform = limit_box and str(
        getattr(config, "limit_box_redraw", "uniform")) == "uniform"
    lb_base_key = jax.random.PRNGKey(2) if lb_uniform else None

    def step(variables, wlh, carry, xs):
        ref_box = carry  # (B, 4) world frame
        prev_pts, prev_valid, this_pts, this_valid, step_idx = xs
        B = ref_box.shape[0]

        # canonicalize both frames into each ref-box frame (subwindow
        # crop, cf. generate_subwindow, points_utils.py:218-250)
        half = (
            jnp.stack([wlh[:, 1], wlh[:, 0], wlh[:, 2]], axis=-1) * (scale / 2.0)
            + offset
        )  # (B, 3)

        def crop(pts, pad_valid):
            local = rigid.remove_transform_points(pts, ref_box, A=A)
            inside = jnp.all(
                (local < half[:, None, :]) & (local > -half[:, None, :]), axis=-1
            )
            return local, inside & pad_valid

        prev_local, prev_ok = crop(prev_pts, prev_valid)
        this_local, this_ok = crop(this_pts, this_valid)
        prev_sel = _select_fixed(prev_local, prev_ok, n, mode=resample)  # (B, n, 3)
        this_sel = _select_fixed(this_local, this_ok, n, mode=resample)

        canonical = jnp.zeros((B, 4), prev_sel.dtype)
        seg_mask_prev = rigid.points_in_box(
            prev_sel, canonical, wlh, 1.25
        ).astype(prev_sel.dtype)  # (B, n)
        # soft prior-targetness after the first tracked frame
        # (base_model.py:282-284)
        soft = jnp.where(seg_mask_prev > 0.5, 0.8, 0.2)
        seg_mask_prev = jnp.where(step_idx == 0, seg_mask_prev, soft)
        seg_mask_this = jnp.full((B, n), 0.5, prev_sel.dtype)

        ts_prev = jnp.zeros((B, n, 1), prev_sel.dtype)
        ts_this = jnp.full((B, n, 1), 0.1, prev_sel.dtype)
        prev_stack = jnp.concatenate(
            [prev_sel, ts_prev, seg_mask_prev[..., None]], axis=-1
        )
        this_stack = jnp.concatenate(
            [this_sel, ts_this, seg_mask_this[..., None]], axis=-1
        )
        points = jnp.concatenate([prev_stack, this_stack], axis=1)  # (B, 2n, 5)

        batch = {"points": points}
        if box_aware:
            bc_prev = rigid.box_cloud(prev_sel, canonical, wlh)  # (B, n, 9)
            batch["candidate_bc"] = jnp.concatenate(
                [bc_prev, jnp.zeros_like(bc_prev)], axis=1
            )
        if compute_dtype is not None:
            batch = {k: v.astype(compute_dtype) for k, v in batch.items()}

        output = model.apply(variables, batch, train=False)
        # box composition stays f32 regardless of the compute dtype
        pred = output["estimation_boxes"].astype(ref_box.dtype)  # (B, 4)
        if limit_box:
            # outlier-prediction rescue (rigid.limit_box_offset; reference
            # points_utils.py:70-76): U(-1,1) re-draws keyed on the frame
            # index ('uniform', default) or the deterministic 0 ('zero').
            # All shipped M2 configs set limit_box False, so this is
            # normally dead; kept for config parity.
            redraw = None
            if lb_uniform:
                # per-row fold: offline passes a scalar step index, online a
                # per-slot (B,1) counter — equal-index rows share the draw,
                # so online == offline under staggered stream starts
                idx_vec = jnp.broadcast_to(
                    jnp.asarray(step_idx).reshape(-1), (B,))
                redraw = jax.vmap(
                    lambda a: jax.random.uniform(
                        jax.random.fold_in(lb_base_key, a), (2,),
                        minval=-1.0, maxval=1.0))(idx_vec)
            pred = rigid.limit_box_offset(pred, wlh, use_z, redraw=redraw)
        new_ref = rigid.get_offset_box(ref_box, pred, A=A)
        return new_ref, new_ref

    return step


class M2ScanTracker(_TransferDispatchMixin):
    """Batched on-device tracker for M2-Track (B tracklets per dispatch)."""

    def __init__(self, model, variables, config, max_points: int = 4096,
                 frame_bucket: int = 16, mesh=None, compute_dtype=None,
                 transfer_dtype=None):
        self.model = model
        # 'int16' ships fixed-point frame points (halved H2D bytes,
        # dequantized in-jit); None (default) ships exact f32. Falls back to
        # config.transfer_quant when not given explicitly.
        if transfer_dtype is None:
            transfer_dtype = getattr(config, "transfer_quant", None)
        self.transfer_dtype = transfer_dtype
        if compute_dtype is not None:
            # cast the whole model (params + BN stats) to the compute dtype;
            # geometry/box composition below stays f32
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(compute_dtype)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                else x,
                variables,
            )
        self.compute_dtype = compute_dtype
        self.variables = variables
        self.config = config
        self.max_points = max_points
        self.frame_bucket = frame_bucket
        self.mesh = mesh
        self._scorer = None  # built lazily by dispatch_scored
        # up-axis basis: None (z-up) or Rx(pi/2) for camera mode; raises on
        # unsupported axes (geometry/rigid.py::up_frame)
        A = rigid.up_frame(config.up_axis)
        self._A = A
        self._A_np = None if A is None else np.asarray(A)
        self.box_aware = bool(getattr(config, "box_aware", False))
        step = make_m2_step(model, config, A, self.box_aware,
                            compute_dtype=self.compute_dtype)

        def track_fn(variables, pts, counts, wlh, init_box):
            """pts (B, T, P, 3), counts (B, T) valid-prefix lengths,
            wlh (B, 3), init (B, 4) -> predicted world boxes (B, T-1, 4)."""
            valid = _expand_counts(counts, pts.shape[2])
            xs = (
                jnp.swapaxes(pts[:, :-1], 0, 1),
                jnp.swapaxes(valid[:, :-1], 0, 1),
                jnp.swapaxes(pts[:, 1:], 0, 1),
                jnp.swapaxes(valid[:, 1:], 0, 1),
                jnp.arange(pts.shape[1] - 1),
            )
            _, boxes = jax.lax.scan(partial(step, variables, wlh), init_box, xs)
            return jnp.swapaxes(boxes, 0, 1)  # (B, T-1, 4)

        if self.transfer_dtype is not None:
            # the quantized entry takes (scale, off, q) in place of pts; the
            # per-sample scale (B,) / off (B, 3) are batch-leading, so under
            # shard_map they are BATCHED args like q — only the variables are
            # replicated.
            entry_fn, n_extra = _dequant_entry(track_fn), 2
        else:
            entry_fn, n_extra = track_fn, 0
        if mesh is None:
            self._track = jax.jit(entry_fn)
            self._mesh_size = 1
        else:
            # shard the tracklet batch over the 'data' mesh axis: the serial
            # frame recurrence stays local, B/num_devices tracklets per chip.
            # shard_map (not jit-shardings) so the fused Pallas kernels —
            # whose custom calls have no GSPMD partitioning rule — run per
            # device on a multi-chip mesh.
            from open3dsot_tpu.parallel import shard_map_batch

            self._track = jax.jit(
                shard_map_batch(entry_fn, mesh, n_replicated=1,
                                n_batched=4 + n_extra)
            )
            self._mesh_size = mesh.devices.size

    # --- host-side driver -------------------------------------------------
    def _pad_frames(self, sequence, T_pad):
        P = self.max_points
        pts = np.zeros((T_pad, P, 3), np.float32)
        valid = np.zeros((T_pad, P), bool)
        for t, frame in enumerate(sequence):
            pts[t], valid[t] = pad_frame(frame["pc"].points.T, P)
        return pts, valid

    def _bucket_len(self, T: int) -> int:
        return max(2, -(-T // self.frame_bucket) * self.frame_bucket)

    def _prepare(self, sequences: Sequence[list]):
        """Pad a tracklet batch to device arrays (mesh-divisible B)."""
        B_real = len(sequences)
        # pad the batch to a mesh-divisible size by repeating the last tracklet
        pad = (-B_real) % self._mesh_size
        sequences = list(sequences) + [sequences[-1]] * pad
        B = len(sequences)
        T_pad = max(self._bucket_len(len(s)) for s in sequences)
        P = self.max_points
        pts = np.zeros((B, T_pad, P, 3), np.float32)
        valid = np.zeros((B, T_pad, P), bool)
        wlh = np.zeros((B, 3), np.float32)
        init = np.zeros((B, 4), np.float32)
        for b, seq in enumerate(sequences):
            pts[b], valid[b] = self._pad_frames(seq, T_pad)
            first_box = seq[0]["3d_bbox"]
            wlh[b] = first_box.wlh
            theta0 = rigid.theta_from_rotation(first_box.rotation_matrix, self._A_np)
            init[b] = np.append(first_box.center, theta0)
        return sequences, B_real, T_pad, pts, valid, wlh, init

    def track_batch(self, sequences: Sequence[list]) -> List[np.ndarray]:
        """Run B tracklets (same padded length bucket) in one dispatch.

        Returns a list of (T_i - 1, 4) world-frame box parameter arrays.
        """
        sequences, B_real, _, pts, valid, wlh, init = self._prepare(sequences)
        boxes = np.asarray(self._dispatch_track(pts, valid, wlh, init))
        return [boxes[b, : len(seq) - 1] for b, seq in enumerate(sequences[:B_real])]

    def dispatch_scored(self, sequences: Sequence[list], prep_cache=None,
                        cache_key=None):
        """Dispatch tracking AND on-device scoring; no host sync.

        Returns (iou_dev (B_real, T_pad), dist_dev) device arrays — fetch
        with np.asarray when ready (slice [b, :len(seq)] per tracklet).
        Scoring runs as a second small dispatch on the un-fetched box array
        (geometry/iou_device.py), so the host never clips polygons
        per frame; see evaluate_dataset_scan's pipelined loop.

        prep_cache/cache_key: optional dict + key caching the padded host
        arrays across calls — the prep is variables-independent, so repeated
        in-training validation skips all host padding after the first epoch
        (the caller owns invalidation).
        """
        if prep_cache is not None and cache_key in prep_cache:
            (sequences, B_real, T_pad, packed, counts, wlh, init,
             gt_params, gt_wlh) = prep_cache[cache_key]
        else:
            sequences, B_real, T_pad, pts, valid, wlh, init = \
                self._prepare(sequences)
            gt_params, gt_wlh = _gt_arrays(sequences, T_pad, self._A_np)
            # cache the TRANSFER form: quantization is variables-independent
            # too, and int16 halves the cache's resident bytes; the mask is
            # cached/shipped as per-frame counts (prefix validity)
            packed = _pack_transfer(self.transfer_dtype, pts, valid)
            counts = _counts(valid)
            if prep_cache is not None:
                prep_cache[cache_key] = (sequences, B_real, T_pad, packed,
                                         counts, wlh, init, gt_params, gt_wlh)
        boxes = self._dispatch_packed(packed, counts, wlh, init)
        if self._scorer is None:
            self._scorer = _make_scorer(self.config)
        iou, dist = self._scorer(
            boxes, jnp.asarray(init), jnp.asarray(wlh),
            jnp.asarray(gt_params), jnp.asarray(gt_wlh),
        )
        return iou[:B_real], dist[:B_real]

    def _score(self, sequence, box_params, config):
        first_box = sequence[0]["3d_bbox"]
        wlh = first_box.wlh.tolist()
        results_bbs = [first_box]
        for t in range(len(sequence) - 1):
            cx, cy, cz, th = (float(v) for v in box_params[t])
            results_bbs.append(
                Box([cx, cy, cz], wlh,
                    Quaternion(matrix=rigid.rotation_from_theta(th, self._A_np)))
            )
        ious, distances = [], []
        for t, frame in enumerate(sequence):
            gt = frame["3d_bbox"]
            ious.append(
                estimateOverlap(gt, results_bbs[t], dim=config.IoU_space, up_axis=config.up_axis)
            )
            distances.append(
                estimateAccuracy(gt, results_bbs[t], dim=config.IoU_space, up_axis=config.up_axis)
            )
        return ious, distances, results_bbs

    def evaluate_one_sequence(self, sequence, config):
        boxes = self.track_batch([sequence])[0]
        return self._score(sequence, boxes, config)

    def evaluate_sequences(self, sequences, config):
        """Batched tracking + scoring; returns list of (ious, distances, boxes)."""
        all_boxes = self.track_batch(sequences)
        return [
            self._score(seq, boxes, config) for seq, boxes in zip(sequences, all_boxes)
        ]


def evaluate_dataset_scan(model, variables, test_sampler, config,
                          max_points: int = 4096,
                          batch_tracklets: int = 16,
                          max_tracklets: Optional[int] = None,
                          tracker: Optional["M2ScanTracker"] = None,
                          device_metrics: bool = True,
                          pipeline_depth: int = 3,
                          shard_across_processes: bool = False,
                          prep_cache: Optional[dict] = None,
                          prep_store_path: Optional[str] = None,
                          results_writer=None):
    """Scan-tracker dataset evaluation; returns (success, precision).

    Tracklets are grouped into same-length-bucket batches of up to
    `batch_tracklets` so each group runs as one device dispatch (default 16
    — the measured v5e throughput sweet spot, scripts/bench_scan_scaling.py:
    14.0k/18.4k/17.4k frames/s at 8/16/32). Pass a prebuilt `tracker` to
    reuse its compiled scan across calls (in-training validation); its
    variables are swapped for the given ones.

    device_metrics=True (default) scores trajectories on device
    (geometry/iou_device.py) with `pipeline_depth` batches in flight —
    padding/binning for one batch overlaps tracking of another, and only
    (B, T) scalar arrays are fetched. device_metrics=False is the original
    serial host-scoring loop (fetch boxes, clip polygons per frame).

    shard_across_processes: each process walks tracklets
    process_index::process_count at full scan speed and the fixed-size AUC
    count-vectors are summed at the end (the reference's Lightning DDP
    test sharding, /root/reference/main.py:89-93, at O(22 floats) of
    communication).

    prep_store_path: optional directory for a DISK-backed packed prep cache
    (tracking/prep_store.py): later evals — any process — skip dataset
    decode AND padding entirely; fingerprint-validated against the config/
    tracker/batching. Ignored when prep_cache is given.

    prep_cache: optional dict (pass the SAME dict with the same sampler and
    arguments each call); caches the tracklet batching and the padded host
    arrays so repeated evaluation — in-training validation every epoch —
    does no host padding work after the first pass. The caller owns
    invalidation (pass a fresh dict if the sampler or args change).
    """
    from open3dsot_tpu.utils.metrics import Precision, Success

    if tracker is None:
        tracker = M2ScanTracker(model, variables, config, max_points=max_points)
    else:
        tracker.variables = variables
    success, precision = Success(), Precision()
    n = len(test_sampler)
    if max_tracklets is not None:
        n = min(n, max_tracklets)

    if results_writer is not None:
        # results-saving mode: order-preserving index batches, host-scored
        # (the writer needs the Box trajectories on the host anyway)
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


def _bucketed_batches(test_sampler, n, tracker, batch_tracklets,
                      shard_across_processes=False):
    """Group tracklets [start::step, < n] into same-length-bucket batches."""
    from collections import defaultdict

    start, step = 0, 1
    if shard_across_processes:
        start, step = jax.process_index(), jax.process_count()
    buckets = defaultdict(list)
    for i in range(start, n, step):
        seq = test_sampler[i]
        buckets[tracker._bucket_len(len(seq))].append(seq)
    return [
        seqs[j : j + batch_tracklets]
        for _, seqs in sorted(buckets.items())
        for j in range(0, len(seqs), batch_tracklets)
    ]


def _merge_process_metrics(success, precision, shard_across_processes):
    """Sum the AUC count-vectors across the jax.distributed process group."""
    if shard_across_processes and jax.process_count() > 1:
        from jax.experimental import multihost_utils

        for metric in (success, precision):
            gathered = np.asarray(
                multihost_utils.process_allgather(metric.state())
            )
            metric.load_state(gathered.sum(axis=0))


def _scan_eval_with_writer(tracker, test_sampler, config, n, batch_tracklets,
                           shard_across_processes, results_writer,
                           success, precision):
    """Shared results-saving eval loop for both scan trackers: consecutive
    index batches (true tracklet ids in the records), host-scored via
    tracker.evaluate_sequences so the Box trajectories exist on the host."""
    start, step = 0, 1
    if shard_across_processes:
        start, step = jax.process_index(), jax.process_count()
    idxs = list(range(start, n, step))
    for j in range(0, len(idxs), batch_tracklets):
        ids = idxs[j:j + batch_tracklets]
        batch = [test_sampler[i] for i in ids]
        for i, (ious, distances, bbs) in zip(
            ids, tracker.evaluate_sequences(batch, config)
        ):
            results_writer.add(i, bbs, ious, distances)
            success.update(ious)
            precision.update(distances)
    _merge_process_metrics(success, precision, shard_across_processes)
    return success.compute(), precision.compute()
