"""Shared logic for matching trackers (P2B / BAT).

TPU-native rebuild of MatchingBaseModel
(/root/reference/models/base_model.py:120-247): the 4-term matching loss
(seg BCE, masked vote smooth-L1, banded objectness BCE with pos_weight 2,
objectness-weighted box smooth-L1) and the eval-time template/search-area
builders (shape_aggregation, reference_BB, seeded regularize).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from open3dsot_tpu.models.losses import bce_with_logits, smooth_l1


def _compute_dtype(config):
    """bf16 compute dtype when config.bf16 is set (params/BN stats stay f32)."""
    return jnp.bfloat16 if getattr(config, "bf16", False) else None


def _fused_sa(config) -> bool:
    """Resolve config.fused_sa: 'auto' -> fused SA eval kernel on any TPU
    backend. On CPU the Pallas kernel would run interpreted (far slower
    than XLA), so auto stays off there. The kernels carry a GSPMD
    batch-partitioning rule (ops/partition.py), so sharded jit over a
    multi-chip mesh runs them per-shard — one code path for any device
    count, like the reference's DDP (main.py:82). True/False force it."""
    v = getattr(config, "fused_sa", "auto")
    if v in ("auto", None):
        import jax

        return jax.default_backend() == "tpu"
    return bool(v)


def _fused_sa_train(config) -> bool:
    """Resolve config.fused_sa_train: 'auto' -> fused training-mode SA
    kernels (ops/sa_fused_train.py) on any TPU backend, same rationale as
    _fused_sa. Batch statistics stay EXACTLY global-batch under sharding:
    the pass kernels emit per-batch-element partial sums and the GSPMD
    partitioner inserts the allreduce for the jnp-level sum."""
    v = getattr(config, "fused_sa_train", "auto")
    if v in ("auto", None):
        import jax

        return jax.default_backend() == "tpu"
    return bool(v)


def _fused_chain(config) -> bool:
    """Resolve config.fused_chain: fused eval-mode PointNet chains
    (ops/chain_fused.py: SegPointNet / MiniPointNet encoders). Default OFF:
    a measured NEGATIVE result on v5e (VERDICT r2 item 10) — the M2 scan
    tracker runs SLOWER with them (single-stream 1968 -> 1769 frames/s
    fully fused / 1921 SegPointNet-only; batched-8 14,065 -> 13,765 /
    13,174), i.e. XLA's own fusion of the dense chains already beats the
    Pallas two-pass structure at these shapes, unlike the gather-bound SA
    layers where the fused kernels win 1.4-2x. Kept behind the flag (with
    golden + GSPMD tests) for future shapes where the trade may flip."""
    v = getattr(config, "fused_chain", False)
    if v in ("auto", None):
        return False
    return bool(v)


def matching_loss(config, batch: dict, output: dict) -> dict:
    """Reference base_model.py:122-164. Expects seg_label already gathered
    through the backbone sample idxs (done in the model's train apply)."""
    estimation_boxes = output["estimation_boxes"]  # (B, K, 5)
    estimation_cla = output["estimation_cla"]  # (B, N)
    seg_label = batch["seg_label"]  # (B, N) float
    box_label = batch["box_label"]  # (B, 4)
    proposal_center = output["center_xyz"]  # (B, K, 3)
    vote_xyz = output["vote_xyz"]  # (B, N, 3)

    loss_seg = bce_with_logits(estimation_cla, seg_label)

    loss_vote = smooth_l1(vote_xyz, jnp.broadcast_to(box_label[:, None, :3], vote_xyz.shape))
    loss_vote = jnp.sum(loss_vote.mean(axis=2) * seg_label) / (jnp.sum(seg_label) + 1e-6)

    dist = jnp.sum((proposal_center - box_label[:, None, :3]) ** 2, axis=-1)
    dist = jnp.sqrt(dist + 1e-6)  # (B, K)
    objectness_label = (dist < 0.3).astype(jnp.float32)
    objectness_score = estimation_boxes[:, :, 4]
    objectness_mask = ((dist < 0.3) | (dist > 0.6)).astype(jnp.float32)
    # Reference quirk preserved (base_model.py:150-153): the BCE is taken
    # with the DEFAULT 'mean' reduction — a scalar — so the subsequent mask
    # multiply/normalize reduces to scalar * sum(mask)/(sum(mask)+1e-6);
    # the 0.3..0.6 dead band is effectively NOT excluded. Caught by the
    # live-reference loss parity test (tests/test_reference_live_matching.py).
    loss_objective = bce_with_logits(
        objectness_score, objectness_label, pos_weight=2.0
    )
    loss_objective = loss_objective * jnp.sum(objectness_mask) / (
        jnp.sum(objectness_mask) + 1e-6
    )
    loss_box = smooth_l1(
        estimation_boxes[:, :, :4],
        jnp.broadcast_to(box_label[:, None, :4], estimation_boxes[:, :, :4].shape),
    )
    loss_box = jnp.sum(loss_box.mean(axis=2) * objectness_label) / (
        jnp.sum(objectness_label) + 1e-6
    )
    return {
        "loss_objective": loss_objective,
        "loss_box": loss_box,
        "loss_seg": loss_seg,
        "loss_vote": loss_vote,
    }


def matching_total_loss(config, loss_dict: dict) -> jnp.ndarray:
    """Weighted sum (p2b.py:81-84 / bat.py:139-143)."""
    total = (
        loss_dict["loss_objective"] * config.objectiveness_weight
        + loss_dict["loss_box"] * config.box_weight
        + loss_dict["loss_seg"] * config.seg_weight
        + loss_dict["loss_vote"] * config.vote_weight
    )
    if "loss_bc" in loss_dict:
        total = total + loss_dict["loss_bc"] * config.bc_weight
    return total


class MatchingEvalMixin:
    """Eval-time input building for matching trackers
    (base_model.py:166-247)."""

    def generate_template(self, sequence, current_frame_id, results_bbs):
        from open3dsot_tpu.geometry import points_utils

        config = self.config
        first_pc = sequence[0]["pc"]
        previous_pc = sequence[current_frame_id - 1]["pc"]
        agg = config.shape_aggregation.upper()
        if "FIRSTANDPREVIOUS" in agg:
            return points_utils.getModel(
                [first_pc, previous_pc],
                [results_bbs[0], results_bbs[current_frame_id - 1]],
                scale=config.model_bb_scale,
                offset=config.model_bb_offset,
            )
        if "FIRST" in agg:
            return points_utils.cropAndCenterPC(
                first_pc, results_bbs[0],
                scale=config.model_bb_scale, offset=config.model_bb_offset,
            )
        if "PREVIOUS" in agg:
            return points_utils.cropAndCenterPC(
                previous_pc, results_bbs[current_frame_id - 1],
                scale=config.model_bb_scale, offset=config.model_bb_offset,
            )
        if "ALL" in agg:
            return points_utils.getModel(
                [frame["pc"] for frame in sequence[:current_frame_id]],
                results_bbs,
                scale=config.model_bb_scale,
                offset=config.model_bb_offset,
            )
        raise ValueError(config.shape_aggregation)

    def generate_search_area(self, sequence, current_frame_id, results_bbs):
        from open3dsot_tpu.geometry import points_utils

        config = self.config
        this_bb = sequence[current_frame_id]["3d_bbox"]
        this_pc = sequence[current_frame_id]["pc"]
        ref = config.reference_BB.upper()
        if "PREVIOUS_RESULT" in ref:
            ref_bb = results_bbs[-1]
        elif "PREVIOUS_GT" in ref:
            ref_bb = sequence[current_frame_id - 1]["3d_bbox"]
        elif "CURRENT_GT" in ref:
            ref_bb = this_bb
        else:
            raise ValueError(config.reference_BB)
        search_pc_crop = points_utils.generate_subwindow(
            this_pc, ref_bb,
            scale=config.search_bb_scale, offset=config.search_bb_offset,
        )
        return search_pc_crop, ref_bb

    def prepare_input(self, template_pc, search_pc, template_box):
        from open3dsot_tpu.geometry import points_utils

        config = self.config
        template_points, _ = points_utils.regularize_pc(
            template_pc.points.T, config.template_size, seed=1
        )
        search_points, _ = points_utils.regularize_pc(
            search_pc.points.T, config.search_size, seed=1
        )
        return {
            "template_points": template_points[None].astype(np.float32),
            "search_points": search_points[None].astype(np.float32),
        }

    def build_input_dict(self, sequence, frame_id, results_bbs):
        search_pc_crop, ref_bb = self.generate_search_area(sequence, frame_id, results_bbs)
        template_pc, canonical_box = self.generate_template(sequence, frame_id, results_bbs)
        data_dict = self.prepare_input(template_pc, search_pc_crop, canonical_box)
        return data_dict, ref_bb

    def extract_output_box(self, output, ref_box):
        """argmax-objectness proposal -> world box (base_model.py:44-57)."""
        from open3dsot_tpu.geometry import points_utils

        boxes = np.asarray(output["estimation_boxes"])[0]  # (K, 5)
        best = int(np.argmax(boxes[:, 4]))
        estimation_box = boxes[best, 0:4]
        return points_utils.getOffsetBB(
            ref_box,
            estimation_box,
            degrees=self.config.degrees,
            use_z=self.config.use_z,
            limit_box=self.config.limit_box,
        )
