"""M2-Track: matching-free motion-centric tracker (flax, channels-last).

TPU-native rebuild of /root/reference/models/m2track.py: a two-frame stacked
point cloud (timestamp + prior-targetness channels, optional BoxCloud) runs
through a segmentation PointNet, foreground-masked points are embedded by a
MiniPointNet, MLP heads regress 4-DoF relative motion (optionally gated by a
static/dynamic classifier) plus a refined previous box; stage 2 rigidly moves
the t0 points by the predicted motion, re-canonicalizes around the stage-1 box
and regresses a residual refinement (m2track.py:73-151). Loss terms mirror
m2track.py:153-231.

Everything is dense per-point MLP / max-pool / small matmuls — no sampling
ops — so the whole forward compiles to one XLA program; boxes on device are
(cx, cy, cz, theta) tensors (geometry/rigid.py).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from open3dsot_tpu.geometry import rigid
from open3dsot_tpu.models.layers import MLP
from open3dsot_tpu.models.losses import cross_entropy_logits, smooth_l1
from open3dsot_tpu.models.pointnet import MiniPointNet, SegPointNet


class M2TrackNet(nn.Module):
    box_aware: bool = False
    use_motion_cls: bool = True
    use_second_stage: bool = True
    use_prev_refinement: bool = True
    fused_eval: bool = False  # fused SegPointNet/MiniPointNet eval chains
    dtype: Any = None  # bf16 compute; params/BN stats/box math stay f32

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,
        candidate_bc: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> dict:
        """points (B, N, 5) = xyz | timestamp | prior-targetness; N = 2 frames
        stacked (t0 first half, t1 second half). candidate_bc (B, N, 9)."""
        bc_dim = 9 if self.box_aware else 0
        x = points
        if self.box_aware:
            x = jnp.concatenate([x, candidate_bc], axis=-1)
        B, N, _ = x.shape

        output = {}
        seg_out = SegPointNet(
            per_point_mlp1=[64, 64, 64, 128, 1024],
            per_point_mlp2=[512, 256, 128, 128],
            output_size=2 + bc_dim,
            fused_eval=self.fused_eval,
            dtype=self.dtype,
            name="seg_pointnet",
        )(x, train=train).astype(jnp.float32)
        seg_logits = seg_out[..., :2]  # (B, N, 2)
        pred_cls = jnp.argmax(seg_logits, axis=-1, keepdims=True).astype(x.dtype)  # (B,N,1)
        mask_points = x[..., :4] * pred_cls
        mask_xyz_t0 = mask_points[:, : N // 2, :3]  # (B, N/2, 3)
        mask_xyz_t1 = mask_points[:, N // 2 :, :3]
        if self.box_aware:
            pred_bc = seg_out[..., 2:]
            mask_pred_bc = pred_bc * pred_cls
            mask_points = jnp.concatenate([mask_points, mask_pred_bc], axis=-1)
            output["pred_bc"] = pred_bc

        point_feature = MiniPointNet(
            per_point_mlp=[64, 128, 256, 512],
            hidden_mlp=[512, 256],
            output_size=-1,
            fused_eval=self.fused_eval,
            dtype=self.dtype,
            name="mini_pointnet",
        )(mask_points, train=train)  # (B, 256)

        # heads regress boxes/logits: back to f32 for the rigid math + loss
        motion_pred = MLP([128, 128, 4], final_plain=True, dtype=self.dtype,
                          name="motion_mlp")(
            point_feature, train=train
        ).astype(jnp.float32)
        if self.use_motion_cls:
            motion_state_logits = MLP(
                [128, 128, 2], final_plain=True, dtype=self.dtype,
                name="motion_state_mlp"
            )(point_feature, train=train).astype(jnp.float32)
            motion_mask = jnp.argmax(motion_state_logits, axis=-1, keepdims=True).astype(
                motion_pred.dtype
            )
            motion_pred_masked = motion_pred * motion_mask
            output["motion_cls"] = motion_state_logits
        else:
            motion_pred_masked = motion_pred

        if self.use_prev_refinement:
            prev_boxes = MLP([128, 128, 4], final_plain=True, dtype=self.dtype,
                             name="final_mlp")(
                point_feature, train=train
            ).astype(jnp.float32)
            output["estimation_boxes_prev"] = prev_boxes
        else:
            prev_boxes = jnp.zeros_like(motion_pred)

        # 1st-stage box
        aux_box = rigid.get_offset_box(prev_boxes, motion_pred_masked)

        if self.use_second_stage:
            mask_xyz_t0_2_t1 = rigid.get_offset_points(
                mask_xyz_t0, prev_boxes[:, :4], motion_pred_masked
            )
            mask_xyz_t01 = jnp.concatenate([mask_xyz_t0_2_t1, mask_xyz_t1], axis=1)
            mask_xyz_t01 = rigid.remove_transform_points(mask_xyz_t01, aux_box)
            if self.box_aware:
                mask_xyz_t01 = jnp.concatenate([mask_xyz_t01, mask_pred_bc], axis=-1)
            stage2_feat = MiniPointNet(
                per_point_mlp=[64, 128, 256, 512],
                hidden_mlp=[512, 256],
                output_size=-1,
                fused_eval=self.fused_eval,
                dtype=self.dtype,
                name="mini_pointnet2",
            )(mask_xyz_t01, train=train)
            output_offset = MLP([128, 128, 4], final_plain=True, dtype=self.dtype,
                                name="box_mlp")(
                stage2_feat, train=train
            ).astype(jnp.float32)
            output["estimation_boxes"] = rigid.get_offset_box(aux_box, output_offset)
        else:
            output["estimation_boxes"] = aux_box

        output.update(
            seg_logits=seg_logits,
            motion_pred=motion_pred,
            aux_estimation_boxes=aux_box,
        )
        return output


def m2track_loss(config, batch: dict, output: dict) -> dict:
    """Weighted multi-task loss (reference m2track.py:153-231).

    Returns dict with 'loss_total' plus individual terms.
    """
    loss_total = 0.0
    loss_dict = {}
    aux_boxes = output["aux_estimation_boxes"]  # (B, 4)
    motion_pred = output["motion_pred"]  # (B, 4)
    seg_logits = output["seg_logits"]  # (B, N, 2)

    seg_label = batch["seg_label"].astype(jnp.int32)  # (B, N)
    box_label = batch["box_label"]  # (B, 4)
    box_label_prev = batch["box_label_prev"]
    motion_label = batch["motion_label"]
    motion_state_label = batch["motion_state_label"].astype(jnp.float32)  # (B,)
    center_label = box_label[:, :3]
    angle_label = jnp.sin(box_label[:, 3])
    center_label_prev = box_label_prev[:, :3]
    angle_label_prev = jnp.sin(box_label_prev[:, 3])
    center_label_motion = motion_label[:, :3]
    angle_label_motion = jnp.sin(motion_label[:, 3])

    loss_seg = cross_entropy_logits(seg_logits, seg_label, weight=[0.5, 2.0])

    use_motion_cls = getattr(config, "use_motion_cls", True)
    if use_motion_cls:
        motion_cls = output["motion_cls"]  # (B, 2)
        loss_motion_cls = cross_entropy_logits(motion_cls, motion_state_label.astype(jnp.int32))
        loss_total += loss_motion_cls * config.motion_cls_seg_weight
        loss_dict["loss_motion_cls"] = loss_motion_cls

        denom = jnp.sum(motion_state_label) + 1e-6
        lcm = smooth_l1(motion_pred[:, :3], center_label_motion).mean(axis=1)
        loss_center_motion = jnp.sum(motion_state_label * lcm) / denom
        lam = smooth_l1(jnp.sin(motion_pred[:, 3]), angle_label_motion)
        loss_angle_motion = jnp.sum(motion_state_label * lam) / denom
    else:
        loss_center_motion = smooth_l1(motion_pred[:, :3], center_label_motion).mean()
        loss_angle_motion = smooth_l1(jnp.sin(motion_pred[:, 3]), angle_label_motion).mean()

    if getattr(config, "use_second_stage", True):
        est_boxes = output["estimation_boxes"]
        loss_center = smooth_l1(est_boxes[:, :3], center_label).mean()
        loss_angle = smooth_l1(jnp.sin(est_boxes[:, 3]), angle_label).mean()
        loss_total += loss_center * config.center_weight + loss_angle * config.angle_weight
        loss_dict["loss_center"] = loss_center
        loss_dict["loss_angle"] = loss_angle

    if getattr(config, "use_prev_refinement", True):
        est_prev = output["estimation_boxes_prev"]
        loss_center_prev = smooth_l1(est_prev[:, :3], center_label_prev).mean()
        loss_angle_prev = smooth_l1(jnp.sin(est_prev[:, 3]), angle_label_prev).mean()
        loss_total += (
            loss_center_prev * config.center_weight + loss_angle_prev * config.angle_weight
        )
        loss_dict["loss_center_prev"] = loss_center_prev
        loss_dict["loss_angle_prev"] = loss_angle_prev

    loss_center_aux = smooth_l1(aux_boxes[:, :3], center_label).mean()
    loss_angle_aux = smooth_l1(jnp.sin(aux_boxes[:, 3]), angle_label).mean()

    loss_total += (
        loss_seg * config.seg_weight
        + loss_center_aux * config.center_weight
        + loss_angle_aux * config.angle_weight
        + loss_center_motion * config.center_weight
        + loss_angle_motion * config.angle_weight
    )
    loss_dict.update(
        loss_seg=loss_seg,
        loss_center_aux=loss_center_aux,
        loss_center_motion=loss_center_motion,
        loss_angle_aux=loss_angle_aux,
        loss_angle_motion=loss_angle_motion,
    )
    if getattr(config, "box_aware", False):
        bc_label = jnp.concatenate([batch["prev_bc"], batch["this_bc"]], axis=1)
        loss_bc = smooth_l1(output["pred_bc"], bc_label).mean()
        loss_total += loss_bc * config.bc_weight
        loss_dict["loss_bc"] = loss_bc

    # train-time observability (reference m2track.py:250-258): per-class
    # accuracy — correct / count per TRUE class, the torchmetrics
    # Accuracy(average='none') semantics. Computed inside the jitted step.
    pred_seg = jnp.argmax(seg_logits, axis=-1)
    for c, name in ((0, "acc_seg_background"), (1, "acc_seg_foreground")):
        m = (seg_label == c).astype(jnp.float32)
        loss_dict[name] = jnp.sum((pred_seg == c) * m) / (jnp.sum(m) + 1e-6)
    if use_motion_cls:
        pred_motion = jnp.argmax(output["motion_cls"], axis=-1)
        lbl = motion_state_label.astype(jnp.int32)
        for c, name in ((0, "acc_motion_static"), (1, "acc_motion_dynamic")):
            m = (lbl == c).astype(jnp.float32)
            loss_dict[name] = jnp.sum((pred_motion == c) * m) / (jnp.sum(m) + 1e-6)

    loss_dict["loss_total"] = loss_total
    return loss_dict


class M2TrackModel:
    """Orchestration wrapper: net + loss + eval-time input building.

    The eval path mirrors MotionBaseModel.build_input_dict
    (/root/reference/models/base_model.py:255-303): crop prev/this frames
    around the last predicted box, canonicalize, stack with timestamp and
    prior-targetness channels, seeded regularize (seed=1).
    """

    name = "m2track"

    def __init__(self, config):
        self.config = config
        from open3dsot_tpu.models.matching_base import _fused_chain

        self.net = M2TrackNet(
            box_aware=getattr(config, "box_aware", False),
            use_motion_cls=getattr(config, "use_motion_cls", True),
            use_second_stage=getattr(config, "use_second_stage", True),
            use_prev_refinement=getattr(config, "use_prev_refinement", True),
            fused_eval=_fused_chain(config),
            dtype=jnp.bfloat16 if getattr(config, "bf16", False) else None,
        )

    # --- shapes -----------------------------------------------------------
    def dummy_batch(self, batch_size: int = 2) -> dict:
        n = self.config.point_sample_size
        batch = {
            "points": np.zeros((batch_size, 2 * n, 5), np.float32),
            "seg_label": np.zeros((batch_size, 2 * n), np.int32),
            "box_label": np.zeros((batch_size, 4), np.float32),
            "box_label_prev": np.zeros((batch_size, 4), np.float32),
            "motion_label": np.zeros((batch_size, 4), np.float32),
            "motion_state_label": np.zeros((batch_size,), np.int32),
        }
        if getattr(self.config, "box_aware", False):
            batch["candidate_bc"] = np.zeros((batch_size, 2 * n, 9), np.float32)
            batch["prev_bc"] = np.zeros((batch_size, n, 9), np.float32)
            batch["this_bc"] = np.zeros((batch_size, n, 9), np.float32)
        return batch

    # --- net application --------------------------------------------------
    def init(self, rng, batch: dict):
        kwargs = {}
        if getattr(self.config, "box_aware", False):
            kwargs["candidate_bc"] = batch["candidate_bc"]
        return self.net.init(rng, batch["points"], train=True, **kwargs)

    def apply(self, variables, batch: dict, train: bool = False):
        kwargs = {}
        if getattr(self.config, "box_aware", False):
            kwargs["candidate_bc"] = batch["candidate_bc"]
        if train:
            return self.net.apply(
                variables, batch["points"], train=True, mutable=["batch_stats"], **kwargs
            )
        return self.net.apply(variables, batch["points"], train=False, **kwargs)

    def loss(self, config, batch, output) -> dict:
        return m2track_loss(config, batch, output)

    # --- eval-time input building (host, per frame) -----------------------
    def build_input_dict(self, sequence, frame_id, results_bbs):
        from open3dsot_tpu.geometry import points_utils

        assert frame_id > 0, "no need to construct an input_dict at frame 0"
        config = self.config
        prev_pc = sequence[frame_id - 1]["pc"]
        this_pc = sequence[frame_id]["pc"]
        ref_box = results_bbs[-1]
        prev_frame_pc = points_utils.generate_subwindow(
            prev_pc, ref_box, scale=config.bb_scale, offset=config.bb_offset
        )
        this_frame_pc = points_utils.generate_subwindow(
            this_pc, ref_box, scale=config.bb_scale, offset=config.bb_offset
        )
        canonical_box = points_utils.transform_box(ref_box, ref_box)
        n = config.point_sample_size
        prev_points, _ = points_utils.regularize_pc(prev_frame_pc.points.T, n, seed=1)
        this_points, _ = points_utils.regularize_pc(this_frame_pc.points.T, n, seed=1)

        seg_mask_prev = points_utils.points_in_box(
            canonical_box, prev_points.T, 1.25
        ).astype(np.float64)
        if frame_id != 1:
            # soft prior-targetness after frame 1 (ref box is a prediction)
            seg_mask_prev[seg_mask_prev == 0] = 0.2
            seg_mask_prev[seg_mask_prev == 1] = 0.8
        seg_mask_this = np.full(seg_mask_prev.shape, fill_value=0.5)

        timestamp_prev = np.full((n, 1), fill_value=0.0)
        timestamp_this = np.full((n, 1), fill_value=0.1)
        prev_points = np.concatenate([prev_points, timestamp_prev, seg_mask_prev[:, None]], axis=-1)
        this_points = np.concatenate([this_points, timestamp_this, seg_mask_this[:, None]], axis=-1)
        stack_points = np.concatenate([prev_points, this_points], axis=0)

        data_dict = {"points": stack_points[None].astype(np.float32)}
        if getattr(config, "box_aware", False):
            candidate_bc_prev = points_utils.get_point_to_box_distance(
                stack_points[:n, :3], canonical_box
            )
            candidate_bc_this = np.zeros_like(candidate_bc_prev)
            candidate_bc = np.concatenate([candidate_bc_prev, candidate_bc_this], axis=0)
            data_dict["candidate_bc"] = candidate_bc[None].astype(np.float32)
        return data_dict, results_bbs[-1]

    def extract_output_box(self, output, ref_box):
        """Predicted 4-DoF box (device) -> world Box via getOffsetBB."""
        from open3dsot_tpu.geometry import points_utils

        estimation_box = np.asarray(output["estimation_boxes"])[0]  # (4,)
        return points_utils.getOffsetBB(
            ref_box,
            estimation_box[:4],
            degrees=self.config.degrees,
            use_z=self.config.use_z,
            limit_box=self.config.limit_box,
        )
