"""BAT: box-aware siamese tracker (flax, channels-last).

TPU-native rebuild of /root/reference/models/bat.py: P2B's backbone + RPN
with BoxCloud (9-D point-to-box-keypoint distance) features — an `mlp_bc`
head predicts the search BoxCloud from xyz||features (bat.py:94-95), the
template BoxCloud is gathered through the backbone FPS idxs (bat.py:96-97),
and `BoxAwareXCorr` replaces the dense cosine xcorr (bat.py:99-100). Extra
seg-masked smooth-L1 BoxCloud loss (bat.py:57-65); eval-time prepare_input
adds points2cc_dist_t (bat.py:41-55).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from open3dsot_tpu.models.layers import MLP
from open3dsot_tpu.models.losses import smooth_l1
from open3dsot_tpu.models.matching_base import (  # noqa: E501
    _compute_dtype,
    _fused_sa,
    _fused_sa_train,
)
from open3dsot_tpu.models.matching_base import (
    MatchingEvalMixin,
    matching_loss,
    matching_total_loss,
)
from open3dsot_tpu.models.pointnet import PointnetBackbone
from open3dsot_tpu.models.rpn import P2BVoteNetRPN
from open3dsot_tpu.models.xcorr import BoxAwareXCorr
from open3dsot_tpu.ops import gather_points


class BATNet(nn.Module):
    feature_channel: int = 256
    hidden_channel: int = 256
    out_channel: int = 256
    vote_channel: int = 256
    num_proposal: int = 64
    k: int = 4
    bc_channel: int = 9
    use_search_bc: bool = False
    use_search_feature: bool = False
    use_fps: bool = True
    normalize_xyz: bool = False
    fused_eval: bool = False
    fused_train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, template, search, template_bc, train: bool = False) -> dict:
        """template (B, M, 3), search (B, N, 3), template_bc (B, M, 9)."""
        M, N = template.shape[1], search.shape[1]
        backbone = PointnetBackbone(
            use_fps=self.use_fps, normalize_xyz=self.normalize_xyz,
            fused_eval=self.fused_eval, fused_train=self.fused_train,
            dtype=self.dtype, name="backbone"
        )
        conv_final = nn.Dense(self.feature_channel, dtype=self.dtype, name="conv_final")

        template_xyz, template_feature, sample_idxs_t = backbone(
            template, [M // 2, M // 4, M // 8], train=train
        )
        search_xyz, search_feature, sample_idxs = backbone(
            search, [N // 2, N // 4, N // 8], train=train
        )
        template_feature = conv_final(template_feature)
        search_feature = conv_final(search_feature)

        # predict search BoxCloud from xyz || features (bat.py:94-95)
        f = self.feature_channel
        pred_search_bc = MLP([f, f, self.bc_channel], final_plain=True,
                             dtype=self.dtype, name="mlp_bc")(
            jnp.concatenate([search_xyz, search_feature], axis=-1), train=train
        ).astype(jnp.float32)  # (B, N//8, 9); BoxCloud targets regress in f32
        # gather template BoxCloud through the FPS sample idxs (bat.py:96-97)
        template_bc = gather_points(template_bc, sample_idxs_t[:, : M // 8])

        fusion_feature = BoxAwareXCorr(
            hidden_channel=self.hidden_channel,
            out_channel=self.out_channel,
            k=self.k,
            use_search_bc=self.use_search_bc,
            use_search_feature=self.use_search_feature,
            dtype=self.dtype,
            name="xcorr",
        )(
            template_feature,
            search_feature,
            template_xyz,
            search_xyz,
            template_bc,
            pred_search_bc,
            train=train,
        )

        estimation_boxes, estimation_cla, vote_xyz, center_xyzs = P2BVoteNetRPN(
            feature_channel=self.feature_channel,
            vote_channel=self.vote_channel,
            num_proposal=self.num_proposal,
            normalize_xyz=self.normalize_xyz,
            fused_eval=self.fused_eval,
            dtype=self.dtype,
            name="rpn",
        )(search_xyz, fusion_feature, train=train)

        return {
            "estimation_boxes": estimation_boxes,
            "estimation_cla": estimation_cla,
            "vote_xyz": vote_xyz,
            "center_xyz": center_xyzs,
            "sample_idxs": sample_idxs,
            "pred_search_bc": pred_search_bc,
        }


class BATModel(MatchingEvalMixin):
    name = "bat"

    def __init__(self, config):
        self.config = config
        self.net = BATNet(
            feature_channel=config.feature_channel,
            hidden_channel=config.hidden_channel,
            out_channel=config.out_channel,
            vote_channel=config.vote_channel,
            num_proposal=config.num_proposal,
            k=getattr(config, "k", 4),
            bc_channel=getattr(config, "bc_channel", 9),
            use_search_bc=getattr(config, "use_search_bc", False),
            use_search_feature=getattr(config, "use_search_feature", False),
            use_fps=getattr(config, "use_fps", True),
            normalize_xyz=getattr(config, "normalize_xyz", False),
            fused_eval=_fused_sa(config),
            fused_train=_fused_sa_train(config),
            dtype=_compute_dtype(config),
        )

    def dummy_batch(self, batch_size: int = 2) -> dict:
        m, n = self.config.template_size, self.config.search_size
        bc = getattr(self.config, "bc_channel", 9)
        return {
            "template_points": np.zeros((batch_size, m, 3), np.float32),
            "search_points": np.zeros((batch_size, n, 3), np.float32),
            "points2cc_dist_t": np.zeros((batch_size, m, bc), np.float32),
            "points2cc_dist_s": np.zeros((batch_size, n, bc), np.float32),
            "box_label": np.zeros((batch_size, 4), np.float32),
            "seg_label": np.zeros((batch_size, n), np.float32),
        }

    def init(self, rng, batch: dict):
        return self.net.init(
            rng,
            batch["template_points"],
            batch["search_points"],
            batch["points2cc_dist_t"],
            train=True,
        )

    def apply(self, variables, batch: dict, train: bool = False):
        args = (
            batch["template_points"],
            batch["search_points"],
            batch["points2cc_dist_t"],
        )
        if train:
            return self.net.apply(variables, *args, train=True, mutable=["batch_stats"])
        return self.net.apply(variables, *args, train=False)

    def loss(self, config, batch: dict, output: dict) -> dict:
        # gather seg label + search BoxCloud through sample idxs (bat.py:130-136)
        n_out = output["estimation_cla"].shape[1]
        idx = output["sample_idxs"][:, :n_out].astype(jnp.int32)
        batch = dict(batch)
        batch["seg_label"] = jnp.take_along_axis(batch["seg_label"], idx, axis=1)
        search_bc = gather_points(batch["points2cc_dist_s"], idx)
        loss_dict = matching_loss(config, batch, output)
        # seg-masked BoxCloud regression (bat.py:57-65)
        loss_bc = smooth_l1(output["pred_search_bc"], search_bc)
        loss_bc = jnp.sum(loss_bc.mean(axis=2) * batch["seg_label"]) / (
            jnp.sum(batch["seg_label"]) + 1e-6
        )
        loss_dict["loss_bc"] = loss_bc
        loss_dict["loss_total"] = matching_total_loss(config, loss_dict)
        return loss_dict

    def prepare_input(self, template_pc, search_pc, template_box):
        """Adds the template BoxCloud channel (bat.py:41-55)."""
        from open3dsot_tpu.geometry import points_utils

        config = self.config
        template_points, _ = points_utils.regularize_pc(
            template_pc.points.T, config.template_size, seed=1
        )
        search_points, _ = points_utils.regularize_pc(
            search_pc.points.T, config.search_size, seed=1
        )
        template_bc = points_utils.get_point_to_box_distance(template_points, template_box)
        return {
            "template_points": template_points[None].astype(np.float32),
            "search_points": search_points[None].astype(np.float32),
            "points2cc_dist_t": template_bc[None].astype(np.float32),
        }
