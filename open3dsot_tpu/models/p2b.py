"""P2B: point-to-box siamese matching tracker (flax, channels-last).

TPU-native rebuild of /root/reference/models/p2b.py: shared PointNet++
backbone over template (M pts) and search (N pts) with npoint halving
[X/2, X/4, X/8], a final 1x1-conv feature projection, dense cosine xcorr,
and the VoteNet proposal head. The seg label re-gather through the backbone
sample idxs (p2b.py:75-78) happens in `loss()` here.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

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
from open3dsot_tpu.models.xcorr import P2BXCorr


class P2BNet(nn.Module):
    feature_channel: int = 256
    hidden_channel: int = 256
    out_channel: int = 256
    vote_channel: int = 256
    num_proposal: int = 64
    use_fps: bool = False
    normalize_xyz: bool = False
    fused_eval: bool = False
    fused_train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, template, search, train: bool = False) -> dict:
        """template (B, M, 3), search (B, N, 3)."""
        M, N = template.shape[1], search.shape[1]
        backbone = PointnetBackbone(
            use_fps=self.use_fps, normalize_xyz=self.normalize_xyz,
            fused_eval=self.fused_eval, fused_train=self.fused_train,
            dtype=self.dtype, name="backbone"
        )
        conv_final = nn.Dense(self.feature_channel, dtype=self.dtype, name="conv_final")

        template_xyz, template_feature, _ = backbone(
            template, [M // 2, M // 4, M // 8], train=train
        )
        search_xyz, search_feature, sample_idxs = backbone(
            search, [N // 2, N // 4, N // 8], train=train
        )
        template_feature = conv_final(template_feature)
        search_feature = conv_final(search_feature)

        fusion_feature = P2BXCorr(
            hidden_channel=self.hidden_channel,
            out_channel=self.out_channel,
            dtype=self.dtype,
            name="xcorr",
        )(template_feature, search_feature, template_xyz, train=train)

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
        }


class P2BModel(MatchingEvalMixin):
    name = "p2b"

    def __init__(self, config):
        self.config = config
        self.net = P2BNet(
            feature_channel=config.feature_channel,
            hidden_channel=config.hidden_channel,
            out_channel=config.out_channel,
            vote_channel=config.vote_channel,
            num_proposal=config.num_proposal,
            use_fps=getattr(config, "use_fps", False),
            normalize_xyz=getattr(config, "normalize_xyz", False),
            fused_eval=_fused_sa(config),
            fused_train=_fused_sa_train(config),
            dtype=_compute_dtype(config),
        )

    def dummy_batch(self, batch_size: int = 2) -> dict:
        m, n = self.config.template_size, self.config.search_size
        return {
            "template_points": np.zeros((batch_size, m, 3), np.float32),
            "search_points": np.zeros((batch_size, n, 3), np.float32),
            "box_label": np.zeros((batch_size, 4), np.float32),
            "seg_label": np.zeros((batch_size, n), np.float32),
        }

    def init(self, rng, batch: dict):
        return self.net.init(
            rng, batch["template_points"], batch["search_points"], train=True
        )

    def apply(self, variables, batch: dict, train: bool = False):
        if train:
            return self.net.apply(
                variables,
                batch["template_points"],
                batch["search_points"],
                train=True,
                mutable=["batch_stats"],
            )
        return self.net.apply(
            variables, batch["template_points"], batch["search_points"], train=False
        )

    def loss(self, config, batch: dict, output: dict) -> dict:
        # gather seg labels through backbone sample idxs (p2b.py:75-78)
        n_out = output["estimation_cla"].shape[1]
        idx = output["sample_idxs"][:, :n_out].astype(jnp.int32)
        batch = dict(batch)
        batch["seg_label"] = jnp.take_along_axis(batch["seg_label"], idx, axis=1)
        loss_dict = matching_loss(config, batch, output)
        loss_dict["loss_total"] = matching_total_loss(config, loss_dict)
        return loss_dict
