"""VoteNet-style region proposal head (flax, channels-last).

TPU-native rebuild of /root/reference/models/head/rpn.py:12-67: per-point
classification head, vote offsets on xyz||feature, score-prepended vote
features, set-abstraction vote aggregation (radius 0.3, nsample 16) into
num_proposal clusters, proposal regression (dxyz, theta, objectness) added to
cluster centers.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from open3dsot_tpu.models.layers import MLP
from open3dsot_tpu.models.pointnet import SetAbstraction


class P2BVoteNetRPN(nn.Module):
    feature_channel: int
    vote_channel: int = 256
    num_proposal: int = 64
    normalize_xyz: bool = False
    fused_eval: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, xyz, feature, train: bool = False):
        """xyz (B, N, 3), feature (B, N, f) ->
        (estimation_boxes (B, K, 5), estimation_cla (B, N),
         vote_xyz (B, N, 3), center_xyzs (B, K, 3))."""
        f = self.feature_channel
        estimation_cla = MLP([f, f, 1], final_plain=True, dtype=self.dtype,
                             name="FC_layer_cla")(feature, train=train)[..., 0]
        # classification logits feed the loss and the vote scores: keep f32
        estimation_cla = estimation_cla.astype(jnp.float32)
        score = nn.sigmoid(estimation_cla)

        xyz_feature = jnp.concatenate([xyz, feature], axis=-1)  # (B, N, 3+f)
        offset = MLP([f, f, 3 + f], final_plain=True, dtype=self.dtype,
                     name="vote_layer")(xyz_feature, train=train)
        # votes are geometry (xyz offsets live in meters): accumulate in f32
        vote = xyz_feature.astype(jnp.float32) + offset.astype(jnp.float32)
        vote_xyz = vote[..., 0:3]
        vote_feature = vote[..., 3:]
        vote_feature = jnp.concatenate([score[..., None], vote_feature], axis=-1)

        center_xyzs, proposal_features, _ = SetAbstraction(
            mlp=[self.vote_channel, self.vote_channel, self.vote_channel],
            radius=0.3,
            nsample=16,
            use_xyz=True,
            use_fps=False,
            normalize_xyz=self.normalize_xyz,
            fused_eval=self.fused_eval,
            dtype=self.dtype,
            name="vote_aggregation",
        )(vote_xyz, vote_feature, self.num_proposal, train=train)

        v = self.vote_channel
        proposal_offsets = MLP([v, v, 5], final_plain=True, dtype=self.dtype,
                               name="FC_proposal")(
            proposal_features, train=train
        ).astype(jnp.float32)  # (B, K, 3+1+1); box params in f32
        estimation_boxes = jnp.concatenate(
            [proposal_offsets[..., 0:3] + center_xyzs, proposal_offsets[..., 3:5]],
            axis=-1,
        )
        return estimation_boxes, estimation_cla, vote_xyz, center_xyzs
