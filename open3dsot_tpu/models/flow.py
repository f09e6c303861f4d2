"""FlowNet3D-style layers (flax, channels-last).

TPU-native equivalents of the reference's FlowEmbedding and
PointNetSetUpConv (pointnet2_modules.py:215-334). Like the reference, these
are provided for completeness of the layer library — none of the three
shipped trackers use them.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from open3dsot_tpu.models.layers import MLP
from open3dsot_tpu.ops import ball_query, group_points, knn


class FlowEmbedding(nn.Module):
    """Cross-cloud correlation layer: for each point in cloud 1, group its
    neighbors in cloud 2, concat [pos_diff || feat2 || feat1], MLP, max-pool."""

    radius: float
    nsample: int
    mlp: Sequence[int]
    use_knn: bool = True

    @nn.compact
    def __call__(self, xyz1, xyz2, feature1, feature2, train: bool = False):
        """xyz1/xyz2 (B, N, 3); feature1/feature2 (B, N, C) ->
        (xyz1, new_feature (B, N, mlp[-1]))."""
        if self.use_knn:
            idx = knn(xyz1, xyz2, self.nsample)  # (B, N, K)
        else:
            idx = ball_query(self.radius, self.nsample, xyz2, xyz1)
        xyz2_grouped = group_points(xyz2, idx)  # (B, N, K, 3)
        pos_diff = xyz2_grouped - xyz1[:, :, None, :]
        feat2_grouped = group_points(feature2, idx)  # (B, N, K, C)
        feat1_tiled = jnp.broadcast_to(
            feature1[:, :, None, :], feat2_grouped.shape[:3] + (feature1.shape[-1],)
        )
        feat = jnp.concatenate([pos_diff, feat2_grouped, feat1_tiled], axis=-1)
        feat = MLP(self.mlp, name="mlp")(feat, train=train)
        return xyz1, jnp.max(feat, axis=2)


class PointNetSetUpConv(nn.Module):
    """Feature propagation from a sparse cloud 2 to a dense cloud 1 via
    neighborhood grouping + two MLP stages with a skip concat."""

    nsample: int
    radius: float
    mlp: Sequence[int]
    mlp2: Sequence[int]
    use_knn: bool = True

    @nn.compact
    def __call__(self, xyz1, xyz2, feature1, feature2, train: bool = False):
        """xyz1 (B, N1, 3) dense, xyz2 (B, N2, 3) sparse;
        feature1 (B, N1, C1) or None, feature2 (B, N2, C2) ->
        (B, N1, out)."""
        if self.use_knn:
            idx = knn(xyz1, xyz2, self.nsample)
        else:
            idx = ball_query(self.radius, self.nsample, xyz2, xyz1)
        xyz2_grouped = group_points(xyz2, idx)  # (B, N1, K, 3)
        pos_diff = xyz2_grouped - xyz1[:, :, None, :]
        feat2_grouped = group_points(feature2, idx)
        feat = jnp.concatenate([feat2_grouped, pos_diff], axis=-1)
        if len(self.mlp) > 0:
            feat = MLP(self.mlp, name="mlp1")(feat, train=train)
        feat = jnp.max(feat, axis=2)  # (B, N1, C)
        if feature1 is not None:
            feat = jnp.concatenate([feat, feature1], axis=-1)
        if len(self.mlp2) > 0:
            feat = MLP(self.mlp2, name="mlp2")(feat, train=train)
        return feat
