"""PointNet family backbones (flax, channels-last).

TPU-native re-designs of /root/reference/models/backbone/pointnet.py and the
set-abstraction module (/root/reference/pointnet2/utils/pointnet2_modules.py):

- `MiniPointNet`   — per-point MLP -> global max-pool -> FC MLP
  (pointnet.py:91-141).
- `SegPointNet`    — per-point MLP with a layer-2 tap, global max-pool
  concatenated back per point, second MLP, logits head (pointnet.py:144-204).
- `SetAbstraction` — centroid sampling (FPS or first-npoint), ball-query
  grouping, SharedMLP, max over the neighborhood (pointnet2_modules.py:24-149).
- `SetAbstractionMSG` — the multi-scale-grouping generalization: shared
  centroids, per-radius branches, feature-axis concat
  (pointnet2_modules.py:82-118; never instantiated by the three trackers,
  in the reference or here).
- `PointnetBackbone` — 3 single-scale-grouping SA layers with radii
  0.3/0.5/0.7, nsample 32 (pointnet.py:12-88).
- `FeaturePropagation` — 3-NN inverse-distance interpolation + MLP
  (pointnet2_modules.py:152-212; defined for completeness, unused by the
  three trackers, as in the reference).

All tensors are (B, N, C); masked points participate exactly as in the
reference (zeroed features, plain max-pool).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from open3dsot_tpu.models.layers import MLP
from open3dsot_tpu.ops import ball_query, furthest_point_sample, gather_points, group_points
from open3dsot_tpu.ops.interpolate import three_interpolate, three_nn
from open3dsot_tpu.ops.sa_fused import fused_sa_apply
from open3dsot_tpu.ops.sa_fused_train import fused_sa_train_apply


class MiniPointNet(nn.Module):
    per_point_mlp: Sequence[int]
    hidden_mlp: Sequence[int]
    output_size: int = 0  # <=0: no final FC
    fused_eval: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x (B, N, C) -> (B, hidden_mlp[-1] or output_size)."""
        if self.fused_eval and not train and not self.is_initializing():
            # fused per-point chain + max-pool (ops/chain_fused.py): the
            # wide intermediates never leave VMEM; the tiny per-batch
            # hidden MLP stays in XLA
            from open3dsot_tpu.ops.chain_fused import fused_pointnet_encoder

            v = self.variables
            n = len(self.per_point_mlp)
            _, x = fused_pointnet_encoder(
                x,
                [v["params"]["per_point"][f"layer{i}"] for i in range(n)],
                [v["batch_stats"]["per_point"][f"layer{i}"] for i in range(n)],
                tap_at=None, dtype=self.dtype,
            )
        else:
            x = MLP(self.per_point_mlp, dtype=self.dtype, name="per_point")(
                x, train=train)
            x = jnp.max(x, axis=1)  # global max-pool over points
        x = MLP(self.hidden_mlp, dtype=self.dtype, name="hidden")(x, train=train)
        if self.output_size > 0:
            x = nn.Dense(self.output_size, dtype=self.dtype, name="fc")(x)
        return x


class SegPointNet(nn.Module):
    per_point_mlp1: Sequence[int]
    per_point_mlp2: Sequence[int]
    output_size: int = 0
    fused_eval: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x (B, N, C) -> per-point logits (B, N, output_size)."""
        if (
            self.fused_eval
            and not train
            and not self.is_initializing()
            and self.output_size > 0
        ):
            # Two fused kernels (ops/chain_fused.py): mlp1 chain + pooled
            # max with only the layer-2 tap in HBM, then
            # concat/mlp2/head per tile. Eval only (training needs the
            # per-layer batch statistics barrier).
            from open3dsot_tpu.ops.chain_fused import (
                fused_pointnet_encoder,
                fused_seg_head,
            )

            v = self.variables
            p, st = v["params"], v["batch_stats"]
            n1, n2 = len(self.per_point_mlp1), len(self.per_point_mlp2)
            tap, pooled = fused_pointnet_encoder(
                x,
                [p[f"mlp1_{i}"]["layer0"] for i in range(n1)],
                [st[f"mlp1_{i}"]["layer0"] for i in range(n1)],
                tap_at=1, dtype=self.dtype,
            )
            return fused_seg_head(
                tap, pooled,
                [p[f"mlp2_{i}"]["layer0"] for i in range(n2)],
                [st[f"mlp2_{i}"]["layer0"] for i in range(n2)],
                p["fc"], dtype=self.dtype,
            )
        second_layer_out = None
        for i, ch in enumerate(self.per_point_mlp1):
            x = MLP([ch], dtype=self.dtype, name=f"mlp1_{i}")(x, train=train)
            if i == 1:
                second_layer_out = x
        pooled = jnp.max(x, axis=1, keepdims=True)  # (B, 1, C)
        pooled = jnp.broadcast_to(pooled, x.shape)
        x = jnp.concatenate([second_layer_out, pooled], axis=-1)
        for i, ch in enumerate(self.per_point_mlp2):
            x = MLP([ch], dtype=self.dtype, name=f"mlp2_{i}")(x, train=train)
        if self.output_size > 0:
            x = nn.Dense(self.output_size, dtype=self.dtype, name="fc")(x)
        return x


class SetAbstraction(nn.Module):
    """Single-scale-grouping SA layer.

    Centroids: FPS when use_fps else the first `npoint` points
    (pointnet2_modules.py:53-56); neighborhoods: ball query with
    pad-with-first; features: [centered xyz (optionally /radius) || grouped
    features] -> SharedMLP -> max over nsample.
    """

    mlp: Sequence[int]
    radius: float
    nsample: int
    use_xyz: bool = True
    use_fps: bool = False
    normalize_xyz: bool = False
    fused_eval: bool = False
    fused_train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        features: Optional[jnp.ndarray],
        npoint: int,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """xyz (B, N, 3), features (B, N, C) or None -> (new_xyz (B, S, 3),
        new_features (B, S, mlp[-1]), sample_idxs (B, S))."""
        B, N, _ = xyz.shape
        if self.use_fps:
            sample_idxs = furthest_point_sample(xyz, npoint)
        else:
            sample_idxs = jnp.broadcast_to(
                jnp.arange(npoint, dtype=jnp.int32)[None, :], (B, npoint)
            )
        new_xyz = gather_points(xyz, sample_idxs)  # (B, S, 3)

        if (
            self.fused_eval
            and not train
            and not self.is_initializing()
            and len(self.mlp) == 3
        ):
            # Single fused Pallas kernel: ball query + one-hot gather +
            # folded-BN MLP + neighborhood max, all in VMEM
            # (ops/sa_fused.py). Inference only — training needs grid batch
            # statistics.
            variables = self.variables
            out = fused_sa_apply(
                xyz, features, new_xyz, None,
                variables["params"]["mlp_shared"],
                variables["batch_stats"]["mlp_shared"],
                radius=self.radius,
                normalize_xyz=self.normalize_xyz,
                use_xyz=self.use_xyz,
                nsample=self.nsample,
                dtype=self.dtype,
            )
            return new_xyz, out, sample_idxs

        mlp_mod = MLP(self.mlp, dtype=self.dtype, name="mlp_shared")

        if (
            self.fused_train
            and train
            and not self.is_initializing()
            and features is not None
            and len(self.mlp) == 3
        ):
            # Fused training passes (ops/sa_fused_train.py): batch-stats ->
            # BN fold -> eval-style tiled forward, with a custom VJP doing
            # the exact BatchNorm-training chain rule. Feature-bearing
            # layers only: with no features the per-pass one-hot gather
            # dominates the small grid MLP (measured slower on SA layer 1).
            idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
            out, stats = fused_sa_train_apply(
                xyz, features, new_xyz, idx,
                self.variables["params"]["mlp_shared"],
                radius=self.radius,
                normalize_xyz=self.normalize_xyz,
                use_xyz=self.use_xyz,
                dtype=self.dtype,
            )
            # running-statistics update through the real BN modules so the
            # batch_stats collection blend is identical to the unfused path
            mlp_mod.update_batch_stats(stats)
            return new_xyz, out, sample_idxs

        idx = ball_query(self.radius, self.nsample, xyz, new_xyz)  # (B, S, K)
        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]  # (B, S, K, 3)
        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius
        if features is not None:
            grouped_feats = group_points(features, idx)  # (B, S, K, C)
            if self.use_xyz:
                grouped = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
            else:
                grouped = grouped_feats
        else:
            grouped = grouped_xyz

        out = mlp_mod(grouped, train=train)  # (B, S, K, C')
        out = jnp.max(out, axis=2)  # max over neighborhood
        return new_xyz, out, sample_idxs


class SetAbstractionMSG(nn.Module):
    """Multi-scale-grouping SA layer (PointnetSAModuleMSG,
    /root/reference/pointnet2/utils/pointnet2_modules.py:82-118).

    One shared centroid set (FPS or first-npoint, exactly like the SSG
    case); one (radius, nsample, mlp) branch per scale, each a ball-query
    grouping + SharedMLP + neighborhood max; branch outputs concatenated
    along the feature axis, so new_features is (B, S, sum(mlp[-1] per
    branch)). Unused by the three shipped trackers (the reference also only
    ever instantiates the single-scale subclass) — kept for layer-library
    completeness, unfused path only.
    """

    mlps: Sequence[Sequence[int]]
    radii: Sequence[float]
    nsamples: Sequence[int]
    use_xyz: bool = True
    use_fps: bool = False
    normalize_xyz: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        features: Optional[jnp.ndarray],
        npoint: int,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """xyz (B, N, 3), features (B, N, C) or None -> (new_xyz (B, S, 3),
        new_features (B, S, sum(mlp[-1])), sample_idxs (B, S))."""
        assert len(self.mlps) == len(self.radii) == len(self.nsamples), (
            "mlps / radii / nsamples must align (pointnet2_modules.py:104)"
        )
        B, N, _ = xyz.shape
        if self.use_fps:
            sample_idxs = furthest_point_sample(xyz, npoint)
        else:
            sample_idxs = jnp.broadcast_to(
                jnp.arange(npoint, dtype=jnp.int32)[None, :], (B, npoint)
            )
        new_xyz = gather_points(xyz, sample_idxs)  # (B, S, 3)

        outs = []
        for i, (mlp, radius, nsample) in enumerate(
            zip(self.mlps, self.radii, self.nsamples)
        ):
            idx = ball_query(radius, nsample, xyz, new_xyz)  # (B, S, K_i)
            grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
            if self.normalize_xyz:
                grouped_xyz = grouped_xyz / radius
            if features is not None:
                grouped_feats = group_points(features, idx)
                if self.use_xyz:
                    grouped = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
                else:
                    grouped = grouped_feats
            else:
                grouped = grouped_xyz
            out = MLP(mlp, dtype=self.dtype, name=f"mlp_shared_{i}")(
                grouped, train=train
            )
            outs.append(jnp.max(out, axis=2))  # (B, S, mlp[-1])
        return new_xyz, jnp.concatenate(outs, axis=-1), sample_idxs


class SetAbstractionAll(nn.Module):
    """GroupAll variant: one group containing every point
    (pointnet2_utils.py:342-385) — [xyz || features] -> SharedMLP -> max over
    all N. Kept for layer-library completeness; the three trackers never
    group-all, same as the reference.
    """

    mlp: Sequence[int]
    use_xyz: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, features: Optional[jnp.ndarray],
                 train: bool = False):
        """xyz (B, N, 3), features (B, N, C) -> (new_xyz (B, 1, 3) zeros,
        new_features (B, 1, mlp[-1]))."""
        if features is not None:
            grouped = (
                jnp.concatenate([xyz, features], axis=-1) if self.use_xyz else features
            )
        else:
            grouped = xyz
        out = MLP(self.mlp, dtype=self.dtype, name="mlp_shared")(grouped[:, None], train=train)
        out = jnp.max(out, axis=2)  # (B, 1, C')
        return jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype), out


class PointnetBackbone(nn.Module):
    """3-layer SSG PointNet++ encoder (pointnet.py:28-88).

    FPS (if enabled) only at layer 1; layers 2-3 take the first npoint
    centroids, matching the reference.
    """

    use_fps: bool = False
    normalize_xyz: bool = False
    return_intermediate: bool = False
    input_channels: int = 0
    fused_eval: bool = False
    fused_train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, pointcloud: jnp.ndarray, numpoints: Sequence[int], train: bool = False):
        """pointcloud (B, N, 3 + input_channels); numpoints: per-layer npoint."""
        xyz = pointcloud[..., 0:3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None

        specs = [
            dict(mlp=[64, 64, 128], radius=0.3, nsample=32, use_fps=self.use_fps),
            dict(mlp=[128, 128, 256], radius=0.5, nsample=32, use_fps=False),
            dict(mlp=[256, 256, 256], radius=0.7, nsample=32, use_fps=False),
        ]
        l_xyz, l_features, l_idxs = [xyz], [features], []
        for i, spec in enumerate(specs):
            li_xyz, li_features, sample_idxs = SetAbstraction(
                mlp=spec["mlp"],
                radius=spec["radius"],
                nsample=spec["nsample"],
                use_xyz=True,
                use_fps=spec["use_fps"],
                normalize_xyz=self.normalize_xyz,
                fused_eval=self.fused_eval,
                fused_train=self.fused_train,
                dtype=self.dtype,
                name=f"sa{i}",
            )(l_xyz[i], l_features[i], numpoints[i], train=train)
            l_xyz.append(li_xyz)
            l_features.append(li_features)
            l_idxs.append(sample_idxs)
        if self.return_intermediate:
            return l_xyz[1:], l_features[1:], l_idxs[0]
        return l_xyz[-1], l_features[-1], l_idxs[0]


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance feature propagation (pointnet2_modules.py:152-212)."""

    mlp: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats, train: bool = False):
        if known is not None:
            dist, idx = three_nn(unknown, known)
            dist_recip = 1.0 / (dist + 1e-8)
            norm = jnp.sum(dist_recip, axis=2, keepdims=True)
            weight = dist_recip / norm
            interpolated = three_interpolate(known_feats, idx, weight)
        else:
            interpolated = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1])
            )
        if unknown_feats is not None:
            new_features = jnp.concatenate([interpolated, unknown_feats], axis=-1)
        else:
            new_features = interpolated
        return MLP(self.mlp, dtype=self.dtype, name="mlp_shared")(new_features, train=train)
