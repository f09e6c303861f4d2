"""Template-search cross-correlation heads (flax, channels-last).

TPU-native rebuilds of /root/reference/models/head/xcorr.py:
- `P2BXCorr`     — dense cosine-similarity (B, M, N) grid, augmented with
  broadcast template xyz+features, SharedMLP over the grid, max over the
  template axis (xcorr.py:20-53). The similarity matrix and the grid MLP are
  batched matmuls that map directly onto the MXU.
- `BoxAwareXCorr`— k-NN in BoxCloud space (cdist+argsort -> our dense
  `knn`), gathers template xyz|bc|feature per search point, SharedMLP + max
  over k (xcorr.py:56-103).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from open3dsot_tpu.models.layers import MLP
from open3dsot_tpu.ops import group_points, knn

_HI = jax.lax.Precision.HIGHEST


class P2BXCorr(nn.Module):
    hidden_channel: int
    out_channel: int
    dtype: Any = None

    @nn.compact
    def __call__(self, template_feature, search_feature, template_xyz, train: bool = False):
        """(B, M, f), (B, N, f), (B, M, 3) -> (B, N, out_channel)."""
        B, M, f = template_feature.shape
        N = search_feature.shape[1]
        # cosine similarity across the feature axis
        t_norm = template_feature / (
            jnp.linalg.norm(template_feature, axis=-1, keepdims=True) + 1e-8
        )
        s_norm = search_feature / (
            jnp.linalg.norm(search_feature, axis=-1, keepdims=True) + 1e-8
        )
        sim = jnp.einsum("bmf,bnf->bmn", t_norm, s_norm, precision=_HI)  # (B, M, N)

        fusion = jnp.concatenate(
            [
                sim[..., None],  # (B, M, N, 1)
                jnp.broadcast_to(template_xyz[:, :, None, :], (B, M, N, 3)),
                jnp.broadcast_to(template_feature[:, :, None, :], (B, M, N, f)),
            ],
            axis=-1,
        )  # (B, M, N, 4+f)
        h = self.hidden_channel
        fusion = MLP([h, h, h], dtype=self.dtype, name="mlp")(fusion, train=train)
        fusion = jnp.max(fusion, axis=1)  # max over template dim -> (B, N, h)
        return MLP([h, self.out_channel], final_plain=True, dtype=self.dtype,
                   name="fea_layer")(fusion, train=train)


class BoxAwareXCorr(nn.Module):
    hidden_channel: int
    out_channel: int
    k: int = 4
    use_search_bc: bool = False
    use_search_feature: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        template_feature,
        search_feature,
        template_xyz,
        search_xyz=None,
        template_bc=None,
        search_bc=None,
        train: bool = False,
    ):
        """(B, M, f), (B, N, f), (B, M, 3), (B, N, 3), (B, M, 9), (B, N, 9)
        -> (B, N, out_channel)."""
        # k nearest template points per search point, in BoxCloud space
        idx = knn(search_bc, template_bc, self.k)  # (B, N, k)
        template_xfb = jnp.concatenate(
            [template_xyz, template_bc, template_feature], axis=-1
        )  # (B, M, 3+9+f)
        corr = group_points(template_xfb, idx)  # (B, N, k, 3+9+f)
        if self.use_search_bc:
            sb = jnp.broadcast_to(
                search_bc[:, :, None, :], corr.shape[:3] + (search_bc.shape[-1],)
            )
            corr = jnp.concatenate([sb, corr], axis=-1)
        if self.use_search_feature:
            sf = jnp.broadcast_to(
                search_feature[:, :, None, :], corr.shape[:3] + (search_feature.shape[-1],)
            )
            corr = jnp.concatenate([sf, corr], axis=-1)
        h = self.hidden_channel
        fusion = MLP([h, h, h], dtype=self.dtype, name="mlp")(corr, train=train)
        fusion = jnp.max(fusion, axis=2)  # max over k -> (B, N, h)
        return MLP([h, self.out_channel], final_plain=True, dtype=self.dtype,
                   name="fea_layer")(fusion, train=train)
