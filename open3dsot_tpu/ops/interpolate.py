"""3-NN feature interpolation ops.

TPU-native equivalents of the reference's CUDA `three_nn` /
`three_interpolate` (+ scatter-add backward) wrapped at
pointnet2_utils.py:105-191 and consumed by the feature-propagation module
(pointnet2_modules.py:152-212). Dense top-k + gather; autodiff provides the
weighted scatter-add VJP the CUDA extension hand-codes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open3dsot_tpu.ops.neighbors import pairwise_sqdist
from open3dsot_tpu.ops.grouping import group_points


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray):
    """(B, n, 3) unknown, (B, m, 3) known -> (dists (B, n, 3), idx (B, n, 3)).

    Euclidean (sqrt) distances of the three nearest known points, ascending.
    """
    d2 = pairwise_sqdist(unknown, known)  # (B, n, m)
    neg_d2, idx = jax.lax.top_k(-d2, 3)
    dist = jnp.sqrt(jnp.maximum(-neg_d2, 0.0))
    return dist, jax.lax.stop_gradient(idx.astype(jnp.int32))


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """(B, m, C) features, (B, n, 3) idx, (B, n, 3) weight -> (B, n, C)."""
    grouped = group_points(features, idx)  # (B, n, 3, C)
    return jnp.sum(grouped * weight[..., None], axis=2)
