"""Index gather/group ops.

TPU-native equivalents of the reference's CUDA `gather_points` and
`group_points` (+ hand-written scatter-add backward kernels,
pointnet2_utils.py:68-102, 194-242). On TPU these are plain XLA gathers
(`take_along_axis`); JAX autodiff derives the scatter-add VJPs that the CUDA
extension hand-implements, so no custom backward is needed.

Layout note: the reference is channels-first (B, C, N); this framework is
channels-last (B, N, C) so that per-point feature transforms hit the MXU with
C on the lane dimension.
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) features, (B, S) indices -> (B, S, C)."""
    return jnp.take_along_axis(features, idx[..., None].astype(jnp.int32), axis=1)


def group_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) features, (B, S, K) indices -> (B, S, K, C)."""
    B, N, C = features.shape
    _, S, K = idx.shape
    flat = jnp.take_along_axis(
        features, idx.reshape(B, S * K, 1).astype(jnp.int32), axis=1
    )
    return flat.reshape(B, S, K, C)
