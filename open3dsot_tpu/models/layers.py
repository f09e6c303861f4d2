"""Shared flax building blocks.

TPU-native counterparts of the reference's `pytorch_utils` sugar
(/root/reference/pointnet2/utils/pytorch_utils.py): every "1x1 conv over
(B, C, N)" becomes a Dense over the channels-last layout (B, N, C) — a
batched matmul XLA maps straight onto the MXU — and SharedMLP over
(B, npoint, nsample, C) grids is the same Dense broadcast over two leading
axes. BatchNorm matches torch defaults (momentum 0.1 -> flax 0.9, eps 1e-5)
for checkpoint-import fidelity.

Mixed precision: `dtype=jnp.bfloat16` runs the matmuls/activations in bf16 on
the MXU while parameters and BatchNorm running statistics stay float32
(flax's param_dtype default; flax normalization computes batch statistics in
float32 regardless of dtype).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class DenseBNRelu(nn.Module):
    """Dense -> BatchNorm -> ReLU over the last axis (any leading shape)."""

    features: int
    bn: bool = True
    activation: bool = True
    dtype: Any = None  # computation dtype; None = float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.features, kernel_init=nn.initializers.kaiming_normal(),
                     dtype=self.dtype, name="dense")(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn"
            )(x)
        if self.activation:
            x = nn.relu(x)
        return x


class MLP(nn.Module):
    """Stack of Dense+BN+ReLU layers; `final_plain` makes the last layer a
    bare Dense (no bn / activation), matching the reference's
    `Seq(...).conv1d(out, activation=None)` heads. With `final_plain=False`
    this is pt_utils.SharedMLP (pytorch_utils.py:12-37)."""

    channels: Sequence[int]
    final_plain: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n = len(self.channels)
        for i, ch in enumerate(self.channels):
            plain = self.final_plain and i == n - 1
            x = DenseBNRelu(
                ch, bn=not plain, activation=not plain, dtype=self.dtype,
                name=f"layer{i}"
            )(x, train=train)
        return x
