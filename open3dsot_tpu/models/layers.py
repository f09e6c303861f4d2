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
    """Dense -> BatchNorm -> ReLU over the last axis (any leading shape).

    setup-style (not nn.compact) so fused training kernels can register the
    BatchNorm running-statistics update without running the grid through the
    module (`update_batch_stats`); the variable tree is unchanged
    ('dense' / 'bn' child names are explicit).
    """

    features: int
    bn: bool = True
    activation: bool = True
    dtype: Any = None  # computation dtype; None = float32

    def setup(self):
        self.dense = nn.Dense(
            self.features, kernel_init=nn.initializers.kaiming_normal(),
            dtype=self.dtype, name="dense",
        )
        if self.bn:
            self.norm = nn.BatchNorm(
                momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn",
            )

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self.dense(x)
        if self.bn:
            x = self.norm(x, use_running_average=not train)
        if self.activation:
            x = nn.relu(x)
        return x

    def update_batch_stats(self, mean: jnp.ndarray, var: jnp.ndarray) -> None:
        """Register a running-statistics update for externally computed batch
        statistics (ops/sa_fused_train.py): feed the BatchNorm a crafted
        2-sample input [mean+sqrt(var), mean-sqrt(var)] whose batch mean /
        biased variance equal (mean, var) exactly, so flax performs the
        identical `ra = m*ra + (1-m)*batch` blend as the unfused path. The
        normalized output is discarded."""
        delta = jnp.sqrt(jnp.maximum(var.astype(jnp.float32), 0.0))
        mean = mean.astype(jnp.float32)
        crafted = jnp.stack([mean + delta, mean - delta], axis=0)  # (2, C)
        self.norm(crafted, use_running_average=False)


class MLP(nn.Module):
    """Stack of Dense+BN+ReLU layers; `final_plain` makes the last layer a
    bare Dense (no bn / activation), matching the reference's
    `Seq(...).conv1d(out, activation=None)` heads. With `final_plain=False`
    this is pt_utils.SharedMLP (pytorch_utils.py:12-37)."""

    channels: Sequence[int]
    final_plain: bool = False
    dtype: Any = None

    def setup(self):
        n = len(self.channels)
        self.layers = [
            DenseBNRelu(
                ch,
                bn=not (self.final_plain and i == n - 1),
                activation=not (self.final_plain and i == n - 1),
                dtype=self.dtype,
                name=f"layer{i}",
            )
            for i, ch in enumerate(self.channels)
        ]

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for layer in self.layers:
            x = layer(x, train=train)
        return x

    def update_batch_stats(self, stats: dict) -> None:
        """stats: {'layer{i}': (batch_mean, batch_var)} from a fused kernel."""
        for i, layer in enumerate(self.layers):
            mean, var = stats[f"layer{i}"]
            layer.update_batch_stats(mean, var)
