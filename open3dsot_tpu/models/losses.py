"""Loss primitives with torch-parity semantics.

The reference leans on F.smooth_l1_loss / F.cross_entropy /
F.binary_cross_entropy_with_logits defaults; numerical parity of reductions
and weight normalization matters for reproducing training dynamics, so each
helper documents the exact torch behavior it mirrors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (huber), torch default beta=1.0."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def cross_entropy_logits(
    logits: jnp.ndarray, labels: jnp.ndarray, weight=None
) -> jnp.ndarray:
    """torch F.cross_entropy with optional class weights.

    logits (..., C), labels (...) int. Reduction 'mean' with weights divides
    by the sum of the selected per-sample weights (torch semantics), not the
    sample count.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if weight is not None:
        w = jnp.asarray(weight)[labels]
        return jnp.sum(nll * w) / (jnp.sum(w) + 1e-12)
    return jnp.mean(nll)


def bce_with_logits(
    logits: jnp.ndarray, targets: jnp.ndarray, pos_weight=None, reduction: str = "mean"
) -> jnp.ndarray:
    """torch F.binary_cross_entropy_with_logits.

    loss = max(x,0) - x*t + (1 + (pw-1)*t) * log(1+exp(-|x|)) using the
    numerically-stable form; pos_weight multiplies the positive term.
    """
    log_sig = jax.nn.log_sigmoid(logits)
    log_sig_neg = jax.nn.log_sigmoid(-logits)
    if pos_weight is not None:
        loss = -(pos_weight * targets * log_sig + (1.0 - targets) * log_sig_neg)
    else:
        loss = -(targets * log_sig + (1.0 - targets) * log_sig_neg)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(reduction)
