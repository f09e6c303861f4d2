"""BatchNorm momentum scheduling.

Equivalent of pt_utils.BNMomentumScheduler (reference
pointnet2/utils/pytorch_utils.py:272-297) — the torch version mutates live
modules; in flax BN momentum is a static module attribute, so instead the
train step RE-BLENDS the running statistics after the forward:

    flax BN computed   S1 = M0*S0 + (1-M0)*mu        (M0 = 0.9 baked in)
    we recover         mu = (S1 - M0*S0) / (1-M0)
    and re-blend       S' = m*S0 + (1-m)*mu          (m = scheduled, dynamic)

`reblend_batch_stats` does this as a pytree map inside the jitted step with
the scheduled momentum as a runtime scalar — no recompile per epoch, exact
same statistics a natively-scheduled BN would produce. The trainer applies
it when `config.bn_decay_step` is set; like the reference, the shipped
training recipes do not schedule BN momentum by default.

Torch momentum m corresponds to flax momentum (1 - m); `torch_momentum`
values here use the torch convention like the reference scheduler.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

_FLAX_BASE_MOMENTUM = 0.9  # models/layers.py DenseBNRelu BatchNorm momentum


def reblend_batch_stats(old_stats, new_stats, flax_momentum):
    """Re-blend flax BN running stats as if momentum had been `flax_momentum`.

    old_stats/new_stats: batch_stats pytrees before/after the forward;
    flax_momentum: scalar (may be a traced jnp value). Returns the pytree of
    re-blended statistics.
    """
    m0 = _FLAX_BASE_MOMENTUM

    def blend(old, new):
        mu = (new - m0 * old) / (1.0 - m0)
        return flax_momentum * old + (1.0 - flax_momentum) * mu

    return jax.tree_util.tree_map(blend, old_stats, new_stats)


def bn_momentum_schedule(initial: float = 0.1, decay: float = 0.5,
                         step_size: int = 20, floor: float = 0.01) -> Callable[[int], float]:
    """Torch-convention momentum(epoch) = max(initial * decay^(epoch//step), floor)."""

    def schedule(epoch: int) -> float:
        return max(initial * (decay ** (epoch // step_size)), floor)

    return schedule


def to_flax_momentum(torch_momentum: float) -> float:
    return 1.0 - torch_momentum
