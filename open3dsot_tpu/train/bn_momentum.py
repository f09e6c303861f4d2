"""BatchNorm momentum scheduling.

Equivalent of pt_utils.BNMomentumScheduler (reference
pointnet2/utils/pytorch_utils.py:272-297) — defined for API completeness;
like the reference, the shipped training recipes do not schedule BN momentum.

In flax, BN momentum is a module attribute, so scheduling it means rebuilding
the net with a new value (parameters are untouched; the train step recompiles
once per change, and the schedule is stepwise so changes are rare).

Torch momentum m corresponds to flax momentum (1 - m); `torch_momentum`
values here use the torch convention like the reference scheduler.
"""

from __future__ import annotations

from typing import Callable


def bn_momentum_schedule(initial: float = 0.1, decay: float = 0.5,
                         step_size: int = 20, floor: float = 0.01) -> Callable[[int], float]:
    """Torch-convention momentum(epoch) = max(initial * decay^(epoch//step), floor)."""

    def schedule(epoch: int) -> float:
        return max(initial * (decay ** (epoch // step_size)), floor)

    return schedule


def to_flax_momentum(torch_momentum: float) -> float:
    return 1.0 - torch_momentum
