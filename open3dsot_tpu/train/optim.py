"""Optimizer / LR schedule construction.

Mirrors the reference's configure_optimizers
(/root/reference/models/base_model.py:28-36): SGD(momentum=0.9, wd) or
Adam(betas=(0.5, 0.999), eps=1e-6, wd) with a StepLR epoch schedule
(lr * gamma^(epoch // step)). Torch's *coupled* weight decay (grad += wd*p
before the update) maps to optax.add_decayed_weights placed before the
moment-scaling transform. gradient_clip_val>0 maps to clip_by_global_norm,
matching Lightning's Trainer arg (main.py:85).
"""

from __future__ import annotations

import optax


def steplr_schedule(base_lr: float, steps_per_epoch: int, decay_step: int, decay_rate: float):
    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return base_lr * (decay_rate ** (epoch // decay_step))

    return schedule


def make_optimizer(config, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = steplr_schedule(
        config.lr, steps_per_epoch, config.lr_decay_step, config.lr_decay_rate
    )
    parts = []
    clip = getattr(config, "gradient_clip_val", 0.0) or 0.0
    if clip > 0:
        parts.append(optax.clip_by_global_norm(clip))
    wd = getattr(config, "wd", 0.0) or 0.0
    if wd > 0:
        parts.append(optax.add_decayed_weights(wd))
    if config.optimizer.lower() == "sgd":
        parts.append(optax.trace(decay=0.9, nesterov=False))
    else:
        parts.append(optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-6))
    parts.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*parts)
