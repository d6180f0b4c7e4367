"""LR schedules mirroring yolox ``LRScheduler`` (consumed by the reference
trainer at `/root/reference/exps/train_utils/double_trainer.py:152,119`).

The shipped configs use the base Exp defaults: scheduler ``yoloxwarmcos``,
``warmup_epochs=1``, ``warmup_lr_start=0``, ``min_lr_ratio=0.05``, and
``no_aug_epochs = max_epoch = 15`` — so the cosine segment is empty and the
schedule is: quadratic warmup to ``lr`` over epoch 1, then a constant
``min_lr = 0.05 * lr`` (a quirk of the reference recipe we reproduce exactly).

All schedules are pure jnp functions of the iteration index so they fold into
the jitted train step (no per-iter host LR assignment like torch).
"""

from __future__ import annotations

import jax.numpy as jnp


def yolox_warm_cos_lr(
    lr: float,
    min_lr_ratio: float,
    total_iters: int,
    warmup_total_iters: int,
    warmup_lr_start: float,
    no_aug_iters: int,
):
    """Returns ``schedule(step) -> lr`` (yolox lr_scheduler 'yoloxwarmcos')."""
    min_lr = lr * min_lr_ratio
    cos_span = max(total_iters - warmup_total_iters - no_aug_iters, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (lr - warmup_lr_start) * (
            step / max(warmup_total_iters, 1)
        ) ** 2 + warmup_lr_start
        cos = min_lr + 0.5 * (lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * (step - warmup_total_iters) / cos_span)
        )
        out = jnp.where(step >= total_iters - no_aug_iters, min_lr, cos)
        return jnp.where(step <= warmup_total_iters, warm, out)

    return schedule


def build_lr_schedule(
    scheduler: str,
    lr: float,
    iters_per_epoch: int,
    max_epoch: int,
    warmup_epochs: float = 1.0,
    warmup_lr_start: float = 0.0,
    min_lr_ratio: float = 0.05,
    no_aug_epochs: int = 0,
):
    """Factory matching ``yolox.utils.LRScheduler`` names used by Exp."""
    total = iters_per_epoch * max_epoch
    if scheduler == "yoloxwarmcos":
        return yolox_warm_cos_lr(
            lr,
            min_lr_ratio,
            total,
            int(iters_per_epoch * warmup_epochs),
            warmup_lr_start,
            int(iters_per_epoch * no_aug_epochs),
        )
    if scheduler == "warmcos":
        return yolox_warm_cos_lr(
            lr,
            min_lr_ratio,
            total,
            int(iters_per_epoch * warmup_epochs),
            warmup_lr_start,
            0,
        )
    if scheduler == "constant":
        return lambda step: jnp.full((), lr, jnp.float32)
    raise ValueError(f"Unknown scheduler: {scheduler}")
