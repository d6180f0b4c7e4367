"""Jitted StreamYOLO train step: forward + loss + SGD update + EMA, one XLA
program.

Replaces the reference's per-iteration Python orchestration
(`/root/reference/exps/train_utils/double_trainer.py:95-131`: autocast forward,
GradScaler backward, DDP all-reduce, EMA update, host-side LR assignment) with
a single pure function. Under a data mesh the batch is sharded on axis 0 and
the gradient all-reduce is inserted by GSPMD (SURVEY.md §2.4); the LR schedule
is a jnp function of ``state.step`` so nothing touches the host. Loss scaling
is unnecessary: TPU mixed precision is bf16 (same exponent range as fp32).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from streamyolo_tpu.models.losses import streamyolo_losses
from streamyolo_tpu.train.optimizer import sgd_optimizer

EMA_DECAY = 0.9998  # `double_trainer.py:174` (ModelEMA default ramp below)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any


def create_train_state(
    variables: Dict[str, Any],
    lr_schedule: Callable,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = sgd_optimizer(lr_schedule, momentum=momentum, weight_decay=weight_decay)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            ema_params=params,
            ema_batch_stats=batch_stats,
        ),
        tx,
    )


def _ema_update(ema, new, updates):
    """yolox ``ModelEMA``: decay ramped by update count,
    d = base * (1 - exp(-updates/2000)); EMA covers params AND BN stats
    (the torch version EMAs the full float state_dict)."""
    d = EMA_DECAY * (1.0 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))
    return jax.tree_util.tree_map(lambda e, v: e * d + v.astype(e.dtype) * (1.0 - d), ema, new)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    num_classes: int,
    lr_schedule: Callable,
    strides=(8, 16, 32),
    gamma: float = 1.0,
    ignore_thr: float = 0.5,
    ignore_value: float = 1.5,
    use_l1: bool = True,
    use_tal: bool = True,
    remat: bool = False,
):
    """Build the pure train step.

    Batch contract: ``images`` [B, H, W, 6] float (current ++ support,
    raw 0..255 — the reference applies no normalization), ``labels`` and
    ``support_labels`` [B, M, 5] (cls, cx, cy, w, h) zero-padded.

    ``remat=True`` rematerializes the forward during backprop
    (``jax.checkpoint``) — trades ~30% step FLOPs for roughly halved
    activation HBM, the standard lever for growing per-chip batch at 600x960.
    """

    def apply_fn(params, batch_stats, images):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            mode="off_pipe",
            train=True,
            mutable=["batch_stats"],
        )

    if remat:
        apply_fn = jax.checkpoint(apply_fn)

    def loss_fn(params, batch_stats, batch):
        outputs, new_vars = apply_fn(params, batch_stats, batch["images"])
        losses = streamyolo_losses(
            outputs,
            batch["labels"],
            batch.get("support_labels") if use_tal else None,
            num_classes=num_classes,
            strides=strides,
            gamma=gamma,
            ignore_thr=ignore_thr,
            ignore_value=ignore_value,
            use_l1=use_l1,
            use_tal=use_tal,
        )
        return losses["total_loss"], (losses, new_vars["batch_stats"])

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
        (_, (losses, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        n_updates = state.step + 1
        new_state = state.replace(
            step=n_updates,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=_ema_update(state.ema_params, new_params, n_updates),
            ema_batch_stats=_ema_update(state.ema_batch_stats, new_bs, n_updates),
        )
        metrics = dict(losses)
        metrics["lr"] = lr_schedule(state.step)
        return new_state, metrics

    # exposed for benchmarking/bisection (tools/bench_suite.py train_parts)
    train_step.loss_fn = loss_fn
    train_step.model = model
    return train_step


def jit_train_step(train_step, mesh=None, data_axis: str = "data", donate: bool = True):
    """Jit the step with state donated; with a mesh, pin the batch sharding
    to axis 0 of the data axis and keep the state replicated.

    ``donate=False`` exists for the virtual-CPU-device test path: donation +
    multi-partition execution deadlocks XLA:CPU's collective rendezvous on
    single-core hosts (observed with the thunk runtime); on TPU donation is
    what keeps the optimizer state update in-place in HBM, so it stays the
    default.
    """
    donate_kw = dict(donate_argnums=0) if donate else {}
    if mesh is None:
        return jax.jit(train_step, **donate_kw)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(data_axis))
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        **donate_kw,
    )
