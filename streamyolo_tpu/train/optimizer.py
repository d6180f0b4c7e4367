"""SGD optimizer with yolox param-group semantics, built on optax.

The reference's (inherited) ``Exp.get_optimizer`` builds torch SGD with
momentum 0.9 + nesterov and THREE param groups: BN affine weights (no decay),
conv/linear weights (weight_decay=5e-4), biases (no decay). Torch couples the
decay (grad += wd * p) *before* the momentum buffer — reproduced here by
placing ``add_decayed_weights`` before ``trace`` in the chain.
"""

from __future__ import annotations

from typing import Callable, Union

import optax


def _decay_mask(params):
    """True (apply weight decay) only for conv/dense kernels. In our flax
    tree BN affine scale is named ``scale``, biases ``bias``, conv kernels
    ``kernel`` — exactly the torch pg1 group."""
    import jax

    return jax.tree_util.tree_map_with_path(
        lambda path, _: path[-1].key == "kernel", params
    )


def sgd_optimizer(
    learning_rate: Union[float, Callable],
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    nesterov: bool = True,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=_decay_mask),
        optax.trace(decay=momentum, nesterov=nesterov),
        optax.scale_by_learning_rate(learning_rate),
    )
