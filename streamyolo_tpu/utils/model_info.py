"""Model cost summary: params + GFLOPs (the ``yolox.utils.get_model_info``
capability, consumed at `/root/reference/tools/eval.py:149`).

GFLOPs come from XLA's own cost analysis of the compiled forward
(`jax.jit(...).lower().compile().cost_analysis()`), which is exact for the
program actually run — the reference instead duplicates a 3-channel input
through the DFP for thop profiling (`exps/model/dfp_pafpn.py:234-243`); that
3-channel duplicate path exists in our DFPPAFPN too for parity.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def count_params(variables) -> int:
    import jax

    return sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables["params"])
    )


def get_model_info(model, variables, tsize: Tuple[int, int]) -> str:
    """'Params: {:.2f}M, Gflops: {:.2f}' for a 3-channel input of size
    ``tsize`` (h, w) — the reference's stride-adjusted convention."""
    import jax

    h, w = tsize
    dummy = np.zeros((1, h, w, 3), np.float32)

    def fwd(v, x):
        return model.apply(v, x, mode="off_pipe", train=False)

    compiled = jax.jit(fwd).lower(variables, dummy).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # older jax returns one dict per device
        analysis = analysis[0]
    flops = float(analysis.get("flops", 0.0))
    params_m = count_params(variables) / 1e6
    return f"Params: {params_m:.2f}M, Gflops: {flops / 1e9:.2f}"


def profile_trace(log_dir: str):
    """Context manager capturing a ``jax.profiler`` device trace (the
    tracing capability slot from SURVEY.md §5.1; view with TensorBoard)."""
    import jax

    return jax.profiler.trace(log_dir)
