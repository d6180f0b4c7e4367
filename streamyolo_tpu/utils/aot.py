"""Ahead-of-time compilation for serving (the TensorRT-slot capability,
`/root/reference/tools/eval.py:179-191` — SURVEY.md §2.2).

On TPU the deployment artifact is an AOT-compiled fixed-shape XLA executable:
``jax.jit(fn).lower(*args).compile()`` plus the persistent compilation cache
(enabled here) give exactly TensorRT's role — fixed shapes, full fusion,
instant reload on later processes.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Tuple


def enable_compilation_cache(cache_dir: str = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "STREAMYOLO_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


def aot_compile(fn: Callable, *example_args, donate_argnums=()) -> Tuple[Any, float]:
    """Compile ``fn`` for the exact example shapes. Returns (compiled,
    compile_seconds); the compiled object is directly callable and skips all
    tracing/dispatch overhead on every call."""
    import jax

    t0 = time.perf_counter()
    compiled = (
        jax.jit(fn, donate_argnums=donate_argnums)
        .lower(*example_args)
        .compile()
    )
    return compiled, time.perf_counter() - t0


def time_synchronized() -> float:
    """Device-synced timestamp (the ``yolox.utils.time_synchronized`` role,
    `/root/reference/exps/evaluators/onex_stream_evaluator.py:136-153`).
    JAX dispatch is async; syncing all live arrays is not expressible, so
    callers time around an explicit ``block_until_ready``/host fetch — this
    helper just wraps the monotonic clock for surface parity."""
    return time.perf_counter()
