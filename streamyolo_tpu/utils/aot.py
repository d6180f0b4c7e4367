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


def executable_key(**parts) -> str:
    """Stable content key for a serialized executable: the caller's parts
    (shapes, thresholds, model repr hash, ...) plus everything environmental
    that invalidates a compiled artifact — jax version, backend platform,
    device kind and count. Any mismatch yields a different key, so a stale
    artifact is simply never found (load falls back to jit)."""
    import hashlib

    import jax

    devs = jax.devices()
    parts = dict(
        parts,
        jax_version=jax.__version__,
        platform=devs[0].platform,
        device_kind=devs[0].device_kind,
        n_devices=len(devs),
    )
    canon = ";".join(f"{k}={parts[k]!r}" for k in sorted(parts))
    return hashlib.sha256(canon.encode()).hexdigest()


def save_executable(compiled, path: str) -> None:
    """Persist an AOT-compiled executable (`jax.jit(...).lower().compile()`)
    to ``path`` via ``jax.experimental.serialize_executable`` — the
    TensorRT-engine-file equivalent: a device binary that loads without any
    tracing or XLA compilation. Written atomically."""
    import pickle

    from jax.experimental import serialize_executable

    payload, in_tree, out_tree = serialize_executable.serialize(compiled)
    blob = pickle.dumps((payload, in_tree, out_tree))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_executable(path: str, execution_devices=None):
    """Load an executable saved by ``save_executable``; returns the callable
    or None when the file is absent or the backend rejects the artifact
    (different topology, incompatible runtime, relay without AOT support) —
    callers fall back to ``jax.jit``.

    ``execution_devices`` must match the device count the executable was
    compiled for (``deserialize_and_load`` otherwise spreads it over ALL
    local devices — wrong for a single-chip serving program on a multi-chip
    host). Defaults to the first device, matching ``aot_compile`` of an
    unsharded program."""
    import pickle

    if not os.path.isfile(path):
        return None
    try:
        import jax
        from jax.experimental import serialize_executable

        if execution_devices is None:
            execution_devices = jax.devices()[:1]
        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.loads(f.read())
        return serialize_executable.deserialize_and_load(
            payload, in_tree, out_tree,
            execution_devices=execution_devices)
    except Exception as e:  # noqa: BLE001 — any load failure means "re-jit"
        from streamyolo_tpu.utils.logger import get_logger

        get_logger().warning("AOT executable %s failed to load (%s) — "
                             "falling back to jit", path, e)
        return None


def time_synchronized() -> float:
    """Device-synced timestamp (the ``yolox.utils.time_synchronized`` role,
    `/root/reference/exps/evaluators/onex_stream_evaluator.py:136-153`).
    JAX dispatch is async; syncing all live arrays is not expressible, so
    callers time around an explicit ``block_until_ready``/host fetch — this
    helper just wraps the monotonic clock for surface parity."""
    return time.perf_counter()
