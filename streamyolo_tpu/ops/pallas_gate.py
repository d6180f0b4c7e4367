"""Once-per-cache-dir verified gate for compiled Pallas kernels.

The Mosaic kernels are interpret-verified in CI but cannot be COMPILED
through the axon dev relay (its remote-compile helper 500s), so first
contact with a compiled kernel happens in the field. Before a kernel may
serve traffic, its selftest must compile it on the attached backend and
cross-check it bit-exact against the jnp twin; the verdict is persisted
next to the XLA compilation cache (keyed by transport + device kind, so a
relay failure does not gate the kernel off for a later directly-attached
chip of the same kind) and later processes read the marker instead of
re-running. ``tools/selftest_pallas.py`` runs the same selftests
explicitly and writes the same markers.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional, Tuple

import jax

# name -> in-process memo of the persisted/derived verdict
_VERDICTS: Dict[str, bool] = {}


def _marker_path(name: str) -> Optional[str]:
    cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir:
        return None
    kind = getattr(jax.devices()[0], "device_kind", "unknown")
    transport = os.environ.get("JAX_PLATFORMS", "") or jax.default_backend()
    return os.path.join(
        cache_dir,
        f"pallas_{name}_selftest_"
        f"{transport.replace(',', '+')}_{kind.replace(' ', '_')}.json",
    )


def kernel_verified(
    name: str,
    selftest: Callable[[], Tuple[bool, str]],
    force: bool = False,
) -> bool:
    """Return whether the compiled kernel ``name`` may serve traffic,
    running ``selftest`` (-> (ok, detail)) at most once per process and
    persisting the verdict per cache dir. ``force=True`` re-runs the
    selftest and rewrites the marker."""
    if name in _VERDICTS and not force:
        return _VERDICTS[name]

    from streamyolo_tpu.utils.logger import get_logger

    marker = _marker_path(name)
    if marker and not force and os.path.exists(marker):
        try:
            with open(marker) as f:
                _VERDICTS[name] = bool(json.load(f)["ok"])
            return _VERDICTS[name]
        except Exception:
            pass  # unreadable marker: fall through to a fresh selftest
    ok, detail = selftest()
    _VERDICTS[name] = ok
    (get_logger().info if ok else get_logger().warning)(
        "Pallas %s selftest %s: %s%s",
        name,
        "passed" if ok else "FAILED (falling back to the jnp twin)",
        detail,
        f" [verdict cached at {marker}]" if marker else "",
    )
    if marker:
        try:
            os.makedirs(os.path.dirname(marker), exist_ok=True)
            with open(marker, "w") as f:
                json.dump({"ok": ok, "detail": detail}, f)
        except OSError:
            pass
    return ok


def reset_memo(name: Optional[str] = None) -> None:
    """Drop the in-process memo (tests; markers on disk are untouched)."""
    if name is None:
        _VERDICTS.clear()
    else:
        _VERDICTS.pop(name, None)
