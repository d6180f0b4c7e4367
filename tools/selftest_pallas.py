#!/usr/bin/env python3
"""Compile-and-verify the Pallas TPU kernels before they serve traffic.

The two Mosaic kernels (`ops/nms_pallas.py` VMEM greedy NMS,
`ops/preproc_pallas.py` fused 2x downsample + bf16 cast) are interpret-
verified in CI but cannot be COMPILED through the axon dev relay (its
remote-compile helper 500s on Mosaic) — so on a directly-attached TPU this
script is the first-contact check: it compiles both kernels, cross-checks
them against their jnp twins, persists the NMS verdict next to the XLA
compilation cache (the marker `ops/nms.py::pallas_nms_verified` consults
before auto-selecting the kernel), and exits nonzero on any failure.

    python tools/selftest_pallas.py [--interpret]

``--interpret`` runs the kernels in interpret mode instead (works on any
backend; useful to sanity-check the harness itself, but does NOT count as
compiled verification and does not write the marker).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))


def check_preproc(interpret: bool):
    """Compiled fused downsample vs the jnp oracle (and the documented cv2
    INTER_LINEAR semantics) on random uint8 frames."""
    import numpy as np

    try:
        import jax.numpy as jnp

        from streamyolo_tpu.ops.preproc_pallas import (
            downsample2x_bilinear,
            downsample2x_reference,
        )

        rng = np.random.RandomState(0)
        for h, w in ((64, 96), (1200, 1920)):
            frame = rng.randint(0, 256, (h, w, 3), np.uint8)
            got = np.asarray(
                downsample2x_bilinear(
                    frame, out_dtype=jnp.float32, interpret=interpret
                )
            )
            want = np.asarray(downsample2x_reference(frame)).astype(np.float32)
            if not np.array_equal(got, want):
                return False, (
                    f"downsample mismatch at {h}x{w}: max abs diff "
                    f"{np.abs(got - want).max():.4g}"
                )
        return True, "64x96 + 1200x1920 frames bit-exact vs the jnp oracle"
    except Exception as e:
        return False, f"{type(e).__name__}: {e}"


def main():
    parser = argparse.ArgumentParser("Pallas kernel selftest")
    parser.add_argument("--interpret", action="store_true",
                        help="interpret mode (any backend; no marker written)")
    args = parser.parse_args()

    import jax

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.realpath(__file__))), ".jax_cache"),
        )
    from streamyolo_tpu.ops.nms import (
        pallas_nms_verified,
        run_pallas_nms_selftest,
    )
    from streamyolo_tpu.utils.logger import get_logger

    logger = get_logger()
    backend = jax.default_backend()
    kind = getattr(jax.devices()[0], "device_kind", "?")
    logger.info("backend=%s device=%s interpret=%s", backend, kind, args.interpret)
    if backend != "tpu" and not args.interpret:
        logger.warning(
            "no TPU attached — compiled Mosaic kernels need one; rerun with "
            "--interpret for a harness sanity check"
        )

    failed = False
    if args.interpret:
        nms_ok, nms_detail = run_pallas_nms_selftest(interpret=True)
    else:
        # compiled path: runs the selftest AND persists the verdict marker
        # that gates auto-selection in postprocess_fixed
        nms_ok = pallas_nms_verified(force=True)
        nms_detail = "see log above (verdict marker written)"
    logger.info("NMS kernel: %s — %s", "OK" if nms_ok else "FAIL", nms_detail)
    failed |= not nms_ok

    pre_ok, pre_detail = check_preproc(interpret=args.interpret)
    logger.info("preproc kernel: %s — %s", "OK" if pre_ok else "FAIL", pre_detail)
    failed |= not pre_ok

    print(f"pallas selftest: NMS {'OK' if nms_ok else 'FAIL'}, "
          f"preproc {'OK' if pre_ok else 'FAIL'} "
          f"({'interpret' if args.interpret else 'compiled'}, {backend}/{kind})")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
