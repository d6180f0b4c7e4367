#!/usr/bin/env python3
"""Compile-and-verify the Pallas TPU kernels before they serve traffic.

The two Mosaic kernels (`ops/nms_pallas.py` VMEM greedy NMS,
`ops/preproc_pallas.py` fused 2x downsample + bf16 cast) are interpret-
verified in CI but cannot be COMPILED through the axon dev relay (its
remote-compile helper 500s on Mosaic) — so on a directly-attached TPU this
script is the first-contact check: it compiles both kernels, cross-checks
them against their jnp twins, persists both verdicts next to the XLA
compilation cache (the markers `ops/nms.py::pallas_nms_verified` and
`ops/preproc_pallas.py::pallas_preproc_verified` consult before
auto-selecting a kernel), and exits nonzero on any failure.

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
    from streamyolo_tpu.ops.preproc_pallas import (
        pallas_preproc_verified,
        run_pallas_preproc_selftest,
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

    if args.interpret:
        pre_ok, pre_detail = run_pallas_preproc_selftest(interpret=True)
    else:
        pre_ok = pallas_preproc_verified(force=True)
        pre_detail = "see log above (verdict marker written)"
    logger.info("preproc kernel: %s — %s", "OK" if pre_ok else "FAIL", pre_detail)
    failed |= not pre_ok

    print(f"pallas selftest: NMS {'OK' if nms_ok else 'FAIL'}, "
          f"preproc {'OK' if pre_ok else 'FAIL'} "
          f"({'interpret' if args.interpret else 'compiled'}, {backend}/{kind})")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
