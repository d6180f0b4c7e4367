"""Child process for the AOT-serving tests (test_stream_detector.py).

A FRESH serving process — the scenario the AOT artifacts exist for — loads
the serialized star/steady executables with ``jax.jit`` poisoned and verifies
its detections bit-match the parent's jit-path reference. Run in a separate
interpreter on purpose: in a process that has already compiled many XLA:CPU
programs, a deserialized executable can fail AT EXECUTION with a
"Buffer Definition Event: Function ... not found" symbol-registry collision
(the detector's construction probe catches that and re-jits — correct for
production, but it would turn the no-tracing assertion into a flake).

Argv: work_dir. Expects under work_dir:
  setup.pkl   — {"mode": "single"|"multi", "variables", "depth", "width",
                 "detector_kwargs", "n_streams", "reset_stream_at"}
  frames.npz  — frame_0..frame_{n-1}: single: uint8 HWC; multi: uint8 NHWC
  want.npz    — boxes_i / scores_i / labels_i (single) or
                boxes_i_j / ... per frame i stream j (multi); the parent's
                jit-path outputs
Prints "CHILD_OK" and exits 0 on success. The parent must spawn this with
the SAME XLA_FLAGS device count it runs under — the executable key includes
n_devices, so a mismatch is a key miss (=> jit fallback => poison trips).
"""

import os
import pickle
import sys


def main() -> int:
    work = sys.argv[1]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import numpy as np

    # Import/build everything BEFORE poisoning jax.jit: module imports
    # legitimately jit (e.g. ops/nms.py decorates postprocess_fixed at
    # import); the assertion is about detector CONSTRUCTION and first calls.
    from streamyolo_tpu.exp import get_exp
    from streamyolo_tpu.stream import MultiStreamDetector, TPUStreamDetector

    with open(os.path.join(work, "setup.pkl"), "rb") as f:
        setup = pickle.load(f)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exp = get_exp(os.path.join(repo, "cfgs", "s_s50_onex_dfp_tal_flip.py"))
    exp.depth, exp.width = setup["depth"], setup["width"]
    model = exp.get_model()

    frames_npz = np.load(os.path.join(work, "frames.npz"))
    want_npz = np.load(os.path.join(work, "want.npz"))
    n = len(frames_npz.files)
    mode = setup.get("mode", "single")

    real_jit = jax.jit

    def poisoned_jit(*a, **k):
        raise AssertionError("AOT detector construction must not trace/jit")

    jax.jit = poisoned_jit
    try:
        if mode == "single":
            det = TPUStreamDetector(
                model, setup["variables"], **setup["detector_kwargs"])
            assert det.aot_loaded, "serialized executables did not load cold"
            for i in range(n):
                boxes, scores, labels, mask = det(frames_npz[f"frame_{i}"])
                assert mask is None
                np.testing.assert_array_equal(boxes, want_npz[f"boxes_{i}"])
                np.testing.assert_array_equal(scores, want_npz[f"scores_{i}"])
                np.testing.assert_array_equal(labels, want_npz[f"labels_{i}"])
        else:
            det = MultiStreamDetector(
                model, setup["variables"], n_streams=setup["n_streams"],
                **setup["detector_kwargs"])
            assert det.aot_loaded, "serialized executables did not load cold"
            for i in range(n):
                if i == setup.get("reset_stream_at", (None, None))[0]:
                    det.reset(setup["reset_stream_at"][1])
                outs = det(frames_npz[f"frame_{i}"], preprocessed=True)
                for j, (boxes, scores, labels, _) in enumerate(outs):
                    np.testing.assert_array_equal(
                        boxes, want_npz[f"boxes_{i}_{j}"])
                    np.testing.assert_array_equal(
                        scores, want_npz[f"scores_{i}_{j}"])
                    np.testing.assert_array_equal(
                        labels, want_npz[f"labels_{i}_{j}"])
    finally:
        jax.jit = real_jit

    print("CHILD_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
