"""Child process for the AOT-serving tests (test_stream_detector.py).

Two phases, each run in its OWN fresh interpreter — the shapes production
actually has (`tools/precompile.py --serve` is a dedicated process, and so is
the serving process that loads the artifacts):

  export — build the model, serialize the star/steady executables into
           work_dir, run the jit-path reference detector over the frames and
           save its detections as want.npz.
  serve  — load the executables with ``jax.jit`` poisoned (must not trace),
           run the same frames, bit-compare against want.npz.

Process freshness matters in BOTH directions on XLA:CPU: a process that has
already compiled many programs can (a) fail a deserialized executable at
execution with a "Buffer Definition Event: Function ... not found"
symbol-registry collision, and (b) EXPORT artifacts whose embedded LLVM
target features (+prefer-no-scatter/+prefer-no-gather were observed) a clean
process refuses to run. The detectors' construction probe turns both into a
loud jit fallback — correct for production, but it would make an in-process
no-tracing assertion flaky.

Argv: work_dir phase. Expects under work_dir:
  setup.pkl   — {"mode": "single"|"multi", "variables", "depth", "width",
                 "export_kwargs", "detector_kwargs", "n_streams",
                 "reset_stream_at"}
  frames.npz  — frame_0..frame_{n-1}: single: uint8 HWC; multi: uint8 NHWC
Prints "CHILD_OK" and exits 0 on success. The parent must spawn this with
the SAME XLA_FLAGS device count it runs under — the executable key includes
n_devices, so a mismatch is a key miss (=> jit fallback => poison trips).
"""

import os
import pickle
import sys


def main() -> int:
    work, phase = sys.argv[1], sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import numpy as np

    from streamyolo_tpu.exp import get_exp
    from streamyolo_tpu.stream import (
        MultiStreamDetector,
        TPUStreamDetector,
        export_multi_stream_executables,
        export_stream_executables,
    )

    with open(os.path.join(work, "setup.pkl"), "rb") as f:
        setup = pickle.load(f)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exp = get_exp(os.path.join(repo, "cfgs", "s_s50_onex_dfp_tal_flip.py"))
    exp.depth, exp.width = setup["depth"], setup["width"]
    model = exp.get_model()

    frames_npz = np.load(os.path.join(work, "frames.npz"))
    n = len(frames_npz.files)
    mode = setup.get("mode", "single")
    reset_at = setup.get("reset_stream_at", (None, None))

    if phase == "export":
        want = {}
        if mode == "single":
            export_stream_executables(
                model, setup["variables"], work, **setup["export_kwargs"])
            ref = TPUStreamDetector(
                model, setup["variables"],
                **{k: v for k, v in setup["detector_kwargs"].items()
                   if k != "aot_dir"})
            for i in range(n):
                boxes, scores, labels, _ = ref(frames_npz[f"frame_{i}"])
                want.update({f"boxes_{i}": boxes, f"scores_{i}": scores,
                             f"labels_{i}": labels})
        else:
            export_multi_stream_executables(
                model, setup["variables"], work, n_streams=setup["n_streams"],
                **setup["export_kwargs"])
            ref = MultiStreamDetector(
                model, setup["variables"], n_streams=setup["n_streams"],
                **{k: v for k, v in setup["detector_kwargs"].items()
                   if k != "aot_dir"})
            for i in range(n):
                if i == reset_at[0]:
                    ref.reset(reset_at[1])
                outs = ref(frames_npz[f"frame_{i}"], preprocessed=True)
                for j, (boxes, scores, labels, _) in enumerate(outs):
                    want.update({f"boxes_{i}_{j}": boxes,
                                 f"scores_{i}_{j}": scores,
                                 f"labels_{i}_{j}": labels})
        np.savez(os.path.join(work, "want.npz"), **want)
        print("CHILD_OK")
        return 0

    assert phase == "serve", phase
    want_npz = np.load(os.path.join(work, "want.npz"))
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
                if i == reset_at[0]:
                    det.reset(reset_at[1])
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
