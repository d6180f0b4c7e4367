"""TPUStreamDetector + stream_det CLI paths on the CPU backend: the real
model drives the streaming protocol end-to-end (tiny net, fake clock)."""

import os
import pickle
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")

from tests.conftest import FAKE_H, FAKE_W

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def tiny_model():
    from streamyolo_tpu.exp import get_exp

    exp = get_exp(os.path.join(REPO, "cfgs", "s_s50_onex_dfp_tal_flip.py"))
    exp.depth, exp.width = 0.33, 0.25
    model = exp.get_model()
    variables = exp.init_model(model)
    return model, variables


def _make_detector(tiny_model, **kw):
    from streamyolo_tpu.stream import TPUStreamDetector

    model, variables = tiny_model
    return TPUStreamDetector(
        model, variables, input_size=(FAKE_H // 2, FAKE_W // 2), in_scale=0.5,
        conf_thre=0.05, nms_thre=0.5, num_classes=8, pre_nms_topk=32,
        use_bf16=False,  # CPU test backend
        **kw,
    )


@pytest.fixture(scope="module")
def tiny_detector(tiny_model):
    return _make_detector(tiny_model)


def test_use_bf16_with_fp32_model_warns(tiny_model, caplog):
    """use_bf16=True casts only the input; fp32-built flax modules promote
    straight back and the trunk silently runs fp32 (~20x slower on TPU) —
    the detector must warn so the CLI-level fix (build the model bf16,
    exp.compute_dtype='bfloat16') is discoverable. The streaming CLIs
    (stream_det/offline_det/sap_rehearsal) set it by default."""
    import logging

    from streamyolo_tpu.stream import TPUStreamDetector

    model, variables = tiny_model
    with caplog.at_level(logging.WARNING, logger="streamyolo_tpu"):
        TPUStreamDetector(
            model, variables, input_size=(FAKE_H // 2, FAKE_W // 2),
            in_scale=0.5, conf_thre=0.05, nms_thre=0.5, num_classes=8,
            pre_nms_topk=32, use_bf16=True)
    assert any("built fp32" in r.message for r in caplog.records)


def test_tpu_stream_detector_contract(tiny_detector):
    det = tiny_detector
    det.warmup(2)
    frame = np.random.RandomState(0).randint(0, 255, (FAKE_H, FAKE_W, 3), np.uint8)
    bboxes, scores, labels, masks = det(frame)
    assert masks is None
    assert bboxes.shape[1] == 4 if len(bboxes) else True
    assert len(bboxes) == len(scores) == len(labels)
    # buffer carried: second call uses the 'buffer' node
    assert det._buffer is not None
    det(frame)
    det.reset()
    assert det._buffer is None


def test_device_preproc_matches_host_path(tiny_model, tiny_detector):
    """device_preproc=True (raw 2x frame in, 0.5x resize on device with the
    cv2-parity floor(x+0.5) round) produces bit-identical detections to the
    host cv2.resize path on the same source frame."""
    host = tiny_detector
    dev = _make_detector(tiny_model, device_preproc=True)
    frame = np.random.RandomState(1).randint(0, 255, (FAKE_H, FAKE_W, 3), np.uint8)

    host.reset()
    dev.reset()
    for _ in range(2):  # star node, then the buffer-carrying node
        bb_h, sc_h, lb_h, _ = host(frame)
        bb_d, sc_d, lb_d, _ = dev(frame)
        np.testing.assert_array_equal(bb_h, bb_d)
        np.testing.assert_array_equal(sc_h, sc_d)
        np.testing.assert_array_equal(lb_h, lb_d)
    host.reset()

    # a non-2x source frame must be rejected loudly, not silently mis-shaped
    with pytest.raises(ValueError, match="device_preproc"):
        dev(np.zeros((FAKE_H // 2, FAKE_W // 2, 3), np.uint8))


def test_stream_detector_through_protocol(tiny_detector, fake_argoverse, tmp_path):
    """Full run_streaming_detection with the REAL (untrained) model under a
    fake clock + runtime zoo; outputs feed streaming_eval without error."""
    from streamyolo_tpu.data.coco import COCO
    from streamyolo_tpu.stream import (
        Empirical,
        SimClock,
        run_streaming_detection,
        streaming_eval,
    )

    db = COCO(os.path.join(fake_argoverse, "Argoverse-HD/annotations/val.json"))
    out_dir = str(tmp_path / "run")
    info = run_streaming_detection(
        db, os.path.join(fake_argoverse, "Argoverse-1.1", "tracking"), out_dir,
        tiny_detector, fps=30.0, clock=SimClock(),
        runtime_dist=Empirical([0.02], seed=0), overwrite=True,
    )
    assert info["n_processed"] > 0
    with open(os.path.join(out_dir, "seq0.pkl"), "rb") as f:
        seq = pickle.load(f)
    assert set(seq) == {"results_parsed", "timestamps", "input_fidx", "runtime"}
    # pairing runs end-to-end (untrained model: summary may be None)
    streaming_eval(db, out_dir, fps=30.0, eta=0, overwrite=True)
    assert os.path.isfile(os.path.join(out_dir, "eval_assoc.pkl"))


def test_spatial_mesh_matches_single_device(tiny_model):
    """Latency-mode spatial sharding (parallel/spatial.py): the same frame
    sequence through a 2-device H-sharded step must reproduce the
    single-device detections exactly — halo-exchanged convs are work
    division, not approximation."""
    import jax

    from streamyolo_tpu.parallel.spatial import make_spatial_mesh

    mesh = make_spatial_mesh(jax.devices()[:2])  # input H=30: 2 | 30
    det_ref = _make_detector(tiny_model)
    det_sp = _make_detector(tiny_model, mesh=mesh)
    rs = np.random.RandomState(1)
    for _ in range(3):  # star frame, then two buffer-carrying steps
        frame = rs.randint(0, 255, (FAKE_H, FAKE_W, 3), np.uint8)
        b0, s0, l0, _ = det_ref(frame)
        b1, s1, l1, _ = det_sp(frame)
        assert b0.shape == b1.shape
        np.testing.assert_allclose(b1, b0, rtol=0, atol=1e-4)
        np.testing.assert_allclose(s1, s0, rtol=0, atol=1e-5)
        np.testing.assert_array_equal(l1, l0)
    # the carried buffer lives on the mesh (GSPMD-chosen sharding)
    for leaf in jax.tree_util.tree_leaves(det_sp._buffer):
        assert len(leaf.sharding.device_set) == 2


def test_spatial_mesh_rejects_indivisible_height(tiny_model):
    import jax

    from streamyolo_tpu.parallel.spatial import make_spatial_mesh

    with pytest.raises(ValueError, match="divisible"):
        _make_detector(tiny_model, mesh=make_spatial_mesh(jax.devices()[:4]))


def test_spatial_mesh_rejects_device_preproc(tiny_model):
    import jax

    from streamyolo_tpu.parallel.spatial import make_spatial_mesh

    with pytest.raises(ValueError, match="spatial mesh"):
        _make_detector(
            tiny_model, mesh=make_spatial_mesh(jax.devices()[:2]),
            device_preproc=True,
        )


def _run_aot_child(tmp_path, phase):
    """Spawn tests/_aot_serve_child.py on tmp_path. Same virtual device
    count as this process: the executable key includes n_devices, so a
    mismatch would be a key miss (=> jit => the serve child's poison
    trips). Export runs in its own fresh process too — a long-compiled
    process can emit artifacts a clean process refuses to execute."""
    import subprocess

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "_aot_serve_child.py"),
         str(tmp_path), phase],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "CHILD_OK" in proc.stdout


def test_aot_serialized_detector_loads_without_tracing(tiny_model, tmp_path):
    """The TensorRT-engine slot closed end-to-end: export_stream_executables
    serializes the star + steady-state programs; a FRESH serving process
    (tests/_aot_serve_child.py — the scenario the artifacts exist for)
    constructs a detector with ``aot_dir``, loads them (``aot_loaded``),
    never calls ``jax.jit`` (poisoned in the child), and its detections match
    the jit path exactly. BOTH the export and the serve run in their own
    fresh interpreter — production's actual shape (`tools/precompile.py
    --serve` is a dedicated process) — because a long-compiled XLA:CPU
    process can (a) fail a deserialized executable at execution ("Buffer
    Definition Event: Function ... not found") and (b) export artifacts
    whose embedded LLVM target features a clean process refuses; the
    detector's probe turns both into a loud jit fallback, which would make
    an in-process no-tracing assertion flaky."""
    model, variables = tiny_model
    kwargs = dict(
        input_size=(FAKE_H // 2, FAKE_W // 2), conf_thre=0.05, nms_thre=0.5,
        num_classes=8, pre_nms_topk=32, use_bf16=False,
    )
    rs = np.random.RandomState(7)
    frames = [rs.randint(0, 255, (FAKE_H, FAKE_W, 3), np.uint8)
              for _ in range(3)]

    with open(tmp_path / "setup.pkl", "wb") as f:
        pickle.dump(dict(
            mode="single", variables=variables, depth=0.33, width=0.25,
            export_kwargs=kwargs,
            detector_kwargs=dict(kwargs, in_scale=0.5,
                                 aot_dir=str(tmp_path)),
        ), f)
    np.savez(tmp_path / "frames.npz",
             **{f"frame_{i}": fr for i, fr in enumerate(frames)})

    _run_aot_child(tmp_path, "export")
    assert [p for p in os.listdir(tmp_path) if p.endswith(".jaxexec")]
    _run_aot_child(tmp_path, "serve")

    # In-process: the AOT path must be CORRECT here too — aot_loaded may be
    # legitimately False (execution-probe fallback in a long-lived process),
    # but detections must match the clean processes' either way.
    want_npz = np.load(tmp_path / "want.npz")
    det = _make_detector(tiny_model, aot_dir=str(tmp_path))
    for i, f in enumerate(frames):
        b, s, l, m = det(f)
        assert m is None
        np.testing.assert_array_equal(b, want_npz[f"boxes_{i}"])
        np.testing.assert_array_equal(s, want_npz[f"scores_{i}"])
        np.testing.assert_array_equal(l, want_npz[f"labels_{i}"])

    # a config mismatch is a key miss -> loud fallback to jit, still correct
    from streamyolo_tpu.stream import TPUStreamDetector

    det2 = TPUStreamDetector(
        model, variables, input_size=(FAKE_H // 2, FAKE_W // 2), in_scale=0.5,
        conf_thre=0.05, nms_thre=0.45, num_classes=8, pre_nms_topk=32,
        use_bf16=False, aot_dir=str(tmp_path),
    )
    assert not det2.aot_loaded
    b, s, l, _ = det2(frames[0])
    assert len(b) == len(s) == len(l)


# ---------------------------------------------------------------------------
# MultiStreamDetector: N streams in one batched on_pipe step
# ---------------------------------------------------------------------------


def _make_multi(tiny_model, n_streams, **kw):
    from streamyolo_tpu.stream import MultiStreamDetector

    model, variables = tiny_model
    # conf 1e-5: the prior-prob bias init puts untrained scores at ~1e-4,
    # so a realistic threshold would keep the comparisons below vacuously
    # empty.
    return MultiStreamDetector(
        model, variables, n_streams,
        input_size=(FAKE_H // 2, FAKE_W // 2), in_scale=0.5,
        conf_thre=1e-5, nms_thre=0.5, num_classes=8, pre_nms_topk=32,
        use_bf16=False,
        **kw,
    )


def test_multi_stream_aot_serialized(tiny_model, tmp_path):
    """MultiStreamDetector(aot_dir=...) in a FRESH serving process loads the
    serialized batched executables without tracing (jit poisoned in the
    child) and matches the jit path, including a per-stream reset through
    the star-mask program. Export and serve each get their own fresh
    interpreter for the same reasons as the single-stream test above."""
    model, variables = tiny_model
    kwargs = dict(
        input_size=(FAKE_H // 2, FAKE_W // 2), conf_thre=1e-5, nms_thre=0.5,
        num_classes=8, pre_nms_topk=32, use_bf16=False,
    )
    rs = np.random.RandomState(9)
    frames = [np.stack([rs.randint(0, 255, (FAKE_H // 2, FAKE_W // 2, 3),
                                   np.uint8)] * 2) for _ in range(3)]

    with open(tmp_path / "setup.pkl", "wb") as f:
        pickle.dump(dict(
            mode="multi", variables=variables, depth=0.33, width=0.25,
            n_streams=2, reset_stream_at=(2, 1),
            export_kwargs=kwargs,
            detector_kwargs=dict(kwargs, in_scale=0.5,
                                 aot_dir=str(tmp_path)),
        ), f)
    np.savez(tmp_path / "frames.npz",
             **{f"frame_{i}": fr for i, fr in enumerate(frames)})

    _run_aot_child(tmp_path, "export")
    _run_aot_child(tmp_path, "serve")

    # In-process: correct with or without the AOT fast path (the execution
    # probe may legitimately fall back to jit in a long-lived process).
    want_npz = np.load(tmp_path / "want.npz")
    det = _make_multi(tiny_model, 2, aot_dir=str(tmp_path))
    for i, f in enumerate(frames):
        if i == 2:
            det.reset(1)
        got = det(f, preprocessed=True)
        for j, (b1, s1, l1, _) in enumerate(got):
            np.testing.assert_array_equal(b1, want_npz[f"boxes_{i}_{j}"])
            np.testing.assert_array_equal(s1, want_npz[f"scores_{i}_{j}"])
            np.testing.assert_array_equal(l1, want_npz[f"labels_{i}_{j}"])


def test_on_pipe_star_mask_row_semantics(tiny_model):
    """star_mask selects per ROW between buffer fuse and star (self) fuse —
    bit-exact against the unmasked programs on the same batch."""
    import jax.numpy as jnp

    model, variables = tiny_model
    rs = np.random.RandomState(0)
    h, w = FAKE_H // 2, FAKE_W // 2
    x0 = rs.rand(2, h, w, 3).astype(np.float32) * 255
    x1 = rs.rand(2, h, w, 3).astype(np.float32) * 255

    _, buf = model.apply(variables, x0, mode="on_pipe")
    masked, _ = model.apply(
        variables, x1, buffer=buf, mode="on_pipe",
        star_mask=jnp.array([False, True]),
    )
    buffered, _ = model.apply(variables, x1, buffer=buf, mode="on_pipe")
    starred, _ = model.apply(variables, x1, mode="on_pipe")
    masked, buffered, starred = map(np.asarray, (masked, buffered, starred))
    np.testing.assert_array_equal(masked[0], buffered[0])
    np.testing.assert_array_equal(masked[1], starred[1])
    # and the mask changed something: row 1 buffer-fuse != star-fuse
    assert not np.array_equal(buffered[1], starred[1])


def test_multi_stream_single_matches_tpu_stream_detector(tiny_model):
    """n_streams=1 reproduces TPUStreamDetector on the same frame sequence
    (same batch-1 program; the steady-state all-False mask selects the
    buffer everywhere)."""
    from streamyolo_tpu.stream import TPUStreamDetector

    model, variables = tiny_model
    single = TPUStreamDetector(
        model, variables, input_size=(FAKE_H // 2, FAKE_W // 2), in_scale=0.5,
        conf_thre=1e-5, nms_thre=0.5, num_classes=8, pre_nms_topk=32,
        use_bf16=False,
    )
    multi = _make_multi(tiny_model, 1)
    rs = np.random.RandomState(2)
    for _ in range(3):  # star, then two buffer-carrying steps
        frame = rs.randint(0, 255, (FAKE_H, FAKE_W, 3), np.uint8)
        b0, s0, l0, _ = single(frame)
        ((b1, s1, l1, m1),) = multi([frame])
        assert m1 is None
        assert len(b0), "vacuous comparison: no detections"
        np.testing.assert_allclose(b1, b0, rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(s1, s0, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(l1, l0)


def test_multi_stream_reset_bounds_and_frame_promotion(tiny_model):
    """`reset(i)` rejects out-of-range indices (a negative index must not
    silently mark a stream from the end via numpy wrap-around), and the
    preprocessed path promotes a single unstacked HWC frame to a batch of 1
    ONLY for n_streams==1 — for n_streams>1 it is a count mismatch."""
    multi = _make_multi(tiny_model, 2)
    for bad in (-1, 2, 7):
        with pytest.raises(IndexError):
            multi.reset(bad)
    multi.reset(1)  # in-range still fine
    frame = np.zeros((FAKE_H // 2, FAKE_W // 2, 3), np.uint8)
    with pytest.raises(AssertionError, match="expected 2 frames"):
        multi(frame, preprocessed=True)

    one = _make_multi(tiny_model, 1)
    ((b, s, l, m),) = one(frame, preprocessed=True)  # HWC accepted as [1,HWC]
    assert m is None and len(b) == len(s) == len(l)


def test_multi_stream_rows_are_independent(tiny_model):
    """Two streams fed the SAME frame sequence produce identical rows (the
    batched step is row-wise independent), and a per-stream reset makes ONLY
    the marked row diverge (its next step star-fuses while the other keeps
    its carry)."""
    multi = _make_multi(tiny_model, 2)
    rs = np.random.RandomState(3)
    frames = [rs.randint(0, 255, (FAKE_H, FAKE_W, 3), np.uint8)
              for _ in range(3)]

    out0 = multi(np.stack([multi.preproc(frames[0])] * 2), preprocessed=True)
    out1 = multi(np.stack([multi.preproc(frames[1])] * 2), preprocessed=True)
    for out in (out0, out1):
        (ba, sa, la, _), (bb, sb, lb, _) = out
        assert len(ba), "vacuous comparison: no detections"
        np.testing.assert_array_equal(ba, bb)
        np.testing.assert_array_equal(sa, sb)
        np.testing.assert_array_equal(la, lb)

    multi.reset(1)  # stream 1 re-stars; stream 0 keeps its carry
    (ba, sa, la, _), (bb, sb, lb, _) = multi(
        np.stack([multi.preproc(frames[2])] * 2), preprocessed=True)
    assert not (
        ba.shape == bb.shape and np.array_equal(ba, bb)
        and np.array_equal(sa, sb)
    ), "per-stream reset did not change the marked row"
    assert multi._buffer is not None
    assert not multi._pending_star.any()

    multi.reset()
    assert multi._buffer is None
