"""Jittable fixed-shape NMS vs a pure-NumPy greedy oracle (the dual-
implementation-as-oracle pattern the reference itself uses, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from streamyolo_tpu.ops.nms import nms_padded, postprocess, postprocess_fixed


def np_greedy_nms(boxes, scores, thr):
    """Sequential greedy NMS, torchvision semantics. Returns kept indices."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        tl = np.maximum(boxes[i, :2], boxes[:, :2])
        br = np.minimum(boxes[i, 2:], boxes[:, 2:])
        wh = np.clip(br - tl, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-12)
        suppressed |= iou > thr
    return np.array(keep)


def random_boxes(rng, n, size=200.0):
    cxy = rng.uniform(10, size, (n, 2))
    wh = rng.uniform(5, 60, (n, 2))
    return np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)


def test_nms_padded_matches_greedy(rng):
    for trial in range(5):
        n = 64
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        sorted_boxes = boxes[order]
        keep_mask = np.asarray(
            nms_padded(jnp.asarray(sorted_boxes), jnp.ones(n, bool), 0.5)
        )
        got = set(order[np.where(keep_mask)[0]])
        want = set(np_greedy_nms(boxes, scores, 0.5))
        assert got == want


def test_nms_respects_padding(rng):
    boxes = random_boxes(rng, 16)
    valid = np.zeros(16, bool)
    valid[:4] = True
    keep = np.asarray(nms_padded(jnp.asarray(boxes), jnp.asarray(valid), 0.5))
    assert not keep[4:].any()


def test_postprocess_class_aware(rng):
    """Overlapping boxes of different classes must BOTH survive class-aware
    NMS (the torchvision batched_nms offset trick)."""
    n, ncls = 50, 8
    pred = np.zeros((1, n, 5 + ncls), np.float32)
    pred[0, :, 0:2] = 100.0  # identical centers
    pred[0, :, 2:4] = 40.0
    pred[0, :, 4] = 0.9
    pred[0, :, 5] = 0.0
    pred[0, 0, 5 + 0] = 0.8  # class 0
    pred[0, 1, 5 + 1] = 0.7  # class 1 — overlaps class 0 box entirely
    out = postprocess(pred, ncls, conf_thre=0.3, nms_thre=0.5, pre_nms_topk=16)
    assert out[0] is not None and len(out[0]) == 2
    got_classes = sorted(out[0][:, 6].astype(int).tolist())
    assert got_classes == [0, 1]


def test_postprocess_matches_oracle_end_to_end(rng):
    n, ncls = 200, 8
    pred = np.zeros((2, n, 5 + ncls), np.float32)
    for b in range(2):
        boxes = random_boxes(rng, n)
        pred[b, :, 0:2] = (boxes[:, :2] + boxes[:, 2:]) / 2
        pred[b, :, 2:4] = boxes[:, 2:] - boxes[:, :2]
        pred[b, :, 4] = rng.uniform(0, 1, n)
        pred[b, :, 5:] = rng.uniform(0, 1, (n, ncls))

    conf_thre, nms_thre = 0.25, 0.5
    outs = postprocess(pred, ncls, conf_thre, nms_thre, pre_nms_topk=n)
    for b in range(2):
        obj = pred[b, :, 4]
        cls_conf = pred[b, :, 5:].max(-1)
        cls_pred = pred[b, :, 5:].argmax(-1)
        scores = obj * cls_conf
        mask = scores >= conf_thre
        idx = np.where(mask)[0]
        cxy, wh = pred[b, idx, 0:2], pred[b, idx, 2:4]
        corners = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
        offset = cls_pred[idx, None] * 8192.0
        keep = np_greedy_nms(corners + offset, scores[idx], nms_thre)
        want = idx[keep]
        got = outs[b]
        assert got is not None and len(got) == len(want)
        # compare the surviving (box, class) sets
        want_boxes = corners[keep]
        got_sorted = got[np.lexsort(got[:, :2].T)]
        want_sorted = want_boxes[np.lexsort(want_boxes[:, :2].T)]
        np.testing.assert_allclose(got_sorted[:, :4], want_sorted, atol=1e-4)


def test_postprocess_fixed_shape_static():
    pred = jnp.zeros((1, 300, 13))
    out = postprocess_fixed(pred, 8, 0.01, 0.65, pre_nms_topk=100)
    assert out.shape == (1, 100, 8)
    assert not bool(out[..., 7].any())

def test_fixed_point_nms_matches_sequential(rng):
    """The while-loop fixed-point NMS must equal the K-step sequential greedy
    sweep on dense, heavily-overlapping box sets (deep suppression chains)."""
    from streamyolo_tpu.ops.nms import nms_padded_sequential

    for n, size in [(64, 120.0), (128, 80.0), (200, 60.0)]:
        boxes = random_boxes(rng, n, size=size)  # crowded -> long chains
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        sb = jnp.asarray(boxes[order])
        valid = jnp.ones(n, bool)
        got = np.asarray(nms_padded(sb, valid, 0.5))
        want = np.asarray(nms_padded_sequential(sb, valid, 0.5))
        np.testing.assert_array_equal(got, want)


def test_fixed_point_nms_chain():
    """Hand-built suppression chain a>b>c where a-c don't overlap: greedy
    keeps a and c (the naive one-shot 'suppress all overlapped' would drop c)."""
    boxes = jnp.asarray(
        np.array(
            [
                [0.0, 0.0, 10.0, 10.0],   # a (highest score)
                [6.0, 0.0, 16.0, 10.0],   # b: iou(a,b)=4/16=0.25... overlap
                [12.0, 0.0, 22.0, 10.0],  # c: overlaps b, not a
            ],
            np.float32,
        )
    )
    keep = np.asarray(nms_padded(boxes, jnp.ones(3, bool), 0.2))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_pallas_nms_matches_twins(rng):
    """Pallas VMEM kernel (interpret mode) vs the jnp fixed-point and the
    sequential greedy oracle, on crowded random boxes."""
    from streamyolo_tpu.ops.nms_pallas import nms_padded_pallas
    from streamyolo_tpu.ops.nms import nms_padded_sequential

    for n, size in [(64, 100.0), (128, 70.0)]:
        boxes = random_boxes(rng, n, size=size)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        sb = jnp.asarray(boxes[order])
        valid = jnp.ones(n, bool)
        got = np.asarray(nms_padded_pallas(sb, valid, 0.5, interpret=True))
        np.testing.assert_array_equal(got, np.asarray(nms_padded(sb, valid, 0.5)))
        np.testing.assert_array_equal(
            got, np.asarray(nms_padded_sequential(sb, valid, 0.5))
        )
    # padding respected
    valid = np.zeros(64, bool); valid[:5] = True
    keep = np.asarray(nms_padded_pallas(jnp.asarray(boxes[:64]), jnp.asarray(valid), 0.5, interpret=True))
    assert not keep[5:].any()


def test_nms_exact_score_ties(rng):
    """Exact duplicate scores: tie order is positional (stable sort); the
    fixed-point and sequential results must agree."""
    from streamyolo_tpu.ops.nms import nms_padded_sequential

    n = 48
    boxes = random_boxes(rng, n, size=90.0)
    scores = np.repeat(rng.uniform(0.2, 1.0, n // 4), 4).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    sb = jnp.asarray(boxes[order])
    valid = jnp.ones(n, bool)
    np.testing.assert_array_equal(
        np.asarray(nms_padded(sb, valid, 0.5)),
        np.asarray(nms_padded_sequential(sb, valid, 0.5)),
    )


def test_dense_scene_cap_invisible_and_saturation_detected(rng):
    """Dense scene (>1000 above-conf candidates at conf 0.001): the 1000-cap
    must not change the top-100 post-NMS rows (maxDets=100 is what COCOeval
    consumes), and the saturation detector must fire so the cap is never
    silent (round-2 finding; the reference NMS is uncapped)."""
    from streamyolo_tpu.ops.nms import candidate_counts, warn_if_saturated

    # 800 cells on a 40x20 grid; TWO heavily-overlapping boxes per cell so
    # real suppression happens (1600 above-conf candidates, ~800 survivors).
    n_cells, num_classes = 800, 8
    gx, gy = np.meshgrid(np.arange(40), np.arange(20))
    centers = np.stack([gx.reshape(-1) * 24 + 12, gy.reshape(-1) * 24 + 12], -1)
    preds = []
    for j, (cx, cy) in enumerate(centers[:n_cells]):
        hi, lo = 0.9 - 1e-4 * j, 0.5 - 1e-4 * j
        cls = np.zeros(num_classes); cls[j % num_classes] = 1.0
        preds.append([cx, cy, 10, 10, hi, *cls])          # winner
        preds.append([cx + 1, cy + 1, 10, 10, lo, *cls])  # suppressed (IoU .68)
    pred = np.asarray(preds, np.float32)[None]  # [1, 1600, 13]

    capped = postprocess(pred, num_classes, 0.001, 0.65, pre_nms_topk=1000)[0]
    full = postprocess(pred, num_classes, 0.001, 0.65, pre_nms_topk=1600)[0]
    # top-100 post-NMS rows identical (rows come out score-sorted)
    np.testing.assert_array_equal(capped[:100], full[:100])

    # saturation is detected on the capped run only
    fixed_capped = np.asarray(
        postprocess_fixed(jnp.asarray(pred), num_classes, 0.001, 0.65, 1000)
    )
    fixed_full = np.asarray(
        postprocess_fixed(jnp.asarray(pred), num_classes, 0.001, 0.65, 1600)
    )
    n_anchors = pred.shape[1]
    assert candidate_counts(fixed_capped, 0.001)[0] == 1000
    assert warn_if_saturated(fixed_capped, 0.001, n_anchors) == 1
    assert candidate_counts(fixed_full, 0.001)[0] == 1600
    # K covers every anchor -> nothing could have been dropped
    assert warn_if_saturated(fixed_full, 0.001, n_anchors) == 0


def test_pallas_selftest_interpret_passes():
    """The selftest harness itself: interpret-mode kernels are bit-exact
    against the jnp twin (the compiled run needs a directly-attached TPU)."""
    from streamyolo_tpu.ops import nms as nms_mod

    ok, detail = nms_mod.run_pallas_nms_selftest(trials=2, k=64, interpret=True)
    assert ok, detail


def test_pallas_verified_gate_caches_verdict(tmp_path, monkeypatch):
    """pallas_nms_verified: runs the selftest once, persists the verdict next
    to the compilation cache, and later processes (fresh module state) read
    the marker instead of re-running."""
    import jax

    from streamyolo_tpu.ops import nms as nms_mod
    from streamyolo_tpu.ops import pallas_gate

    calls = {"n": 0}

    def fake_selftest(*a, **k):
        calls["n"] += 1
        return True, "fake"

    monkeypatch.setattr(nms_mod, "run_pallas_nms_selftest", fake_selftest)
    pallas_gate.reset_memo("nms")
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    try:
        assert nms_mod.pallas_nms_verified() is True
        assert calls["n"] == 1
        markers = list(tmp_path.glob("pallas_nms_selftest_*.json"))
        assert len(markers) == 1

        # same process: memoized, no re-run
        assert nms_mod.pallas_nms_verified() is True
        assert calls["n"] == 1

        # fresh process state: the marker is consulted, selftest NOT re-run
        pallas_gate.reset_memo("nms")
        assert nms_mod.pallas_nms_verified() is True
        assert calls["n"] == 1

        # force re-runs and rewrites
        assert nms_mod.pallas_nms_verified(force=True) is True
        assert calls["n"] == 2

        # a FAILED verdict is also persisted and gates auto-selection off
        monkeypatch.setattr(
            nms_mod, "run_pallas_nms_selftest", lambda *a, **k: (False, "boom")
        )
        assert nms_mod.pallas_nms_verified(force=True) is False
        pallas_gate.reset_memo("nms")
        assert nms_mod.pallas_nms_verified() is False
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
        pallas_gate.reset_memo("nms")
