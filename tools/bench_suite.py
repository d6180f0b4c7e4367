"""Supplementary benchmark suite backing the README performance table.

``bench.py`` is the driver contract (one JSON line, streaming step); this
script re-measures every other README row with the same methodology:
R dependency-chained async dispatches per timed sample, ONE host sync per
sample (the dev relay costs ~30 ms per sync, which contaminated the round-1
ad-hoc numbers), min over samples as the headline (shared-relay contention
inflates one-sidedly).

Also reports XLA-counted FLOPs and the implied MFU against the TPU v5e
bf16 peak (197 TFLOP/s) where the compiled program exposes cost analysis.

Usage: python tools/bench_suite.py {stream_fp32,serve8,eval_fwd,train_s,all}
       [--batch N] [--samples N]

Reference recipes being matched: streaming loop
`/root/reference/sAP/streamyolo/streamyolo_det.py:152-195` (V100, 30 FPS
bar), train recipe 8xV100 batch 32 fp16 (`/root/reference/README.md:100-106`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

V5E_BF16_PEAK = 197e12  # TFLOP/s, TPU v5e per-chip bf16 peak
K = 10  # fori_loop steps per dispatch (streaming benches)
R = 5  # async dispatches per timed sample


def _setup_jax():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _cost(jitted, *args):
    """XLA cost analysis of the compiled program: {'flops', 'bytes'} (either
    may be None if the backend does not expose the counter). ``bytes`` is
    XLA's bytes-accessed estimate — the HBM-roofline numerator."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return {
            "flops": float(cost.get("flops", 0.0)) or None,
            "bytes": float(cost.get("bytes accessed", 0.0)) or None,
        }
    except Exception:
        return {"flops": None, "bytes": None}


def _flops(jitted, *args):
    return _cost(jitted, *args)["flops"]


V5E_HBM_BW = 819e9  # bytes/s, TPU v5e HBM bandwidth


def _roofline(cost, step_s):
    """Achieved fraction of both v5e roofs for a measured step time."""
    parts = []
    if cost.get("flops"):
        parts.append(f"MXU {cost['flops'] / step_s / V5E_BF16_PEAK * 100:.0f}%"
                     f" ({cost['flops']/1e12:.2f} TFLOP)")
    if cost.get("bytes"):
        parts.append(f"HBM {cost['bytes'] / step_s / V5E_HBM_BW * 100:.0f}%"
                     f" ({cost['bytes']/1e9:.2f} GB)")
    return "; ".join(parts)


def _size_tag(depth: float, width: float) -> str:
    return {(0.33, 0.5): "s", (0.67, 0.75): "m", (1.0, 1.0): "l"}.get(
        (depth, width), f"d{depth}_w{width}")


def _report(name, step_ms, per_what, extra=""):
    print(f"[{name}] {step_ms:.2f} ms/{per_what} (min over samples){extra}")


def _timed_samples(dispatch_once, sync, n_samples, steps_per_sample):
    samples = []
    for _ in range(n_samples):
        t0 = time.perf_counter()
        dispatch_once()
        sync()
        samples.append((time.perf_counter() - t0) / steps_per_sample)
    print(
        f"  samples (ms): min={np.min(samples)*1e3:.2f} "
        f"median={np.median(samples)*1e3:.2f} max={np.max(samples)*1e3:.2f}",
        file=sys.stderr,
    )
    return float(np.min(samples))


def _build_model(depth, width, dtype, packed=True):
    from streamyolo_tpu.models.dfp_pafpn import DFPPAFPN
    from streamyolo_tpu.models.heads import TALHead
    from streamyolo_tpu.models.yolox import StreamYOLO

    return StreamYOLO(
        backbone=DFPPAFPN(depth=depth, width=width, dtype=dtype, packed=packed),
        head=TALHead(num_classes=8, width=width, dtype=dtype),
    )


def _stream_chain(jax, jnp, model, variables, batch, cast_dtype):
    """The bench.py streaming chain at configurable batch/dtype.

    Operating point = the deployed detector defaults (conf 0.01 / NMS 0.65 /
    top-k 200, `stream/online.py`). For batch > 1 the steady-state program
    is exactly ``MultiStreamDetector``'s: it includes the all-False
    ``star_mask`` per-row select that per-stream restarts ride on."""
    from streamyolo_tpu.ops.nms import postprocess_fixed

    star_mask = jnp.zeros((batch,), bool) if batch > 1 else None

    @jax.jit
    def chain(v, x, b):
        def body(i, carry):
            b, acc = carry
            preds, nb = model.apply(
                v, x.astype(cast_dtype), buffer=b, mode="on_pipe",
                star_mask=star_mask,
            )
            dets = postprocess_fixed(
                preds, num_classes=8, conf_thre=0.01, nms_thre=0.65,
                pre_nms_topk=200,
            )
            # reduce over the WHOLE detection tensor (incl. the keep flags)
            # so XLA cannot dead-code-eliminate the NMS suppression
            return nb, acc + jnp.sum(dets.astype(jnp.float32))

        b, acc = jax.lax.fori_loop(0, K, body, (b, jnp.float32(0)))
        return b, acc

    img = np.random.RandomState(0).randint(
        0, 255, (batch, 600, 960, 3)).astype(np.uint8)
    image = jax.device_put(img)

    @jax.jit
    def one(v, x, b):
        _, nb = model.apply(v, x.astype(cast_dtype), buffer=b, mode="on_pipe")
        return nb

    buf = one(variables, image, None)
    np.asarray(jax.tree_util.tree_leaves(buf)[0][(0,) * 4])
    buf, acc = chain(variables, image, buf)  # compile + warm
    float(acc)
    return chain, image, buf


def bench_stream(dtype_name: str, batch: int, n_samples: int):
    jax = _setup_jax()
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = _build_model(depth=1.0, width=1.0, dtype=dtype)
    variables = jax.device_put(model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 96, 3), np.float32),
        mode="off_pipe", train=False,
    ))
    chain, image, buf = _stream_chain(jax, jnp, model, variables, batch, dtype)

    state = {"buf": buf, "acc": None}

    def dispatch():
        for _ in range(R):
            state["buf"], state["acc"] = chain(variables, image, state["buf"])

    step_s = _timed_samples(
        dispatch, lambda: float(state["acc"]), n_samples, R * K
    )
    fps = batch / step_s
    name = f"stream_l_{dtype_name}_b{batch}"
    _report(name, step_s * 1e3, "step",
            f"; {fps:.0f} frames/s/chip ({fps/30:.1f}x the 30 FPS V100 bar)")
    return {name: {"ms_per_step": round(step_s * 1e3, 3),
                   "frames_per_sec": round(fps, 1)}}


def bench_stream_int8(batch: int, n_samples: int, packed: bool = True):
    """The streaming step with the int8 PTQ serving path (quant/ptq.py),
    synthetic calibration, strip=True. ``packed`` (default) runs the
    phase-packed layout — the fast int8 combination (narrow raw int8 convs
    pay relayout copies on both operands, see PackedConvBN); ``--no-packed``
    measures the raw layout (every CBS conv int8 including the stem).
    Compare with stream_l_bf16 for the int8 effect on the headline step."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from streamyolo_tpu.quant import quantize_for_serving

    model = _build_model(depth=1.0, width=1.0, dtype=jnp.bfloat16,
                         packed=packed)
    variables = jax.device_get(model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 96, 3), np.float32),
        mode="off_pipe", train=False,
    ))
    calib = [np.random.RandomState(1).randint(
        0, 255, (1, 600, 960, 6)).astype(np.float32)]
    qvars = jax.device_put(
        quantize_for_serving(model, variables, calib, strip=True))
    chain, image, buf = _stream_chain(jax, jnp, model, qvars, batch, jnp.bfloat16)

    state = {"buf": buf, "acc": None}

    def dispatch():
        for _ in range(R):
            state["buf"], state["acc"] = chain(qvars, image, state["buf"])

    step_s = _timed_samples(
        dispatch, lambda: float(state["acc"]), n_samples, R * K
    )
    fps = batch / step_s
    name = f"stream_l_int8{'' if packed else '_raw'}_b{batch}"
    _report(name, step_s * 1e3, "step",
            f"; {fps:.0f} frames/s/chip ({fps/30:.1f}x the 30 FPS V100 bar)")
    return {name: {"ms_per_step": round(step_s * 1e3, 3),
                   "frames_per_sec": round(fps, 1)}}


def bench_stream_sweep(batches, n_samples: int, int8: bool = False,
                       packed: bool = True):
    """Multi-stream scaling: the MultiStreamDetector steady-state program at
    n = 1..N independent 600x960 camera streams (batch rows = streams, star
    mask included for n > 1). Reports per-step latency, aggregate
    frames/s/chip, and the implied per-chip capacity of 30 FPS cameras —
    the largest n whose step still fits the 33.3 ms frame period (each
    stream gets exactly one step per frame interval, so step_ms <= 1000/30
    means every camera is served in real time). Reference bar: ONE stream on
    a V100 (`/root/reference/sAP/streamyolo/streamyolo_det.py:152-195`)."""
    deadline_ms = 1000.0 / 30.0
    results = {}
    rows = []
    for b in batches:
        # bf16 always runs the packed layout (the production default);
        # --no-packed only selects the raw int8 variant, same as stream_int8
        r = (bench_stream_int8(b, n_samples, packed=packed) if int8
             else bench_stream("bf16", b, n_samples))
        results.update(r)
        (name, stats), = r.items()
        rows.append((b, stats["ms_per_step"], stats["frames_per_sec"]))
    fitting = [b for b, ms, _ in rows if ms <= deadline_ms]
    tag = "int8" if int8 else "bf16"
    print(f"[stream_sweep_{tag}] streams -> ms/step (aggregate frames/s):")
    for b, ms, fps in rows:
        fit = "fits 30 FPS" if ms <= deadline_ms else "MISSES 30 FPS"
        print(f"  n={b:3d}: {ms:7.2f} ms  {fps:7.0f} f/s  "
              f"{ms / b:5.2f} ms/frame  ({fit})")
    if fitting:
        cap = max(fitting)
        print(f"  => capacity at 30 FPS/camera: >= {cap} streams/chip "
              f"(largest measured n with step <= {deadline_ms:.1f} ms)")
        results[f"capacity_30fps_{tag}"] = {"streams_per_chip": cap}
    return results


def bench_eval_fwd(batch: int, n_samples: int, depth: float = 1.0,
                   width: float = 1.0, int8: bool = False,
                   packed: bool = True):
    """Offline dual-frame eval forward: off_pipe on [B,600,960,6] + NMS.
    With ``int8`` the CBS convs run the PTQ path (stripped f32 kernels,
    synthetic calibration); pair with the default packed layout for the
    fast combination, or ``--no-packed`` for the raw-layout variant."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from streamyolo_tpu.ops.nms import postprocess_fixed

    model = _build_model(depth=depth, width=width, dtype=jnp.bfloat16,
                         packed=packed)
    variables = jax.device_get(model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 96, 6), np.float32),
        mode="off_pipe", train=False,
    ))
    if int8:
        from streamyolo_tpu.quant import quantize_for_serving

        calib = [np.random.RandomState(1).randint(
            0, 255, (1, 600, 960, 6)).astype(np.float32)]
        variables = quantize_for_serving(model, variables, calib, strip=True)
    variables = jax.device_put(variables)

    @jax.jit
    def step(v, x):
        preds = model.apply(v, x, mode="off_pipe", train=False)
        return postprocess_fixed(preds, num_classes=8, conf_thre=0.01,
                                 nms_thre=0.65)

    imgs = jax.device_put(np.random.RandomState(0).randint(
        0, 255, (batch, 600, 960, 6)).astype(np.float32))
    out = step(variables, imgs)  # compile + warm
    np.asarray(out[0, 0, 0])
    flops = _flops(step, variables, imgs)

    state = {"out": None}

    def dispatch():
        for _ in range(R * K):  # no carried state; device serializes
            state["out"] = step(variables, imgs)

    step_s = _timed_samples(
        dispatch, lambda: np.asarray(state["out"][0, 0, 0]), n_samples, R * K
    )
    rate = batch / step_s
    extra = f"; {rate:.0f} imgs/s/chip"
    if flops:
        mfu = flops / step_s / V5E_BF16_PEAK
        extra += f"; {flops/1e9:.0f} GFLOP/step, MFU {mfu*100:.0f}%"
    tag = (f"eval_fwd_d{depth}_w{width}_b{batch}"
           + ("_int8" if int8 else "") + ("" if packed else "_raw"))
    _report(tag, step_s * 1e3, "batch", extra)
    return {tag: {
        "ms_per_batch": round(step_s * 1e3, 2),
        "imgs_per_sec": round(rate, 1),
        "gflops": round(flops / 1e9, 1) if flops else None,
    }}


def bench_eval_dedup(batch: int, n_samples: int, depth: float = 1.0,
                     width: float = 1.0):
    """Sequential-dedup eval forward (mode='seq'): one backbone pass per
    unique frame, support features batch-shifted with an HBM carry."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from streamyolo_tpu.ops.nms import postprocess_fixed

    model = _build_model(depth=depth, width=width, dtype=jnp.bfloat16)
    variables = jax.device_put(model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 96, 6), np.float32),
        mode="off_pipe", train=False,
    ))

    @jax.jit
    def step(v, x, carry, flags):
        preds, new_carry = model.apply(
            v, x, buffer=carry, mode="seq", support_shift=flags)
        return postprocess_fixed(preds, num_classes=8, conf_thre=0.01,
                                 nms_thre=0.65), new_carry

    frames = jax.device_put(np.random.RandomState(0).randint(
        0, 255, (batch, 600, 960, 3)).astype(np.float32))
    flags = jax.device_put(np.ones(batch, np.int32))
    out, carry = step(variables, frames, None, flags)  # first-batch trace
    np.asarray(out[0, 0, 0])
    out, carry = step(variables, frames, carry, flags)  # steady-state trace
    np.asarray(out[0, 0, 0])
    flops = _flops(step, variables, frames, carry, flags)

    state = {"out": out, "carry": carry}

    def dispatch():
        for _ in range(R * K):  # carry-chained
            state["out"], state["carry"] = step(
                variables, frames, state["carry"], flags)

    step_s = _timed_samples(
        dispatch, lambda: np.asarray(state["out"][0, 0, 0]), n_samples, R * K
    )
    rate = batch / step_s
    extra = f"; {rate:.0f} imgs/s/chip"
    if flops:
        mfu = flops / step_s / V5E_BF16_PEAK
        extra += f"; {flops/1e9:.0f} GFLOP/step, MFU {mfu*100:.0f}%"
    tag = f"eval_dedup_d{depth}_w{width}_b{batch}"
    _report(tag, step_s * 1e3, "batch", extra)
    return {tag: {
        "ms_per_batch": round(step_s * 1e3, 2),
        "imgs_per_sec": round(rate, 1),
        "gflops": round(flops / 1e9, 1) if flops else None,
    }}


def _train_setup(jax, batch: int, remat: bool, packed: bool = True,
                 depth: float = 0.33, width: float = 0.50):
    """Shared fixture for the train benches: StreamYOLO-{s,m,l} at 600x960,
    the synthetic 8-object batch, and the configured train step."""
    from streamyolo_tpu.train import (
        build_lr_schedule, create_train_state, make_train_step,
    )

    import jax.numpy as jnp

    model = _build_model(depth=depth, width=width, dtype=jnp.bfloat16,
                         packed=packed)
    h, w, max_labels = 600, 960, 50
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (batch, h, w, 6)).astype(np.float32)
    labels = np.zeros((batch, max_labels, 5), np.float32)
    labels[:, :8] = np.stack([
        rs.randint(0, 8, (batch, 8)).astype(np.float32),
        rs.uniform(100, 860, (batch, 8)).astype(np.float32),
        rs.uniform(100, 500, (batch, 8)).astype(np.float32),
        rs.uniform(20, 120, (batch, 8)).astype(np.float32),
        rs.uniform(20, 120, (batch, 8)).astype(np.float32),
    ], axis=-1)

    variables = model.init(
        jax.random.PRNGKey(0), images[:1], mode="off_pipe", train=False)
    lr_schedule = build_lr_schedule(
        "yoloxwarmcos", lr=0.001 / 64 * batch, iters_per_epoch=100,
        max_epoch=15, warmup_epochs=1, no_aug_epochs=15)
    state, tx = create_train_state(variables, lr_schedule)
    step_fn = make_train_step(
        model, tx, num_classes=8, lr_schedule=lr_schedule,
        gamma=1.0, ignore_thr=0.5, ignore_value=1.5, remat=remat)
    batch_d = jax.device_put({
        "images": images, "labels": labels, "support_labels": labels.copy()})
    return step_fn, jax.device_put(state), batch_d


def bench_train(batch: int, n_samples: int, remat: bool = False,
                depth: float = 0.33, width: float = 0.50):
    """Full train step (fwd + SimOTA/TAL + bwd + SGD + EMA),
    StreamYOLO-{s,m,l} at 600x960, per-chip batch ``batch``."""
    jax = _setup_jax()

    from streamyolo_tpu.train import jit_train_step
    from streamyolo_tpu.train.trainer import _donation_safe

    step_fn, state, batch_d = _train_setup(jax, batch, remat,
                                           depth=depth, width=width)
    jitted = jit_train_step(step_fn, donate=_donation_safe())

    state, metrics = jitted(state, batch_d)  # compile + warm
    float(metrics["total_loss"])
    cost = _cost(jitted, state, batch_d)

    holder = {"state": state, "metrics": metrics}

    def dispatch():
        for _ in range(R):
            holder["state"], holder["metrics"] = jitted(
                holder["state"], batch_d)

    step_s = _timed_samples(
        dispatch, lambda: float(holder["metrics"]["total_loss"]),
        n_samples, R,
    )
    rate = batch / step_s
    extra = f"; {rate:.1f} imgs/s/chip"
    roof = _roofline(cost, step_s)
    if roof:
        extra += f"; {roof}"
    tag = (f"train_{_size_tag(depth, width)}_b{batch}"
           + ("_remat" if remat else ""))
    _report(tag, step_s * 1e3, "step", extra)
    return {tag: {
        "ms_per_step": round(step_s * 1e3, 1),
        "imgs_per_sec": round(rate, 1),
        "tflops_per_step": (round(cost["flops"] / 1e12, 3)
                            if cost["flops"] else None),
        "gbytes_per_step": (round(cost["bytes"] / 1e9, 2)
                            if cost["bytes"] else None),
    }}


def bench_train_parts(batch: int, n_samples: int, remat: bool = False,
                      packed: bool = True, depth: float = 0.33,
                      width: float = 0.50):
    """Bisect the train step: loss-only forward, loss+grads, and a
    model-only grad (sum over raw head outputs — the conv-stack backward
    without the SimOTA/TAL loss), each with its XLA FLOP and bytes-accessed
    roofline, to attribute step time between forward, loss backward, conv
    backward, and optimizer+EMA (the full step is the ``train_s`` mode)."""
    jax = _setup_jax()
    import jax.numpy as jnp

    step_fn, state, batch_d = _train_setup(jax, batch, remat, packed=packed,
                                           depth=depth, width=width)
    loss_fn = step_fn.loss_fn
    model = step_fn.model

    loss_only = jax.jit(
        lambda p, bs, b: loss_fn(p, bs, b)[0])
    loss_grad = jax.jit(
        lambda p, bs, b: jax.value_and_grad(loss_fn, has_aux=True)(p, bs, b))

    def model_sum(p, bs, b):
        # train-mode off_pipe returns the per-level raw head outputs (list)
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, b["images"], mode="off_pipe",
            train=True, mutable=["batch_stats"])
        return sum(jnp.sum(o.astype(jnp.float32))
                   for o in jax.tree_util.tree_leaves(out))

    model_fwd = jax.jit(model_sum)
    model_grad = jax.jit(jax.grad(model_sum))

    results = {}
    for tag, fn, fetch in (
        ("model_fwd", model_fwd, lambda r: float(r)),
        ("model_bwd", model_grad,
         lambda r: float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])),
        ("loss_fwd", loss_only, lambda r: float(r)),
        ("loss_bwd", loss_grad, lambda r: float(r[0][0])),
    ):
        out = fn(state.params, state.batch_stats, batch_d)  # compile + warm
        fetch(out)
        cost = _cost(fn, state.params, state.batch_stats, batch_d)
        holder = {"out": None}

        def dispatch():
            for _ in range(R):
                holder["out"] = fn(state.params, state.batch_stats, batch_d)

        step_s = _timed_samples(
            dispatch, lambda: fetch(holder["out"]), n_samples, R)
        name = (
            f"train_parts_{_size_tag(depth, width)}_{tag}_b{batch}"
            + ("_remat" if remat else "")
            + ("" if packed else "_raw")
        )
        roof = _roofline(cost, step_s)
        _report(name, step_s * 1e3, "step", f"; {roof}" if roof else "")
        results[name] = {
            "ms_per_step": round(step_s * 1e3, 1),
            "tflops": (round(cost["flops"] / 1e12, 3)
                       if cost["flops"] else None),
            "gbytes": (round(cost["bytes"] / 1e9, 2)
                       if cost["bytes"] else None),
        }
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("which", choices=[
        "stream_fp32", "stream_int8", "stream_sweep", "serve8", "eval_fwd",
        "eval_dedup", "train_s", "train_parts", "all"])
    p.add_argument("--batches", type=str, default="1,2,4,8,16,32",
                   help="stream_sweep only: comma-separated stream counts")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--samples", type=int, default=8)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--no-packed", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="eval_fwd only: int8 PTQ path (packed layout by "
                        "default; add --no-packed for the raw variant)")
    p.add_argument("--depth", type=float, default=None,
                   help="model depth (eval benches default 1.0, train 0.33)")
    p.add_argument("--width", type=float, default=None,
                   help="model width (eval benches default 1.0, train 0.50)")
    args = p.parse_args()
    eval_d, eval_w = args.depth or 1.0, args.width or 1.0
    train_d, train_w = args.depth or 0.33, args.width or 0.50

    results = {}
    if args.which == "train_parts":
        results.update(bench_train_parts(
            args.batch or 16, args.samples, remat=args.remat,
            packed=not args.no_packed, depth=train_d, width=train_w))
    if args.which in ("stream_fp32", "all"):
        results.update(bench_stream("fp32", args.batch or 1, args.samples))
    if args.which == "stream_int8":
        results.update(bench_stream_int8(args.batch or 1, args.samples,
                                         packed=not args.no_packed))
    if args.which == "stream_sweep":
        batches = [int(b) for b in args.batches.split(",")]
        results.update(bench_stream_sweep(batches, args.samples,
                                          int8=args.int8,
                                          packed=not args.no_packed))
    if args.which in ("serve8", "all"):
        results.update(bench_stream("bf16", args.batch or 8, args.samples))
    if args.which in ("eval_fwd", "all"):
        results.update(bench_eval_fwd(args.batch or 8, args.samples,
                                      depth=eval_d, width=eval_w,
                                      int8=args.int8,
                                      packed=not args.no_packed))
    if args.which in ("eval_dedup", "all"):
        results.update(bench_eval_dedup(args.batch or 8, args.samples,
                                        depth=eval_d, width=eval_w))
    if args.which in ("train_s", "all"):
        results.update(bench_train(args.batch or 16, args.samples,
                                   remat=args.remat, depth=train_d,
                                   width=train_w))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
