"""Online streaming detection loop (real-clock on TPU, fake-clock on CPU).

Capability parity with `/root/reference/sAP/streamyolo/streamyolo_det.py:85-231`
and the simulated-runtime harness `sAP/det/srt_det.py:72-165`, unified behind
the ``clock`` abstraction:

  * per sequence: frames preloaded to RAM, clock starts, the loop repeatedly
    grabs the LATEST frame ``floor(elapsed * fps)`` (skipping already-seen /
    strided frames, with the optional dynamic-schedule policy: skip the frame
    if more than half its period has already elapsed, `streamyolo_det.py:165-174`);
  * the detector runs the DFP ``on_pipe`` step threading the feature buffer;
  * per-sequence pkl: ``results_parsed / timestamps / input_fidx / runtime``;
    global ``time_info.pkl`` with runtime stats (`:197-229`).

TPU-native detector design: the whole per-frame device program (uint8 cast ->
bf16 backbone once -> DFP fuse with donated HBM buffer -> head -> decode ->
fixed-shape NMS) is ONE AOT-compiled XLA executable; the host does only the
cv2 resize and the final [K, 8] row unpack (BASELINE "on-device streaming
loop" requirement).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from streamyolo_tpu.stream.clock import SimClock, WallClock
from streamyolo_tpu.stream.runtime_dist import Empirical
from streamyolo_tpu.utils.logger import get_logger


def _build_stream_step(model, *, num_classes, conf_thre, nms_thre,
                       pre_nms_topk, compute_dtype, device_preproc):
    """The per-frame device program shared by the jit and AOT paths:
    (uint8 frame -> cast/preproc -> on_pipe forward threading the DFP buffer
    -> decode -> fixed-shape NMS), one XLA program."""
    from streamyolo_tpu.ops.nms import postprocess_fixed

    def _step(variables, image, buffer):
        import jax.numpy as jnp

        if device_preproc:
            # raw [1, 2H, 2W, 3] uint8 in: fused 0.5x downsample +
            # cv2-parity round (floor(x+0.5), the uint8 write cv2 does)
            # + cast, all on device — Pallas kernel when verified, jnp
            # twin otherwise (ops/preproc_pallas.py).
            from streamyolo_tpu.ops.preproc_pallas import downsample2x_auto

            ds = downsample2x_auto(image[0], out_dtype=jnp.float32)
            x = jnp.clip(jnp.floor(ds + 0.5), 0, 255)[None]
            x = x.astype(compute_dtype)
        else:
            x = image.astype(compute_dtype)
        preds, new_buffer = model.apply(variables, x, buffer=buffer, mode="on_pipe")
        dets = postprocess_fixed(
            preds, num_classes=num_classes, conf_thre=conf_thre,
            nms_thre=nms_thre, pre_nms_topk=pre_nms_topk,
        )
        return dets, new_buffer

    return _step


def _warn_if_fp32_built(model, use_bf16: bool) -> None:
    """The streaming steps cast only the INPUT; fp32-built flax modules
    promote straight back, silently running the whole trunk fp32 (~20x on a
    v5e). Shared by both detector constructors."""
    import jax.numpy as jnp

    model_dtype = getattr(getattr(model, "backbone", None), "dtype", None)
    if use_bf16 and model_dtype == jnp.float32:
        get_logger().warning(
            "use_bf16=True but the model's modules are built fp32 — the "
            "trunk will compute fp32 anyway; set "
            "exp.compute_dtype='bfloat16' before get_model()")


def _stream_aot_key(model, variables, image_shape, **config) -> str:
    """Content key for the detector's serialized executables: model
    hyperparams (flax module repr), variables avals, the exact input shape,
    and every postprocess knob — plus the environment via executable_key."""
    import hashlib

    import jax

    from streamyolo_tpu.utils.aot import executable_key

    avals = jax.tree_util.tree_map(
        lambda a: (tuple(getattr(a, "shape", ())),
                   str(getattr(a, "dtype", type(a).__name__))),
        variables,
    )
    config.setdefault("kind", "stream_step")
    return executable_key(
        model=hashlib.sha256(repr(model).encode()).hexdigest(),
        variables=hashlib.sha256(repr(avals).encode()).hexdigest(),
        image_shape=tuple(image_shape),
        **config,
    )


def _stream_executable_paths(aot_dir: str, key: str) -> Tuple[str, str]:
    stem = os.path.join(aot_dir, f"stream_{key[:20]}")
    return stem + ".star.jaxexec", stem + ".buf.jaxexec"


def export_stream_executables(
    model,
    variables,
    aot_dir: str,
    *,
    input_size: Tuple[int, int] = (600, 960),
    conf_thre: float = 0.01,
    nms_thre: float = 0.65,
    num_classes: int = 8,
    pre_nms_topk: int = 200,
    use_bf16: bool = True,
    device_preproc: bool = False,
) -> Tuple[str, str]:
    """AOT-compile the TPUStreamDetector star and steady-state programs for
    the exact serving configuration and serialize both under ``aot_dir``
    (`utils/aot.py::save_executable`). A later ``TPUStreamDetector(...,
    aot_dir=...)`` with the same configuration loads them and never traces
    or compiles — the full TensorRT-engine capability of the reference's
    deployment slot (`/root/reference/tools/eval.py:179-191`).

    Returns the two artifact paths (star, steady-state)."""
    import jax
    import jax.numpy as jnp

    from streamyolo_tpu.utils.aot import aot_compile, save_executable

    variables = jax.device_put(variables)
    compute_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    config = dict(
        num_classes=num_classes, conf_thre=conf_thre, nms_thre=nms_thre,
        pre_nms_topk=pre_nms_topk, compute_dtype=str(compute_dtype.__name__),
        device_preproc=device_preproc,
    )
    step = _build_stream_step(
        model, num_classes=num_classes, conf_thre=conf_thre,
        nms_thre=nms_thre, pre_nms_topk=pre_nms_topk,
        compute_dtype=compute_dtype, device_preproc=device_preproc,
    )
    scale = 2 if device_preproc else 1
    image = np.zeros(
        (1, scale * input_size[0], scale * input_size[1], 3), np.uint8)
    key = _stream_aot_key(model, variables, image.shape, **config)
    star_path, buf_path = _stream_executable_paths(aot_dir, key)

    star, t_star = aot_compile(step, variables, image, None)
    save_executable(star, star_path)
    _, buffer = star(variables, image, None)
    steady, t_buf = aot_compile(step, variables, image, buffer, donate_argnums=2)
    save_executable(steady, buf_path)
    get_logger().info(
        "exported AOT stream executables (star %.1fs, steady %.1fs) -> %s",
        t_star, t_buf, aot_dir)
    return star_path, buf_path


def _build_multi_stream_step(model, *, num_classes, conf_thre, nms_thre,
                             pre_nms_topk, compute_dtype):
    """MultiStreamDetector's batched per-step device program (shared by the
    jit and AOT paths): N frames -> cast -> batched on_pipe with per-row
    star_mask -> decode -> fixed-shape NMS."""
    from streamyolo_tpu.ops.nms import postprocess_fixed

    def _step(variables, images, buffer, star_mask):
        x = images.astype(compute_dtype)
        preds, new_buffer = model.apply(
            variables, x, buffer=buffer, mode="on_pipe",
            star_mask=star_mask,
        )
        dets = postprocess_fixed(
            preds, num_classes=num_classes, conf_thre=conf_thre,
            nms_thre=nms_thre, pre_nms_topk=pre_nms_topk,
        )
        return dets, new_buffer

    return _step


def export_multi_stream_executables(
    model,
    variables,
    aot_dir: str,
    *,
    n_streams: int,
    input_size: Tuple[int, int] = (600, 960),
    conf_thre: float = 0.01,
    nms_thre: float = 0.65,
    num_classes: int = 8,
    pre_nms_topk: int = 200,
    use_bf16: bool = True,
) -> Tuple[str, str]:
    """`export_stream_executables` for the batched N-camera program: a later
    ``MultiStreamDetector(..., aot_dir=...)`` with the same configuration
    starts compile-free."""
    import jax
    import jax.numpy as jnp

    from streamyolo_tpu.utils.aot import aot_compile, save_executable

    variables = jax.device_put(variables)
    compute_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    step = _build_multi_stream_step(
        model, num_classes=num_classes, conf_thre=conf_thre,
        nms_thre=nms_thre, pre_nms_topk=pre_nms_topk,
        compute_dtype=compute_dtype,
    )
    images = np.zeros((n_streams, input_size[0], input_size[1], 3), np.uint8)
    key = _stream_aot_key(
        model, variables, images.shape,
        kind="multi_stream_step", num_classes=num_classes,
        conf_thre=conf_thre, nms_thre=nms_thre, pre_nms_topk=pre_nms_topk,
        compute_dtype=str(compute_dtype.__name__),
    )
    star_path, buf_path = _stream_executable_paths(aot_dir, key)

    star, t_star = aot_compile(step, variables, images, None, None)
    save_executable(star, star_path)
    _, buffer = star(variables, images, None, None)
    mask = np.zeros(n_streams, bool)
    steady, t_buf = aot_compile(
        step, variables, images, buffer, mask, donate_argnums=2)
    save_executable(steady, buf_path)
    get_logger().info(
        "exported multi-stream AOT executables for %d streams (star %.1fs, "
        "steady %.1fs) -> %s", n_streams, t_star, t_buf, aot_dir)
    return star_path, buf_path


class TPUStreamDetector:
    """Stateful streaming detector: carries the DFP buffer across frames.

    Parse contract (matching `streamyolo_det.py:62-83`): returns
    (bboxes_ltrb / in_scale, scores, int labels, None-masks).
    """

    def __init__(
        self,
        model,
        variables,
        input_size: Tuple[int, int] = (600, 960),
        in_scale: float = 0.5,
        conf_thre: float = 0.01,
        nms_thre: float = 0.65,
        num_classes: int = 8,
        pre_nms_topk: int = 200,
        use_bf16: bool = True,
        device_preproc: bool = False,
        mesh=None,
        aot_dir: Optional[str] = None,
    ):
        import jax
        import jax.numpy as jnp

        if mesh is not None and device_preproc:
            raise ValueError(
                "device_preproc uses a Pallas kernel that is not mesh-"
                "partitioned; use the host preproc path with a spatial mesh")
        self.input_size = input_size
        self.in_scale = in_scale
        self.conf_thre = conf_thre
        self.pre_nms_topk = pre_nms_topk
        self.n_saturated = 0  # frames where the top-k candidate cap bit
        self.device_preproc = device_preproc
        self._buffer = None
        self.aot_loaded = False
        self.variables = jax.device_put(variables)
        compute_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
        _warn_if_fp32_built(model, use_bf16)

        _step = _build_stream_step(
            model, num_classes=num_classes, conf_thre=conf_thre,
            nms_thre=nms_thre, pre_nms_topk=pre_nms_topk,
            compute_dtype=compute_dtype, device_preproc=device_preproc,
        )

        if mesh is not None and mesh.devices.size > 1:
            # Spatial latency mode: one frame's rows sliced over the mesh
            # (parallel/spatial.py). Only the INPUT image carries an explicit
            # sharding (device_put is strict: H must divide by the mesh size
            # — true for 600x960 on 2/4/8 chips); GSPMD propagates it through
            # the step, padding the uneven pyramid levels internally, and
            # picks the carried buffer's sharding itself (feeding it back is
            # consistent: the same program runs every steady-state step).
            # Donation of a multi-partition carry is gated off (same class
            # of restriction as trainer._donation_safe); the buffer is a
            # few MB, so the copy is noise next to the backbone.
            from streamyolo_tpu.parallel.spatial import replicated, row_sharding

            n = int(mesh.devices.size)
            if input_size[0] % n:
                raise ValueError(
                    f"spatial mesh of {n} devices needs input H divisible "
                    f"by {n}, got {input_size[0]}")
            repl, rows = replicated(mesh), row_sharding(mesh)
            self.variables = jax.device_put(self.variables, repl)
            self._step_star = self._step_buf = jax.jit(_step)
            self._device_put = lambda x: jax.device_put(x, rows)
        else:
            self._device_put = jax.device_put
            if aot_dir is not None:
                # Serving from serialized executables (written by
                # `export_stream_executables` / `tools/precompile.py --serve`):
                # construction is a file read, the first frame never traces or
                # compiles. Any mismatch (shapes, thresholds, model, device,
                # jax version) changes the key, so a stale artifact is a cache
                # miss, not a wrong answer.
                scale = 2 if device_preproc else 1
                key = _stream_aot_key(
                    model, self.variables,
                    (1, scale * input_size[0], scale * input_size[1], 3),
                    num_classes=num_classes, conf_thre=conf_thre,
                    nms_thre=nms_thre, pre_nms_topk=pre_nms_topk,
                    compute_dtype=str(compute_dtype.__name__),
                    device_preproc=device_preproc,
                )
                from streamyolo_tpu.utils.aot import load_executable

                star_path, buf_path = _stream_executable_paths(aot_dir, key)
                star, steady = load_executable(star_path), load_executable(buf_path)
                if star is not None and steady is not None:
                    # Probe both executables with one real execution before
                    # they may serve traffic: deserialization can succeed
                    # while execution later fails (observed on XLA:CPU — a
                    # "Buffer Definition Event: Function ... not found"
                    # symbol-registry collision in processes that already
                    # compiled many programs). The probe doubles as the
                    # serving warmup, so the first real frame runs at
                    # steady-state speed.
                    probe = np.zeros(
                        (1, scale * input_size[0], scale * input_size[1], 3),
                        np.uint8)
                    try:
                        _, pbuf = star(self.variables, probe, None)
                        pdets, pbuf = steady(self.variables, probe, pbuf)
                        jax.block_until_ready((pdets, pbuf))
                    except Exception as e:  # noqa: BLE001 — any failure re-jits
                        get_logger().warning(
                            "AOT executables under %s loaded but failed the "
                            "execution probe (%s) — falling back to jit",
                            aot_dir, e)
                    else:
                        self._step_star, self._step_buf = star, steady
                        self.aot_loaded = True
                        get_logger().info(
                            "loaded AOT executable pair (key %s) from %s — "
                            "compile-free startup", key[:20], aot_dir)
                else:
                    get_logger().warning(
                        "no AOT executables for key %s under %s — falling "
                        "back to jit (run tools/precompile.py --serve)",
                        key[:20], aot_dir)
            if not self.aot_loaded:
                # star (first frame) and steady-state (donated buffer) programs
                self._step_star = jax.jit(_step)
                self._step_buf = jax.jit(_step, donate_argnums=2)

    def reset(self):
        self._buffer = None

    def warmup(self, n: int = 10):
        """Compile + warm both programs (reference warms x10,
        `streamyolo_det.py:113-121`)."""
        scale = 2 if self.device_preproc else 1
        frame = np.zeros(
            (scale * self.input_size[0], scale * self.input_size[1], 3),
            np.uint8)
        self.reset()
        for _ in range(n):
            self(frame, preprocessed=True)
        self.reset()

    def preproc(self, frame_bgr: np.ndarray) -> np.ndarray:
        """Plain resize to the streaming input size (`streamyolo_det.py:57-60`
        — the online path does NOT letterbox). Stays uint8: the cast happens
        on device (4x less H2D traffic).

        With ``device_preproc`` the compiled step expects the raw frame at
        exactly 2x the input size (the 0.5x resize runs on device inside the
        step, so the host does no pixel work at all); other source shapes
        must use the host path."""
        if self.device_preproc:
            want = (2 * self.input_size[0], 2 * self.input_size[1])
            if frame_bgr.shape[:2] != want:
                raise ValueError(
                    f"device_preproc expects raw {want[0]}x{want[1]} frames "
                    f"(2x the input size), got {frame_bgr.shape[:2]} — use "
                    "device_preproc=False for other source resolutions")
            return frame_bgr
        import cv2

        return cv2.resize(
            frame_bgr, (self.input_size[1], self.input_size[0]),
            interpolation=cv2.INTER_LINEAR,
        )

    def __call__(self, frame_bgr: np.ndarray, preprocessed: bool = False):
        frame = frame_bgr if preprocessed else self.preproc(frame_bgr)
        image = self._device_put(frame[None])
        if self._buffer is None:
            dets, self._buffer = self._step_star(self.variables, image, None)
        else:
            dets, self._buffer = self._step_buf(self.variables, image, self._buffer)
        rows = np.asarray(dets)[0]  # [K, 8] — the only per-frame D2H
        # Saturation check (no extra transfer: every slot carries its raw
        # obj/cls_conf payload). All K slots above conf => candidates were
        # silently dropped pre-NMS; log the first few occurrences.
        if int((rows[:, 4] * rows[:, 5] >= self.conf_thre).sum()) >= rows.shape[0]:
            self.n_saturated += 1
            if self.n_saturated <= 3 or self.n_saturated % 100 == 0:
                get_logger().warning(
                    "streaming pre-NMS selection saturated (%d candidates "
                    "above conf %.4g; frame count %d) — raise pre_nms_topk "
                    "for dense scenes",
                    self.pre_nms_topk, self.conf_thre, self.n_saturated,
                )
        kept = rows[rows[:, 7] > 0.5]
        bboxes = kept[:, :4] / self.in_scale
        scores = kept[:, 4] * kept[:, 5]
        labels = kept[:, 6].astype(np.int32)
        return bboxes, scores, labels, None


class MultiStreamDetector:
    """N independent camera streams batched through ONE jitted on_pipe step.

    The on_pipe step is row-wise independent — each batch row carries its
    own slice of the DFP buffer — so N streams cost one batched dispatch
    instead of N single-frame dispatches, and the batch amortizes the
    per-level narrow tails far better than b=1 (the README multi-stream
    row: 8 StreamYOLO-l streams in 5.01 ms = 1597 frames/s/chip vs ~708 at
    b=1; int8 PTQ 1844 — measured on this class's steady-state program at
    the serving operating point). The reference can only scale streams by
    adding
    GPUs — one process per stream (`/root/reference/sAP/streamyolo/
    streamyolo_det.py` drives exactly one sequence per run).

    Per-stream restarts (a camera drops and reconnects) thread the model's
    ``star_mask``: a marked row fuses with its OWN current features — the
    reference's 'star' first-frame semantics (`/root/reference/exps/model/
    dfp_pafpn.py:177-197`) — while the other rows keep their carry, in the
    same compiled program (no recompile, no per-stream dispatch).

    Call contract: ``detections = det(frames)`` with ``frames`` a sequence
    of ``n_streams`` BGR frames (or a stacked [N, H, W, 3] array); returns
    a list of ``n_streams`` ``(bboxes_ltrb / in_scale, scores, labels,
    None)`` tuples — each entry exactly ``TPUStreamDetector``'s parse
    contract for that stream.
    """

    def __init__(
        self,
        model,
        variables,
        n_streams: int,
        input_size: Tuple[int, int] = (600, 960),
        in_scale: float = 0.5,
        conf_thre: float = 0.01,
        nms_thre: float = 0.65,
        num_classes: int = 8,
        pre_nms_topk: int = 200,
        use_bf16: bool = True,
        aot_dir: Optional[str] = None,
    ):
        import jax
        import jax.numpy as jnp

        assert n_streams >= 1
        self.n_streams = n_streams
        self.input_size = input_size
        self.in_scale = in_scale
        self.conf_thre = conf_thre
        self.pre_nms_topk = pre_nms_topk
        self.n_saturated = 0
        self._buffer = None
        self._pending_star = np.zeros(n_streams, bool)
        self.aot_loaded = False
        self.variables = jax.device_put(variables)
        compute_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
        _warn_if_fp32_built(model, use_bf16)

        _step = _build_multi_stream_step(
            model, num_classes=num_classes, conf_thre=conf_thre,
            nms_thre=nms_thre, pre_nms_topk=pre_nms_topk,
            compute_dtype=compute_dtype,
        )

        if aot_dir is not None:
            # Compile-free N-camera startup from serialized executables
            # (written by `export_multi_stream_executables` /
            # `tools/precompile.py --serve DIR --streams N`).
            key = _stream_aot_key(
                model, self.variables,
                (n_streams, input_size[0], input_size[1], 3),
                kind="multi_stream_step", num_classes=num_classes,
                conf_thre=conf_thre, nms_thre=nms_thre,
                pre_nms_topk=pre_nms_topk,
                compute_dtype=str(compute_dtype.__name__),
            )
            from streamyolo_tpu.utils.aot import load_executable

            star_path, buf_path = _stream_executable_paths(aot_dir, key)
            star, steady = load_executable(star_path), load_executable(buf_path)
            if star is not None and steady is not None:
                # Execution probe before serving (see TPUStreamDetector:
                # deserialization can succeed while execution fails); also
                # the warmup, so the first real batch runs steady-state.
                probe = np.zeros(
                    (n_streams, input_size[0], input_size[1], 3), np.uint8)
                mask = np.zeros(n_streams, bool)
                try:
                    _, pbuf = star(self.variables, probe, None, None)
                    pdets, pbuf = steady(self.variables, probe, pbuf, mask)
                    jax.block_until_ready((pdets, pbuf))
                except Exception as e:  # noqa: BLE001 — any failure re-jits
                    get_logger().warning(
                        "multi-stream AOT executables under %s loaded but "
                        "failed the execution probe (%s) — falling back to "
                        "jit", aot_dir, e)
                else:
                    self._step_star, self._step_buf = star, steady
                    self.aot_loaded = True
                    get_logger().info(
                        "loaded multi-stream AOT executable pair (key %s) "
                        "from %s — compile-free startup", key[:20], aot_dir)
            else:
                get_logger().warning(
                    "no multi-stream AOT executables for key %s under %s — "
                    "falling back to jit (run tools/precompile.py --serve "
                    "DIR --streams %d)", key[:20], aot_dir, n_streams)
        if not self.aot_loaded:
            # first batch (all streams star) and steady state (donated carry)
            self._step_star = jax.jit(_step)
            self._step_buf = jax.jit(_step, donate_argnums=2)
        self._device_put = jax.device_put

    def reset(self, stream: Optional[int] = None):
        """``reset()`` restarts every stream (next call is the star batch);
        ``reset(i)`` marks stream ``i`` to re-star on the next step while the
        other streams keep their buffer carry."""
        if stream is None:
            self._buffer = None
            self._pending_star[:] = False
        else:
            if not 0 <= stream < self.n_streams:
                raise IndexError(
                    f"stream index {stream} out of range [0, {self.n_streams})")
            self._pending_star[stream] = True

    def warmup(self, n: int = 10):
        frames = np.zeros(
            (self.n_streams, self.input_size[0], self.input_size[1], 3),
            np.uint8)
        self.reset()
        for _ in range(n):
            self(frames, preprocessed=True)
        self.reset()

    def preproc(self, frame_bgr: np.ndarray) -> np.ndarray:
        """Per-stream host resize (`TPUStreamDetector.preproc` host path)."""
        import cv2

        return cv2.resize(
            frame_bgr, (self.input_size[1], self.input_size[0]),
            interpolation=cv2.INTER_LINEAR,
        )

    def __call__(self, frames, preprocessed: bool = False):
        if not preprocessed:
            frames = np.stack([self.preproc(f) for f in frames])
        else:
            frames = np.asarray(frames)
            if frames.ndim == 3 and self.n_streams == 1:
                # accept a single unstacked frame in the 1-stream case
                frames = frames[None]
        assert frames.shape[0] == self.n_streams, (
            f"expected {self.n_streams} frames, got {frames.shape[0]}")
        images = self._device_put(frames)
        if self._buffer is None:
            dets, self._buffer = self._step_star(
                self.variables, images, None, None)
        else:
            dets, self._buffer = self._step_buf(
                self.variables, images, self._buffer,
                self._pending_star.copy())
        self._pending_star[:] = False
        rows_all = np.asarray(dets)  # [N, K, 8] — the only per-frame D2H
        out = []
        for rows in rows_all:
            if int((rows[:, 4] * rows[:, 5] >= self.conf_thre).sum()) \
                    >= rows.shape[0]:
                self.n_saturated += 1
                if self.n_saturated <= 3 or self.n_saturated % 100 == 0:
                    get_logger().warning(
                        "multi-stream pre-NMS selection saturated (%d "
                        "candidates above conf %.4g; count %d) — raise "
                        "pre_nms_topk for dense scenes",
                        self.pre_nms_topk, self.conf_thre, self.n_saturated,
                    )
            kept = rows[rows[:, 7] > 0.5]
            out.append((
                kept[:, :4] / self.in_scale,
                kept[:, 4] * kept[:, 5],
                kept[:, 6].astype(np.int32),
                None,
            ))
        return out


class SimulatedDetector:
    """Oracle/simulated detector for CPU tests: emits the ground truth of the
    input frame (optionally perturbed) and reports runtimes drawn from an
    ``Empirical`` distribution (`sAP/det/srt_det.py` pattern)."""

    def __init__(self, gt_by_fidx, runtime_dist: Empirical):
        self.gt_by_fidx = gt_by_fidx
        self.runtime_dist = runtime_dist

    def reset(self):
        pass

    def __call__(self, fidx: int):
        boxes, labels = self.gt_by_fidx(fidx)
        scores = np.ones(len(boxes))
        return np.asarray(boxes, np.float64), scores, np.asarray(labels, np.int32), None


def stream_sequence(
    frames: Sequence,
    detector,
    fps: float = 30.0,
    clock=None,
    det_stride: int = 1,
    dynamic_schedule: bool = False,
    runtime_dist: Optional[Empirical] = None,
    frame_arg_is_index: bool = False,
) -> Dict[str, list]:
    """Run the streaming protocol over one sequence.

    With ``clock=WallClock()`` and a real detector this is the production
    loop; with ``clock=SimClock()`` + ``runtime_dist`` the detector's latency
    is simulated and the run is deterministic on any host.
    """
    clock = clock or WallClock()
    clock.reset()
    n_frame = len(frames)
    t_total = n_frame / fps

    timestamps: List[float] = []
    results_parsed: List[tuple] = []
    input_fidx: List[int] = []
    runtime: List[float] = []
    last_fidx = None
    stride_cnt = 0
    detector.reset()

    while True:
        t1 = clock.now()
        if t1 >= t_total:
            break
        fidx_continous = t1 * fps
        fidx = int(np.floor(fidx_continous))
        if fidx == last_fidx:
            # real clock: busy-wait until the next frame; sim clock: hop to it
            if isinstance(clock, SimClock):
                clock.advance((fidx + 1) / fps - t1 + 1e-9)
            continue
        last_fidx = fidx
        if dynamic_schedule:
            if fidx_continous - fidx > 0.5:  # more than half a period late
                continue
        else:
            if stride_cnt % det_stride == 0:
                stride_cnt = 1
            else:
                stride_cnt += 1
                continue

        arg = fidx if frame_arg_is_index else frames[fidx]
        result = detector(arg)
        if runtime_dist is not None:
            dt = runtime_dist.draw()
            clock.advance(dt)
        t2 = clock.now()
        if t2 >= t_total:
            break
        timestamps.append(t2)
        results_parsed.append(result)
        input_fidx.append(fidx)
        runtime.append(t2 - t1)

    return {
        "results_parsed": results_parsed,
        "timestamps": timestamps,
        "input_fidx": input_fidx,
        "runtime": runtime,
    }


def print_stats(arr, name: str = "", fmt: str = "{:.4g}", cvt=lambda x: x):
    """Runtime stats line (parity with mtli/sAP ``print_stats`` consumed at
    `streamyolo_det.py:225-229`)."""
    arr = np.asarray(arr)
    logger = get_logger()
    logger.info(
        f"{name}: mean: {fmt.format(cvt(arr.mean()))}; std: {fmt.format(cvt(arr.std(ddof=1)))}; "
        f"min: {fmt.format(cvt(arr.min()))}; max: {fmt.format(cvt(arr.max()))}"
    )


def run_streaming_detection(
    db,
    data_root: str,
    out_dir: str,
    detector,
    fps: float = 30.0,
    det_stride: int = 1,
    dynamic_schedule: bool = False,
    clock=None,
    runtime_dist: Optional[Empirical] = None,
    overwrite: bool = False,
) -> Dict:
    """Whole-dataset streaming run: per-sequence pkls + ``time_info.pkl``
    (`streamyolo_det.py:123-229`). ``db`` is a COCO index whose dataset
    carries ``sequences`` + ``seq_dirs``."""
    import cv2

    logger = get_logger()
    os.makedirs(out_dir, exist_ok=True)
    seqs = db.dataset["sequences"]
    seq_dirs = db.dataset["seq_dirs"]

    runtime_all: List[float] = []
    n_processed = 0
    n_total = 0
    for sid, seq in enumerate(seqs):
        frame_list = [img for img in db.imgs.values() if img["sid"] == sid]
        frames = []
        for img in frame_list:
            path = os.path.join(data_root, seq_dirs[sid], img["name"])
            frame = cv2.imread(path)
            assert frame is not None, path
            # preprocessing outside the clock would be cheating: the
            # reference resizes inside the loop; we preload raw frames only.
            frames.append(frame)
        n_total += len(frames)

        result = stream_sequence(
            frames, detector, fps=fps, clock=clock,
            det_stride=det_stride, dynamic_schedule=dynamic_schedule,
            runtime_dist=runtime_dist,
        )
        out_path = os.path.join(out_dir, seq + ".pkl")
        if overwrite or not os.path.isfile(out_path):
            with open(out_path, "wb") as f:
                pickle.dump(result, f)
        runtime_all += result["runtime"]
        n_processed += len(result["results_parsed"])

    runtime_all_np = np.asarray(runtime_all)
    n_small_runtime = int((runtime_all_np < 1.0 / fps).sum()) if len(runtime_all) else 0
    time_info = {
        "runtime_all": runtime_all,
        "n_processed": n_processed,
        "n_total": n_total,
        "n_small_runtime": n_small_runtime,
    }
    out_path = os.path.join(out_dir, "time_info.pkl")
    if overwrite or not os.path.isfile(out_path):
        with open(out_path, "wb") as f:
            pickle.dump(time_info, f)

    logger.info(f"{n_processed}/{n_total} frames processed")
    if len(runtime_all):
        print_stats(runtime_all_np, "Runtime (ms)", cvt=lambda x: 1e3 * x)
        logger.info(
            f"Runtime smaller than unit time interval: "
            f"{n_small_runtime}/{n_processed} "
            f"({100.0 * n_small_runtime / max(n_processed, 1):.4g}%)"
        )
    return time_info


def stream_sequence_infinite(
    frames: Sequence,
    detector,
    fps: float = 30.0,
    runtime_dist: Optional[Empirical] = None,
    frame_arg_is_index: bool = False,
) -> Dict[str, list]:
    """Infinite-compute simulation: EVERY frame is processed (as if by its
    own accelerator); each result becomes visible at frame_time + runtime —
    the `sAP/det/srt_det_inf.py` capability, used to isolate algorithmic
    latency from device-count limits. Results are emitted in completion-time
    order so the pairing pass consumes them like a real run."""
    n_frame = len(frames)
    detector.reset()
    entries = []
    for fidx in range(n_frame):
        arg = fidx if frame_arg_is_index else frames[fidx]
        result = detector(arg)
        rt = runtime_dist.draw() if runtime_dist is not None else 0.0
        entries.append((fidx / fps + rt, fidx, result, rt))
    entries.sort(key=lambda e: e[0])
    horizon = n_frame / fps
    out = {"results_parsed": [], "timestamps": [], "input_fidx": [], "runtime": []}
    for ts, fidx, result, rt in entries:
        if ts >= horizon:
            continue
        out["timestamps"].append(ts)
        out["results_parsed"].append(result)
        out["input_fidx"].append(fidx)
        out["runtime"].append(rt)
    return out
