"""End-to-end streaming benchmark on the real TPU chip.

Measures the full per-frame streaming step of StreamYOLO-l (the headline
36.9-sAP variant) at the reference's 600x960 input: host image -> device,
backbone ONCE on the current frame, DFP fusion with the HBM-resident buffer,
decoupled head, decode, fixed-shape class-aware NMS, final boxes -> host.
This is the loop the reference runs on a V100 at `sAP/streamyolo/
streamyolo_det.py:152-195`; the V100 baseline is the 30 FPS real-time bar the
README sets for that hardware (`/root/reference/README.md:126-137`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

V100_BASELINE_FPS = 30.0  # real-time bar on the reference hardware


def main():
    import jax

    from streamyolo_tpu.models.dfp_pafpn import DFPPAFPN
    from streamyolo_tpu.models.heads import TALHead
    from streamyolo_tpu.models.yolox import StreamYOLO
    from streamyolo_tpu.ops.nms import postprocess_fixed

    model = StreamYOLO(
        backbone=DFPPAFPN(depth=1.0, width=1.0),
        head=TALHead(num_classes=8, width=1.0),
    )
    rng = jax.random.PRNGKey(0)
    img = np.random.RandomState(0).randint(0, 255, (1, 600, 960, 3)).astype(np.float32)
    variables = model.init(rng, img[:, :64, :96], mode="off_pipe", train=False)

    @jax.jit
    def stream_step(variables, image, buffer):
        preds, new_buffer = model.apply(variables, image, buffer=buffer, mode="on_pipe")
        dets = postprocess_fixed(preds, num_classes=8, conf_thre=0.3, nms_thre=0.5,
                                 pre_nms_topk=200)
        return dets, new_buffer

    # First ('star') frame builds the buffer.
    image = jax.device_put(img)
    dets, buffer = stream_step(variables, image, None)

    @jax.jit
    def stream_step_buf(variables, image, buffer):
        preds, new_buffer = model.apply(variables, image, buffer=buffer, mode="on_pipe")
        dets = postprocess_fixed(preds, num_classes=8, conf_thre=0.3, nms_thre=0.5,
                                 pre_nms_topk=200)
        return dets, new_buffer

    # Warmup (compile + cache), as the reference does x10 (`streamyolo_det.py:113-121`).
    for _ in range(5):
        dets, buffer = stream_step_buf(variables, image, buffer)
    np.asarray(dets)  # sync

    iters = 50
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        image = jax.device_put(img)  # H2D, part of the real loop
        dets, buffer = stream_step_buf(variables, image, buffer)
        np.asarray(dets)  # D2H of final boxes (sync)
        times.append(time.perf_counter() - t0)

    median_s = float(np.median(times))
    fps = 1.0 / median_s
    print(json.dumps({
        "metric": "streamyolo_l_stream_fps_600x960",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / V100_BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
