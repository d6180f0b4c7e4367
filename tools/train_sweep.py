"""Train-step batch-size sweep for the README roofline note.

Times the full jitted train step (fwd + SimOTA/TAL + bwd + SGD + EMA) of
StreamYOLO-s at 600x960 across per-chip batch sizes, syncing on the scalar
total_loss only (a big-array fetch through the dev relay would contaminate
the number). Prints one line per point.

Usage: python tools/train_sweep.py [B ...]   (default: 8 16 32)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))


def measure(batch: int, remat: bool = False, samples: int = 6, chain: int = 4):
    import jax
    import jax.numpy as jnp

    from streamyolo_tpu.models.dfp_pafpn import DFPPAFPN
    from streamyolo_tpu.models.heads import TALHead
    from streamyolo_tpu.models.yolox import StreamYOLO
    from streamyolo_tpu.train import (
        build_lr_schedule, create_train_state, jit_train_step, make_train_step,
    )
    from streamyolo_tpu.train.trainer import _donation_safe

    model = StreamYOLO(
        backbone=DFPPAFPN(depth=0.33, width=0.5, dtype=jnp.bfloat16),
        head=TALHead(num_classes=8, width=0.5, dtype=jnp.bfloat16),
    )
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (batch, 600, 960, 6)).astype(np.float32)
    labels = np.zeros((batch, 50, 5), np.float32)
    labels[:, :8, 0] = rs.randint(0, 8, (batch, 8))
    labels[:, :8, 1] = rs.uniform(100, 860, (batch, 8))
    labels[:, :8, 2] = rs.uniform(100, 500, (batch, 8))
    labels[:, :8, 3:5] = rs.uniform(20, 120, (batch, 8, 2))

    variables = model.init(
        jax.random.PRNGKey(0), images[:1], mode="off_pipe", train=False)
    lr_schedule = build_lr_schedule(
        "yoloxwarmcos", lr=0.001 / 64 * batch, iters_per_epoch=100,
        max_epoch=15, warmup_epochs=1, no_aug_epochs=15)
    state, tx = create_train_state(variables, lr_schedule)
    step_fn = make_train_step(
        model, tx, num_classes=8, lr_schedule=lr_schedule, remat=remat)
    jitted = jit_train_step(step_fn, donate=_donation_safe())

    batch_d = jax.device_put({
        "images": images, "labels": labels, "support_labels": labels.copy()})
    state = jax.device_put(state)
    state, metrics = jitted(state, batch_d)
    float(metrics["total_loss"])

    times = []
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(chain):
            state, metrics = jitted(state, batch_d)
        float(metrics["total_loss"])
        times.append((time.perf_counter() - t0) / chain)
    ms = min(times) * 1e3
    print(
        f"B={batch} remat={int(remat)}: {ms:.1f} ms/step, "
        f"{batch / min(times):.1f} imgs/s/chip "
        f"(median {np.median(times)*1e3:.1f}, max {np.max(times)*1e3:.1f})",
        flush=True,
    )


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    batches = [int(b) for b in sys.argv[1:] if not b.startswith("-")] or [8, 16, 32]
    remat = "--remat" in sys.argv
    for b in batches:
        measure(b, remat=remat)


if __name__ == "__main__":
    main()
