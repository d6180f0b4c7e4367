"""Golden tests: fixed-shape vectorized SimOTA + TAL loss vs the dynamic-
shape torch oracle (reference semantics, `tal_head.py:262-712`). This is the
highest-risk re-design in the framework (SURVEY.md §7 'Hard parts')."""

import numpy as np
import torch

import jax.numpy as jnp

from streamyolo_tpu.models.losses import streamyolo_losses

from . import torch_oracle as oracle

NCLS = 8
STRIDES = (8, 16, 32)
# Image geometry 64x80 -> level shapes (8,10), (4,5), (2,3 -> 2x2?) use 64x96
HW = [(8, 12), (4, 6), (2, 3)]
IMG_H, IMG_W = 64, 96


def random_batch(rng, batch=2, max_labels=10, n_gt=(2, 5), empty_support=False):
    outputs_t = []
    for (h, w) in HW:
        o = rng.standard_normal((batch, 5 + NCLS, h, w)).astype(np.float32) * 0.5
        outputs_t.append(o)
    labels = np.zeros((batch, max_labels, 5), np.float32)
    support = np.zeros((batch, max_labels, 5), np.float32)
    for b in range(batch):
        n = rng.integers(*n_gt)
        for i in range(n):
            cx, cy = rng.uniform(8, IMG_W - 8), rng.uniform(8, IMG_H - 8)
            w_, h_ = rng.uniform(6, 30), rng.uniform(6, 30)
            labels[b, i] = [rng.integers(0, NCLS), cx, cy, w_, h_]
            if not empty_support:
                # support gt: jittered copy (moving object)
                support[b, i] = [
                    labels[b, i, 0],
                    cx + rng.uniform(-6, 6),
                    cy + rng.uniform(-6, 6),
                    w_ * rng.uniform(0.8, 1.2),
                    h_ * rng.uniform(0.8, 1.2),
                ]
    return outputs_t, labels, support


def compare(outputs_t, labels, support, use_tal=True, use_l1=True, **tal_kw):
    ref = oracle.tal_losses_torch(
        [torch.from_numpy(o) for o in outputs_t],
        torch.from_numpy(labels),
        torch.from_numpy(support),
        NCLS,
        strides=STRIDES,
        use_l1=use_l1,
        use_tal=use_tal,
        **tal_kw,
    )
    outputs_j = [jnp.asarray(o.transpose(0, 2, 3, 1)) for o in outputs_t]
    got = streamyolo_losses(
        outputs_j,
        jnp.asarray(labels),
        jnp.asarray(support) if use_tal else None,
        NCLS,
        strides=STRIDES,
        use_l1=use_l1,
        use_tal=use_tal,
        **tal_kw,
    )
    for key in ["total_loss", "iou_loss", "conf_loss", "cls_loss", "l1_loss", "num_fg"]:
        np.testing.assert_allclose(
            float(got[key]), float(ref[key]), rtol=2e-4, atol=1e-5, err_msg=key
        )


def test_tal_loss_matches_reference(rng):
    for trial in range(4):
        outputs_t, labels, support = random_batch(rng, batch=2)
        compare(outputs_t, labels, support, gamma=1.0, ignore_thr=0.5, ignore_value=1.5)


def test_tal_loss_other_hyperparams(rng):
    outputs_t, labels, support = random_batch(rng, batch=3)
    compare(outputs_t, labels, support, gamma=1.0, ignore_thr=0.4, ignore_value=1.7)


def test_plain_loss_matches_reference(rng):
    """PIPE-head loss (still config): no trend weighting."""
    outputs_t, labels, support = random_batch(rng, batch=2)
    compare(outputs_t, labels, support, use_tal=False)


def test_no_l1(rng):
    outputs_t, labels, support = random_batch(rng, batch=2)
    compare(outputs_t, labels, support, use_l1=False, gamma=1.0,
            ignore_thr=0.5, ignore_value=1.5)


def test_empty_support_frame(rng):
    """support_num_gt == 0 -> TAL iou defaults to 1 (`tal_head.py:395-396`)."""
    outputs_t, labels, support = random_batch(rng, batch=2, empty_support=True)
    compare(outputs_t, labels, support, gamma=1.0, ignore_thr=0.5, ignore_value=1.5)


def test_image_without_gt(rng):
    outputs_t, labels, support = random_batch(rng, batch=2)
    labels[1] = 0.0
    support[1] = 0.0
    compare(outputs_t, labels, support, gamma=1.0, ignore_thr=0.5, ignore_value=1.5)


def test_crowded_image_conflicts(rng):
    """Heavily-overlapping gts force the >1-match conflict-resolution path."""
    outputs_t, labels, support = random_batch(rng, batch=1, max_labels=12, n_gt=(8, 11))
    # stack gts on top of each other
    labels[0, :8, 1] = np.linspace(30, 50, 8)
    labels[0, :8, 2] = 32.0
    labels[0, :8, 3:5] = 24.0
    compare(outputs_t, labels, support, gamma=1.0, ignore_thr=0.5, ignore_value=1.5)
