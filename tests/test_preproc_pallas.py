"""Pallas fused preprocess kernel vs cv2 INTER_LINEAR and the jnp oracle
(interpret mode — runs on the CPU test backend)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from streamyolo_tpu.ops.preproc_pallas import (
    downsample2x_bilinear,
    downsample2x_reference,
)


def test_matches_jnp_oracle(rng):
    frame = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    out = downsample2x_bilinear(frame, out_dtype=jnp.float32, interpret=True)
    ref = downsample2x_reference(frame)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_matches_cv2_inter_linear(rng):
    """cv2 INTER_LINEAR at exactly scale 0.5 is the 2x2 box average (source
    coordinate (i+0.5)*2-0.5 = 2i+0.5 -> equal weights)."""
    frame = rng.integers(0, 256, (120, 192, 3), dtype=np.uint8)
    got = np.asarray(downsample2x_bilinear(frame, out_dtype=jnp.float32, interpret=True))
    want = cv2.resize(frame, (96, 60), interpolation=cv2.INTER_LINEAR)
    # cv2 rounds half AWAY from zero (not banker's) when writing uint8
    rounded = np.floor(got + 0.5).clip(0, 255).astype(np.uint8)
    np.testing.assert_array_equal(rounded, want)


def test_odd_row_tile(rng):
    # height where the default 8-row tile doesn't divide evenly (h2=30 -> 2)
    frame = rng.integers(0, 256, (60, 32, 3), dtype=np.uint8)
    out = downsample2x_bilinear(frame, out_dtype=jnp.float32, interpret=True)
    ref = downsample2x_reference(frame)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_bf16_output(rng):
    frame = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = downsample2x_bilinear(frame, interpret=True)
    assert out.dtype == jnp.bfloat16
