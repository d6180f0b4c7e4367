"""Exactness tests for the phase-packed (2x2 space-to-depth) execution path
(`streamyolo_tpu/nn/packed.py`): the packed CSPDarknet must be a pure
execution-layout change — same parameter tree, same outputs, same gradients,
same BatchNorm statistics as the raw layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamyolo_tpu.models.darknet import CSPDarknet
from streamyolo_tpu.nn.packed import (
    pack2x2,
    pack_grid,
    pack_w,
    phase_conv,
    unpack,
    unpack2x2,
)


def _apply_pack(x, spec):
    if spec == 4:  # integer factor: general space-to-depth
        return pack_grid(x, 4, 4)
    ph, pw = (spec, spec) if isinstance(spec, bool) else spec
    if ph and pw:
        return pack2x2(x)
    if pw:
        return pack_w(x)
    assert not ph
    return x


def _tree_allclose(a, b, rtol, atol_scale):
    """Leaf-wise comparison with the absolute tolerance scaled to each
    leaf's magnitude (reduction order differs between the layouts, so noise
    is proportional to the tensor scale, not elementwise)."""
    flat_a, _ = jax.tree_util.tree_flatten(a)
    flat_b, _ = jax.tree_util.tree_flatten(b)
    assert len(flat_a) == len(flat_b)
    for xa, xb in zip(flat_a, flat_b):
        xb = np.asarray(xb)
        np.testing.assert_allclose(
            np.asarray(xa), xb, rtol=rtol,
            atol=atol_scale * (np.abs(xb).max() + 1.0),
        )


def test_pack_unpack_roundtrip():
    x = np.random.RandomState(0).randn(2, 8, 12, 5).astype(np.float32)
    packed = pack2x2(jnp.asarray(x))
    assert packed.shape == (2, 4, 6, 20)
    np.testing.assert_array_equal(np.asarray(unpack2x2(packed)), x)


@pytest.mark.parametrize(
    "ksize,stride,packed_in,packed_out",
    [
        (1, 1, True, True),
        (3, 1, True, True),
        (3, 2, True, False),
        (3, 2, True, True),
        # W-only (factor 2) packing
        (1, 1, False, (False, True)),
        (1, 1, (False, True), (False, True)),
        (3, 1, (False, True), (False, True)),
        (3, 2, (False, True), False),
        # the stem spec: raw image in, 2x2-packed out, even kernel
        (6, 2, False, True),
        # the packed-input stem spec: 4x4-packed image in, 2x2-packed out
        (6, 2, 4, True),
        # factor-4 in, unpacked out (stride 4: the no-dark2-pack stem shape)
        (8, 4, 4, False),
    ],
)
def test_phase_conv_matches_raw_conv(ksize, stride, packed_in, packed_out):
    rs = np.random.RandomState(ksize * 7 + stride)
    c_in, c_out, h, w = 5, 7, 16, 24
    x = rs.randn(2, h, w, c_in).astype(np.float32)
    k = rs.randn(ksize, ksize, c_in, c_out).astype(np.float32)
    pad = (ksize - 1) // 2

    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(k),
        (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        ),
    )
    xin = _apply_pack(jnp.asarray(x), packed_in)
    out = phase_conv(
        xin,
        jnp.asarray(k),
        stride=stride,
        pad=pad,
        packed_in=packed_in,
        packed_out=packed_out,
        dtype=jnp.float32,
    )
    out = unpack(out, packed_out)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def _darknet_pair(wid_mul, out_features=("stem", "dark2", "dark3", "dark4", "dark5")):
    kw = dict(
        dep_mul=0.33,
        wid_mul=wid_mul,
        out_features=out_features,
        dtype=jnp.float32,
    )
    return CSPDarknet(packed=True, **kw), CSPDarknet(packed=False, **kw)


@pytest.mark.parametrize("wid_mul", [0.5, 0.75])
def test_packed_darknet_matches_raw_eval(wid_mul):
    packed, raw = _darknet_pair(wid_mul)
    x = jnp.asarray(
        np.random.RandomState(1).randn(2, 48, 64, 3).astype(np.float32)
    )
    variables = raw.init(jax.random.PRNGKey(0), x, train=False)
    # identical parameter trees: the packed model runs raw-initialized params
    out_p = packed.apply(variables, x, train=False)
    out_r = raw.apply(variables, x, train=False)
    assert set(out_p) == set(out_r)
    for name in out_r:
        assert out_p[name].shape == out_r[name].shape, name
        np.testing.assert_allclose(
            np.asarray(out_p[name]), np.asarray(out_r[name]),
            rtol=1e-4, atol=1e-4, err_msg=name,
        )


def test_packed_darknet_matches_raw_train_stats_and_grads():
    packed, raw = _darknet_pair(0.5, out_features=("dark3", "dark4", "dark5"))
    x = jnp.asarray(
        np.random.RandomState(2).randn(2, 48, 64, 3).astype(np.float32)
    )
    variables = raw.init(jax.random.PRNGKey(0), x, train=False)

    def loss_fn(model, params):
        def inner(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            return sum(jnp.sum(v * v) for v in out.values()), updates
        (loss, updates), grads = jax.value_and_grad(inner, has_aux=True)(params)
        return loss, updates["batch_stats"], grads

    loss_p, stats_p, grads_p = loss_fn(packed, variables["params"])
    loss_r, stats_r, grads_r = loss_fn(raw, variables["params"])
    np.testing.assert_allclose(float(loss_p), float(loss_r), rtol=1e-4)
    _tree_allclose(stats_p, stats_r, rtol=1e-3, atol_scale=1e-5)
    _tree_allclose(grads_p, grads_r, rtol=1e-3, atol_scale=1e-4)


def test_packed_falls_back_on_indivisible_shapes():
    """2x2 packing needs H,W % 8 == 0; on indivisible shapes the model
    still runs (stem/dark2 fall back to raw; W-only packing may still
    engage on even-W stages) and matches the raw layout."""
    packed, raw = _darknet_pair(0.5, out_features=("dark3",))
    x = jnp.asarray(
        np.random.RandomState(3).randn(1, 50, 70, 3).astype(np.float32)
    )
    variables = raw.init(jax.random.PRNGKey(0), x, train=False)
    out_p = packed.apply(variables, x, train=False)
    out_r = raw.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_p["dark3"]), np.asarray(out_r["dark3"]),
        rtol=1e-4, atol=1e-4,
    )
