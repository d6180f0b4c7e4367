"""Weight-import + forward parity of the NN blocks against the torch oracle.

These tests are the unit-level analogue of the BASELINE requirement that the
released ``.pth`` weights load bit-matched: random torch weights are imported
through ``streamyolo_tpu.utils.torch_import`` and the NHWC/JAX forward must
reproduce the NCHW/torch forward to float32 tolerance.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from streamyolo_tpu.nn import BaseConv, CSPLayer, DWConv, Focus, SPPBottleneck
from streamyolo_tpu.utils.torch_import import merge_variables, state_dict_to_variables

from . import torch_oracle as oracle


def run_parity(torch_mod, flax_mod, x_nchw, atol=2e-5):
    torch_mod.eval()
    with torch.no_grad():
        ref = torch_mod(torch.from_numpy(x_nchw)).numpy()

    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    variables = flax_mod.init(jax.random.PRNGKey(0), x_nhwc)
    loaded = state_dict_to_variables(torch_mod.state_dict())
    variables = merge_variables(variables, loaded, strict=True)
    out = flax_mod.apply(variables, x_nhwc)
    out_nchw = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_nchw, ref, atol=atol, rtol=1e-5)


@pytest.mark.parametrize("stride,ksize", [(1, 3), (2, 3), (1, 1)])
def test_baseconv(rng, stride, ksize):
    torch.manual_seed(0)
    m = oracle.BaseConv(8, 16, ksize, stride)
    x = rng.standard_normal((2, 8, 13, 17), dtype=np.float32)
    run_parity(m, BaseConv(out_channels=16, ksize=ksize, stride=stride), x)


def test_dwconv(rng):
    torch.manual_seed(0)
    m = oracle.DWConv(8, 16, 3, 2)
    x = rng.standard_normal((1, 8, 12, 12), dtype=np.float32)
    run_parity(m, DWConv(out_channels=16, ksize=3, stride=2), x)


@pytest.mark.parametrize("shortcut", [True, False])
def test_csplayer(rng, shortcut):
    torch.manual_seed(1)
    m = oracle.CSPLayer(16, 16, n=2, shortcut=shortcut)
    x = rng.standard_normal((2, 16, 10, 14), dtype=np.float32)
    run_parity(m, CSPLayer(out_channels=16, n=2, shortcut=shortcut), x)


def test_spp(rng):
    torch.manual_seed(2)
    m = oracle.SPPBottleneck(32, 32)
    x = rng.standard_normal((1, 32, 19, 30), dtype=np.float32)
    run_parity(m, SPPBottleneck(out_channels=32), x)


def test_focus(rng):
    torch.manual_seed(3)
    m = oracle.Focus(3, 16, ksize=3)
    x = rng.standard_normal((2, 3, 24, 32), dtype=np.float32)
    run_parity(m, Focus(out_channels=16, ksize=3), x)


def test_baseconv_train_mode_updates_stats(rng):
    """BN running stats must update with torch momentum semantics."""
    torch.manual_seed(4)
    m = oracle.BaseConv(4, 8, 3, 1)
    x = rng.standard_normal((2, 4, 8, 8), dtype=np.float32)

    m.train()
    with torch.no_grad():
        ref_train = m(torch.from_numpy(x)).numpy()
    ref_mean = m.bn.running_mean.numpy()
    ref_var = m.bn.running_var.numpy()

    fm = BaseConv(out_channels=8, ksize=3, stride=1)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), x_nhwc)
    # import the *initial* torch state (before the train step mutated it)
    torch.manual_seed(4)
    m2 = oracle.BaseConv(4, 8, 3, 1)
    variables = merge_variables(
        variables, state_dict_to_variables(m2.state_dict()), strict=True
    )
    out, mutated = fm.apply(variables, x_nhwc, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_train, atol=2e-5, rtol=1e-4
    )
    got_mean = np.asarray(mutated["batch_stats"]["bn"]["mean"])
    got_var = np.asarray(mutated["batch_stats"]["bn"]["var"])
    np.testing.assert_allclose(got_mean, ref_mean, atol=1e-5)
    # torch uses unbiased variance for the running stat
    np.testing.assert_allclose(got_var, ref_var, atol=1e-4, rtol=1e-3)
