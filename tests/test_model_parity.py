"""End-to-end forward parity of StreamYOLO (DFP-PAFPN + TAL head) against the
torch oracle: weight import, off_pipe eval decode, and the on_pipe DFP buffer
carry (`/root/reference/exps/model/dfp_pafpn.py:177-228`)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from streamyolo_tpu.models import DFPPAFPN, TALHead, StreamYOLO
from streamyolo_tpu.ops.resize import resize_bilinear_torch, resize_nearest
from streamyolo_tpu.utils.torch_import import merge_variables, state_dict_to_variables

from . import torch_oracle as oracle

DEPTH, WIDTH, NCLS = 0.33, 0.25, 8


def build_pair():
    torch.manual_seed(0)
    tmodel = oracle.StreamYOLOOracle(num_classes=NCLS, depth=DEPTH, width=WIDTH)
    tmodel.eval()
    jmodel = StreamYOLO(
        backbone=DFPPAFPN(depth=DEPTH, width=WIDTH),
        head=TALHead(num_classes=NCLS, width=WIDTH),
    )
    x0 = jnp.zeros((1, 64, 80, 6), jnp.float32)
    variables = jmodel.init(jax.random.PRNGKey(0), x0, mode="off_pipe")
    variables = merge_variables(
        variables, state_dict_to_variables(tmodel.state_dict()), strict=True
    )
    return tmodel, jmodel, variables


def test_off_pipe_eval_parity(rng):
    tmodel, jmodel, variables = build_pair()
    # 120x160: stride-16 level is 8x10 -> upsample to 15x20 (non-integer
    # scale), exercising the torch-nearest resize path at 600x960 geometry.
    x = rng.uniform(0, 255, (2, 6, 120, 160)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    out = jmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), mode="off_pipe")
    out = np.asarray(out)
    assert out.shape == ref.shape
    # decoded xy/wh are in pixel units (up to ~160); compare with mixed tol
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-4)


def test_on_pipe_matches_off_pipe(rng):
    """Streaming step with buffer must equal the 6-channel off_pipe result:
    feeding (cur, prev) off_pipe == on_pipe(cur) with buffer from prev."""
    tmodel, jmodel, variables = build_pair()
    cur = rng.uniform(0, 255, (1, 120, 160, 3)).astype(np.float32)
    prev = rng.uniform(0, 255, (1, 120, 160, 3)).astype(np.float32)

    off = jmodel.apply(
        variables, jnp.concatenate([jnp.asarray(cur), jnp.asarray(prev)], -1), mode="off_pipe"
    )
    # warm the buffer with prev, then stream cur
    _, buf = jmodel.apply(variables, jnp.asarray(prev), mode="on_pipe")
    on, buf2 = jmodel.apply(variables, jnp.asarray(cur), buffer=buf, mode="on_pipe")
    np.testing.assert_allclose(np.asarray(on), np.asarray(off), atol=1e-4, rtol=1e-5)
    # star node: buffer==None self-fuses
    star, _ = jmodel.apply(variables, jnp.asarray(cur), mode="on_pipe")
    off_dup = jmodel.apply(
        variables, jnp.concatenate([jnp.asarray(cur)] * 2, -1), mode="off_pipe"
    )
    np.testing.assert_allclose(np.asarray(star), np.asarray(off_dup), atol=1e-4, rtol=1e-5)


def test_resize_nearest_matches_torch(rng):
    for (h, w), (oh, ow) in [((38, 60), (75, 120)), ((8, 10), (15, 20)), ((4, 5), (8, 10))]:
        x = rng.standard_normal((1, 3, h, w)).astype(np.float32)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(oh, ow), mode="nearest"
        ).numpy()
        got = resize_nearest(jnp.asarray(x.transpose(0, 2, 3, 1)), (oh, ow))
        np.testing.assert_array_equal(np.asarray(got).transpose(0, 3, 1, 2), ref)


def test_resize_bilinear_matches_torch(rng):
    for (h, w), (oh, ow) in [((60, 96), (75, 120)), ((32, 32), (17, 23))]:
        x = rng.standard_normal((2, 3, h, w)).astype(np.float32)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(oh, ow), mode="bilinear", align_corners=False
        ).numpy()
        got = resize_bilinear_torch(jnp.asarray(x.transpose(0, 2, 3, 1)), (oh, ow))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4, rtol=1e-4
        )


def test_bf16_eval_close_to_fp32(rng):
    """bf16 conv trunk (serving precision) stays within bf16-roundoff of the
    fp32 reference on the decoded outputs."""
    import jax
    import jax.numpy as jnp

    from streamyolo_tpu.models.dfp_pafpn import DFPPAFPN
    from streamyolo_tpu.models.heads import TALHead
    from streamyolo_tpu.models.yolox import StreamYOLO

    def build(dtype):
        return StreamYOLO(
            backbone=DFPPAFPN(0.33, 0.25, dtype=dtype),
            head=TALHead(num_classes=8, width=0.25, dtype=dtype),
        )

    x = (rng.random((1, 64, 96, 6)) * 255).astype(np.float32)
    m32 = build(jnp.float32)
    variables = m32.init(jax.random.PRNGKey(0), x, mode="off_pipe", train=False)
    out32 = np.asarray(m32.apply(variables, x, mode="off_pipe", train=False))
    m16 = build(jnp.bfloat16)
    out16 = np.asarray(m16.apply(variables, x, mode="off_pipe", train=False))
    # boxes are in pixel units (up to ~96); obj/cls are probabilities
    box_err = np.abs(out16[..., :4].astype(np.float32) - out32[..., :4]).max()
    prob_err = np.abs(out16[..., 4:].astype(np.float32) - out32[..., 4:]).max()
    assert box_err < 2.0, box_err       # < 2px at init-scale activations
    assert prob_err < 0.05, prob_err    # probabilities within 5e-2


def test_full_scale_pth_import_parity(rng, tmp_path):
    """BASELINE north-star surrogate: the s config (depth 0.33, width 0.50)
    at the full 600x960 input, fp32, weights round-tripped through a real
    torch ``.pth`` file via the production import path
    (``load_torch_checkpoint``) — the exact flow a user of the released
    ``s_s50_one_x.pth`` runs, checked against the torch oracle forward."""
    import os

    torch.manual_seed(7)
    tmodel = oracle.StreamYOLOOracle(num_classes=8, depth=0.33, width=0.50)
    tmodel.eval()
    pth = os.path.join(str(tmp_path), "s_s50_one_x.pth")
    torch.save({"model": tmodel.state_dict()}, pth)

    from streamyolo_tpu.utils.checkpoint import load_checkpoint

    jmodel = StreamYOLO(
        backbone=DFPPAFPN(depth=0.33, width=0.50),
        head=TALHead(num_classes=8, width=0.50),
    )
    variables = jmodel.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 600, 960, 6), jnp.float32),
        mode="off_pipe",
    )
    variables = merge_variables(
        variables, load_checkpoint(pth)["model"], strict=True
    )

    x = rng.uniform(0, 255, (1, 6, 600, 960)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    out = np.asarray(
        jax.jit(lambda v, y: jmodel.apply(v, y, mode="off_pipe"))(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
    )
    assert out.shape == ref.shape == (1, 11850, 13)
    # decoded xy/wh reach ~960px here; obj/cls are probabilities
    np.testing.assert_allclose(out[..., :4], ref[..., :4], atol=2e-2, rtol=1e-4)
    np.testing.assert_allclose(out[..., 4:], ref[..., 4:], atol=1e-4, rtol=1e-4)
