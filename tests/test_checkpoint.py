"""Checkpoint robustness + interchange tests.

Reference write path: `/root/reference/exps/train_utils/double_trainer.py:
353-371` (save_checkpoint of {start_epoch, model, optimizer, best_ap} under
latest/best_ckpt/last_epoch names). Our additions under test: atomic
tmp+rename on BOTH files, loud failure on corrupted loads, and a
``.safetensors`` export that is the exact inverse of the ``.pth`` importer.
"""

import os
import pickle

import numpy as np
import pytest

from streamyolo_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    save_safetensors,
)


@pytest.fixture(scope="module")
def tiny_variables():
    import jax
    import jax.numpy as jnp

    from streamyolo_tpu.models import DFPPAFPN, TALHead, StreamYOLO

    model = StreamYOLO(
        backbone=DFPPAFPN(depth=0.33, width=0.25),
        head=TALHead(num_classes=8, width=0.25),
    )
    return model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 6), jnp.float32),
        mode="off_pipe",
    )


def test_corrupted_checkpoint_fails_loudly(tmp_path):
    """A truncated or garbage checkpoint must raise with the path in the
    message — never return a silently partial state."""
    good = tmp_path / "good_ckpt.pkl"
    save_checkpoint({"model": {"w": np.ones(3)}, "start_epoch": 4},
                    False, str(tmp_path), "good")
    data = good.read_bytes()

    truncated = tmp_path / "truncated_ckpt.pkl"
    truncated.write_bytes(data[: len(data) // 2])
    with pytest.raises(RuntimeError, match="truncated_ckpt.pkl"):
        load_checkpoint(str(truncated))

    garbage = tmp_path / "garbage_ckpt.pkl"
    garbage.write_bytes(b"\x00not a pickle at all")
    with pytest.raises(RuntimeError, match="garbage_ckpt.pkl"):
        load_checkpoint(str(garbage))

    # the intact sibling still loads (the documented recovery path)
    assert load_checkpoint(str(good))["start_epoch"] == 4


def test_save_is_atomic_under_midwrite_crash(tmp_path, monkeypatch):
    """A crash mid-write (simulated by a pickle.dump that explodes after
    writing half the payload) must leave the previously saved file intact
    under the real name — only a *.tmp orphan may remain."""
    state_v1 = {"model": {"w": np.zeros(8)}, "start_epoch": 1}
    save_checkpoint(state_v1, True, str(tmp_path), "latest")
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]

    import streamyolo_tpu.utils.checkpoint as ckpt_mod

    def exploding_dump(obj, f, protocol=None):
        f.write(b"partial garbage")
        raise OSError("disk full")

    monkeypatch.setattr(ckpt_mod.pickle, "dump", exploding_dump)
    with pytest.raises(OSError):
        save_checkpoint({"model": {"w": np.ones(8)}, "start_epoch": 2},
                        True, str(tmp_path), "latest")
    monkeypatch.undo()

    for name in ("latest_ckpt.pkl", "best_ckpt.pkl"):
        loaded = load_checkpoint(str(tmp_path / name))
        assert loaded["start_epoch"] == 1
        np.testing.assert_array_equal(loaded["model"]["w"], np.zeros(8))


def test_safetensors_roundtrip_is_importer_inverse(tmp_path, tiny_variables):
    """torch-layout export -> .pth-importer mapping back == the original
    variables, leaf for leaf (proves flax_path_to_torch inverts
    torch_key_to_flax on the real model tree, including every merged
    ``module.N`` segment)."""
    from flax.traverse_util import flatten_dict
    from safetensors.numpy import load_file

    from streamyolo_tpu.utils.torch_import import state_dict_to_variables

    out = tmp_path / "model.safetensors"
    n = save_safetensors(tiny_variables, str(out), torch_layout=True)
    assert n > 0 and out.is_file()
    back = state_dict_to_variables(load_file(str(out)))

    want = flatten_dict(tiny_variables)
    got = flatten_dict(back)
    assert set(got) == set(want)
    for path in want:
        np.testing.assert_array_equal(
            got[path], np.asarray(want[path]), err_msg="/".join(path))


def test_safetensors_flax_layout(tmp_path, tiny_variables):
    from flax.traverse_util import flatten_dict
    from safetensors.numpy import load_file

    out = tmp_path / "model_flax.safetensors"
    save_safetensors(tiny_variables, str(out), torch_layout=False)
    flat = load_file(str(out))
    want = flatten_dict(tiny_variables)
    assert set(flat) == {"/".join(k) for k in want}
    k, v = next(iter(want.items()))
    np.testing.assert_array_equal(flat["/".join(k)], np.asarray(v))


def test_safetensors_loads_into_torch_model(tmp_path, tiny_variables):
    """The exported file feeds torch directly: the reference-layout oracle
    model accepts every tensor (name AND shape), missing only the
    num_batches_tracked counters the exporter deliberately drops."""
    torch = pytest.importorskip("torch")
    from safetensors.torch import load_file

    from tests.torch_oracle import StreamYOLOOracle

    out = tmp_path / "model.safetensors"
    save_safetensors(tiny_variables, str(out), torch_layout=True)
    sd = load_file(str(out))
    oracle = StreamYOLOOracle(num_classes=8, depth=0.33, width=0.25)
    missing, unexpected = oracle.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all(m.endswith("num_batches_tracked") for m in missing), missing
    # spot-check one conv actually landed transposed back to OIHW
    w = dict(oracle.named_parameters())["backbone.backbone.stem.conv.conv.weight"]
    assert w.shape[2] == w.shape[3]  # [O, I, kH, kW]


def test_export_safetensors_cli(tmp_path, tiny_variables, monkeypatch, capsys):
    import importlib
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    mod = importlib.import_module("export_safetensors")

    ckpt = tmp_path / "w.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump({"model": tiny_variables, "start_epoch": 7}, f)
    out = tmp_path / "w.safetensors"
    monkeypatch.setattr(
        sys, "argv",
        ["export_safetensors.py", "-c", str(ckpt), "-o", str(out)])
    mod.main()
    assert out.is_file()
    assert "torch layout" in capsys.readouterr().out.replace("\n", " ")
