"""Config system, conv+BN fuse parity, and a full trainer smoke test
(1 epoch on the synthetic Argoverse dataset, 8-device virtual CPU mesh)."""

import argparse
import glob
import os

import numpy as np
import pytest

pytest.importorskip("cv2")

import jax

from streamyolo_tpu.exp import get_exp
from tests.conftest import FAKE_IMG_SIZE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFGS = sorted(glob.glob(os.path.join(REPO, "cfgs", "*.py")))


def test_all_five_configs_load_and_build():
    assert len(CFGS) == 5
    expected = {
        "s_s50_onex_dfp_tal_flip": (0.33, 0.50, "tal", "onex"),
        "m_s50_onex_dfp_tal_flip": (0.67, 0.75, "tal", "onex"),
        "l_s50_onex_dfp_tal_filp": (1.0, 1.0, "tal", "onex"),
        "l_s50_twox_dfp_tal_flip": (1.0, 1.0, "tal", "twox"),
        "l_s50_still_dfp_flip": (1.0, 1.0, "pipe", "still"),
    }
    for path in CFGS:
        exp = get_exp(path)
        name = os.path.basename(path)[:-3]
        depth, width, head, evaluator = expected[name]
        assert exp.depth == depth and exp.width == width
        assert exp.head_name == head and exp.evaluator_name == evaluator
        assert exp.input_size == (600, 960) and exp.test_size == (600, 960)
        assert exp.basic_lr_per_img == 0.001 / 64.0
        assert exp.max_epoch == 15 and exp.no_aug_epochs == 15
        model = exp.get_model()
        assert model is not None


def test_exp_merge_overrides():
    exp = get_exp(CFGS[0])
    exp.merge(["max_epoch", "3", "test_conf", "0.25"])
    assert exp.max_epoch == 3
    assert exp.test_conf == 0.25


def test_tal_params_reach_head():
    exp = get_exp(os.path.join(REPO, "cfgs", "m_s50_onex_dfp_tal_flip.py"))
    model = exp.get_model()
    assert model.head.gamma == 1.0
    assert model.head.ignore_thr == 0.4
    assert model.head.ignore_value == 1.7


def test_fuse_parity():
    from streamyolo_tpu.utils.fuse import fuse_model_variables

    exp = get_exp(CFGS[0])
    model = exp.get_model()
    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 96, 6).astype(np.float32) * 255
    variables = model.init(jax.random.PRNGKey(0), x, mode="off_pipe", train=False)
    # randomize BN stats so the fold actually does something
    import jax.numpy as jnp

    variables = jax.tree_util.tree_map(
        lambda v: v + 0.05 * np.abs(rng.standard_normal(v.shape)).astype(v.dtype),
        variables,
    )
    ref = model.apply(variables, x, mode="off_pipe", train=False)
    fused = fuse_model_variables(variables)
    out = model.apply(fused, x, mode="off_pipe", train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-3)


@pytest.mark.slow
def test_trainer_smoke(fake_argoverse, tmp_path):
    """One epoch end-to-end: data loader -> sharded train step -> EMA eval ->
    checkpoints, on the virtual 8-device CPU mesh."""
    exp = get_exp(os.path.join(REPO, "cfgs", "s_s50_onex_dfp_tal_flip.py"))
    exp.depth, exp.width = 0.33, 0.25  # shrink for the 1-core CPU CI
    exp.data_dir = fake_argoverse
    exp.input_size = FAKE_IMG_SIZE
    exp.test_size = FAKE_IMG_SIZE
    exp.random_size = None  # keep one static shape on CPU
    exp.data_num_workers = 0
    exp.max_epoch = 1
    exp.no_aug_epochs = 1
    exp.eval_interval = 1
    exp.save_history_ckpt = False
    exp.output_dir = str(tmp_path)
    exp.print_interval = 1

    args = argparse.Namespace(
        batch_size=8, fp16=False, resume=False, ckpt=None, cache=False,
        experiment_name="smoke", eval_batch_size=4, start_epoch=None,
    )
    trainer = exp.get_trainer(args)
    trainer.train()

    out_dir = os.path.join(str(tmp_path), "smoke")
    assert os.path.exists(os.path.join(out_dir, "latest_ckpt.pkl"))
    assert os.path.exists(os.path.join(out_dir, "last_epoch_ckpt.pkl"))
    assert np.isfinite(float(trainer._last_metrics["total_loss"]))

    # resume path: restores epoch + train state
    args2 = argparse.Namespace(
        batch_size=8, fp16=False, resume=True,
        ckpt=os.path.join(out_dir, "latest_ckpt.pkl"), cache=False,
        experiment_name="smoke", eval_batch_size=4, start_epoch=None,
    )
    trainer2 = exp.get_trainer(args2)
    trainer2.before_train()
    assert trainer2.start_epoch == 1
    assert int(trainer2.state.step) == int(trainer.state.step)

    # resume after a config width change: tolerant restore keeps init values
    # for mismatched leaves instead of crashing (`double_trainer.py:285-318`)
    exp_wide = get_exp(os.path.join(REPO, "cfgs", "s_s50_onex_dfp_tal_flip.py"))
    for k in ("data_dir", "input_size", "test_size", "random_size",
              "data_num_workers", "max_epoch", "no_aug_epochs", "eval_interval",
              "save_history_ckpt", "output_dir", "print_interval"):
        setattr(exp_wide, k, getattr(exp, k))
    exp_wide.depth, exp_wide.width = 0.33, 0.375  # different channel widths
    trainer3 = exp_wide.get_trainer(args2)
    trainer3.before_train()  # must not raise
    assert trainer3.start_epoch == 1
    # step counter has matching shape () -> restored from the checkpoint
    assert int(trainer3.state.step) == int(trainer.state.step)


def test_trainer_wandb_sink(fake_argoverse, tmp_path, monkeypatch):
    """-l wandb drives the full W&B path (`double_trainer.py:186-191,
    269-271,340-345,370-371`): init from wandb-* opts, per-interval metric
    push, per-epoch val metrics, checkpoint artifacts, finish()."""
    import sys
    import types

    calls = {"logs": [], "artifacts": [], "finished": [], "init": []}

    class _Run:
        def log_artifact(self, artifact, aliases=None):
            calls["artifacts"].append((artifact.name, artifact.files, aliases))

        def finish(self):
            calls["finished"].append(True)

    class _Artifact:
        def __init__(self, name, type=None, metadata=None):
            self.name = name
            self.files = []

        def add_file(self, path):
            assert os.path.exists(path), path
            self.files.append(os.path.basename(path))

    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: (calls["init"].append(kw), _Run())[1]
    fake.log = lambda metrics, step=None: calls["logs"].append(metrics)
    fake.Artifact = _Artifact
    monkeypatch.setitem(sys.modules, "wandb", fake)

    exp = get_exp(os.path.join(REPO, "cfgs", "s_s50_onex_dfp_tal_flip.py"))
    exp.depth, exp.width = 0.33, 0.25
    exp.data_dir = fake_argoverse
    exp.input_size = FAKE_IMG_SIZE
    exp.test_size = FAKE_IMG_SIZE
    exp.random_size = None
    exp.data_num_workers = 0
    exp.max_epoch = 1
    exp.no_aug_epochs = 1
    exp.eval_interval = 1
    exp.save_history_ckpt = False
    exp.output_dir = str(tmp_path)
    exp.print_interval = 1

    args = argparse.Namespace(
        batch_size=8, fp16=False, resume=False, ckpt=None, cache=False,
        experiment_name="wandb_smoke", eval_batch_size=4, start_epoch=None,
        logger="wandb", opts=["wandb-project", "streamyolo-tpu"],
    )
    trainer = exp.get_trainer(args)
    trainer.train()

    assert calls["init"] and calls["init"][0]["project"] == "streamyolo-tpu"
    logged_keys = set().union(*(m.keys() for m in calls["logs"]))
    assert "total_loss" in logged_keys and "lr" in logged_keys
    assert {"val/COCOAP50", "val/COCOAP50_95"} <= logged_keys
    assert any(name == "latest" for name, _, _ in calls["artifacts"])
    assert calls["finished"] == [True]


def test_multiscale_random_resize_and_preprocess():
    import jax.numpy as jnp

    exp = get_exp(CFGS[0])
    # seeded: same window -> same size on every host; sizes are 16-aligned
    sizes = {exp.random_resize(step, epoch=0) for step in range(30)}
    assert all(h % 16 == 0 and w % 16 == 0 for h, w in sizes)
    assert len(sizes) > 3  # actually multiscale
    assert exp.random_resize(5, epoch=0) == exp.random_resize(5, epoch=0)
    # last epoch pins the canonical size
    assert exp.random_resize(5, epoch=exp.max_epoch - 1) == tuple(exp.input_size)

    # on-device resize scales cxcywh labels consistently
    exp.input_size = (32, 64)
    images = jnp.ones((2, 32, 64, 6), jnp.float32)
    labels = jnp.asarray(np.tile([[2.0, 32.0, 16.0, 10.0, 8.0]], (2, 1, 1)))
    out_images, (out_labels,) = exp.preprocess(images, (labels,), (16, 32))
    assert out_images.shape == (2, 16, 32, 6)
    np.testing.assert_allclose(
        np.asarray(out_labels[0, 0]), [2.0, 16.0, 8.0, 5.0, 4.0]
    )


def test_lr_schedule_reference_shape():
    """yoloxwarmcos with no_aug_epochs == max_epoch: quadratic warmup for one
    epoch, then CONSTANT min_lr (the shipped-recipe quirk)."""
    exp = get_exp(CFGS[0])
    sched = exp.get_lr_schedule(batch_size=32, iters_per_epoch=100)
    lr = 0.001 / 64 * 32
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(50)) == pytest.approx(lr * 0.25)   # (50/100)^2
    assert float(sched(100)) == pytest.approx(lr)
    assert float(sched(101)) == pytest.approx(lr * 0.05)  # min_lr from then on
    assert float(sched(1400)) == pytest.approx(lr * 0.05)


def test_remat_train_step_matches():
    """jax.checkpoint path must produce identical losses/grads."""
    import jax.numpy as jnp

    from streamyolo_tpu.train import build_lr_schedule, create_train_state, make_train_step

    exp = get_exp(CFGS[0])
    exp.depth, exp.width = 0.33, 0.25
    model = exp.get_model()
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 32, 32, 6), np.float32),
        mode="off_pipe", train=False,
    )
    sched = build_lr_schedule("yoloxwarmcos", 1e-3, 10, 15, 1, no_aug_epochs=15)
    rng = np.random.RandomState(0)
    labels = np.zeros((2, 8, 5), np.float32)
    labels[:, 0] = [2.0, 16.0, 16.0, 10.0, 8.0]
    batch = {
        "images": rng.rand(2, 32, 32, 6).astype(np.float32) * 255,
        "labels": labels,
        "support_labels": labels.copy(),
    }
    outs = []
    for remat in (False, True):
        state, tx = create_train_state(variables, sched)
        step = jax.jit(make_train_step(model, tx, 8, sched, remat=remat))
        new_state, metrics = step(state, batch)
        outs.append((float(metrics["total_loss"]),
                     np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])))
    assert outs[0][0] == pytest.approx(outs[1][0], rel=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_overfit_fixed_batch_loss_decreases():
    """End-to-end learning signal: ~60 SGD steps on one fixed tiny batch must
    cut the total loss by well over half (catches silent gradient breakage:
    wrong stop-gradients, assignment drift, optimizer wiring)."""
    import jax.numpy as jnp

    from streamyolo_tpu.train import (
        build_lr_schedule,
        create_train_state,
        make_train_step,
    )

    exp = get_exp(CFGS[0])
    exp.depth, exp.width = 0.33, 0.25
    model = exp.get_model()
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 96, 6), np.float32),
        mode="off_pipe", train=False,
    )
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (2, 64, 96, 6)).astype(np.float32)
    labels = np.zeros((2, 8, 5), np.float32)
    labels[:, 0] = [2.0, 48.0, 32.0, 24.0, 18.0]
    labels[:, 1] = [5.0, 20.0, 50.0, 16.0, 12.0]
    batch = {"images": images, "labels": labels, "support_labels": labels.copy()}

    sched = build_lr_schedule("constant", 5e-3, 10, 100)
    state, tx = create_train_state(variables, sched)
    step = jax.jit(make_train_step(model, tx, 8, sched))
    first = None
    for i in range(60):
        state, metrics = step(state, batch)
        if i == 0:
            first = float(metrics["total_loss"])
    last = float(metrics["total_loss"])
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)


def test_forward_fn_reuses_compiled_executable():
    """get_forward_fn must NOT recompile per weight set (per-epoch EMA eval):
    the jit is cached with the variables as a traced argument."""
    import jax.numpy as jnp

    exp = get_exp(CFGS[0])
    exp.depth, exp.width = 0.33, 0.25
    model = exp.get_model()
    v1 = model.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 6), np.float32),
                    mode="off_pipe", train=False)
    v2 = jax.tree_util.tree_map(lambda x: x + 0.01, v1)
    x = np.zeros((1, 32, 32, 6), np.float32)
    f1 = exp.get_forward_fn(model, v1)
    f2 = exp.get_forward_fn(model, v2)
    o1 = np.asarray(f1(x))
    o2 = np.asarray(f2(x))
    assert o1.shape == o2.shape and not np.allclose(o1, o2)
    jitted = exp._forward_jit_cache["off_pipe"]
    assert jitted._cache_size() == 1  # one executable for both weight sets


def test_torch_pth_checkpoint_roundtrip(tmp_path):
    """A torch-saved trainer-style ckpt ({'model': state_dict}) loads through
    utils.checkpoint straight into flax variables (OIHW->HWIO, BN split)."""
    import torch

    from streamyolo_tpu.utils.checkpoint import load_checkpoint
    from streamyolo_tpu.utils.torch_import import merge_variables

    sd = {
        "backbone.jian2.conv.weight": torch.arange(32 * 64 * 1 * 1, dtype=torch.float32).reshape(32, 64, 1, 1),
        "backbone.jian2.bn.weight": torch.ones(32),
        "backbone.jian2.bn.bias": torch.zeros(32),
        "backbone.jian2.bn.running_mean": torch.zeros(32),
        "backbone.jian2.bn.running_var": torch.ones(32),
        "backbone.jian2.bn.num_batches_tracked": torch.tensor(7),
        "head.cls_preds.0.weight": torch.randn(8, 64, 1, 1),
        "head.cls_preds.0.bias": torch.randn(8),
    }
    path = tmp_path / "w.pth"
    torch.save({"model": sd, "start_epoch": 5}, str(path))

    ckpt = load_checkpoint(str(path))
    v = ckpt["model"]
    assert v["params"]["backbone"]["jian2"]["conv"]["kernel"].shape == (1, 1, 64, 32)
    assert v["batch_stats"]["backbone"]["jian2"]["bn"]["var"].shape == (32,)
    assert v["params"]["head"]["cls_preds_0"]["kernel"].shape == (1, 1, 64, 8)
    # OIHW -> HWIO content check: torch [o, i, 0, 0] == flax [0, 0, i, o]
    np.testing.assert_allclose(
        v["params"]["backbone"]["jian2"]["conv"]["kernel"][0, 0, 5, 3],
        np.asarray(sd["backbone.jian2.conv.weight"][3, 5, 0, 0]),
    )
    # shape-tolerant merge keeps unmatched target leaves
    target = {
        "params": {"backbone": {"jian2": {"conv": {"kernel": np.zeros((1, 1, 64, 32), np.float32)},
                                           "bn": {"scale": np.zeros(32, np.float32),
                                                  "bias": np.zeros(32, np.float32)}}},
                   "extra": {"kernel": np.full((3, 3, 4, 4), 7.0, np.float32)}},
        "batch_stats": {"backbone": {"jian2": {"bn": {"mean": np.zeros(32, np.float32),
                                                      "var": np.zeros(32, np.float32)}}}},
    }
    merged = merge_variables(target, v, strict=False)
    assert merged["params"]["backbone"]["jian2"]["bn"]["scale"].sum() == 32  # loaded ones
    assert merged["params"]["extra"]["kernel"][0, 0, 0, 0] == 7.0  # kept init


def test_preprocess_is_torch_exact_bilinear():
    """StreamExp.preprocess must use the torch-exact bilinear (F.interpolate
    align_corners=False, no antialias) — jax.image.resize antialiases on
    downsample and drifts on 20 of the 21 multiscale sizes (round-2 finding)."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    exp = get_exp(CFGS[0])
    exp.input_size = (48, 64)
    x = np.random.RandomState(0).rand(2, 48, 64, 6).astype(np.float32)
    for tsize in ((32, 48), (16, 32)):  # downsample: where antialias differs
        out, _ = exp.preprocess(jnp.asarray(x), (jnp.zeros((2, 1, 5)),), tsize)
        want = F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=tsize,
            mode="bilinear", align_corners=False,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_trainer_rank_guards(tmp_path, monkeypatch):
    """Non-main ranks must not write checkpoints, file logs, or TB/W&B
    (round-2 finding; reference guard at double_trainer.py:353-371)."""
    import types

    from streamyolo_tpu import parallel as par
    from streamyolo_tpu.train.trainer import Trainer

    monkeypatch.setattr(par, "get_rank", lambda: 1)
    monkeypatch.setattr(par, "is_main_process", lambda: False)

    exp = get_exp(CFGS[0])
    exp.output_dir = str(tmp_path)
    args = types.SimpleNamespace(experiment_name="rank1")
    trainer = Trainer(exp, args)
    assert not trainer._is_main

    # save_ckpt is a no-op off rank 0 (state never touched)
    trainer.epoch = 0
    trainer.state = None
    trainer.save_ckpt("latest")
    assert not os.path.exists(os.path.join(str(tmp_path), "rank1", "latest_ckpt.pkl"))
    # no per-rank file sink, no output dir
    assert not os.path.exists(os.path.join(str(tmp_path), "rank1", "train_log.txt"))


def test_trainer_main_rank_writes(tmp_path):
    """Rank 0 keeps the full sink surface (regression guard for the guard)."""
    import types

    from streamyolo_tpu.train.trainer import Trainer

    exp = get_exp(CFGS[0])
    exp.output_dir = str(tmp_path)
    trainer = Trainer(exp, types.SimpleNamespace(experiment_name="rank0"))
    assert trainer._is_main
    assert os.path.isdir(os.path.join(str(tmp_path), "rank0"))
