"""Training loop: epochs/iters, EMA eval, multiscale, checkpoints, meters.

Capability parity with `/root/reference/exps/train_utils/double_trainer.py:37-371`
(the double-frame Trainer), re-designed for TPU SPMD:

  * the per-iteration work (forward + SimOTA/TAL loss + grad + SGD + EMA) is
    ONE jitted program (`streamyolo_tpu.train.step`); the batch is sharded on
    a 1-D data mesh and the gradient all-reduce is compiled in — there is no
    DDP wrapper, GradScaler, or host-side LR assignment;
  * mixed precision is bf16 (``args.fp16`` toggles the conv-trunk dtype);
    no loss scaling needed (bf16 keeps fp32's exponent range);
  * multiscale ``random_resize`` every 10 iters is a seeded pure function of
    the step index, so every SPMD host picks the same size with no broadcast
    (`cfgs/s_s50_onex_dfp_tal_flip.py:138-157` did a dist.broadcast);
  * EMA covers params AND BN stats (the torch ModelEMA EMAs the full float
    state_dict) and is what gets evaluated/saved (`double_trainer.py:322-355`);
  * checkpoints: ``latest`` each epoch, ``best_ckpt`` on AP improvement,
    optional per-epoch history (`double_trainer.py:349-371`); resume and
    shape-tolerant fine-tune (including torch ``.pth`` COCO-pretrained
    weights) via ``utils.checkpoint``.
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Any, Dict

import numpy as np

from streamyolo_tpu.utils.logger import get_logger, setup_logger
from streamyolo_tpu.utils.meters import MeterBuffer, device_mem_usage_mb


def _donation_safe() -> bool:
    """Donate the train state only on backends where buffer donation is
    reliable. Two known-bad environments: XLA:CPU multi-partition runs
    deadlock the collective rendezvous on single-core hosts, and the axon
    TPU relay (remote-attached dev chips, JAX_PLATFORMS=axon) rejects
    donated train-state executions with INVALID_ARGUMENT. On directly
    attached TPUs donation keeps the optimizer update in-place in HBM and
    stays on."""
    import jax

    if jax.devices()[0].platform == "cpu":
        return False
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        return False
    return True


class Trainer:
    def __init__(self, exp, args):
        self.exp = exp
        self.args = args
        self.max_epoch = exp.max_epoch
        self.input_size = exp.input_size
        self.best_ap = 0.0
        self.start_epoch = 0
        self.meter = MeterBuffer(window_size=exp.print_interval)
        self.file_name = os.path.join(exp.output_dir, args.experiment_name)
        from streamyolo_tpu.parallel import get_rank, is_main_process

        self._is_main = is_main_process()
        if self._is_main:
            os.makedirs(self.file_name, exist_ok=True)
        # only rank 0 gets the file sink (reference setup_logger contract,
        # `double_trainer.py:67-72`); every rank still logs to stderr
        setup_logger(
            self.file_name, distributed_rank=get_rank(), filename="train_log.txt"
        )
        self.logger = get_logger()
        self.use_tal = exp.head_name == "tal"
        self.tb_writer = None
        self.wandb_logger = None

    # ------------------------------------------------------------------ setup

    def before_train(self):
        import jax

        exp, args = self.exp, self.args
        self.logger.info(f"args: {args}")
        self.logger.info(f"exp value:\n{exp}")

        if getattr(args, "fp16", False):
            exp.compute_dtype = "bfloat16"
        self.model = exp.get_model()
        variables = exp.init_model(self.model)
        variables = self.resume_train(variables)

        self.no_aug = self.start_epoch >= self.max_epoch - exp.no_aug_epochs
        self.train_loader = exp.get_data_loader(
            batch_size=args.batch_size,
            is_distributed=False,
            no_aug=self.no_aug,
            cache_img=getattr(args, "cache", False),
        )
        self.iters_per_epoch = max(len(exp.dataset) // args.batch_size, 1)
        self.max_iter = self.iters_per_epoch

        lr_schedule = exp.get_lr_schedule(args.batch_size, self.iters_per_epoch)
        from streamyolo_tpu.parallel import make_mesh, replicated
        from streamyolo_tpu.train import (
            create_train_state,
            jit_train_step,
            make_train_step,
        )

        self.mesh = make_mesh()
        state, tx = create_train_state(
            variables, lr_schedule,
            momentum=exp.momentum, weight_decay=exp.weight_decay,
        )
        if self._resume_state is not None:
            state = self._restore_state(state, self._resume_state)
        step_fn = make_train_step(
            self.model, tx,
            num_classes=exp.num_classes,
            lr_schedule=lr_schedule,
            gamma=getattr(exp, "tal_gamma", 1.0),
            ignore_thr=getattr(exp, "tal_ignore_thr", 0.5),
            ignore_value=getattr(exp, "tal_ignore_value", 1.5),
            use_l1=True,
            use_tal=self.use_tal,
        )
        self.train_step = jit_train_step(
            step_fn, mesh=self.mesh, donate=_donation_safe()
        )
        self.state = jax.device_put(state, replicated(self.mesh))

        self.evaluator = exp.get_evaluator(
            batch_size=getattr(args, "eval_batch_size", args.batch_size),
            is_distributed=False,
        )
        # logger backend selection (`double_trainer.py:184-193`): tensorboard
        # or wandb (wandb-* key/value pairs come through --opts). Rank 0 only,
        # like the reference (`double_trainer.py:183-193` is is_main-guarded).
        backend = getattr(args, "logger", "tensorboard")
        if backend not in ("tensorboard", "wandb"):
            raise ValueError("logger must be either 'tensorboard' or 'wandb'")
        if self._is_main and backend == "tensorboard":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb_writer = SummaryWriter(self.file_name)
            except Exception:
                self.tb_writer = None
        elif self._is_main and backend == "wandb":
            from streamyolo_tpu.utils.wandb_logger import WandbLogger

            self.wandb_logger = WandbLogger.initialize_wandb_logger(
                args, exp
            )
        self.logger.info("Training starts...")

    def resume_train(self, variables):
        """Resume (``--resume``) or shape-tolerant fine-tune (``-c`` alone,
        used with COCO-pretrained torch weights)."""
        from streamyolo_tpu.utils.checkpoint import (
            load_checkpoint,
            load_ckpt_tolerant,
        )

        args = self.args
        self._resume_state = None
        if getattr(args, "resume", False):
            ckpt_file = args.ckpt or os.path.join(self.file_name, "latest_ckpt.pkl")
            ckpt = load_checkpoint(ckpt_file)
            self.best_ap = ckpt.get("best_ap", 0.0)
            self.start_epoch = (
                args.start_epoch - 1
                if getattr(args, "start_epoch", None)
                else ckpt.get("start_epoch", 0)
            )
            self._resume_state = ckpt.get("train_state")
            if self._resume_state is None and "model" in ckpt:
                variables = load_ckpt_tolerant(variables, ckpt["model"])
            self.logger.info(f"Resumed from {ckpt_file} at epoch {self.start_epoch}")
        elif getattr(args, "ckpt", None):
            ckpt = load_checkpoint(args.ckpt)
            variables = load_ckpt_tolerant(variables, ckpt["model"])
            self.logger.info(f"Fine-tuning from {args.ckpt}")
        return variables

    def _restore_state(self, init_state, saved):
        """Shape/structure-tolerant train-state restore: leaves present in
        the checkpoint with matching shapes are taken, everything else keeps
        its freshly-initialized value, with a clear log of what was skipped
        (mirrors the reference's tolerant ``resume_train``,
        `double_trainer.py:285-318` — a raw tree_map would crash on any
        config change between save and resume)."""
        import jax

        keystr = jax.tree_util.keystr
        init_leaves, treedef = jax.tree_util.tree_flatten_with_path(init_state)
        saved_leaves = {
            keystr(kp): leaf
            for kp, leaf in jax.tree_util.tree_flatten_with_path(saved)[0]
        }
        merged, skipped = [], []
        for kp, leaf in init_leaves:
            k = keystr(kp)
            s = saved_leaves.get(k)
            if s is not None and tuple(np.shape(s)) == tuple(np.shape(leaf)):
                merged.append(np.asarray(s))
            else:
                merged.append(leaf)
                skipped.append(k)
        if skipped:
            self.logger.warning(
                "Resume: checkpoint train state mismatches the current "
                "config for %d of %d leaves (kept init values): %s%s",
                len(skipped), len(init_leaves), ", ".join(skipped[:5]),
                ", ..." if len(skipped) > 5 else "",
            )
        return jax.tree_util.tree_unflatten(treedef, merged)

    # ------------------------------------------------------------------ loop

    def train(self):
        self.before_train()
        try:
            self.train_in_epoch()
        finally:
            self.after_train()

    def train_in_epoch(self):
        from streamyolo_tpu.data import DevicePrefetcher

        for self.epoch in range(self.start_epoch, self.max_epoch):
            self.before_epoch()
            prefetcher = DevicePrefetcher(self.train_loader, mesh=self.mesh)
            for self.iter in range(self.max_iter):
                self.train_one_iter(prefetcher)
            self.after_epoch()

    def before_epoch(self):
        exp = self.exp
        self.logger.info(f"---> start train epoch {self.epoch + 1}")
        if (
            self.epoch + 1 == self.max_epoch - exp.no_aug_epochs and not self.no_aug
        ):
            # mosaic-off transition (`double_trainer.py:206-219`); with the
            # shipped configs no_aug is on from epoch 0, so this is a no-op.
            self.logger.info("--->No mosaic aug now!")
            self.no_aug = True
            self.train_loader = exp.get_data_loader(
                batch_size=self.args.batch_size, is_distributed=False, no_aug=True
            )
            self.save_ckpt(ckpt_name="last_mosaic_epoch")

    def train_one_iter(self, prefetcher):
        import jax

        iter_start = time.perf_counter()
        batch = prefetcher.next()
        if batch is None:
            # epoch wrap: restart the prefetcher on a fresh loader iterator
            # (DevicePrefetcher.__init__ is re-entrant — it joins any
            # in-flight preload before swapping the iterator)
            prefetcher.__init__(self.train_loader, mesh=self.mesh)
            batch = prefetcher.next()
        data_end = time.perf_counter()

        step_idx = self.epoch * self.iters_per_epoch + self.iter
        tsize = self._current_size(step_idx)
        if tuple(tsize) != tuple(self.input_size):
            batch = self._resize_batch(batch, tuple(tsize))

        self.state, metrics = self.train_step(self.state, batch)
        # NOTE: no blocking here — the next dispatch naturally pipelines;
        # meters read one-step-stale values only at print time.
        iter_end = time.perf_counter()

        self.meter.update(
            iter_time=iter_end - iter_start,
            data_time=data_end - iter_start,
        )
        self._last_metrics = metrics

        if (self.iter + 1) % self.exp.print_interval == 0:
            metrics_host = {k: float(v) for k, v in self._last_metrics.items()}
            self.meter.update(**{k: v for k, v in metrics_host.items() if k != "lr"})
            self._log_progress(metrics_host.get("lr", 0.0), tsize)

    def _current_size(self, step_idx: int):
        """Multiscale size for this iteration, re-drawn every 10 iters
        (`double_trainer.py:119-123` + `cfgs/...:138-157`)."""
        if self.exp.random_size is None:
            return self.input_size
        window = step_idx // 10
        return self.exp.random_resize(window, self.epoch)

    def _resize_batch(self, batch: Dict[str, Any], tsize):
        import jax

        targets = (batch["labels"],) + (
            (batch["support_labels"],) if "support_labels" in batch else ()
        )
        images, targets = self.exp.preprocess(batch["images"], targets, tsize)
        out = {"images": images, "labels": targets[0]}
        if len(targets) > 1:
            out["support_labels"] = targets[1]
        return out

    def _log_progress(self, lr: float, tsize):
        left_iter = self.max_iter - (self.iter + 1)
        left_epochs = self.max_epoch - (self.epoch + 1)
        eta_seconds = self.meter["iter_time"].global_avg * (
            left_iter + left_epochs * self.max_iter
        )
        eta = datetime.timedelta(seconds=int(eta_seconds))
        loss_meter = self.meter.get_filtered_meter("loss")
        loss_str = ", ".join(f"{k}: {v.latest:.1f}" for k, v in loss_meter.items())
        time_meter = self.meter.get_filtered_meter("time")
        time_str = ", ".join(f"{k}: {v.avg:.3f}s" for k, v in time_meter.items())
        self.logger.info(
            f"epoch: {self.epoch + 1}/{self.max_epoch}, "
            f"iter: {self.iter + 1}/{self.max_iter}, "
            f"mem: {device_mem_usage_mb():.0f}MB, {time_str}, {loss_str}, "
            f"lr: {lr:.3e}, size: {tsize}, ETA: {eta}"
        )
        if self.tb_writer is not None:
            step = self.epoch * self.max_iter + self.iter
            for k, v in loss_meter.items():
                self.tb_writer.add_scalar(f"train/{k}", v.latest, step)
            self.tb_writer.add_scalar("train/lr", lr, step)
        if self.wandb_logger is not None:
            # per-interval metric push (`double_trainer.py:269-271`)
            self.wandb_logger.log_metrics(
                {k: v.latest for k, v in loss_meter.items()}
            )
            self.wandb_logger.log_metrics({"lr": lr})

    # ------------------------------------------------------------------ epoch end

    def after_epoch(self):
        self.save_ckpt(ckpt_name="latest")
        if (self.epoch + 1) % self.exp.eval_interval == 0:
            self.evaluate_and_save_model()

    def evaluate_and_save_model(self):
        import jax

        # EMA weights are what get evaluated and saved when EMA is enabled
        # (`double_trainer.py:322-355`; ``exp.ema`` gates it like the
        # reference's use_model_ema).
        if self.exp.ema:
            eval_variables = {
                "params": self.state.ema_params,
                "batch_stats": self.state.ema_batch_stats,
            }
        else:
            eval_variables = {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
            }
        if (
            not getattr(self.args, "no_dedup", False)
            and jax.process_count() == 1
            and getattr(self.exp, "evaluator_name", None) in ("onex", "twox")
        ):
            # Default: halve per-epoch eval backbone FLOPs (one pass per
            # unique frame); needs the unsharded sequential val traversal, so
            # single-process and a ONE/TWO pairing only. The wrapper asserts
            # first-batch parity vs the dual-frame forward every epoch (fresh
            # EMA weights each time), reusing one compiled seq program.
            forward_fn = self.exp.get_dedup_forward_fn(
                self.model, eval_variables, self.evaluator.dataset
            )
        else:
            forward_fn = self.exp.get_forward_fn(self.model, eval_variables)
        ap, ap50, summary = self.exp.eval(forward_fn, self.evaluator)
        self.logger.info(f"\n{summary}")
        if self.tb_writer is not None:
            self.tb_writer.add_scalar("val/COCOAP50", ap50, self.epoch + 1)
            self.tb_writer.add_scalar("val/COCOAP50_95", ap, self.epoch + 1)
        if self.wandb_logger is not None:
            # per-epoch val metrics (`double_trainer.py:340-345`)
            self.wandb_logger.log_metrics({
                "val/COCOAP50": ap50,
                "val/COCOAP50_95": ap,
                "train/epoch": self.epoch + 1,
            })
        update_best_ckpt = ap > self.best_ap
        self.best_ap = max(self.best_ap, ap)
        self.save_ckpt("last_epoch", update_best_ckpt)
        if self.exp.save_history_ckpt:
            self.save_ckpt(f"epoch_{self.epoch + 1}")

    def save_ckpt(self, ckpt_name: str, update_best_ckpt: bool = False):
        from streamyolo_tpu.utils.checkpoint import save_checkpoint

        # Rank 0 writes; everyone else would race the shared filesystem
        # (reference guard at `double_trainer.py:353-371`). The params are
        # replicated, so rank 0's copy is the global state.
        if not self._is_main:
            return
        if self.exp.ema:
            model_vars = {
                "params": self.state.ema_params,
                "batch_stats": self.state.ema_batch_stats,
            }
        else:
            model_vars = {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
            }
        state = {
            "start_epoch": self.epoch + 1,
            "model": model_vars,
            "train_state": self.state,
            "best_ap": self.best_ap,
        }
        self.logger.info(f"Save weights to {self.file_name} ({ckpt_name})")
        save_checkpoint(state, update_best_ckpt, self.file_name, ckpt_name)
        if self.wandb_logger is not None:
            # checkpoint artifact upload (`double_trainer.py:370-371`)
            self.wandb_logger.save_checkpoint(
                self.file_name, ckpt_name, update_best_ckpt
            )

    def after_train(self):
        self.logger.info(
            f"Training done, best AP: {self.best_ap * 100:.2f}"
        )
        if self.tb_writer is not None:
            self.tb_writer.close()
        if self.wandb_logger is not None:
            # `double_trainer.py:203-204`
            self.wandb_logger.finish()
