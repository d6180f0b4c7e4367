"""StreamYOLO experiment base: the factory surface shared by the five
shipped configs.

Mirrors `/root/reference/cfgs/s_s50_onex_dfp_tal_flip.py:10-195` — the five
configs differ only in depth/width, TAL (gamma, ignore_thr, ignore_value),
dataset class, evaluator class, and head class (SURVEY.md §5.6), so those are
class attributes here and each ``cfgs/*.py`` is a ~20-line subclass.

JAX adaptation of the factory contract: a flax Module is stateless, so
``get_model()`` returns the module and ``init_model(rng)`` / the torch-weight
importer produce the variables pytree; ``get_forward_fn`` builds the jitted
eval forward the evaluators consume.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from streamyolo_tpu.exp.base import BaseExp


class StreamExp(BaseExp):
    # class-level knobs overridden by the shipped configs
    head_name = "tal"  # 'tal' | 'pipe'
    dataset_name = "one"  # 'one' | 'two' | 'still'
    evaluator_name = "onex"  # 'onex' | 'twox' | 'still'
    tal_gamma = 1.0
    tal_ignore_thr = 0.5
    tal_ignore_value = 1.5

    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.50
        self.data_num_workers = 6
        self.num_classes = 8
        self.input_size = (600, 960)  # (h, w)
        self.random_size = (50, 70)
        self.test_size = (600, 960)
        self.basic_lr_per_img = 0.001 / 64.0
        self.warmup_epochs = 1
        self.max_epoch = 15
        self.no_aug_epochs = 15
        self.eval_interval = 1
        self.train_ann = "train.json"
        self.val_ann = "val.json"
        # reference hardcodes '/data' (`cfgs/...:69`); overridable here
        self.data_dir = os.environ.get("STREAMYOLO_DATADIR", "/data")
        self.output_dir = os.environ.get(
            "STREAMYOLO_OUTDIR", "./StreamYOLO_outputs"
        )
        self.exp_name = type(self).__module__
        # compute dtype for the conv trunk (bf16 = TPU mixed precision;
        # params/BN stats stay fp32)
        self.compute_dtype = "float32"
        # phase-packed execution of the narrow stages (nn/packed.py) —
        # weight-invariant, bit-identical; turn off only for raw-layout
        # debugging (int8 PTQ quantizes the packed layout natively and is
        # FASTER there — narrow raw int8 convs pay relayout copies)
        self.packed = True

    # ---------------- model ----------------

    def get_model(self):
        import jax.numpy as jnp

        from streamyolo_tpu.models.dfp_pafpn import DFPPAFPN
        from streamyolo_tpu.models.heads import PIPEHead, TALHead
        from streamyolo_tpu.models.yolox import StreamYOLO

        dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        in_channels = (256, 512, 1024)
        backbone = DFPPAFPN(
            self.depth, self.width, in_channels=in_channels, act=self.act,
            dtype=dtype, packed=self.packed,
        )
        head_cls = TALHead if self.head_name == "tal" else PIPEHead
        head_kw: dict = {}
        if self.head_name == "tal":
            head_kw = dict(
                gamma=self.tal_gamma,
                ignore_thr=self.tal_ignore_thr,
                ignore_value=self.tal_ignore_value,
            )
        head = head_cls(
            num_classes=self.num_classes,
            width=self.width,
            in_channels=in_channels,
            act=self.act,
            dtype=dtype,
            **head_kw,
        )
        self.model = StreamYOLO(backbone=backbone, head=head)
        return self.model

    def init_model(self, model=None, rng: Optional[int] = None):
        """Initialize variables on a tiny canvas (shape-agnostic conv params).

        Jitted: one compiled program instead of eager op-by-op execution —
        on a remote-attached device (the axon relay) eager init pays a host
        round trip per op, turning a <1 s init into minutes."""
        import jax

        model = model or self.get_model()
        key = jax.random.PRNGKey(self.seed or 0 if rng is None else rng)
        dummy = np.zeros((1, 64, 96, 6), np.float32)
        return jax.jit(model.init, static_argnames=("mode", "train"))(
            key, dummy, mode="off_pipe", train=False)

    def get_forward_fn(self, model, variables, mode: str = "off_pipe"):
        """Jitted eval forward: NHWC float batch -> decoded [B, N, 5+C].

        The jitted callable is cached per (exp, mode) with the variables as a
        traced ARGUMENT — so per-epoch eval with fresh EMA weights reuses the
        compiled executable instead of recompiling (closure-captured
        variables would key a new jit cache entry every epoch)."""
        import functools

        import jax

        cache = getattr(self, "_forward_jit_cache", None)
        if cache is None:
            cache = self._forward_jit_cache = {}
        if mode not in cache:
            cache[mode] = jax.jit(
                lambda v, images: model.apply(v, images, mode=mode, train=False)
            )
        return functools.partial(cache[mode], variables)

    def get_dedup_forward_fn(self, model, variables, dataset,
                             verify_first_batch: bool = True):
        """Sequential-dedup eval forward (one backbone pass per unique frame,
        `eval/seq_forward.py`). The jitted seq program is cached on the exp
        like ``get_forward_fn``'s, so the Trainer's per-epoch eval with fresh
        EMA weights reuses the compiled executable. Requires a sequential,
        unsharded val traversal (ONE/TWO pairing, single process).

        ``verify_first_batch`` (default on — dedup is the default eval path)
        arms the first-batch parity assertion against the dual-frame
        off_pipe forward over the SAME variables; tolerances scale with the
        compute dtype (bf16 trunks round differently under the two batch
        layouts, fp32 agrees to ~1e-5)."""
        from streamyolo_tpu.eval import SequentialDedupForward

        verify_fn = None
        verify_tol = (1e-4, 1e-4)
        if verify_first_batch:
            verify_fn = self.get_forward_fn(model, variables)
            if str(getattr(self, "compute_dtype", "float32")) != "float32":
                verify_tol = (1.0, 5e-3)  # bf16: ~8-bit mantissa, px-scale boxes
        # Cache keyed on the model instance: the jitted closure captures the
        # model, so reusing it for a different model would silently run the
        # first one's program.
        cache = getattr(self, "_seq_forward_jit_cache", None)
        if cache is None:
            cache = self._seq_forward_jit_cache = {}
        fwd = SequentialDedupForward(
            model, variables, dataset, jit_fn=cache.get(id(model)),
            verify_fn=verify_fn, verify_tol=verify_tol,
        )
        cache[id(model)] = fwd.jit_fn
        return fwd

    # ---------------- data ----------------

    def _dataset_cls(self):
        from streamyolo_tpu.data import (
            ONE_ARGOVERSEDataset,
            STILL_ARGOVERSEDataset,
            TWO_ARGOVERSEDataset,
        )

        return {
            "one": ONE_ARGOVERSEDataset,
            "two": TWO_ARGOVERSEDataset,
            "still": STILL_ARGOVERSEDataset,
        }[self.dataset_name]

    def get_data_loader(
        self,
        batch_size: int,
        is_distributed: bool = False,
        no_aug: bool = False,
        cache_img: bool = False,
    ):
        from streamyolo_tpu.data import (
            DataLoader,
            DoubleTrainTransform,
            InfiniteSampler,
            MosaicDetection,
            StillMosaicDetection,
            TrainTransform,
            YoloBatchSampler,
            worker_init_reset_seed,
        )

        double = self.dataset_name in ("one", "two")
        transform_cls = DoubleTrainTransform if double else TrainTransform
        dataset = self._dataset_cls()(
            data_dir=self.data_dir,
            json_file=self.train_ann,
            name="train",
            img_size=self.input_size,
            preproc=transform_cls(max_labels=50, hsv=False, flip=True),
            cache=cache_img,
        )
        wrapper_cls = MosaicDetection if double else StillMosaicDetection
        dataset = wrapper_cls(
            dataset,
            mosaic=not no_aug,
            img_size=self.input_size,
            preproc=transform_cls(max_labels=120, hsv=False, flip=True),
            degrees=self.degrees,
            translate=self.translate,
            scale=self.mosaic_scale,
            shear=self.shear,
            perspective=0.0,
            enable_mixup=self.enable_mixup,
            mosaic_prob=self.mosaic_prob,
            mixup_prob=self.mixup_prob,
        )
        self.dataset = dataset

        # SPMD: each process loads ITS slice of the global batch (rank-aware
        # infinite sampler) and `parallel.shard_batch` assembles the global
        # array across hosts; single-host keeps the whole batch local. The
        # reference divides the batch by world size the same way
        # (`cfgs/s_s50_onex_dfp_tal_flip.py:93-94`).
        import jax

        world = jax.process_count()
        rank = jax.process_index()
        assert batch_size % max(world, 1) == 0, (batch_size, world)
        sampler = InfiniteSampler(
            len(dataset), seed=self.seed if self.seed else 0,
            rank=rank, world_size=world,
        )
        batch_sampler = YoloBatchSampler(
            sampler=sampler,
            batch_size=batch_size // max(world, 1),
            drop_last=False,
            mosaic=not no_aug,
        )
        return DataLoader(
            dataset,
            num_workers=self.data_num_workers,
            batch_sampler=batch_sampler,
            worker_init_fn=worker_init_reset_seed,
        )

    def get_eval_loader(
        self, batch_size: int, is_distributed: bool = False, testdev: bool = False
    ):
        from streamyolo_tpu.data import (
            DataLoader,
            DoubleValTransform,
            ValTransform,
        )

        double = self.dataset_name in ("one", "two")
        valdataset = self._dataset_cls()(
            data_dir=self.data_dir,
            json_file=self.val_ann,
            name="val",
            img_size=self.test_size,
            preproc=DoubleValTransform() if double else ValTransform(),
        )
        import jax

        if jax.process_count() > 1:
            from streamyolo_tpu.data import ShardDataset

            valdataset = ShardDataset(
                valdataset, jax.process_index(), jax.process_count()
            )
        return DataLoader(
            valdataset,
            num_workers=self.data_num_workers,
            batch_size=batch_size,
            shuffle=False,
        )

    def get_evaluator(
        self, batch_size: int, is_distributed: bool = False, testdev: bool = False
    ):
        from streamyolo_tpu.eval import (
            ONEX_COCOEvaluator,
            STILL_COCOEvaluator,
            TWOX_COCOEvaluator,
        )

        evaluator_cls = {
            "onex": ONEX_COCOEvaluator,
            "twox": TWOX_COCOEvaluator,
            "still": STILL_COCOEvaluator,
        }[self.evaluator_name]
        val_loader = self.get_eval_loader(batch_size, is_distributed, testdev)
        return evaluator_cls(
            dataloader=val_loader,
            img_size=self.test_size,
            confthre=self.test_conf,
            nmsthre=self.nmsthre,
            num_classes=self.num_classes,
            testdev=testdev,
        )

    # ---------------- training ----------------

    def get_lr_schedule(self, batch_size: int, iters_per_epoch: int):
        from streamyolo_tpu.train import build_lr_schedule

        return build_lr_schedule(
            self.scheduler,
            lr=self.basic_lr_per_img * batch_size,
            iters_per_epoch=iters_per_epoch,
            max_epoch=self.max_epoch,
            warmup_epochs=self.warmup_epochs,
            warmup_lr_start=self.warmup_lr,
            min_lr_ratio=self.min_lr_ratio,
            no_aug_epochs=self.no_aug_epochs,
        )

    def get_trainer(self, args):
        from streamyolo_tpu.train.trainer import Trainer

        return Trainer(self, args)

    def random_resize(self, step: int, epoch: int) -> Tuple[int, int]:
        """Pick the multiscale input size for the next 10-iter window.

        Seeded by (seed, step) so every SPMD host computes the same size —
        the reference's rank-0 broadcast (`cfgs/...:138-157`) disappears
        (SURVEY.md §5.8)."""
        if self.random_size is None or epoch >= self.max_epoch - 1:
            return tuple(self.input_size)
        rng = np.random.RandomState((self.seed or 0) * 1_000_003 + step)
        size = int(rng.randint(self.random_size[0], self.random_size[1] + 1))
        size_factor = self.input_size[0] * 1.0 / self.input_size[1]
        return (16 * int(size * size_factor), 16 * size)

    def preprocess(self, inputs, targets, tsize):
        """On-device multiscale resize of an NHWC batch + cxcywh label scale
        (reference `cfgs/...:160-171`). Uses the torch-exact bilinear
        (align_corners=False, NO antialiasing — ``F.interpolate`` semantics);
        ``jax.image.resize`` would antialias on downsample and drift on 20 of
        the 21 multiscale sizes. Pure jax; jitted per target size."""
        from streamyolo_tpu.ops.resize import resize_bilinear_torch

        scale_y = tsize[0] / self.input_size[0]
        scale_x = tsize[1] / self.input_size[1]
        if scale_x == 1 and scale_y == 1:
            return inputs, targets
        import jax.numpy as jnp

        if not jnp.issubdtype(inputs.dtype, jnp.inexact):
            inputs = inputs.astype(jnp.float32)  # uint8 host pipeline
        inputs = resize_bilinear_torch(inputs, (tsize[0], tsize[1]))
        scaled = []
        for t in targets:
            t = t.at[..., 1::2].multiply(scale_x)
            t = t.at[..., 2::2].multiply(scale_y)
            scaled.append(t)
        return inputs, tuple(scaled)

    def eval(self, forward_fn, evaluator, is_distributed: bool = None, half: bool = False):
        # is_distributed=None lets the evaluator auto-detect multi-process
        # runs (matching get_eval_loader's auto-sharding).
        return evaluator.evaluate(forward_fn, is_distributed, half)

    # reference-surface alias (`yolox.exp.Exp.get_lr_scheduler` name)
    def get_lr_scheduler(self, lr: float, iters_per_epoch: int):
        """Note: the reference passes lr = basic_lr_per_img * batch; here the
        schedule factory takes the batch size directly via get_lr_schedule.
        This alias accepts the reference calling convention."""
        from streamyolo_tpu.train import build_lr_schedule

        return build_lr_schedule(
            self.scheduler,
            lr=lr,
            iters_per_epoch=iters_per_epoch,
            max_epoch=self.max_epoch,
            warmup_epochs=self.warmup_epochs,
            warmup_lr_start=self.warmup_lr,
            min_lr_ratio=self.min_lr_ratio,
            no_aug_epochs=self.no_aug_epochs,
        )
