#!/usr/bin/env python3
"""Training CLI.

Flag surface mirrors `/root/reference/tools/train.py:18-96` where it makes
sense on TPU: ``-f`` config file, ``-b`` total batch, ``-c`` checkpoint
(torch ``.pth`` or our ``.pkl``), ``--resume``, ``-e`` start epoch,
``--fp16`` (bf16 on TPU), ``--cache``, and an ``opts`` remainder merged into
the Exp. GPU-process plumbing disappears: SPMD JAX runs ONE process per host
(`jax.distributed.initialize`) and the mesh spans all chips — there is no
``launch()`` fork, no ``--dist-backend``/``--dist-url`` (SURVEY.md §2.4/5.8);
``--num_machines``/``--machine_rank`` map to the JAX coordinator settings.
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))


def make_parser():
    parser = argparse.ArgumentParser("StreamYOLO-TPU train")
    parser.add_argument("-expn", "--experiment-name", type=str, default=None)
    parser.add_argument("-n", "--name", type=str, default=None, help="model name")
    parser.add_argument("-f", "--exp_file", default=None, type=str, help="experiment config file")
    parser.add_argument("-b", "--batch-size", type=int, default=32, help="total batch size")
    parser.add_argument("-c", "--ckpt", default=None, type=str, help="checkpoint file (.pth or .pkl)")
    parser.add_argument("--resume", default=False, action="store_true", help="resume training")
    parser.add_argument("-e", "--start_epoch", default=None, type=int, help="resume start epoch")
    parser.add_argument("--fp16", dest="fp16", default=False, action="store_true",
                        help="mixed precision (bf16 on TPU)")
    parser.add_argument("--cache", dest="cache", default=False, action="store_true",
                        help="cache resized images in RAM")
    parser.add_argument("-o", "--occupy", dest="occupy", default=False, action="store_true",
                        help="accepted for drop-in script compatibility; GPU memory "
                             "pre-occupancy has no TPU analogue (ignored)")
    parser.add_argument("--dist-backend", default="xla", type=str,
                        help="accepted for compatibility; collectives always run "
                             "through XLA over ICI/DCN (ignored)")
    parser.add_argument("--num_machines", default=1, type=int, help="number of hosts")
    parser.add_argument("--machine_rank", default=0, type=int, help="host rank (process index)")
    parser.add_argument("--dist-url", default=None, type=str,
                        help="JAX distributed coordinator address (host:port)")
    parser.add_argument("-l", "--logger", type=str, default="tensorboard",
                        help="logger backend: tensorboard | wandb "
                             "(wandb-* 'key value' pairs in opts configure the run)")
    parser.add_argument("--seed", default=None, type=int)
    parser.add_argument("--dedup", dest="dedup", default=False, action="store_true",
                        help="accepted for compatibility: sequential-dedup "
                             "per-epoch eval is now the DEFAULT (single "
                             "process, ONE/TWO pairing; auto-falls-back "
                             "otherwise)")
    parser.add_argument("--no-dedup", dest="no_dedup", default=False,
                        action="store_true",
                        help="per-epoch eval with the dual-frame (off_pipe) "
                             "forward instead of the sequential-dedup one")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="extra 'key value' Exp overrides")
    return parser


def main():
    args = make_parser().parse_args()
    from streamyolo_tpu.exp import get_exp

    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)

    if args.seed is not None:
        exp.seed = args.seed
    if exp.seed is not None:
        random.seed(exp.seed)
        import numpy as np

        np.random.seed(exp.seed)
        warnings.warn(
            "Seed set — determinism may slow data loading (same caveat as the reference)."
        )

    if not args.experiment_name:
        args.experiment_name = exp.exp_name

    if args.num_machines > 1:
        import jax

        jax.distributed.initialize(
            coordinator_address=args.dist_url,
            num_processes=args.num_machines,
            process_id=args.machine_rank,
        )

    trainer = exp.get_trainer(args)
    trainer.train()


if __name__ == "__main__":
    main()
