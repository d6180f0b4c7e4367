#!/usr/bin/env python3
"""Export a checkpoint's model weights as ``.safetensors``.

Interchange with the torch ecosystem: ``--torch-names`` (default) writes the
reference's state_dict names with OIHW convs, so
``torch.nn.Module.load_state_dict(safetensors.torch.load_file(out))`` works
on a reference-style model (`/root/reference/exps/model/` module tree);
``--flax-names`` keeps the flax tree ('/'-joined, HWIO). Accepts our pickle
checkpoints or a torch ``.pth`` (via the importer), so it also converts
released reference weights to safetensors.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))


def main():
    p = argparse.ArgumentParser("StreamYOLO-TPU safetensors export")
    p.add_argument("-c", "--ckpt", type=str, required=True,
                   help="checkpoint: *.pkl (ours) or *.pth (torch)")
    p.add_argument("-o", "--out", type=str, required=True,
                   help="output .safetensors path")
    names = p.add_mutually_exclusive_group()
    names.add_argument("--torch-names", dest="torch_layout",
                       action="store_true", default=True)
    names.add_argument("--flax-names", dest="torch_layout",
                       action="store_false")
    args = p.parse_args()

    from streamyolo_tpu.utils.checkpoint import load_checkpoint, save_safetensors

    ckpt = load_checkpoint(args.ckpt)
    variables = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    n = save_safetensors(variables, args.out, torch_layout=args.torch_layout)
    print(f"wrote {n} tensors ({'torch' if args.torch_layout else 'flax'} "
          f"layout) to {args.out}")


if __name__ == "__main__":
    main()
