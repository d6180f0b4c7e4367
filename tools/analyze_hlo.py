#!/usr/bin/env python3
"""Where do the train-step HBM bytes go? Parse the optimized HLO of the
compiled program and attribute memory traffic per top-level instruction.

The m train step measures at ~86% of the v5e HBM roofline (117 GB/step,
tools/bench_suite.py train_s), so bytes — not FLOPs — set the step time.
This tool compiles a step (persistent-cache hit when the benches ran
first), walks the ENTRY computation of the optimized HLO, and charges each
top-level instruction result-bytes (HBM writes) + operand-bytes (HBM reads;
fusion-internal values never materialize, matching how XLA's own
bytes-accessed estimate works). Output: traffic grouped by opcode, the top
instructions, and a conv-shape census of forward vs backward convolutions
(backward = dgrad/wgrad shapes, recognizable by reversed/dilated windows).

Usage: python tools/analyze_hlo.py {train,model_bwd,eval,stream} [--batch N]
       [--depth D] [--width W] [--top N] [--int8] [--no-packed] [--dump FILE]
(``stream`` = the single-frame on_pipe + fixed-NMS program bench.py times;
``--int8``/``--no-packed`` profile the PTQ / raw-layout eval+stream variants
— the raw-int8 relayout-copy pathology documented in README was found here)
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
# shape with its physical layout, e.g. bf16[16,300,480,48]{3,2,1,0:T(8,128)(2,1)}
_SHAPE_LAYOUT_RE = re.compile(r"(\w+)\[([\d,]*)\]\{([^}]*)\}")
_TILE_RE = re.compile(r"T\((\d+),(\d+)\)")
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*(\(?[\w\[\],\s\{\}/#:()\-]+?\)?)\s+"
    r"([\w\-]+)\(")
_OPERAND_RE = re.compile(r"%([\w\.\-]+)")
_CYCLES_RE = re.compile(r'"estimated_cycles":"(\d+)"')


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def shape_bytes(type_str: str) -> int:
    """Total PHYSICAL bytes of an HLO type string (handles tuples): when a
    layout with a T(s, l) tiling is present, the two minor-most dims are
    padded to the tile — the real HBM footprint on TPU (a 48-channel bf16
    tensor stores as 128 lanes)."""
    total = 0
    consumed = set()
    for m in _SHAPE_LAYOUT_RE.finditer(type_str):
        dtype, dims_s, layout = m.group(1), m.group(2), m.group(3)
        consumed.add((m.start(), dtype, dims_s))
        if dtype not in DTYPE_BYTES:
            continue
        dims = [int(d) for d in dims_s.split(",") if d]
        tile = _TILE_RE.search(layout)
        if tile and len(dims) >= 2:
            s, l = int(tile.group(1)), int(tile.group(2))
            # layout minor-to-major order: first two ids are the minor dims
            order = [int(x) for x in layout.split(":")[0].split(",") if
                     x.strip().isdigit()]
            minor = order[0] if order else len(dims) - 1
            second = order[1] if len(order) > 1 else len(dims) - 2
            dims[minor] = _ceil_to(dims[minor], l)
            dims[second] = _ceil_to(dims[second], s)
        elif tile and len(dims) == 1:
            dims[0] = _ceil_to(dims[0], int(tile.group(2)))
        n = 1
        for d in dims:
            n *= d
        total += n * DTYPE_BYTES[dtype]
    if total:
        return total
    for dtype, dims in _SHAPE_RE.findall(type_str):
        if dtype not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


def parse_entry(hlo_text: str):
    """Yield (name, opcode, result_bytes, operand_names, cycles, raw_line)
    for each instruction of the ENTRY computation."""
    entry = []
    in_entry = False
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                break
            m = _INSTR_RE.match(line)
            if not m:
                continue
            name, type_str, opcode = m.groups()
            rest = line[m.end():]
            operands = _OPERAND_RE.findall(rest.split(", calls=")[0])
            cyc = _CYCLES_RE.search(line)
            entry.append((name, opcode, shape_bytes(type_str), operands,
                          int(cyc.group(1)) if cyc else 0, line))
    return entry


V5E_HZ = 940e6  # v5e core clock (cycle estimates -> time)

_OP_NAME_RE = re.compile(r'op_name="([^"]*)"')


def module_share(hlo_text: str, pattern: str):
    """Estimated-cycle share of instructions whose op_name metadata matches
    ``pattern`` — per-module attribution (an instruction/fusion is charged
    to the module of its representative op, the same accounting the r4
    jian/bu_conv2 packing decision used). Returns (matched_cycles,
    total_cycles) and prints the matching instructions."""
    entry = parse_entry(hlo_text)
    total = sum(cyc for _, _, _, _, cyc, _ in entry)
    rx = re.compile(pattern)
    matched = 0
    rows = []
    for name, opcode, rb, _, cyc, line in entry:
        m = _OP_NAME_RE.search(line)
        if m and rx.search(m.group(1)):
            matched += cyc
            if cyc:
                rows.append((cyc, opcode, m.group(1)))
    print(f"\n== module share: op_name ~ /{pattern}/ ==")
    for cyc, opcode, opn in sorted(rows, reverse=True)[:12]:
        print(f"  {cyc / V5E_HZ * 1e3:7.3f} ms-est  {opcode:12s} {opn[:90]}")
    pct = 100.0 * matched / max(total, 1)
    print(f"  matched {matched / V5E_HZ * 1e3:.3f} of "
          f"{total / V5E_HZ * 1e3:.3f} ms-est = {pct:.2f}%")
    return matched, total


def analyze(hlo_text: str, top: int = 25):
    entry = parse_entry(hlo_text)
    result_bytes = {name: rb for name, _, rb, _, _, _ in entry}

    by_op = defaultdict(lambda: [0, 0, 0])  # opcode -> [bytes, count, cycles]
    per_instr = []
    for name, opcode, rb, operands, cyc, line in entry:
        reads = sum(result_bytes.get(o, 0) for o in operands)
        total = rb + reads
        by_op[opcode][0] += total
        by_op[opcode][1] += 1
        by_op[opcode][2] += cyc
        per_instr.append((total, cyc, name, opcode, line))

    grand = sum(v[0] for v in by_op.values())
    grand_cyc = sum(v[2] for v in by_op.values())
    print("== traffic / est-time by opcode ==")
    for op, (b, c, cy) in sorted(by_op.items(), key=lambda kv: -kv[1][2])[:15]:
        print(f"  {op:24s} {b/1e9:8.2f} GB  {cy/V5E_HZ*1e3:7.2f} ms-est "
              f"({c} instrs)")
    print(f"  {'TOTAL':24s} {grand/1e9:8.2f} GB  "
          f"{grand_cyc/V5E_HZ*1e3:7.2f} ms-est")

    print(f"\n== top {top} instructions by estimated cycles ==")
    for total, cyc, name, opcode, line in sorted(
            per_instr, key=lambda e: -e[1])[:top]:
        fused = re.search(r"calls=%?([\w\.\-]+)", line)
        detail = f" calls={fused.group(1)}" if fused else ""
        shape = _SHAPE_RE.search(line.split("=", 1)[1])
        shp = f"{shape.group(1)}[{shape.group(2)}]" if shape else "?"
        print(f"  {cyc/V5E_HZ*1e3:7.3f} ms  {total/1e9:7.2f} GB  "
              f"{opcode:12s} {shp:30s}{detail[:60]}")

    convs = [(t, cyc, line) for t, cyc, _, op, line in per_instr
             if op == "convolution"]
    print(f"\n== convolution census ({len(convs)} top-level convs, "
          f"{sum(c for _, c, _ in convs)/V5E_HZ*1e3:.2f} ms-est) ==")
    for t, cyc, line in sorted(convs, key=lambda e: -e[1])[:top]:
        win = re.search(r"window=\{([^}]*)\}", line)
        dims = re.search(r"dim_labels=(\S+?)[,\s]", line)
        shape = _SHAPE_RE.search(line.split("=", 1)[1])
        shp = f"{shape.group(1)}[{shape.group(2)}]" if shape else "?"
        print(f"  {cyc/V5E_HZ*1e3:7.3f} ms  {t/1e9:6.2f} GB -> {shp:26s} "
              f"{win.group(1) if win else ''}  "
              f"{dims.group(1) if dims else ''}")


def _get_hlo(which: str, batch: int, depth: float, width: float,
             int8: bool = False, packed: bool = True) -> str:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    from tools.bench_suite import _train_setup  # noqa: E402

    if which in ("train", "model_bwd"):
        step_fn, state, batch_d = _train_setup(
            jax, batch, remat=False, depth=depth, width=width)
        if which == "train":
            from streamyolo_tpu.train import jit_train_step

            jitted = jit_train_step(step_fn, donate=False)
            return jitted.lower(state, batch_d).compile().as_text()
        import jax.numpy as jnp

        model = step_fn.model

        def model_sum(p, bs, b):
            out, _ = model.apply(
                {"params": p, "batch_stats": bs}, b["images"],
                mode="off_pipe", train=True, mutable=["batch_stats"])
            return sum(jnp.sum(o.astype(jnp.float32))
                       for o in jax.tree_util.tree_leaves(out))

        g = jax.jit(jax.grad(model_sum))
        return g.lower(
            state.params, state.batch_stats, batch_d).compile().as_text()

    # eval / stream forward
    import jax.numpy as jnp

    from tools.bench_suite import _build_model

    model = _build_model(depth=depth, width=width, dtype=jnp.bfloat16,
                         packed=packed)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 96, 6), np.float32),
        mode="off_pipe", train=False)
    if int8:
        from streamyolo_tpu.quant import quantize_for_serving

        calib = [np.random.RandomState(1).randint(
            0, 255, (1, 600, 960, 6)).astype(np.float32)]
        variables = quantize_for_serving(
            model, jax.device_get(variables), calib, strip=True)
    if which == "stream":
        # the bench.py / TPUStreamDetector per-frame program: uint8 cast,
        # on_pipe forward with the carried DFP buffer, decode, fixed NMS
        from streamyolo_tpu.ops.nms import postprocess_fixed

        def step(v, image, buffer):
            x = image.astype(jnp.bfloat16)
            preds, new_buf = model.apply(v, x, buffer=buffer, mode="on_pipe")
            return postprocess_fixed(
                preds, num_classes=8, conf_thre=0.01, nms_thre=0.65,
                pre_nms_topk=200), new_buf

        img = np.zeros((1, 600, 960, 3), np.uint8)
        _, buf = jax.eval_shape(
            lambda v, x: model.apply(v, x, mode="on_pipe"), variables,
            img.astype(np.float32))
        buf = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), buf)
        return jax.jit(step).lower(variables, img, buf).compile().as_text()
    fwd = jax.jit(lambda v, x: model.apply(v, x, mode="off_pipe", train=False))
    x = np.zeros((batch, 600, 960, 6), np.float32)
    return fwd.lower(variables, x).compile().as_text()


def main():
    p = argparse.ArgumentParser("train-step HLO traffic analysis")
    p.add_argument("which", choices=["train", "model_bwd", "eval", "stream"])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--depth", type=float, default=0.33)
    p.add_argument("--width", type=float, default=0.50)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--int8", action="store_true",
                   help="eval/stream only: profile the int8 PTQ program")
    p.add_argument("--no-packed", action="store_true",
                   help="eval/stream only: raw-layout model")
    p.add_argument("--dump", help="also write the raw HLO text here")
    p.add_argument("--from-file", help="analyze an existing HLO dump instead")
    p.add_argument("--module-share", metavar="REGEX",
                   help="also report the estimated-cycle share of "
                        "instructions whose op_name matches (e.g. 'stem' to "
                        "size the fp-stem int8 exemption)")
    args = p.parse_args()

    if args.from_file:
        text = open(args.from_file).read()
    else:
        text = _get_hlo(args.which, args.batch, args.depth, args.width,
                        int8=args.int8, packed=not args.no_packed)
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(text)
    analyze(text, top=args.top)
    if args.module_share:
        module_share(text, args.module_share)
    return 0


if __name__ == "__main__":
    sys.exit(main())
