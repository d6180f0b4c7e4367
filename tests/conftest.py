"""Test configuration: force a CPU backend with 8 virtual devices so the
multi-chip sharding paths (SURVEY.md §2.4) are exercised without TPU hardware.
Must run before the first ``import jax`` anywhere in the test session."""

import os

# The session environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel) and a
# sitecustomize module imports jax BEFORE conftest runs, so env-var overrides
# are too late. The XLA_FLAGS env is only read at backend-init time, so it can
# still be set here; the platform itself must be forced through jax.config
# (verified to win over the preloaded axon registration).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import pytest

# JAX's DEFAULT conv/matmul precision is reduced (bf16-class) even on CPU;
# parity tests against the fp32 torch oracle need exact fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Synthetic Argoverse-HD-format dataset shared by data/eval/stream tests:
# two sequences (4 + 3 tiny frames), one 10x8 box drifting +2px/frame.
FAKE_H, FAKE_W = 60, 96
FAKE_IMG_SIZE = (30, 48)


def write_fake_argoverse(root, seq_lens=(4, 3), draw_boxes=False,
                         box_wh=(10, 8)):
    """Materialize the synthetic dataset under ``root`` with one sequence per
    entry of ``seq_lens``; returns ``str(root)``.

    ``draw_boxes=True`` renders each annotation as a bright rectangle on a
    dark background so the box is VISIBLE — required by any test that trains
    on this data (the default flat frames carry no signal at the box)."""
    import json

    import cv2

    ann_dir = root / "Argoverse-HD" / "annotations"
    ann_dir.mkdir(parents=True)
    seq_dirs = [f"seq{sid}" for sid in range(len(seq_lens))]
    images, annotations = [], []
    img_id = ann_id = 0
    bw, bh = box_wh
    for sid, n_frames in enumerate(seq_lens):
        d = root / "Argoverse-1.1" / "tracking" / seq_dirs[sid]
        d.mkdir(parents=True)
        for fid in range(n_frames):
            name = f"f{fid}.jpg"
            x = 10 + 2 * fid
            if draw_boxes:
                frame = np.full((FAKE_H, FAKE_W, 3), 24, np.uint8)
                frame[20:20 + bh, x:x + bw] = (40, 230, 90)
            else:
                frame = np.full(
                    (FAKE_H, FAKE_W, 3), 30 * (img_id + 1) % 255, np.uint8)
            cv2.imwrite(str(d / name), frame)
            images.append(
                dict(id=img_id, width=FAKE_W, height=FAKE_H, sid=sid, fid=fid, name=name)
            )
            annotations.append(
                dict(id=ann_id, image_id=img_id, category_id=2,
                     bbox=[x, 20, bw, bh], area=bw * bh, iscrowd=0)
            )
            ann_id += 1
            img_id += 1
    categories = [
        dict(id=i, name=n)
        for i, n in enumerate(
            "person bicycle car motorcycle bus truck traffic_light stop_sign".split()
        )
    ]
    data = dict(images=images, annotations=annotations, categories=categories,
                seq_dirs=seq_dirs, sequences=seq_dirs)
    for split in ("train.json", "val.json"):
        with open(ann_dir / split, "w") as f:
            json.dump(data, f)
    return str(root)


@pytest.fixture(scope="session")
def fake_argoverse(tmp_path_factory):
    return write_fake_argoverse(tmp_path_factory.mktemp("argoverse"))


@pytest.fixture(scope="session")
def fake_argoverse_long(tmp_path_factory):
    """A single 8-frame sequence: long enough that the TWOX evaluator's
    boundary rules leave survivors (ids 2..5 -> rows at image_ids 4..7)."""
    return write_fake_argoverse(
        tmp_path_factory.mktemp("argoverse_long"), seq_lens=(8,))
