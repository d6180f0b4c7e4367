"""Real multi-process ``jax.distributed`` coverage: two OS processes with a
local coordinator run the sharded eval, and the cross-process
``all_gather_objects`` lands BOTH halves' detections in each process — no
monkeypatched ranks (the reference's equivalent gather-to-rank-0 ran under
real DDP, `onex_stream_evaluator.py:158-161`)."""

import json
import os
import socket
import subprocess
import sys

import pytest

pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_eval_gathers_both_halves(fake_argoverse, tmp_path):
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    child = os.path.join(REPO, "tests", "_dist_eval_child.py")
    outs = [str(tmp_path / f"rank{r}.json") for r in (0, 1)]
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(r), fake_argoverse, str(port), outs[r]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for r in (0, 1)
    ]
    results = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=300)
        assert p.returncode == 0, f"rank failed:\n{stdout}\n{stderr}"
    for path in outs:
        with open(path) as f:
            results.append(json.load(f))

    r0, r1 = results
    # strided shard: 7 images split 4 / 3
    assert r0["n_local_images"] == 4 and r1["n_local_images"] == 3
    # the gathered list covers the survivors of the FULL dataset on BOTH
    # ranks (ids 1, 2, 5 survive the ONEX boundary rules -> rows at +1);
    # each rank alone only saw part of them
    assert r0["image_ids"] == [2, 3, 6]
    assert r1["image_ids"] == [2, 3, 6]
    # COCOeval ran on the main process only
    assert r0["is_main_output"] and not r1["is_main_output"]
