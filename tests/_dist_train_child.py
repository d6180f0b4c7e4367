"""Child process for the real 2-process data-parallel TRAIN step test
(tests/test_distributed.py). Each rank holds HALF of a fixed global batch,
forms the 2-device global mesh, and runs ONE jitted train step (forward +
SimOTA/TAL loss + SGD + EMA) with the batch sharded on the data axis — the
gradient all-reduce is GSPMD-inserted, the role of the reference's DDP
bucket all-reduce (`/root/reference/exps/train_utils/double_trainer.py:171`).
Writes the replicated loss as JSON and the full updated params as
``<out>.npz`` so the parent can assert (a) both ranks agree BITWISE and
(b) the result matches a single-process step over the full batch
elementwise (only the reduction order differs)."""

import json
import sys


def main():
    rank, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    import jax

    # Force CPU through jax.config (env overrides are too late — a
    # sitecustomize imports jax with the axon platform preset), then bring
    # up the 2-process distributed runtime. rank -1 is the REFERENCE mode:
    # one process, two local devices (the parent sets the XLA_FLAGS device
    # count), same mesh/sharding/partitioned program — so the cross-process
    # rendezvous is the only thing the 2-process run adds.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if rank >= 0:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}", num_processes=2,
            process_id=rank,
        )
        assert jax.process_count() == 2
    assert len(jax.devices()) == 2

    import os

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from streamyolo_tpu.exp import get_exp
    from streamyolo_tpu.train import (
        build_lr_schedule,
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exp = get_exp(os.path.join(repo, "cfgs", "s_s50_onex_dfp_tal_flip.py"))
    exp.depth, exp.width = 0.33, 0.25
    model = exp.get_model()
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 32, 32, 6), np.float32),
        mode="off_pipe", train=False,
    )
    sched = build_lr_schedule("constant", 5e-3, 10, 100)
    state, tx = create_train_state(variables, sched)
    # replicated inputs may be passed as host arrays (identical on every
    # process); the jit in_shardings place them
    state = jax.tree_util.tree_map(np.asarray, state)

    # the SAME fixed global batch on both ranks; each contributes its half
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (4, 32, 32, 6)).astype(np.float32)
    labels = np.zeros((4, 8, 5), np.float32)
    labels[:, 0] = [2.0, 16.0, 16.0, 10.0, 8.0]
    labels[:, 1] = [5.0, 10.0, 22.0, 8.0, 6.0]
    global_batch = {"images": images, "labels": labels,
                    "support_labels": labels.copy()}

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    def to_global(x):
        if rank < 0:  # single-process reference: both devices are local
            return jax.device_put(x, sharding)
        local = x[rank * 2:(rank + 1) * 2]
        return jax.make_array_from_process_local_data(sharding, local, x.shape)

    batch = {k: to_global(v) for k, v in global_batch.items()}

    # donation of a multi-partition carry deadlocks on XLA:CPU (CLAUDE.md);
    # the real-TPU path keeps it on
    step = jit_train_step(
        make_train_step(model, tx, 8, sched), mesh=mesh, donate=False)
    new_state, metrics = step(state, batch)

    leaves = jax.tree_util.tree_leaves(new_state.params)
    np.savez(out + ".npz",
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    with open(out, "w") as f:
        json.dump({
            "rank": rank,
            "n_global_devices": len(jax.devices()),
            "total_loss": float(metrics["total_loss"]),
            "num_fg": float(metrics["num_fg"]),
        }, f)


if __name__ == "__main__":
    main()
