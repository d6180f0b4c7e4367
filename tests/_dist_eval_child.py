"""Child process for the real 2-process ``jax.distributed`` eval test
(tests/test_distributed.py). Runs one rank of a sharded ONEX evaluation:
strided ShardDataset -> evaluator -> cross-process all_gather_objects ->
COCOeval on the main process only. Writes its observations as JSON."""

import json
import sys


def main():
    rank, root, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]

    import jax

    # The session presets JAX_PLATFORMS=axon and a sitecustomize module
    # imports jax before this script runs, so the env override is too late —
    # force CPU through jax.config (same recipe as tests/conftest.py), and
    # only then bring up the distributed runtime.
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=rank,
    )
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np

    from streamyolo_tpu.data import (
        DataLoader,
        DoubleValTransform,
        ONE_ARGOVERSEDataset,
        ShardDataset,
    )
    from streamyolo_tpu.eval import ONEX_COCOEvaluator

    ds = ONE_ARGOVERSEDataset(
        root, "val.json", name="val", img_size=(30, 48),
        preproc=DoubleValTransform(),
    )
    shard = ShardDataset(ds, rank, 2)
    loader = DataLoader(shard, batch_size=2, num_workers=0, shuffle=False)
    evaluator = ONEX_COCOEvaluator(
        loader, img_size=(30, 48), confthre=0.3, nmsthre=0.5, num_classes=8,
    )

    def forward(images):
        # one fixed high-confidence class-2 box per image: every surviving
        # input contributes exactly one COCO row under image_id + 1
        preds = np.zeros((images.shape[0], 8, 13), np.float32)
        preds[:, 0, :4] = (10, 22, 8, 6)
        preds[:, 0, 4] = 1.0
        preds[:, 0, 5 + 2] = 1.0
        return preds

    n_local = len(shard)
    (ap, ap50, info), data_list = evaluator.evaluate(forward, return_outputs=True)
    with open(out, "w") as f:
        json.dump({
            "rank": rank,
            "n_local_images": n_local,
            "image_ids": sorted(d["image_id"] for d in data_list),
            "is_main_output": info is not None,
            "ap50": ap50,
        }, f)


if __name__ == "__main__":
    main()
