"""Worker process for the REAL two-process multi-host test (launched by
tests/test_multihost_real.py; reference launch semantics:
/root/reference/train_net.py:325-335 detectron2 launch -> 1 proc/GPU).

Each worker: jax.distributed.initialize against a local coordinator (the
train.py --distributed path), builds its per-process loader shard, runs a
few SPMD train steps over a 2-process global mesh (XLA inserts the gradient
all-reduce), then exercises the evaluator state all-gather. Results land in
<outdir>/rank<r>.json for the parent to cross-check.

Usage: python tests/multihost_worker.py RANK PORT OUTDIR
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rank, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    import jax

    # the axon sitecustomize forces jax_platforms="axon,cpu"; this test runs
    # CPU-only processes (the multi-host analogue of testing multi-node
    # without a cluster, SURVEY.md §4)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=rank,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    assert jax.local_device_count() == 1

    import numpy as np
    import jax.numpy as jnp

    from bm2f_tpu.config import get_config
    from bm2f_tpu.data.loader import TrainingSampler
    from bm2f_tpu.parallel.mesh import shard_batch
    from bm2f_tpu.train.trainer import Trainer

    cfg = get_config("coco_instance_r50", {
        "model.decoder.dec_layers": 1,
        "model.decoder.num_queries": 8,
        "model.pixel_decoder.transformer_enc_layers": 1,
        "model.num_classes": 5,
        "model.backbone.resnet.depth": 50,
        "train.matcher": "jv",
        "train.ims_per_batch": 2,
        "mesh.data": 2,
    })
    trainer = Trainer(cfg)

    # --- per-process loader shard (train.py:84-93 contract) --------------
    world = jax.process_count()
    local_b = cfg.train.ims_per_batch // world
    sampler = TrainingSampler(8, seed=7, rank=rank, world_size=world)
    it = iter(sampler)

    H = W = 64
    G = 4

    def local_batch(idx):
        r = np.random.RandomState(1000 + idx)
        return {
            "images": (r.rand(local_b, H, W, 3) * 255).astype(np.float32),
            "labels": r.randint(0, 5, (local_b, G)).astype(np.int32),
            "masks": (r.rand(local_b, G, H, W) > 0.7).astype(np.float32),
            "valid": np.ones((local_b, G), bool),
        }

    state = trainer.init_state(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    step_fn = trainer.compile_step(state)
    losses = []
    with trainer.mesh:
        state = trainer.shard_state(state)
        for _ in range(3):
            batch = shard_batch(local_batch(next(it)), trainer.mesh)
            state, metrics = step_fn(state, batch)
            losses.append(float(metrics["total_loss"]))

    # --- evaluator state all-gather (gather_evaluator over 2 processes) --
    from bm2f_tpu.evaluation.coco_eval import COCOMaskAPEvaluator
    from bm2f_tpu.evaluation.evaluator import gather_evaluator

    ev = COCOMaskAPEvaluator(num_classes=3)
    # each rank scores a DIFFERENT image; the merged result must see both
    r = np.random.RandomState(rank)
    m = np.zeros((1, 32, 32), bool)
    m[0, 4 + rank * 8 : 16 + rank * 8, 4:16] = True
    ev.process(
        {"scores": np.array([0.9]), "labels": np.array([rank % 3]),
         "masks": m},
        {"labels": np.array([rank % 3]), "masks": m.copy()},
    )
    merged = gather_evaluator(ev)
    eval_res = merged.evaluate()
    n_cats = len(merged.state_dict())

    with open(os.path.join(outdir, f"rank{rank}.json"), "w") as f:
        json.dump({"rank": rank, "losses": losses, "eval": eval_res,
                   "n_cats_after_gather": n_cats}, f)
    print(f"rank {rank} done: losses={losses} eval={eval_res}")


if __name__ == "__main__":
    main()
