#!/usr/bin/env python
"""Training entry point — the framework's train_net.py (reference:
train_net.py:305-335 main/launch; one explicit SPMD process instead of
one-process-per-GPU DDP).

Usage:
  python train.py --config coco_instance_r50 --opts train.ims_per_batch=8
  python train.py --config coco_instance_r50 --eval-only --resume
"""

from __future__ import annotations

import argparse
import ast
import os
import time


def parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


# batch keys forwarded to the device (everything else is host-side metadata)
BATCH_KEYS = ("images", "labels", "masks", "valid", "dino_feats")

# host run-ahead bound: how many dispatched-but-unsynced steps may be in
# flight. >=2 keeps the device busy (double buffering: the next batch's
# host->device upload overlaps the current step); small enough that queued
# input batches stay bounded (~DEPTH x batch bytes of device memory).
ASYNC_DEPTH = 4


def run_train_loop(cfg, trainer, state, step_fn, loader, first_batch, ckpt,
                   storage, writers, lr_sched, dispatch_eval=None,
                   eval_dataset="", profile_dir=None):
    """The training loop, written for asynchronous dispatch (reference loop
    semantics: train_net.py:184-263 / d2 SimpleTrainer, which hides the
    same costs behind CUDA streams):

    - NO per-iteration device sync: pulling `int(state.step)` or metric
      floats every step blocks the host on step completion and costs a
      full host round trip (~27 ms on the tunneled TPU) before the next
      batch's upload even starts. The iteration counter is tracked
      host-side (the step fn increments state.step by exactly 1).
    - per-step metric scalars are stacked into ONE device vector at
      dispatch time; the host syncs each vector only once it is
      ASYNC_DEPTH steps old (by then the device has long finished it, so
      the pull returns without stalling the pipeline), and log writers
      flush at log_period from already-pulled host rows.
    - the next batch is collated and device_put WHILE the current step
      runs on the device.

    Returns the final state. Exercised by tests/test_train_loop.py against
    a synthetic loader (iteration accounting, checkpoint cadence, metric
    batching exactness)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bm2f_tpu.parallel.mesh import shard_batch

    max_iter = cfg.train.optimizer.max_iter
    log_period = max(int(cfg.train.log_period), 1)

    def to_device(batch):
        return shard_batch(
            {k: jnp.asarray(v) for k, v in batch.items() if k in BATCH_KEYS},
            trainer.mesh,
        )

    it = int(state.step)
    t_start, it_start = time.time(), it
    metric_keys = []
    pending = []  # (iter, stacked metric vector, device) — unsynced steps
    host_rows = []  # (iter, np.ndarray row) — synced, awaiting flush

    def drain(n_keep):
        """Pull pending metric vectors until at most n_keep remain."""
        while len(pending) > n_keep:
            i0, v0 = pending.pop(0)
            host_rows.append((i0, np.asarray(v0)))

    def flush():
        drain(0)
        if not host_rows:
            return
        now = time.time()
        for i_, row in host_rows:
            scalars = dict(zip(metric_keys, row.tolist()))
            scalars["lr"] = float(lr_sched(i_))
            if it > it_start:
                s_per_it = (now - t_start) / (it - it_start)
                scalars["eta_hours"] = s_per_it * (max_iter - i_) / 3600.0
            storage.put_scalars(i_, **scalars)
            for w in writers:
                w.write(storage)
        host_rows.clear()

    with trainer.mesh:
        sb = to_device(first_batch)
    while it < max_iter:
        if profile_dir is not None and it == 10:
            jax.profiler.start_trace(profile_dir)
        with trainer.mesh:
            state, metrics = step_fn(state, sb)  # async dispatch
            if not metric_keys:
                metric_keys = list(metrics.keys())
            pending.append(
                (it + 1, jnp.stack([metrics[k] for k in metric_keys]))
            )
        # host collation + upload of the NEXT batch overlap the device step
        batch = next(loader)
        with trainer.mesh:
            sb = to_device(batch)
        it += 1
        drain(ASYNC_DEPTH)
        if profile_dir is not None and it == 15:
            jax.profiler.stop_trace()
        do_ckpt = it % cfg.train.checkpoint_period == 0
        do_eval = bool(
            cfg.train.eval_period and dispatch_eval is not None
            and eval_dataset and it % cfg.train.eval_period == 0
            and it < max_iter
        )
        if it % log_period == 0 or do_ckpt or do_eval or it >= max_iter:
            flush()
        if do_ckpt:
            ckpt.save(it, state)
        if do_eval:
            eval_res = dispatch_eval(
                {"params": jax.device_get(state.params),
                 "frozen": jax.device_get(state.frozen)},
                eval_dataset,
            )
            storage.put_scalars(
                it, **{f"eval/{k}": float(v) for k, v in eval_res.items()}
            )
    flush()
    ckpt.save(it, state, force=True)
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="preset name (bm2f_tpu.config.PRESETS)")
    ap.add_argument("--dataset", default="coco_2017_train")
    ap.add_argument("--eval-dataset", default="")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max-iter", type=int, default=0)
    ap.add_argument("--output", default="./output")
    ap.add_argument("--wandb", action="store_true")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of steps 10-15")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host SPMD: jax.distributed.initialize() from "
                         "the cluster env (reference: d2 launch/DDP, "
                         "train_net.py:305-335); loaders shard per host")
    ap.add_argument("opts", nargs="*", help="config overrides key=value")
    args = ap.parse_args()

    import jax

    if args.distributed:
        jax.distributed.initialize()
    import jax.numpy as jnp
    import numpy as np

    from bm2f_tpu.config import get_config, update
    from bm2f_tpu.data import build_train_loader
    from bm2f_tpu.data.cityscapes import register_all_cityscapes
    from bm2f_tpu.data.datasets import register_all_builtin_datasets
    from bm2f_tpu.data.mappers import MAPPERS
    from bm2f_tpu.data.ytvis import register_all_ytvis
    from bm2f_tpu.train.checkpoint import Checkpointer
    from bm2f_tpu.train.trainer import Trainer
    from bm2f_tpu.parallel.mesh import shard_batch
    from bm2f_tpu.utils.events import (
        ConsoleWriter, EventStorage, JSONWriter, TensorBoardWriter, WandBWriter,
    )

    cfg = get_config(args.config, parse_overrides(args.opts))
    if args.max_iter:
        cfg = update(cfg, {"train.optimizer.max_iter": args.max_iter})
    register_all_builtin_datasets()
    register_all_cityscapes()
    register_all_ytvis()

    trainer = Trainer(cfg)
    mapper_name = cfg.input.dataset_mapper
    if cfg.task == "video" and "temporal_pairwise" in cfg.model.loss.sup_type:
        # temporal pairwise needs per-frame DINO features
        # (reference: train_net_video.py:82-85 mapper dispatch on SUP_TYPE)
        mapper_name = "ytvis_with_feats"
    mapper_cls = MAPPERS[mapper_name]
    mapper = mapper_cls(cfg.input, seed=cfg.train.seed)
    # per-host data sharding: each process loads its slice of the global
    # batch (reference: d2 per-GPU DataLoader shards)
    rank, world = jax.process_index(), jax.process_count()
    assert cfg.train.ims_per_batch % world == 0, (
        f"train.ims_per_batch={cfg.train.ims_per_batch} must divide evenly "
        f"across {world} hosts (reference: data_video/build.py:21-35)")
    loader = build_train_loader(
        args.dataset, mapper, cfg.train.ims_per_batch // world,
        seed=cfg.train.seed, rank=rank, world_size=world,
    )

    first = next(loader)
    # init on a tiny crop of the sample: parameter shapes do not depend on
    # the image size, and a full-resolution init graph costs a multi-minute
    # extra device compile that the training step never reuses (round-5
    # time-to-first-step work; reference reaches step 1 in under a minute,
    # train_net.py:305-322)
    sample = jnp.asarray(first["images"][:1])[..., :64, :64, :]
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed), sample)
    ckpt = Checkpointer(os.path.join(args.output, "checkpoints"))
    state = ckpt.resume_or_load(state, resume=args.resume)

    def dispatch_eval(variables, dataset):
        """Image vs video evaluator dispatch (reference: train_net.py:68-148
        vs train_net_video.py:59-99 — the video trainer always evaluates
        with YTVISEvaluator)."""
        if cfg.task == "video":
            from eval_video import run_video_eval  # noqa: local CLI module

            return run_video_eval(cfg, trainer.model, variables, dataset,
                                  rank=rank, world_size=world)
        from eval import run_eval  # noqa: local CLI module

        return run_eval(cfg, trainer.model, variables, dataset,
                        rank=rank, world_size=world)

    if args.eval_only:
        dispatch_eval({"params": state.params, "frozen": state.frozen},
                      args.eval_dataset or args.dataset)
        return

    step_fn = trainer.compile_step(state)
    state = trainer.shard_state(state)
    storage = EventStorage()
    writers = [
        ConsoleWriter(cfg.train.log_period),
        JSONWriter(os.path.join(args.output, "metrics.json"), cfg.train.log_period),
        TensorBoardWriter(os.path.join(args.output, "tb"), cfg.train.log_period),
    ]
    if args.wandb:
        writers.append(WandBWriter())

    from bm2f_tpu.train.optim import make_lr_schedule

    lr_sched = make_lr_schedule(cfg.train.optimizer)
    # periodic in-training evaluation (reference: d2 EvalHook at
    # TEST.EVAL_PERIOD, train_net.py:68-148 evaluator dispatch) happens
    # inside the loop via dispatch_eval
    state = run_train_loop(
        cfg, trainer, state, step_fn, loader, first, ckpt, storage, writers,
        lr_sched, dispatch_eval=dispatch_eval, eval_dataset=args.eval_dataset,
        profile_dir=os.path.join(args.output, "profile") if args.profile else None,
    )
    print(f"training done at iter {int(state.step)}")


if __name__ == "__main__":
    main()
