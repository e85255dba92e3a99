"""run_train_loop (train.py) against a synthetic loader: the loop batches
device syncs (one metric pull per log window, host-side iteration counter,
bounded ASYNC_DEPTH run-ahead) — these tests pin that the async accounting
is EXACT: same per-step losses as a synchronous replay, every iteration
recorded, checkpoints on cadence."""

import itertools
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")  # repo root (train.py is a top-level module)

from bm2f_tpu.config import get_config
from bm2f_tpu.parallel.mesh import shard_batch
from bm2f_tpu.train.checkpoint import Checkpointer
from bm2f_tpu.train.optim import make_lr_schedule
from bm2f_tpu.train.trainer import Trainer
from bm2f_tpu.utils.events import EventStorage


class _RecordingWriter:
    """Captures (step, latest total_loss) at every log_period boundary."""

    def __init__(self, log_period):
        self.log_period = log_period
        self.rows = []

    def write(self, storage):
        if storage.step % self.log_period != 0:
            return
        self.rows.append((storage.step, storage.latest()["total_loss"]))


@pytest.mark.slow
def test_run_train_loop_async_accounting_is_exact(tmp_path):
    from train import run_train_loop

    # same tiny config as test_train_integration (shares its compile cache)
    cfg = get_config(
        "coco_instance_r50",
        {
            "model.decoder.dec_layers": 2,
            "model.decoder.num_queries": 10,
            "model.pixel_decoder.transformer_enc_layers": 1,
            "model.loss.train_num_points": 128,
            "mesh.data": 2,
            "train.optimizer.base_lr": 5e-4,
            "train.optimizer.clip_gradients": 1.0,
            "train.optimizer.warmup_iters": 0,
            "train.optimizer.max_iter": 11,
            "train.log_period": 4,
            "train.checkpoint_period": 5,
        },
    )
    trainer = Trainer(cfg)
    B, H, W, G = 2, 64, 64, 3
    rng = np.random.RandomState(0)
    masks = np.zeros((B, G, H, W), np.float32)
    masks[:, 0, :32, :32] = 1
    masks[:, 1, 32:, :] = 1
    masks[:, 2, :32, 32:] = 1
    batch = {
        "images": rng.rand(B, H, W, 3).astype(np.float32) * 255,
        "labels": rng.randint(0, 80, (B, G)).astype(np.int32),
        "masks": masks,
        "valid": np.ones((B, G), bool),
    }
    state0 = trainer.init_state(
        jax.random.PRNGKey(0), jnp.asarray(batch["images"][:1])
    )
    step_fn = trainer.compile_step(state0)

    # synchronous replay for the ground-truth per-step losses. init is
    # deterministic, so a second init_state gives a bitwise-identical
    # starting point (step_fn donates its state argument, so state0's
    # buffers are consumed by whichever run goes first).
    replay_state = state0
    state0 = trainer.init_state(
        jax.random.PRNGKey(0), jnp.asarray(batch["images"][:1])
    )
    replay = []
    with trainer.mesh:
        sb = shard_batch(
            {k: jnp.asarray(v) for k, v in batch.items()}, trainer.mesh
        )
        for _ in range(11):
            replay_state, metrics = step_fn(replay_state, sb)
            replay.append(float(metrics["total_loss"]))

    storage = EventStorage()
    rec = _RecordingWriter(cfg.train.log_period)
    ckpt = Checkpointer(str(tmp_path / "ck"))
    state = run_train_loop(
        cfg, trainer, state0, step_fn, itertools.cycle([batch]), batch,
        ckpt, storage, [rec], make_lr_schedule(cfg.train.optimizer),
    )

    # every iteration 1..max_iter was recorded, in order
    assert int(state.step) == 11
    hist = storage._hist["total_loss"]
    assert storage.step == 11 and len(hist) == 11
    np.testing.assert_array_equal(np.asarray(hist), np.asarray(replay))

    # writers fired exactly at the log boundaries with the right latest value
    assert [s for s, _ in rec.rows] == [4, 8]
    assert rec.rows[0][1] == replay[3] and rec.rows[1][1] == replay[7]

    # checkpoints on cadence: it=5, 10 and the forced final 11
    steps = set(ckpt._mgr.all_steps())
    assert {5, 10, 11}.issubset(steps), steps
