"""End-to-end training integration: a few optimizer steps on synthetic data
through the full Trainer (mesh + jit + matching callback + AdamW), the
framework analogue of the reference's debug.sh single-GPU smoke run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bm2f_tpu.config import get_config
from bm2f_tpu.parallel.mesh import shard_batch
from bm2f_tpu.train.trainer import Trainer


@pytest.mark.slow
def test_train_steps_decrease_loss():
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
        "images": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        "labels": jnp.asarray(rng.randint(0, 80, (B, G)).astype(np.int32)),
        "masks": jnp.asarray(masks),
        "valid": jnp.asarray(np.ones((B, G), bool)),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch["images"][:1])
    step_fn = trainer.compile_step(state)

    losses = []
    with trainer.mesh:
        sb = shard_batch(batch, trainer.mesh)
        for _ in range(8):
            state, metrics = step_fn(state, sb)
            losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    # overfitting a fixed batch must reduce the loss
    assert min(losses[-3:]) < losses[0], losses
    assert int(state.step) == 8
