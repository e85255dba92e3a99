"""Trainer dispatch tests: weak-sup image training and video training run a
step end-to-end (small shapes, 2-device mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bm2f_tpu.config import get_config
from bm2f_tpu.parallel.mesh import shard_batch
from bm2f_tpu.train.trainer import Trainer

TINY = {
    "model.decoder.dec_layers": 1,
    "model.decoder.num_queries": 8,
    "model.pixel_decoder.transformer_enc_layers": 1,
    "model.loss.train_num_points": 64,
    "mesh.data": 2,
}


@pytest.mark.slow
def test_weaksup_image_train_step():
    cfg = get_config("coco_instance_r50", {
        **TINY,
        "model.loss.sup_type": "mask_projection_and_pairwise",
        "model.loss.weak.mask_update_enabled": True,
    })
    trainer = Trainer(cfg)
    B, H, W, G = 2, 64, 64, 2
    rng = np.random.RandomState(0)
    masks = np.zeros((B, G, H, W), np.float32)
    masks[:, 0, 8:40, 8:40] = 1
    masks[:, 1, 40:60, 20:50] = 1
    batch = {
        "images": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        "labels": jnp.asarray(rng.randint(0, 80, (B, G)).astype(np.int32)),
        "masks": jnp.asarray(masks),
        "valid": jnp.asarray(np.ones((B, G), bool)),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch["images"][:1])
    step = trainer.compile_step(state)
    with trainer.mesh:
        sb = shard_batch(batch, trainer.mesh)
        state, m = step(state, sb)
    assert np.isfinite(float(m["total_loss"]))
    assert "loss_mask_projection" in m and "loss_pairwise" in m


@pytest.mark.slow
def test_video_train_step():
    cfg = get_config("ytvis2019_video_r50", {**TINY, "model.num_frames": 2})
    trainer = Trainer(cfg)
    B, T, H, W, G = 2, 2, 64, 64, 2
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32) * 255),
        "labels": jnp.asarray(rng.randint(0, 40, (B, G)).astype(np.int32)),
        "masks": jnp.asarray((rng.rand(B, G, T, H, W) > 0.8).astype(np.float32)),
        "valid": jnp.asarray(np.ones((B, G), bool)),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch["images"][:1])
    step = trainer.compile_step(state)
    with trainer.mesh:
        sb = shard_batch(batch, trainer.mesh)
        state, m = step(state, sb)
    assert np.isfinite(float(m["total_loss"]))
    assert "loss_dice" in m
