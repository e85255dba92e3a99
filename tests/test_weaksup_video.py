"""Video weak-supervision tests: DINO pair matching, temporal pairwise loss,
full video weak-sup criterion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bm2f_tpu.losses.criterion import SetCriterionConfig
from bm2f_tpu.losses.weaksup_video import (
    compute_temporal_pairs,
    temporal_pairwise_loss,
    video_weaksup_set_criterion,
)


def test_compute_temporal_pairs_matches_translated_features(rng):
    Hp = Wp = 8
    C = 16
    f = rng.randn(Hp, Wp, C).astype(np.float32)
    # frame t+1 = frame t shifted right by 1
    f_next = np.roll(f, 1, axis=1)
    box = np.zeros((Hp, Wp), bool)
    box[2:6, 2:6] = True
    box_next = np.roll(box, 1, axis=1)
    pairs, valid = compute_temporal_pairs(
        jnp.asarray(f), jnp.asarray(f_next), jnp.asarray(box),
        jnp.asarray(box_next), num_pairs=8,
    )
    pairs, valid = np.asarray(pairs), np.asarray(valid)
    assert valid.any()
    for (xs, ys, xd, yd), v in zip(pairs, valid):
        if v:
            assert xd == xs + 1 and yd == ys  # exact translation recovered


def test_temporal_pairwise_loss_confidence(rng):
    N, T, h, w, Kp = 2, 3, 8, 8, 4
    masks = np.full((N, T, h, w), 10.0, np.float32)  # confident fg everywhere
    pairs = rng.randint(0, 8, (N, T - 1, Kp, 4)).astype(np.int32)
    valid = np.ones((N, T - 1, Kp), bool)
    loss = temporal_pairwise_loss(jnp.asarray(masks), jnp.asarray(pairs), jnp.asarray(valid))
    assert float(loss) < 1e-3
    # uncertain predictions -> ln 2
    loss0 = temporal_pairwise_loss(
        jnp.zeros((N, T, h, w)), jnp.asarray(pairs), jnp.asarray(valid)
    )
    assert abs(float(loss0) - np.log(2)) < 1e-3


@pytest.mark.slow
def test_video_weaksup_criterion(rng):
    B, Q, K, G, T, h, w, Kp = 1, 5, 3, 2, 2, 16, 16, 6
    logits = jnp.asarray(rng.randn(B, Q, K + 1).astype(np.float32))
    masks = jnp.asarray(rng.randn(B, Q, T, h, w).astype(np.float32))
    box = np.zeros((B, G, T, h, w), np.float32)
    box[:, :, :, 4:12, 4:12] = 1
    targets = {
        "labels": jnp.asarray(rng.randint(0, K, (B, G)).astype(np.int32)),
        "valid": jnp.asarray(np.ones((B, G), bool)),
        "box_masks": jnp.asarray(box),
        "left_bounds": jnp.asarray(np.full((B, G, T, h), 4.0, np.float32)),
        "right_bounds": jnp.asarray(np.full((B, G, T, h), 12.0, np.float32)),
        "top_bounds": jnp.asarray(np.full((B, G, T, w), 4.0, np.float32)),
        "bottom_bounds": jnp.asarray(np.full((B, G, T, w), 12.0, np.float32)),
        "color_similarity": jnp.asarray(rng.rand(B, T, h, w, 8).astype(np.float32)),
        "temporal_pairs": jnp.asarray(
            rng.randint(4, 12, (B, G, T - 1, Kp, 4)).astype(np.int32)
        ),
        "temporal_pairs_valid": jnp.asarray(np.ones((B, G, T - 1, Kp), bool)),
    }
    cfg = SetCriterionConfig(num_classes=K, num_points=64)

    def f(logits, masks):
        outputs = {
            "pred_logits": logits, "pred_masks": masks,
            "aux_logits": logits[None], "aux_masks": masks[None],
        }
        total, losses = video_weaksup_set_criterion(
            outputs, targets, cfg, jax.random.PRNGKey(0)
        )
        return total, losses

    (total, losses), gm = jax.value_and_grad(f, argnums=1, has_aux=True)(logits, masks)
    assert np.isfinite(float(total))
    assert {"loss_ce", "loss_mask_projection", "loss_mask_spatial_pairwise",
            "loss_mask_temporal_pairwise", "temp_pair_valid_prop"} <= set(losses)
    assert np.isfinite(np.asarray(gm)).all() and np.abs(np.asarray(gm)).sum() > 0
