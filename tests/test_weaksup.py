"""Weak-supervision tests: LAB conversion vs skimage formula (via torch-free
reference values), unfold/color-similarity semantics, projection + pairwise
losses, full weak-sup criterion with grads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bm2f_tpu.losses.criterion import SetCriterionConfig
from bm2f_tpu.losses.weaksup import (
    box_targets_from_masks,
    get_images_color_similarity,
    log_same_prob,
    mask_update_pix_thr,
    pairwise_loss,
    projection_loss,
    rgb_to_lab,
    unfold_wo_center,
    update_box_masks,
)
from bm2f_tpu.losses.weaksup_criterion import weaksup_set_criterion


def test_rgb_to_lab_known_values():
    # white -> L=100, a~0, b~0; black -> 0; red -> known skimage value
    lab = np.asarray(rgb_to_lab(jnp.asarray([[1.0, 1.0, 1.0], [0, 0, 0], [1, 0, 0]])))
    np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.02)
    np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=0.01)
    np.testing.assert_allclose(lab[2], [53.24, 80.09, 67.20], atol=0.1)


def test_unfold_wo_center_shifts(rng):
    x = jnp.asarray(rng.randn(1, 5, 5, 1).astype(np.float32))
    out = unfold_wo_center(x, 3, 1)  # (1,5,5,1,8)
    assert out.shape == (1, 5, 5, 1, 8)
    # center pixel's neighbors: first offset is (-1,-1)
    np.testing.assert_allclose(out[0, 2, 2, 0, 0], x[0, 1, 1, 0])
    # border: out-of-image neighbors are zero
    assert float(out[0, 0, 0, 0, 0]) == 0.0


def test_color_similarity_range(rng):
    img = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    sim = get_images_color_similarity(rgb_to_lab(img), 3, 2)
    s = np.asarray(sim)
    assert s.shape == (1, 8, 8, 8)
    assert (s >= 0).all() and (s <= 1).all()
    # uniform image -> similarity 1 on valid edges
    uni = get_images_color_similarity(rgb_to_lab(jnp.ones((1, 8, 8, 3)) * 0.5), 3, 1)
    assert abs(float(uni[0, 4, 4].max()) - 1.0) < 1e-5


def test_box_targets_from_masks():
    m = np.zeros((1, 16, 16), np.float32)
    m[0, 4:12, 6:14] = 1
    t = jax.tree.map(np.asarray, box_targets_from_masks(jnp.asarray(m), stride=4))
    assert t["box_masks"].shape == (1, 4, 4)
    # box spans rows 4..11, cols 6..13 -> at stride 4 (offsets 2,6,10,14):
    # rows 6,10 inside; cols 6,10 inside
    assert t["box_masks"][0].sum() == 4
    # bounds: rows inside box have left=6/4, right=14/4
    assert abs(t["left_bounds"][0, 1] - 1.5) < 1e-6
    assert abs(t["right_bounds"][0, 1] - 3.5) < 1e-6


def test_projection_loss_perfect_box():
    # prediction exactly filling the box -> near-zero projection loss
    H = W = 32
    box = np.zeros((1, H, W), np.float32)
    box[0, 8:24, 4:20] = 1
    pred = np.where(box > 0, 20.0, -20.0).astype(np.float32)
    bounds = {
        "left_bounds": jnp.asarray(np.where(box.any(2), 4.0, 0.0)),
        "right_bounds": jnp.asarray(np.where(box.any(2), 20.0, 0.0)),
        "top_bounds": jnp.asarray(np.where(box.any(1), 8.0, 0.0)),
        "bottom_bounds": jnp.asarray(np.where(box.any(1), 24.0, 0.0)),
    }
    loss = projection_loss(
        jnp.asarray(pred), jnp.asarray(box), bounds, jnp.ones((1,)), jnp.asarray(1.0)
    )
    assert float(loss) < 0.05


def test_pairwise_loss_confident_uniform(rng):
    # uniformly confident foreground inside box -> P(same)~1 -> loss ~ 0
    pred = jnp.full((1, 16, 16), 20.0)
    box = jnp.ones((1, 16, 16))
    sim = jnp.ones((1, 16, 16, 8))
    loss = pairwise_loss(pred, sim, box, jnp.ones((1,)), jnp.asarray(1.0))
    assert float(loss) < 1e-3
    # maximal uncertainty -> interior edges contribute ln 2; border edges
    # less (zero-padded unfold in log space, faithful to the reference's
    # F.unfold padding)
    pred0 = jnp.zeros((1, 16, 16))
    loss0 = pairwise_loss(pred0, sim, box, jnp.ones((1,)), jnp.asarray(1.0))
    assert 0.5 < float(loss0) <= np.log(2) + 0.01


def test_update_box_masks_and_thr_schedule():
    pred = jnp.asarray(np.full((1, 2, 8, 8), 5.0, np.float32))
    box = jnp.asarray(np.ones((1, 1, 8, 8), np.float32))
    assign = jnp.asarray([[1]])
    out = update_box_masks(pred, assign, box, 0.5)
    assert float(out.sum()) == 64.0
    thr = mask_update_pix_thr(jnp.asarray(60), 100, (0.0, 0.5, 1.0), (0.1, 0.7))
    assert abs(float(thr) - 0.7) < 1e-6
    thr = mask_update_pix_thr(jnp.asarray(10), 100, (0.0, 0.5, 1.0), (0.1, 0.7))
    assert abs(float(thr) - 0.1) < 1e-6


@pytest.mark.slow
def test_weaksup_criterion_end_to_end(rng):
    B, Q, K, G, h, w = 2, 6, 4, 3, 16, 16
    logits = jnp.asarray(rng.randn(B, Q, K + 1).astype(np.float32))
    masks = jnp.asarray(rng.randn(B, Q, h, w).astype(np.float32))
    box = np.zeros((B, G, h, w), np.float32)
    box[:, :, 4:12, 4:12] = 1
    targets = {
        "labels": jnp.asarray(rng.randint(0, K, (B, G)).astype(np.int32)),
        "valid": jnp.asarray(np.array([[1, 1, 0], [1, 0, 0]], bool)),
        "box_masks": jnp.asarray(box),
        "left_bounds": jnp.asarray(np.full((B, G, h), 4.0, np.float32)),
        "right_bounds": jnp.asarray(np.full((B, G, h), 12.0, np.float32)),
        "top_bounds": jnp.asarray(np.full((B, G, w), 4.0, np.float32)),
        "bottom_bounds": jnp.asarray(np.full((B, G, w), 12.0, np.float32)),
        "color_similarity": jnp.asarray(rng.rand(B, h, w, 8).astype(np.float32)),
    }
    cfg = SetCriterionConfig(num_classes=K, num_points=64)

    def f(logits, masks):
        outputs = {
            "pred_logits": logits,
            "pred_masks": masks,
            "aux_logits": logits[None],
            "aux_masks": masks[None],
        }
        total, losses = weaksup_set_criterion(
            outputs, targets, cfg, jax.random.PRNGKey(0),
            sup_type="mask_projection_and_pairwise",
        )
        return total, losses

    (total, losses), (gl, gm) = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
        logits, masks
    )
    assert np.isfinite(float(total))
    assert {"loss_ce", "loss_mask_projection", "loss_pairwise"} <= set(losses)
    assert np.isfinite(np.asarray(gm)).all() and np.abs(np.asarray(gm)).sum() > 0
