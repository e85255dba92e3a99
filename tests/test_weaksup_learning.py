"""End-to-end weak-supervision LEARNING proof (round-3 verdict item 7):
box-supervised training (sup_type=mask_projection_and_pairwise) on a
synthetic set must (a) reduce the projection + pairwise losses and (b) make
the progressive pseudo-mask update (reference: criterion.py:625-676
update_targets, staged thresholds :704-708) produce masks strictly closer
to the TRUE object masks than the box masks it starts from.

The synthetic objects are uniform-color ellipses on a contrasting
background, so the pairwise color-similarity loss has a real signal to
carve the ellipse out of its box."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bm2f_tpu.config import get_config
from bm2f_tpu.parallel.mesh import shard_batch
from bm2f_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow

B, G, H, W = 2, 2, 64, 64
COLORS = [(200, 40, 40), (40, 80, 200), (40, 180, 60), (220, 200, 50)]


def _ellipse(cy, cx, ry, rx, h=H, w=W):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0


def _make_batch():
    """Images with uniform-color ellipses; supervision = box masks only."""
    images = np.full((B, H, W, 3), 120, np.float32)
    true_masks = np.zeros((B, G, H, W), bool)
    box_masks = np.zeros((B, G, H, W), np.float32)
    labels = np.zeros((B, G), np.int32)
    centers = [[(20, 18, 11, 13), (45, 46, 12, 12)],
               [(22, 44, 13, 11), (44, 18, 11, 14)]]
    for b in range(B):
        for g in range(G):
            cy, cx, ry, rx = centers[b][g]
            ell = _ellipse(cy, cx, ry, rx)
            true_masks[b, g] = ell
            images[b][ell] = COLORS[b * G + g]
            ys, xs = np.where(ell)
            box_masks[b, g, ys.min():ys.max() + 1, xs.min():xs.max() + 1] = 1
            labels[b, g] = b * G + g
    return {
        "images": jnp.asarray(images),
        "labels": jnp.asarray(labels),
        "masks": jnp.asarray(box_masks),
        "valid": jnp.asarray(np.ones((B, G), bool)),
    }, true_masks


def _iou(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / max(union, 1)


def test_weaksup_overfit_improves_pseudo_masks():
    steps = 120
    cfg = get_config("coco_instance_r50", {
        "model.loss.sup_type": "mask_projection_and_pairwise",
        "model.num_classes": 8,
        "model.decoder.dec_layers": 2,
        "model.decoder.num_queries": 10,
        "model.pixel_decoder.transformer_enc_layers": 1,
        "model.loss.weak.mask_update_enabled": True,
        "model.loss.weak.pairwise.warmup_iters": 20,
        "mesh.data": 1,
        "train.optimizer.base_lr": 2e-4,
        "train.optimizer.clip_gradients": 1.0,
        "train.optimizer.warmup_iters": 0,
        "train.optimizer.max_iter": steps,
    })
    trainer = Trainer(cfg)
    batch, true_masks = _make_batch()
    state = trainer.init_state(jax.random.PRNGKey(0), batch["images"][:1])
    step_fn = trainer.compile_step(state)

    proj, pair = [], []
    with trainer.mesh:
        sb = shard_batch(batch, trainer.mesh)
        for _ in range(steps):
            state, metrics = step_fn(state, sb)
            proj.append(float(metrics["loss_mask_projection"]))
            pair.append(float(metrics["loss_pairwise"]))

    assert all(np.isfinite(v) for v in proj + pair)
    # (a) both weak-sup losses fall while overfitting the fixed batch
    assert np.mean(proj[-10:]) < np.mean(proj[:10]) * 0.7, (proj[:10], proj[-10:])
    assert np.mean(pair[-10:]) < np.mean(pair[10:20]), (pair[10:20], pair[-10:])

    # (b) progressive pseudo-mask update: at the staged threshold the
    # pseudo-masks (pred >= thr AND box) must beat the raw box masks
    # against the TRUE ellipses — strictly, per instance
    from bm2f_tpu.losses.target_prep import build_weaksup_targets
    from bm2f_tpu.losses.weaksup import update_box_masks
    from bm2f_tpu.losses.weaksup_criterion import weaksup_matcher_costs
    from bm2f_tpu.matching.hungarian import assign_fn_default
    from bm2f_tpu.models.maskformer import normalize_images

    targets = build_weaksup_targets(
        batch["images"], batch["labels"], batch["masks"], batch["valid"],
        kernel_size=cfg.model.loss.weak.pairwise.size,
        dilation=cfg.model.loss.weak.pairwise.dilation,
    )
    out = trainer.model.apply(
        {"params": state.params, "frozen": state.frozen},
        normalize_images(batch["images"], cfg.model),
    )
    costs = weaksup_matcher_costs(
        out["pred_logits"], out["pred_masks"], targets,
        cost_class=cfg.model.loss.class_weight,
        cost_projection=cfg.model.loss.weak.projection_weight,
        cost_pairwise=cfg.model.loss.weak.pairwise_weight,
    )
    assign = assign_fn_default(costs[:, None])[:, 0]  # (B, G)

    # true masks at the prediction stride (pixel centers)
    true4 = true_masks[:, :, 2::4, 2::4]

    iou_at = {}
    for thr in cfg.model.loss.weak.mask_update_pix_thrs:  # (0.0, 0.5)
        pseudo = np.asarray(update_box_masks(
            out["pred_masks"].astype(jnp.float32), assign,
            targets["box_masks"], thr,
        )) > 0.5
        iou_at[thr] = [
            _iou(pseudo[b, g], true4[b, g]) for b in range(B) for g in range(G)
        ]
    # thr 0.0 keeps the raw box (sigmoid >= 0 everywhere)
    box_iou = iou_at[0.0]
    upd_iou = iou_at[0.5]
    assert all(u > b for u, b in zip(upd_iou, box_iou)), (box_iou, upd_iou)
    assert np.mean(upd_iou) > np.mean(box_iou) + 0.03, (box_iou, upd_iou)
