"""Weak-supervision criteria assembling projection/pairwise losses with
Hungarian matching (reference: SetCriterionProj criterion.py:445,
SetCriterionProjPair :184; matchers HungarianMatcherProj matcher.py:356,
HungarianMatcherProjPair :219; selected by MODEL.MASK_FORMER.SUP_TYPE,
maskformer_model.py:126-225).

Targets (all static shapes, stride-4 resolution to match pred masks):
  labels (B, G) int32; valid (B, G) bool;
  box_masks (B, G, h, w); left/right_bounds (B, G, h);
  top/bottom_bounds (B, G, w); color_similarity (B, h, w, K).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from bm2f_tpu.losses.criterion import SetCriterionConfig, _loss_labels
from bm2f_tpu.losses.weaksup import (
    pairwise_cost_matrix,
    pairwise_loss,
    projection_cost_matrix,
    projection_loss,
)
from bm2f_tpu.matching.matcher import PAD_COST


def weaksup_matcher_costs(
    pred_logits: jnp.ndarray,  # (B, Q, K+1)
    pred_masks: jnp.ndarray,  # (B, Q, h, w)
    targets: Dict[str, jnp.ndarray],
    *,
    cost_class: float,
    cost_projection: float,
    cost_pairwise: float = 0.0,
    color_thresh: float = 0.3,
    kernel_size: int = 3,
    dilation: int = 2,
    warmup_factor=1.0,
) -> jnp.ndarray:
    B, Q = pred_logits.shape[:2]
    K = pred_logits.shape[-1] - 1
    labels = targets["labels"]
    valid = targets["valid"]
    G = labels.shape[1]

    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    labels_safe = jnp.clip(labels, 0, K - 1)
    c_class = -jnp.take_along_axis(
        prob[..., :K], labels_safe[:, None, :].repeat(Q, 1), axis=2
    )

    def per_image(pm, bm, lb, rb, tb, bb, cs):
        bounds = {
            "left_bounds": lb, "right_bounds": rb,
            "top_bounds": tb, "bottom_bounds": bb,
        }
        c = cost_projection * projection_cost_matrix(pm, bm, bounds)
        if cost_pairwise > 0.0:
            cs_per_tgt = jnp.broadcast_to(cs[None], (G, *cs.shape))
            c = c + cost_pairwise * pairwise_cost_matrix(
                pm, cs_per_tgt, bm,
                color_thresh=color_thresh, kernel_size=kernel_size,
                dilation=dilation, warmup_factor=warmup_factor,
            )
        return c

    c_mask = jax.vmap(per_image)(
        pred_masks.astype(jnp.float32),
        targets["box_masks"],
        targets["left_bounds"],
        targets["right_bounds"],
        targets["top_bounds"],
        targets["bottom_bounds"],
        targets["color_similarity"],
    )
    C = cost_class * c_class + c_mask
    return jnp.where(valid[:, None, :], C, PAD_COST)


def weaksup_set_criterion(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    cfg: SetCriterionConfig,
    rng: jax.Array,
    *,
    sup_type: str = "mask_projection_and_pairwise",
    projection_weight: float = 5.0,
    pairwise_weight: float = 5.0,
    color_thresh: float = 0.3,
    kernel_size: int = 3,
    dilation: int = 2,
    warmup_factor=1.0,
    assign_fn=None,
    mask_update_pix_thr=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weak-sup training loss over final + aux layers.

    mask_update_pix_thr: optional traced scalar enabling the progressive
    pseudo-mask update (reference: criterion.py:625-676 update_targets,
    config keys WEAK_SUPERVISION.MASK_UPDATE.* — latent/commented in the
    reference config): after matching, box masks are intersected with
    confident regions of the FINAL layer's predictions before the
    projection/pairwise losses are computed."""
    use_pairwise = "pairwise" in sup_type
    labels, valid = targets["labels"], targets["valid"]
    B, G = labels.shape

    logits_all = jnp.concatenate(
        [outputs["aux_logits"], outputs["pred_logits"][None]], axis=0
    )
    masks_all = jnp.concatenate(
        [outputs["aux_masks"], outputs["pred_masks"][None]], axis=0
    )
    L1 = logits_all.shape[0]

    # per-layer loops are lax.scan: one compiled body instead of L1 copies
    # (the round-5 cold-compile work — see criterion.set_criterion)
    def cost_body(_, xs):
        logits, masks = xs
        C = weaksup_matcher_costs(
            logits, jax.lax.stop_gradient(masks), targets,
            cost_class=cfg.class_weight,
            cost_projection=projection_weight,
            cost_pairwise=pairwise_weight if use_pairwise else 0.0,
            color_thresh=color_thresh, kernel_size=kernel_size,
            dilation=dilation, warmup_factor=warmup_factor,
        )
        return None, C

    _, costs_l = jax.lax.scan(cost_body, None, (logits_all, masks_all))
    costs = jax.lax.stop_gradient(costs_l.transpose(1, 0, 2, 3))  # (B,L1,Q,G)
    if assign_fn is None:
        from bm2f_tpu.matching.hungarian import assign_fn_default

        assign_fn = assign_fn_default
    assignments = assign_fn(costs).transpose(1, 0, 2)  # (L1, B, G)

    num_masks = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    bounds_flat = {
        k: targets[k].reshape(B * G, -1)
        for k in ("left_bounds", "right_bounds", "top_bounds", "bottom_bounds")
    }
    box_masks = targets["box_masks"]
    if mask_update_pix_thr is not None:
        from bm2f_tpu.losses.weaksup import update_box_masks

        box_masks = jax.lax.stop_gradient(
            update_box_masks(
                outputs["pred_masks"].astype(jnp.float32),
                assignments[-1], box_masks, mask_update_pix_thr,
            )
        )
    box_flat = box_masks.reshape(B * G, *box_masks.shape[2:])
    valid_flat = valid.reshape(B * G).astype(jnp.float32)
    K_edges = targets["color_similarity"].shape[-1]
    cs_flat = jnp.broadcast_to(
        targets["color_similarity"][:, None],
        (B, G, *targets["color_similarity"].shape[1:]),
    ).reshape(B * G, *targets["color_similarity"].shape[1:])

    def loss_body(_, xs):
        logits, masks, assign = xs
        loss_ce = _loss_labels(logits, labels, valid, assign, cfg)
        src = jnp.take_along_axis(
            masks, assign[:, :, None, None], axis=1
        ).reshape(B * G, *masks.shape[2:]).astype(jnp.float32)
        loss_proj = projection_loss(
            src, box_flat, bounds_flat, valid_flat, num_masks
        )
        loss_pair = (
            pairwise_loss(
                src, cs_flat, box_flat, valid_flat, num_masks,
                color_thresh=color_thresh, kernel_size=kernel_size,
                dilation=dilation, warmup_factor=warmup_factor,
            )
            if use_pairwise
            else jnp.zeros((), jnp.float32)
        )
        return None, (loss_ce, loss_proj, loss_pair)

    _, (ce_l, proj_l, pair_l) = jax.lax.scan(
        loss_body, None, (logits_all, masks_all, assignments)
    )

    losses: Dict[str, jnp.ndarray] = {}
    for i in range(L1):
        suffix = "" if i == L1 - 1 else f"_{i}"
        losses[f"loss_ce{suffix}"] = ce_l[i]
        losses[f"loss_mask_projection{suffix}"] = proj_l[i]
        if use_pairwise:
            losses[f"loss_pairwise{suffix}"] = pair_l[i]
    total = (
        cfg.class_weight * jnp.sum(ce_l)
        + projection_weight * jnp.sum(proj_l)
        + (pairwise_weight * jnp.sum(pair_l) if use_pairwise else 0.0)
    )
    return total, losses
