"""Video SetCriterion (reference: mask2former_video/modeling/criterion.py:144
`VideoSetCriterion` + matcher.py:503 `VideoHungarianMatcher`):

- matching costs are point-sampled per frame and concatenated over the clip
  (clip-level one-to-one assignment);
- mask losses flatten (instance, frame) pairs into the mask batch
  (reference flattens NT x 1 x H x W before point sampling) while
  num_masks stays the INSTANCE count.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from bm2f_tpu.losses.criterion import SetCriterionConfig, _loss_labels
from bm2f_tpu.matching.matcher import PAD_COST
from bm2f_tpu.ops import point_sample


def video_matcher_costs(
    pred_logits, pred_masks, tgt_labels, tgt_masks, tgt_valid, rng, *,
    num_points, cost_class, cost_mask, cost_dice,
):
    """pred_masks (B,Q,T,h,w); tgt_masks (B,G,T,Hg,Wg) -> (B, Q, G)."""
    B, Q = pred_logits.shape[:2]
    G = tgt_labels.shape[1]
    K = pred_logits.shape[-1] - 1
    T = pred_masks.shape[2]

    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    labels_safe = jnp.clip(tgt_labels, 0, K - 1)
    c_class = -jnp.take_along_axis(
        prob[..., :K], labels_safe[:, None, :].repeat(Q, 1), axis=2
    )

    # shared random points per image, sampled in every frame
    coords = jax.random.uniform(rng, (B, num_points, 2), jnp.float32)

    def frame_points(masks):  # (B, N_masks, T, H, W) -> (B, P, N_masks, T)
        Bm, Nm, T_, H, W = masks.shape
        m = masks.reshape(Bm, Nm * T_, H, W).transpose(0, 2, 3, 1)
        pts = point_sample(m.astype(jnp.float32), coords)  # (B, P, Nm*T)
        return pts.reshape(Bm, num_points, Nm, T_)

    # point-major costs: the einsums contract (point, frame) directly so
    # the (B, P, Nm*T) -> (B, Nm, T*P) relayout copies of the row-major
    # formulation never materialize (same dots as the reference's
    # flattened-clip batch_sigmoid_ce/dice costs, matcher.py:104-156)
    pred_pts = frame_points(pred_masks)  # (B, P, Q, T)
    tgt_pts = frame_points(tgt_masks)  # (B, P, G, T)
    n_tot = num_points * T

    pos = jax.nn.softplus(-pred_pts)
    neg = jax.nn.softplus(pred_pts)
    c_mask = (
        jnp.einsum("bpqt,bpgt->bqg", pos, tgt_pts)
        + jnp.einsum("bpqt,bpgt->bqg", neg, 1.0 - tgt_pts)
    ) / n_tot
    p = jax.nn.sigmoid(pred_pts)
    num = 2.0 * jnp.einsum("bpqt,bpgt->bqg", p, tgt_pts)
    den = p.sum((1, 3))[:, :, None] + tgt_pts.sum((1, 3))[:, None, :]
    c_dice = 1.0 - (num + 1.0) / (den + 1.0)

    C = cost_class * c_class + cost_mask * c_mask + cost_dice * c_dice
    return jnp.where(tgt_valid[:, None, :], C, PAD_COST)


def _video_loss_masks(rng, pred_masks, tgt_masks, tgt_valid, assignment,
                      num_masks, cfg, tgt_table=None):
    """pred (B,Q,T,h,w), tgt (B,G,T,Hg,Wg): per-frame point-sampled losses
    summed over (instance, frame), / num_masks (instances). Candidate/random
    points are shared per (image, frame) — wide G-channel gathers through
    the corner-packed one-gather-per-point sampler; the importance-selected
    contribution is a masked sum over the candidate evaluation with a
    stop-gradded top-k threshold/tie-break weight (exactly top_k's set — see
    criterion._loss_masks for the rationale and measurements).
    `tgt_table` optionally carries the prebuilt corner table of the
    (BT, Hg, Wg, G) targets, shared across decoder layers."""
    from bm2f_tpu.ops.sampling import build_corner_table, point_sample_packed

    B, Q, T, h, w = pred_masks.shape
    G = tgt_valid.shape[1]
    src = jnp.take_along_axis(
        pred_masks, assignment[:, :, None, None, None], axis=1
    )  # (B,G,T,h,w)
    src = src.astype(jnp.float32)
    tgt = tgt_masks.astype(jnp.float32)
    BT = B * T

    n_imp = int(cfg.importance_sample_ratio * cfg.num_points)
    n_rand = cfg.num_points - n_imp
    n_cand = int(cfg.num_points * cfg.oversample_ratio)
    r1, r2 = jax.random.split(rng)

    # (B,G,T,h,w) -> (B*T, h, w, G)
    src_bt = src.transpose(0, 2, 3, 4, 1).reshape(BT, h, w, G)
    tgt_bt = tgt.transpose(0, 2, 3, 4, 1).reshape(
        BT, *tgt_masks.shape[3:], G
    )

    pred_table = build_corner_table(src_bt)
    cand = jax.random.uniform(r1, (BT, n_cand, 2), jnp.float32)
    pred_c = point_sample_packed(src_bt, cand, table=pred_table)
    tgt_c = jax.lax.stop_gradient(
        point_sample_packed(tgt_bt, cand, table=tgt_table)
    )  # (BT, n_cand, G) each

    # top-k-equivalent 0/1 weight (threshold + lower-index tie-break)
    unc = -jnp.abs(jax.lax.stop_gradient(pred_c)).transpose(0, 2, 1)
    u = unc.reshape(BT * G, n_cand)
    kth = jax.lax.top_k(u, n_imp)[0][:, -1:]
    above = u > kth
    eq = u == kth
    need = n_imp - jnp.sum(above.astype(jnp.int32), -1, keepdims=True)
    tie_rank = jnp.cumsum(eq.astype(jnp.int32), axis=-1)
    w_sel = (above | (eq & (tie_rank <= need))).astype(jnp.float32)
    w_sel = w_sel.reshape(BT, G, n_cand).transpose(0, 2, 1)  # (BT, n_cand, G)

    def masked_sums(logits, labels, wgt):
        ce = (
            jnp.maximum(logits, 0)
            - logits * labels
            + jax.nn.softplus(-jnp.abs(logits))
        )
        p = jax.nn.sigmoid(logits)
        return (
            jnp.sum(ce * wgt, 1),
            jnp.sum(p * wgt, 1),
            jnp.sum(p * labels * wgt, 1),
            jnp.sum(labels * wgt, 1),
        )  # (BT, G) each

    ce_s, p_s, pt_s, t_s = masked_sums(pred_c, tgt_c, w_sel)
    if n_rand > 0:
        randc = jax.random.uniform(r2, (BT, n_rand, 2), jnp.float32)
        pred_r = point_sample_packed(src_bt, randc, table=pred_table)
        tgt_r = jax.lax.stop_gradient(
            point_sample_packed(tgt_bt, randc, table=tgt_table)
        )
        ce_r, p_r, pt_r, t_r = masked_sums(pred_r, tgt_r, 1.0)
        ce_s, p_s, pt_s, t_s = ce_s + ce_r, p_s + p_r, pt_s + pt_r, t_s + t_r

    # (BT*G) rows are ordered (b, t, g); valid is ordered (b, g, t) — reorder
    valid = tgt_valid[:, None, :].repeat(T, 1).reshape(BT * G).astype(jnp.float32)

    ce_per = (ce_s / cfg.num_points).reshape(BT * G)
    loss_mask = jnp.sum(ce_per * valid) / num_masks
    dice = 1.0 - (2.0 * pt_s + 1.0) / (p_s + t_s + 1.0)
    loss_dice = jnp.sum(dice.reshape(BT * G) * valid) / num_masks
    return loss_mask, loss_dice


def video_set_criterion(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    cfg: SetCriterionConfig,
    rng: jax.Array,
    assign_fn=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """outputs: pred_logits (B,Q,K+1), pred_masks (B,Q,T,h,w) + stacked aux.
    targets: labels (B,G), masks (B,G,T,Hg,Wg), valid (B,G)."""
    tgt_labels = targets["labels"]
    tgt_masks = targets["masks"]
    tgt_valid = targets["valid"]
    B, G = tgt_labels.shape

    logits_all = jnp.concatenate(
        [outputs["aux_logits"], outputs["pred_logits"][None]], axis=0
    )
    masks_all = jnp.concatenate(
        [outputs["aux_masks"], outputs["pred_masks"][None]], axis=0
    )
    L1 = logits_all.shape[0]
    rngs = jax.random.split(rng, 2 * L1 + 1)

    # per-layer loops are lax.scan: one compiled body instead of L1 copies
    # (the round-5 cold-compile work — see criterion.set_criterion)
    def cost_body(_, xs):
        logits, masks, r = xs
        C = video_matcher_costs(
            logits, jax.lax.stop_gradient(masks),
            tgt_labels, tgt_masks, tgt_valid, r,
            num_points=cfg.num_points, cost_class=cfg.class_weight,
            cost_mask=cfg.mask_weight, cost_dice=cfg.dice_weight,
        )
        return None, C

    _, costs_l = jax.lax.scan(
        cost_body, None, (logits_all, masks_all, rngs[:L1])
    )
    costs = jax.lax.stop_gradient(costs_l.transpose(1, 0, 2, 3))  # (B,L1,Q,G)
    if assign_fn is None:
        from bm2f_tpu.matching.hungarian import assign_fn_default

        assign_fn = assign_fn_default
    assignments = assign_fn(costs).transpose(1, 0, 2)  # (L1, B, G)

    num_masks = jnp.maximum(jnp.sum(tgt_valid.astype(jnp.float32)), 1.0)

    # shared corner table over the constant per-frame targets; int8 storage
    # is exact for binary gt masks and quarters the HBM row-fetch cost (see
    # criterion.set_criterion)
    from bm2f_tpu.ops.sampling import build_corner_table

    B_, G_, T_ = tgt_masks.shape[:3]
    tgt_bt = (
        tgt_masks.astype(jnp.float32)
        .transpose(0, 2, 3, 4, 1)
        .reshape(B_ * T_, tgt_masks.shape[3], tgt_masks.shape[4], G_)
    )
    tgt_table = build_corner_table(tgt_bt.astype(jnp.int8))

    def loss_body(_, xs):
        logits, masks, assign, r = xs
        loss_ce = _loss_labels(logits, tgt_labels, tgt_valid, assign, cfg)
        loss_mask, loss_dice = _video_loss_masks(
            r, masks, tgt_masks, tgt_valid, assign,
            num_masks, cfg, tgt_table=tgt_table,
        )
        return None, (loss_ce, loss_mask, loss_dice)

    _, (ce_l, mask_l, dice_l) = jax.lax.scan(
        loss_body, None,
        (logits_all, masks_all, assignments, rngs[L1 : 2 * L1]),
    )

    losses: Dict[str, jnp.ndarray] = {}
    for i in range(L1):
        suffix = "" if i == L1 - 1 else f"_{i}"
        losses[f"loss_ce{suffix}"] = ce_l[i]
        losses[f"loss_mask{suffix}"] = mask_l[i]
        losses[f"loss_dice{suffix}"] = dice_l[i]
    total = (
        cfg.class_weight * jnp.sum(ce_l)
        + cfg.mask_weight * jnp.sum(mask_l)
        + cfg.dice_weight * jnp.sum(dice_l)
    )
    return total, losses
