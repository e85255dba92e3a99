"""Video weak supervision (reference: mask2former_video/modeling/
criterion_proj.py VideoSetCriterionProj, criterion_proj_spatpair.py (+ spatial
pairwise), criterion_proj_spatpair_temppair.py (+ temporal pairwise with
DINOv2-matched point pairs, :38-70 calculate_temp_similarities,
:269-334 loss_temporal_pairwise); matchers matcher.py:249/:396; DINO patch
matching utils/weaksup_utils.py:64-198).

Static-shape design: temporal pairs are fixed-size (B, G, T-1, Kp, 4) int
coordinate tensors + validity masks, produced on device by
`compute_temporal_pairs` from precomputed DINO feature grids (the reference
loads per-frame DINOv2 .pt files and runs per-instance python loops on host).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from bm2f_tpu.losses.criterion import SetCriterionConfig, _loss_labels
from bm2f_tpu.losses.weaksup import (
    log_same_prob,
    pairwise_cost_matrix,
    pairwise_loss,
    projection_cost_matrix,
    projection_loss,
)
from bm2f_tpu.matching.matcher import PAD_COST


# ---------------------------------------------------------------------------
# DINOv2 temporal pair construction
# ---------------------------------------------------------------------------


def compute_temporal_pairs(
    feat_curr: jnp.ndarray,  # (Hp, Wp, C) DINO patch features, frame t
    feat_next: jnp.ndarray,  # (Hp, Wp, C) frame t+1
    box_curr: jnp.ndarray,  # (Hp, Wp) bool: instance box at frame t
    box_next: jnp.ndarray,  # (Hp, Wp) bool
    num_pairs: int,
    lab_curr: jnp.ndarray = None,  # (Hp, Wp, 3) optional color filter
    lab_next: jnp.ndarray = None,
    color_thresh: float = 0.3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match patches inside the instance box across adjacent frames by
    nearest DINO feature (reference: calculate_patch_matching :92 — topk of
    -cdist), keep the `num_pairs` best matches, optionally filtered by LAB
    color similarity (reference: filter_temporal_pairs_by_color_similarity
    :168). Returns (pairs (num_pairs, 4) int32 [x_t, y_t, x_t1, y_t1],
    valid (num_pairs,) bool) in patch-grid coordinates."""
    Hp, Wp, C = feat_curr.shape
    N = Hp * Wp
    fc = feat_curr.reshape(N, C)
    fn = feat_next.reshape(N, C)
    bc = box_curr.reshape(N)
    bn = box_next.reshape(N)

    # negative squared distance, masked outside boxes
    d2 = (
        jnp.sum(fc**2, -1)[:, None]
        - 2.0 * fc @ fn.T
        + jnp.sum(fn**2, -1)[None, :]
    )
    sim = -d2
    sim = jnp.where(bc[:, None] & bn[None, :], sim, -jnp.inf)

    best_j = jnp.argmax(sim, axis=1).astype(jnp.int32)  # (N,)
    best_sim = jnp.max(sim, axis=1)

    if lab_curr is not None and lab_next is not None:
        cc = lab_curr.reshape(N, 3)
        cn = lab_next.reshape(N, 3)[best_j]
        col_sim = jnp.exp(-jnp.sqrt(jnp.sum((cc - cn) ** 2, -1) + 1e-12) * 0.5)
        best_sim = jnp.where(col_sim >= color_thresh, best_sim, -jnp.inf)

    # top `num_pairs` source patches by match quality
    score, src = jax.lax.top_k(best_sim, num_pairs)
    dst = best_j[src]
    valid = jnp.isfinite(score)
    xs, ys = src % Wp, src // Wp
    xd, yd = dst % Wp, dst // Wp
    pairs = jnp.stack([xs, ys, xd, yd], axis=-1).astype(jnp.int32)
    return pairs, valid


def temporal_pair_log_same(
    mask_curr: jnp.ndarray,  # (h, w) logits
    mask_next: jnp.ndarray,
    pairs: jnp.ndarray,  # (Kp, 4) [x_t, y_t, x_t1, y_t1] in mask coords
) -> jnp.ndarray:
    """-log P(same label across frames) at matched points (reference:
    calculate_temp_similarities :38-70)."""
    pc = mask_curr[pairs[:, 1], pairs[:, 0]]
    pn = mask_next[pairs[:, 3], pairs[:, 2]]
    same_fg = jax.nn.log_sigmoid(pc) + jax.nn.log_sigmoid(pn)
    same_bg = jax.nn.log_sigmoid(-pc) + jax.nn.log_sigmoid(-pn)
    mx = jnp.maximum(same_fg, same_bg)
    return -(jnp.log(jnp.exp(same_fg - mx) + jnp.exp(same_bg - mx) + 1e-12) + mx)


def temporal_pairwise_loss(
    src_masks: jnp.ndarray,  # (N, T, h, w) matched prediction logits
    pairs: jnp.ndarray,  # (N, T-1, Kp, 4) int32 mask-coords
    pairs_valid: jnp.ndarray,  # (N, T-1, Kp)
    warmup_factor=1.0,
) -> jnp.ndarray:
    """Mean -log P(same) over all valid matched point pairs (reference:
    temporal_pairwise_loss = sum(sim * 1) / count, :269-334)."""
    N, T = src_masks.shape[:2]

    def per_frame_pair(t):
        def per_inst(m_curr, m_next, p):
            return temporal_pair_log_same(m_curr, m_next, p)

        return jax.vmap(per_inst)(
            src_masks[:, t], src_masks[:, t + 1], pairs[:, t]
        )  # (N, Kp)

    sims = jnp.stack([per_frame_pair(t) for t in range(T - 1)], 1)  # (N,T-1,Kp)
    v = pairs_valid.astype(sims.dtype)
    return jnp.sum(sims * v) / jnp.maximum(jnp.sum(v), 1.0) * warmup_factor


# ---------------------------------------------------------------------------
# Video weak-sup matcher + criterion
# ---------------------------------------------------------------------------


def video_weaksup_matcher_costs(
    pred_logits, pred_masks, targets, *, cost_class, cost_projection,
    cost_pairwise=0.0, color_thresh=0.3, kernel_size=3, dilation=2,
    warmup_factor=1.0,
):
    """Per-frame projection (+ optional spatial pairwise) costs summed over
    the clip (reference: VideoHungarianMatcherProj matcher.py:396,
    ProjPair :249). pred_masks: (B, Q, T, h, w)."""
    B, Q = pred_logits.shape[:2]
    K = pred_logits.shape[-1] - 1
    labels, valid = targets["labels"], targets["valid"]
    G = labels.shape[1]
    T = pred_masks.shape[2]

    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    labels_safe = jnp.clip(labels, 0, K - 1)
    c_class = -jnp.take_along_axis(
        prob[..., :K], labels_safe[:, None, :].repeat(Q, 1), axis=2
    )

    def per_image(pm, bm, lb, rb, tb, bb, cs):
        # pm (Q,T,h,w); bm (G,T,h,w); bounds (G,T,len); cs (T,h,w,K)
        c = 0.0
        for t in range(T):
            bounds = {
                "left_bounds": lb[:, t], "right_bounds": rb[:, t],
                "top_bounds": tb[:, t], "bottom_bounds": bb[:, t],
            }
            c = c + cost_projection * projection_cost_matrix(
                pm[:, t], bm[:, t], bounds
            )
            if cost_pairwise > 0.0:
                cs_per_tgt = jnp.broadcast_to(cs[t][None], (G, *cs[t].shape))
                c = c + cost_pairwise * pairwise_cost_matrix(
                    pm[:, t], cs_per_tgt, bm[:, t],
                    color_thresh=color_thresh, kernel_size=kernel_size,
                    dilation=dilation, warmup_factor=warmup_factor,
                )
        return c

    c_mask = jax.vmap(per_image)(
        pred_masks.astype(jnp.float32), targets["box_masks"],
        targets["left_bounds"], targets["right_bounds"],
        targets["top_bounds"], targets["bottom_bounds"],
        targets["color_similarity"],
    )
    C = cost_class * c_class + c_mask
    return jnp.where(valid[:, None, :], C, PAD_COST)


def video_weaksup_set_criterion(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    cfg: SetCriterionConfig,
    rng: jax.Array,
    *,
    sup_type: str = "mask_projection_and_spatial_pairwise_and_temporal_pairwise",
    projection_weight: float = 5.0,
    pairwise_weight: float = 5.0,
    temporal_pairwise_weight: float = 5.0,
    color_thresh: float = 0.3,
    kernel_size: int = 3,
    dilation: int = 2,
    warmup_factor=1.0,
    assign_fn=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Video weak-sup loss. targets: labels (B,G), valid (B,G),
    box_masks (B,G,T,h,w), bounds (B,G,T,h|w), color_similarity (B,T,h,w,K),
    temporal_pairs (B,G,T-1,Kp,4), temporal_pairs_valid (B,G,T-1,Kp)."""
    use_spat = "spatial_pairwise" in sup_type or "pairwise" in sup_type
    use_temp = "temporal_pairwise" in sup_type and "temporal_pairs" in targets
    labels, valid = targets["labels"], targets["valid"]
    B, G = labels.shape
    T = outputs["pred_masks"].shape[2]

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
        C = video_weaksup_matcher_costs(
            logits, jax.lax.stop_gradient(masks), targets,
            cost_class=cfg.class_weight, cost_projection=projection_weight,
            cost_pairwise=pairwise_weight if use_spat else 0.0,
            color_thresh=color_thresh, kernel_size=kernel_size,
            dilation=dilation, warmup_factor=warmup_factor,
        )
        return None, C

    _, costs_l = jax.lax.scan(cost_body, None, (logits_all, masks_all))
    costs = jax.lax.stop_gradient(costs_l.transpose(1, 0, 2, 3))
    if assign_fn is None:
        from bm2f_tpu.matching.hungarian import assign_fn_default

        assign_fn = assign_fn_default
    assignments = assign_fn(costs).transpose(1, 0, 2)

    num_masks = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    h, w = masks_all.shape[-2:]
    valid_ft = jnp.repeat(valid.reshape(B * G), T).astype(jnp.float32)
    box_ft = targets["box_masks"].transpose(0, 1, 2, 3, 4).reshape(B * G * T, h, w)
    bounds_ft = {
        k: targets[k].reshape(B * G * T, -1)
        for k in ("left_bounds", "right_bounds", "top_bounds", "bottom_bounds")
    }
    cs = targets["color_similarity"]  # (B,T,h,w,K)
    cs_ft = jnp.broadcast_to(
        cs[:, None], (B, G, T, h, w, cs.shape[-1])
    ).reshape(B * G * T, h, w, cs.shape[-1])

    def loss_body(_, xs):
        logits, masks, assign = xs
        loss_ce = _loss_labels(logits, labels, valid, assign, cfg)
        src = jnp.take_along_axis(
            masks, assign[:, :, None, None, None], axis=1
        )  # (B,G,T,h,w)
        src_ft = src.reshape(B * G * T, h, w).astype(jnp.float32)
        loss_proj = projection_loss(
            src_ft, box_ft, bounds_ft, valid_ft, num_masks * T
        )
        loss_pair = (
            pairwise_loss(
                src_ft, cs_ft, box_ft, valid_ft, num_masks * T,
                color_thresh=color_thresh, kernel_size=kernel_size,
                dilation=dilation, warmup_factor=warmup_factor,
            )
            if use_spat
            else jnp.zeros((), jnp.float32)
        )
        if use_temp:
            src_bgt = src.reshape(B * G, T, h, w).astype(jnp.float32)
            pv = targets["temporal_pairs_valid"].reshape(B * G, T - 1, -1)
            pv = pv & valid.reshape(B * G)[:, None, None]
            loss_temp = temporal_pairwise_loss(
                src_bgt,
                targets["temporal_pairs"].reshape(B * G, T - 1, -1, 4),
                pv, warmup_factor,
            )
        else:
            loss_temp = jnp.zeros((), jnp.float32)
        return None, (loss_ce, loss_proj, loss_pair, loss_temp)

    _, (ce_l, proj_l, pair_l, temp_l) = jax.lax.scan(
        loss_body, None, (logits_all, masks_all, assignments)
    )

    losses: Dict[str, jnp.ndarray] = {}
    for i in range(L1):
        suffix = "" if i == L1 - 1 else f"_{i}"
        losses[f"loss_ce{suffix}"] = ce_l[i]
        losses[f"loss_mask_projection{suffix}"] = proj_l[i]
        if use_spat:
            losses[f"loss_mask_spatial_pairwise{suffix}"] = pair_l[i]
        if use_temp:
            losses[f"loss_mask_temporal_pairwise{suffix}"] = temp_l[i]
    total = (
        cfg.class_weight * jnp.sum(ce_l)
        + projection_weight * jnp.sum(proj_l)
        + (pairwise_weight * jnp.sum(pair_l) if use_spat else 0.0)
        + (temporal_pairwise_weight * jnp.sum(temp_l) if use_temp else 0.0)
    )
    # debug metric (reference: video_maskformer_model.py:361-369
    # loss_pos_temp_pair_prop — DINO-match survival rate)
    if use_temp:
        losses["temp_pair_valid_prop"] = jnp.mean(
            targets["temporal_pairs_valid"].astype(jnp.float32)
        )
    return total, losses
