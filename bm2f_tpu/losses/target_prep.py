"""Weak-supervision target preparation — the device-side, batched analogue of
the reference's host loops (reference: maskformer_model.py:399-507
prepare_weaksup_targets; video_maskformer_model.py:395-620 including
skimage rgb2lab on CPU per image and per-instance python loops — noted in
SURVEY.md as a host bottleneck).

Everything here is jit-able: LAB conversion, color similarity, box masks +
projection bounds at stride 4, and (video) DINOv2 temporal pairs."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from bm2f_tpu.losses.weaksup import (
    box_targets_from_masks,
    get_images_color_similarity,
    rgb_to_lab,
)
from bm2f_tpu.losses.weaksup_video import compute_temporal_pairs


def build_weaksup_targets(
    images: jnp.ndarray,  # (B, H, W, 3) raw RGB [0, 255]
    labels: jnp.ndarray,  # (B, G)
    gt_box_masks: jnp.ndarray,  # (B, G, H, W) — box (or full) masks, full res
    valid: jnp.ndarray,  # (B, G)
    *,
    stride: int = 4,
    kernel_size: int = 3,
    dilation: int = 2,
) -> Dict[str, jnp.ndarray]:
    """Image weak-sup targets at stride-4 resolution (matching pred masks)."""
    B, G = labels.shape

    def per_image(masks):
        return box_targets_from_masks(masks, stride=stride)

    t = jax.vmap(per_image)(gt_box_masks)

    start = stride // 2
    sub = images[:, start::stride, start::stride] / 255.0
    lab = rgb_to_lab(sub)
    color_sim = get_images_color_similarity(lab, kernel_size, dilation)

    return {
        "labels": labels,
        "valid": valid,
        "box_masks": t["box_masks"],
        "left_bounds": t["left_bounds"],
        "right_bounds": t["right_bounds"],
        "top_bounds": t["top_bounds"],
        "bottom_bounds": t["bottom_bounds"],
        "color_similarity": color_sim,
    }


def build_video_weaksup_targets(
    images: jnp.ndarray,  # (B, T, H, W, 3)
    labels: jnp.ndarray,  # (B, G)
    gt_box_masks: jnp.ndarray,  # (B, G, T, H, W)
    valid: jnp.ndarray,  # (B, G)
    dino_feats: Optional[jnp.ndarray] = None,  # (B, T, Hp, Wp, C)
    *,
    stride: int = 4,
    kernel_size: int = 3,
    dilation: int = 2,
    num_pairs: int = 128,
    color_thresh: float = 0.3,
) -> Dict[str, jnp.ndarray]:
    """Video weak-sup targets; temporal pairs are built when DINO features
    are provided (reference: get_instance_temporal_pairs,
    weaksup_utils.py:157)."""
    B, T = images.shape[:2]
    G = labels.shape[1]

    def per_frame_mask(masks):  # (G*T, H, W)
        return box_targets_from_masks(masks, stride=stride)

    flat = gt_box_masks.reshape(B, G * T, *gt_box_masks.shape[3:])
    t = jax.vmap(per_frame_mask)(flat)

    def rs(x):
        return x.reshape(B, G, T, *x.shape[2:])

    start = stride // 2
    sub = images[:, :, start::stride, start::stride] / 255.0
    lab = rgb_to_lab(sub)
    color_sim = jax.vmap(
        lambda l: get_images_color_similarity(l, kernel_size, dilation)
    )(lab)  # (B, T, h, w, K)

    out = {
        "labels": labels,
        "valid": valid,
        "box_masks": rs(t["box_masks"]),
        "left_bounds": rs(t["left_bounds"]),
        "right_bounds": rs(t["right_bounds"]),
        "top_bounds": rs(t["top_bounds"]),
        "bottom_bounds": rs(t["bottom_bounds"]),
        "color_similarity": color_sim,
    }

    if dino_feats is not None and T >= 2:
        Hp, Wp = dino_feats.shape[2:4]
        h4, w4 = out["box_masks"].shape[-2:]
        # boxes on the DINO patch grid (nearest subsample of box masks)
        ys = (jnp.arange(Hp) * h4) // Hp
        xs = (jnp.arange(Wp) * w4) // Wp
        boxes_p = out["box_masks"][:, :, :, ys][:, :, :, :, xs] > 0.5  # (B,G,T,Hp,Wp)
        lab_p = lab[:, :, (jnp.arange(Hp) * lab.shape[2]) // Hp][
            :, :, :, (jnp.arange(Wp) * lab.shape[3]) // Wp
        ]  # (B, T, Hp, Wp, 3)

        def pairs_for(b_feats, b_lab, g_boxes):
            # b_feats (T,Hp,Wp,C); g_boxes (T,Hp,Wp)
            ps, vs = [], []
            for t_i in range(T - 1):
                p, v = compute_temporal_pairs(
                    b_feats[t_i], b_feats[t_i + 1],
                    g_boxes[t_i], g_boxes[t_i + 1],
                    num_pairs,
                    b_lab[t_i], b_lab[t_i + 1], color_thresh,
                )
                ps.append(p)
                vs.append(v)
            return jnp.stack(ps), jnp.stack(vs)

        pairs, pvalid = jax.vmap(  # over B
            lambda f, l, boxes: jax.vmap(lambda g: pairs_for(f, l, g))(boxes)
        )(dino_feats, lab_p, boxes_p.transpose(0, 1, 2, 3, 4))
        # pairs (B, G, T-1, Kp, 4) in patch coords -> mask (stride-4) coords
        scale_x = w4 / Wp
        scale_y = h4 / Hp
        px = jnp.clip((pairs[..., 0::2].astype(jnp.float32) * scale_x).astype(jnp.int32), 0, w4 - 1)
        py = jnp.clip((pairs[..., 1::2].astype(jnp.float32) * scale_y).astype(jnp.int32), 0, h4 - 1)
        pairs_m = jnp.stack(
            [px[..., 0], py[..., 0], px[..., 1], py[..., 1]], -1
        )
        out["temporal_pairs"] = pairs_m
        out["temporal_pairs_valid"] = pvalid & valid[:, :, None, None]
    return out
