"""PointRend-style uncertainty point sampling (reference: detectron2
point_rend.point_features.get_uncertain_point_coords_with_randomness, used
by criterion.py:853-873), static-shape JAX."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bm2f_tpu.ops import point_sample


def sample_mask_points(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """masks: (N, H, W), coords: (N, P, 2) in [0,1] -> (N, P)."""
    return point_sample(masks[..., None], coords)[..., 0]


def get_uncertain_point_coords_with_randomness(
    rng: jax.Array,
    mask_logits: jnp.ndarray,  # (N, H, W)
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jnp.ndarray:
    """Sample `num_points` coords per mask: the most uncertain
    (smallest |logit|) among num_points*oversample random candidates, topped
    up with fresh uniform points. Returns (N, num_points, 2)."""
    N = mask_logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    r1, r2 = jax.random.split(rng)
    cand = jax.random.uniform(r1, (N, num_sampled, 2), jnp.float32)
    logits = sample_mask_points(mask_logits, cand)  # (N, num_sampled)
    uncertainty = -jnp.abs(logits)

    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain
    _, idx = jax.lax.top_k(uncertainty, num_uncertain)
    picked = jnp.take_along_axis(cand, idx[..., None], axis=1)
    if num_random > 0:
        rand = jax.random.uniform(r2, (N, num_random, 2), jnp.float32)
        picked = jnp.concatenate([picked, rand], axis=1)
    return picked
