"""Hungarian matcher cost computation (reference: matcher.py:479-597
`HungarianMatcher.memory_efficient_forward`), static-shape TPU redesign:

- targets are padded to a fixed G_max with a validity mask (no per-image
  Python loops);
- the class / sigmoid-CE / dice costs are batched einsums over shared
  random sample points (exactly the reference's point-sampled costs);
- padding targets receive a large constant cost so the rectangular LSA
  assigns them leftover queries, which the criterion then ignores.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from bm2f_tpu.matching.hungarian import hungarian_assign
from bm2f_tpu.ops import point_sample

PAD_COST = 1e6


def _softplus(x):
    # numerically-stable log(1 + exp(x)) == BCE-with-logits building block
    return jax.nn.softplus(x)


def batch_sigmoid_ce_cost(pred_pts: jnp.ndarray, tgt_pts: jnp.ndarray) -> jnp.ndarray:
    """(Q, N) logits x (G, N) binary -> (Q, G) mean-over-points BCE
    (reference: matcher.py:128-156 batch_sigmoid_ce_loss)."""
    N = pred_pts.shape[-1]
    pos = _softplus(-pred_pts)  # BCE(x, 1)
    neg = _softplus(pred_pts)  # BCE(x, 0)
    return (pos @ tgt_pts.T + neg @ (1.0 - tgt_pts).T) / N


def batch_dice_cost(pred_pts: jnp.ndarray, tgt_pts: jnp.ndarray) -> jnp.ndarray:
    """(Q, N) logits x (G, N) binary -> (Q, G) dice cost
    (reference: matcher.py:104-120 batch_dice_loss)."""
    p = jax.nn.sigmoid(pred_pts)
    num = 2.0 * (p @ tgt_pts.T)
    den = p.sum(-1)[:, None] + tgt_pts.sum(-1)[None, :]
    return 1.0 - (num + 1.0) / (den + 1.0)


def _point_costs_nmajor(pred_pts: jnp.ndarray, tgt_pts: jnp.ndarray):
    """batch_sigmoid_ce_cost + batch_dice_cost consuming POINT-MAJOR inputs
    (B, N, Q) x (B, N, G) -> two (B, Q, G) costs. The einsums contract the
    point axis directly, so the (B, N, Q) -> (B, Q, N) relayout copies the
    row-major formulation forces on TPU never materialize (they showed up
    as ~6 ms/step of data-formatting in the round-3 train trace)."""
    N = pred_pts.shape[1]
    pos = _softplus(-pred_pts)  # BCE(x, 1)
    neg = _softplus(pred_pts)  # BCE(x, 0)
    c_ce = (
        jnp.einsum("bnq,bng->bqg", pos, tgt_pts)
        + jnp.einsum("bnq,bng->bqg", neg, 1.0 - tgt_pts)
    ) / N
    p = jax.nn.sigmoid(pred_pts)
    num = 2.0 * jnp.einsum("bnq,bng->bqg", p, tgt_pts)
    den = p.sum(1)[:, :, None] + tgt_pts.sum(1)[:, None, :]
    c_dice = 1.0 - (num + 1.0) / (den + 1.0)
    return c_ce, c_dice


def hungarian_matcher_costs(
    pred_logits: jnp.ndarray,  # (B, Q, K+1)
    pred_masks: jnp.ndarray,  # (B, Q, H, W) logits
    tgt_labels: jnp.ndarray,  # (B, G) int32 (any value where invalid)
    tgt_masks: jnp.ndarray,  # (B, G, Hg, Wg) float 0/1
    tgt_valid: jnp.ndarray,  # (B, G) bool
    rng: jax.Array,
    *,
    num_points: int = 112 * 112,
    cost_class: float = 2.0,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
    tgt_nhwc: jnp.ndarray | None = None,
    tgt_table: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Returns the (B, Q, G) matching cost matrix.

    `tgt_nhwc`/`tgt_table` optionally pass the float32 NHWC targets and
    their prebuilt `ops.sampling.build_corner_table` so a caller looping
    over decoder layers (the criterion) samples the constant targets
    through one shared corner table (one gather descriptor per point
    instead of four)."""
    B, Q = pred_logits.shape[:2]
    G = tgt_labels.shape[1]
    K = pred_logits.shape[-1] - 1

    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)  # (B,Q,K+1)
    labels_safe = jnp.clip(tgt_labels, 0, K - 1)
    c_class = -jnp.take_along_axis(
        prob[..., :K], labels_safe[:, None, :].repeat(Q, 1), axis=2
    )  # (B, Q, G)

    # shared random points per image (reference: torch.rand(1, num_points, 2))
    coords = jax.random.uniform(rng, (B, num_points, 2), jnp.float32)
    # pred stays on the plain 4-corner sampler: a corner table over Q=100
    # channels would be a 4Q-lane (>128) row layout and ~200 MB of transient
    # HBM per layer for a ~0.5 ms/layer gather saving — not worth it
    pred_pts = point_sample(
        pred_masks.astype(jnp.float32).transpose(0, 2, 3, 1), coords
    )  # (B, N, Q) point-major
    if tgt_nhwc is None:
        tgt_nhwc = tgt_masks.astype(jnp.float32).transpose(0, 2, 3, 1)
    from bm2f_tpu.ops.sampling import point_sample_packed

    tgt_pts = point_sample_packed(tgt_nhwc, coords, table=tgt_table)  # (B,N,G)

    c_mask, c_dice = _point_costs_nmajor(pred_pts, tgt_pts)

    C = cost_class * c_class + cost_mask * c_mask + cost_dice * c_dice
    C = jnp.where(tgt_valid[:, None, :], C, PAD_COST)
    return C


def match(
    pred_logits, pred_masks, tgt_labels, tgt_masks, tgt_valid, rng, **kw
) -> jnp.ndarray:
    """Cost + LSA. Returns (B, G) int32: query index matched to each target."""
    C = hungarian_matcher_costs(
        pred_logits, pred_masks, tgt_labels, tgt_masks, tgt_valid, rng, **kw
    )
    return hungarian_assign(C)
