"""Multi-scale deformable attention — the TPU replacement for the
reference's single CUDA extension (reference:
mask2former/modeling/pixel_decoder/ops/src/cuda/ms_deform_im2col_cuda.cuh:242-304
forward, :306-927 backward; Python fallback ms_deform_attn_func.py:52-72).

Semantics: for every (batch, query, head), sample each of L feature levels at
P offset locations with bilinear interpolation (zero padding outside), and
accumulate samples weighted by softmaxed attention weights.

Two implementations:
 - "xla": pure-JAX gathers (jnp.take_along_axis) — XLA autodiff provides the
   backward (deterministic scatter-add, unlike the reference's atomicAdd).
 - "pallas": hand-written TPU kernel (see deform_attn_pallas.py).

All spatial shapes are static Python tuples — TPU-first design uses fixed
input sizes, so level geometry is compile-time constant.

Shapes (matching the reference op's contract):
  value:              (B, S, M, D)   S = sum of H*W over levels
  spatial_shapes:     static tuple ((H0, W0), ..., (H_{L-1}, W_{L-1}))
  sampling_locations: (B, Q, M, L, P, 2)  normalized [0,1], (x, y)
  attention_weights:  (B, Q, M, L, P)  softmaxed over L*P
  returns:            (B, Q, M*D)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def level_start_index(spatial_shapes: Sequence[Tuple[int, int]]):
    starts = [0]
    for h, w in spatial_shapes[:-1]:
        starts.append(starts[-1] + h * w)
    return tuple(starts)


def _ms_deform_attn_xla(value, spatial_shapes, sampling_locations, attention_weights):
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    starts = level_start_index(spatial_shapes)

    compute_dtype = value.dtype
    out = jnp.zeros((B, Q, M, D), dtype=jnp.promote_types(compute_dtype, jnp.float32))

    # Flatten heads into the gather batch: take_along_axis over axis=1 of
    # (B, S, M, D) with per-head indices broadcasts over D only.
    for lid, (H, W) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lid]  # (B, Q, M, P, 2)
        attn = attention_weights[:, :, :, lid]  # (B, Q, M, P)
        # torch grid_sample(2*loc-1, align_corners=False) unnormalizes to
        # loc * size - 0.5 (reference cuh:268-269: loc * spatial - 0.5).
        fx = loc[..., 0] * W - 0.5
        fy = loc[..., 1] * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        lx = (fx - x0).astype(compute_dtype)
        ly = (fy - y0).astype(compute_dtype)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        corner_w = (
            (1 - lx) * (1 - ly),  # (y0, x0)
            lx * (1 - ly),        # (y0, x1)
            (1 - lx) * ly,        # (y1, x0)
            lx * ly,              # (y1, x1)
        )
        corner_ij = ((y0i, x0i), (y0i, x0i + 1), (y0i + 1, x0i), (y0i + 1, x0i + 1))

        acc = 0.0
        for (yi, xi), w in zip(corner_ij, corner_w):
            valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            yc = jnp.clip(yi, 0, H - 1)
            xc = jnp.clip(xi, 0, W - 1)
            idx = starts[lid] + yc * W + xc  # (B, Q, M, P)
            w = (w * valid.astype(compute_dtype) * attn).astype(compute_dtype)
            # gather: (B, S, M, D) indexed along axis 1 by (B, Q*P, M)
            idx_flat = idx.transpose(0, 1, 3, 2).reshape(B, Q * P, M)
            v = jnp.take_along_axis(value, idx_flat[..., None], axis=1)
            v = v.reshape(B, Q, P, M, D)
            w = w.transpose(0, 1, 3, 2)[..., None]  # (B, Q, P, M, 1)
            acc = acc + jnp.sum(v * w, axis=2)  # (B, Q, M, D)
        out = out + acc

    return out.reshape(B, Q, M * D).astype(compute_dtype)


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    *,
    impl: str = "xla",
) -> jnp.ndarray:
    """Multi-scale deformable attention core (see module docstring)."""
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    total = sum(h * w for h, w in spatial_shapes)
    if total != value.shape[1]:
        raise ValueError(
            f"spatial_shapes {spatial_shapes} sum to {total} but value has "
            f"S={value.shape[1]}"
        )
    if impl == "xla":
        return _ms_deform_attn_xla(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    elif impl == "pallas":
        from bm2f_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas

        return ms_deform_attn_pallas(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    raise ValueError(f"unknown impl {impl!r}")
