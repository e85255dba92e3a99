"""Scratch benchmark module: alternative gather formulations for
ms_deform_attn. The winner gets promoted into ops/deform_attn.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bm2f_tpu.ops.deform_attn import level_start_index


def ms_deform_attn_flat(value, spatial_shapes, sampling_locations, attention_weights):
    """Formulation D: ONE flat row-gather (embedding-lookup pattern).

    value (B,S,M,D) -> (B*M*S, D); all (level, point, corner) indices are
    combined into a single (B*M*Q, L*P*4) index tensor; one jnp.take.
    """
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    starts = level_start_index(spatial_shapes)
    dtype = value.dtype

    # (B, M, S, D) -> (B*M*S, D)
    vflat = value.transpose(0, 2, 1, 3).reshape(B * M * S, D)

    idx_all = []
    w_all = []
    for lid, (H, W) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lid]  # (B,Q,M,P,2)
        attn = attention_weights[:, :, :, lid]  # (B,Q,M,P)
        fx = loc[..., 0] * W - 0.5
        fy = loc[..., 1] * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        lx = (fx - x0).astype(dtype)
        ly = (fy - y0).astype(dtype)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        for (yi, xi), w in (
            ((y0i, x0i), (1 - lx) * (1 - ly)),
            ((y0i, x0i + 1), lx * (1 - ly)),
            ((y0i + 1, x0i), (1 - lx) * ly),
            ((y0i + 1, x0i + 1), lx * ly),
        ):
            valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            yc = jnp.clip(yi, 0, H - 1)
            xc = jnp.clip(xi, 0, W - 1)
            idx = starts[lid] + yc * W + xc  # (B,Q,M,P) within-level
            idx_all.append(idx)
            w_all.append((w * valid.astype(dtype) * attn).astype(dtype))

    idx = jnp.stack(idx_all, axis=-1)  # (B,Q,M,P,L*4) -> want (B,M,Q,P*L*4)
    w = jnp.stack(w_all, axis=-1)
    K = idx.shape[-1] * P
    idx = idx.transpose(0, 2, 1, 3, 4).reshape(B, M, Q * K)
    w = w.transpose(0, 2, 1, 3, 4).reshape(B, M, Q, K)

    bm_offset = (
        jnp.arange(B * M, dtype=jnp.int32).reshape(B, M, 1) * S
    )
    flat_idx = (idx + bm_offset).reshape(-1)
    rows = jnp.take(vflat, flat_idx, axis=0)  # (B*M*Q*K, D)
    rows = rows.reshape(B, M, Q, K, D)
    out = jnp.einsum("bmqk,bmqkd->bqmd", w, rows)
    return out.reshape(B, Q, M * D).astype(dtype)
