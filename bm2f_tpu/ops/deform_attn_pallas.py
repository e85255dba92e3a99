"""Pallas TPU kernel for multi-scale deformable attention.

This is the hand-written-kernel counterpart of the reference's CUDA op
(reference: ops/src/cuda/ms_deform_im2col_cuda.cuh:242-304). It keeps each
(batch, head)'s im2col'd patch rows VMEM-resident and walks query tiles,
doing one dynamic VMEM row load per (query, level, point) sample.

STATUS / measured reality (v5e, B=4, 800^2 encoder shapes): Mosaic issues
scalar-addressed VMEM loads at ~40M/s, so this kernel sustains ~125 ms per
encoder layer — SLOWER than the XLA `impl="im2col"` formulation (~35 ms of
gather per layer), because XLA's gather emitter pipelines HBM row fetches
harder than in-kernel dynamic loads. The kernel is kept (a) as the
foundation for a future double-buffered DMA-gather variant and (b) as an
executable reference of the sampling semantics. Default remains
`impl="im2col"` (ops/deform_attn.py).

Forward only: the custom VJP falls back to the XLA path (deterministic
scatter-add, unlike the reference's atomicAdd col2im kernels,
cuh:306-927).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bm2f_tpu.ops.deform_attn import level_start_index


def _build_patches_and_indices(
    value, spatial_shapes, sampling_locations, attention_weights
):
    """Shared preprocessing with the im2col XLA path: per-pixel 2x2 patch
    rows (B*M, S, 4D) + per-sample start indices (B, M, Q, K) and folded
    weights (B, M, Q, K, 4)."""
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    starts_lvl = level_start_index(spatial_shapes)
    dtype = value.dtype
    vbm = value.transpose(0, 2, 1, 3)

    patch_rows = []
    for lid, (H, W) in enumerate(spatial_shapes):
        img = vbm[:, :, starts_lvl[lid] : starts_lvl[lid] + H * W].reshape(
            B, M, H, W, D
        )
        right = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 0)))[:, :, :, 1:]
        down = jnp.pad(img, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))[:, :, 1:]
        downright = jnp.pad(img, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))[:, :, 1:, 1:]
        p = jnp.concatenate([img, right, down, downright], -1)
        patch_rows.append(p.reshape(B, M, H * W, 4 * D))
    patches = jnp.concatenate(patch_rows, 2)  # (B, M, S, 4D)

    idx_all, w_all = [], []
    for lid, (H, W) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lid]
        attn = attention_weights[:, :, :, lid]
        fx = loc[..., 0] * W - 0.5
        fy = loc[..., 1] * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        lx = (fx - x0).astype(dtype)
        ly = (fy - y0).astype(dtype)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        wy0 = (1 - ly) * ((y0i >= 0) & (y0i < H)).astype(dtype)
        wy1 = ly * ((y0i + 1 >= 0) & (y0i + 1 < H)).astype(dtype)
        wx0 = (1 - lx) * ((x0i >= 0) & (x0i < W)).astype(dtype)
        wx1 = lx * ((x0i + 1 >= 0) & (x0i + 1 < W)).astype(dtype)
        ys = jnp.clip(y0i, 0, H - 2)
        xs = jnp.clip(x0i, 0, W - 2)
        sy = (y0i - ys).astype(dtype)
        sx = (x0i - xs).astype(dtype)
        wyp0 = wy0 * (sy == 0) + wy1 * (sy == -1)
        wyp1 = wy0 * (sy == 1) + wy1 * (sy == 0)
        wxp0 = wx0 * (sx == 0) + wx1 * (sx == -1)
        wxp1 = wx0 * (sx == 1) + wx1 * (sx == 0)
        w4 = jnp.stack(
            [wyp0 * wxp0, wyp0 * wxp1, wyp1 * wxp0, wyp1 * wxp1], -1
        ) * attn[..., None]
        idx_all.append(starts_lvl[lid] + ys * W + xs)
        w_all.append(w4)

    idx = jnp.stack(idx_all, 3).transpose(0, 2, 1, 3, 4)  # (B,M,Q,L,P)
    w = jnp.stack(w_all, 3).transpose(0, 2, 1, 3, 4, 5)  # (B,M,Q,L,P,4)
    K = L * P
    return (
        patches,
        idx.reshape(B, M, Q, K),
        w.reshape(B, M, Q, K, 4),
    )


def ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    *,
    q_tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    K = L * P
    D4 = 4 * D
    patches, idx, w = _build_patches_and_indices(
        value, spatial_shapes, sampling_locations, attention_weights
    )
    # pad Q to a tile multiple
    Qp = (Q + q_tile - 1) // q_tile * q_tile
    if Qp != Q:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, Qp - Q), (0, 0), (0, 0)))
    # weights as (BM, Qp, K*4) rows so the kernel reads one row per query
    wf = w.reshape(B * M, Qp, K * 4).astype(jnp.float32)
    idxf = idx.reshape(B * M, Qp, K)
    pf = patches.reshape(B * M, S, D4).astype(jnp.float32)

    n_qt = Qp // q_tile

    def kernel(idx_ref, w_ref, patch_ref, out_ref):
        def q_body(qi, _):
            acc = jnp.zeros((1, D), jnp.float32)
            for k in range(K):  # static unroll
                a = idx_ref[0, qi, k]
                row = patch_ref[0, a, :].reshape(4, D)
                wk = w_ref[0, qi, k * 4 : (k + 1) * 4]
                acc = acc + (wk[:, None] * row).sum(0, keepdims=True)
            out_ref[0, pl.ds(qi, 1), :] = acc
            return 0

        jax.lax.fori_loop(0, q_tile, q_body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(B * M, n_qt),
        in_specs=[
            pl.BlockSpec((1, q_tile, K), lambda bm, qt: (bm, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, K * 4), lambda bm, qt: (bm, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D4), lambda bm, qt: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, D), lambda bm, qt: (bm, qt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * M, Qp, D), jnp.float32),
        interpret=interpret,
    )(idxf, wf, pf)

    out = out.reshape(B, M, Qp, D)[:, :, :Q]
    return out.transpose(0, 2, 1, 3).reshape(B, Q, M * D).astype(value.dtype)
