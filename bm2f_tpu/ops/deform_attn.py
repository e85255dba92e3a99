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
    """ONE flat row-gather (the embedding-lookup pattern, XLA's fast TPU
    gather path — measured 66x faster than per-head take_along_axis on
    v5e): value is viewed as (B*M*S, D) rows; every (level, point, corner)
    index is combined into a single (B*M*Q*K,) index vector; bilinear +
    attention weights fold into one einsum."""
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    starts = level_start_index(spatial_shapes)
    dtype = value.dtype

    # (B, M, S, D) rows
    vflat = value.transpose(0, 2, 1, 3).reshape(B * M * S, D)

    idx_all, w_all = [], []
    for lid, (H, W) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lid]  # (B, Q, M, P, 2)
        attn = attention_weights[:, :, :, lid]  # (B, Q, M, P)
        # torch grid_sample(2*loc-1, align_corners=False) unnormalizes to
        # loc * size - 0.5 (reference cuh:268-269: loc * spatial - 0.5).
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
            idx_all.append(starts[lid] + yc * W + xc)  # (B, Q, M, P)
            w_all.append((w * valid.astype(dtype) * attn).astype(dtype))

    K = L * P * 4
    idx = jnp.stack(idx_all, axis=-1)  # (B, Q, M, P, L*4)
    w = jnp.stack(w_all, axis=-1)
    idx = idx.transpose(0, 2, 1, 3, 4).reshape(B, M, Q * P * len(spatial_shapes) * 4)
    w = w.transpose(0, 2, 1, 3, 4).reshape(B, M, Q, K)

    bm_offset = jnp.arange(B * M, dtype=jnp.int32).reshape(B, M, 1) * S
    rows = jnp.take(vflat, (idx + bm_offset).reshape(-1), axis=0)
    rows = rows.reshape(B, M, Q, K, D)
    out = jnp.einsum("bmqk,bmqkd->bqmd", w, rows)
    return out.reshape(B, Q, M * D).astype(dtype)


def _ms_deform_attn_patch(value, spatial_shapes, sampling_locations, attention_weights):
    """2x2-patch gather formulation: one lax.gather of (2, 2, D) slices per
    (level, point) from the (B*M, H, W, D) level image. Bilinear weights are
    separable, so border clamping is handled by placing the per-axis weights
    at their clamped in-patch offsets (weights of out-of-image corners are
    already zero). Fewer, larger gather descriptors than row gathers."""
    from jax import lax

    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    starts_lvl = level_start_index(spatial_shapes)
    dtype = value.dtype

    vbm = value.transpose(0, 2, 1, 3).reshape(B * M, S, D)
    bm_ids = jnp.arange(B * M, dtype=jnp.int32).reshape(B, M, 1, 1)

    out = jnp.zeros((B, M, Q, D), dtype)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )
    for lid, (H, W) in enumerate(spatial_shapes):
        img = vbm[:, starts_lvl[lid] : starts_lvl[lid] + H * W].reshape(
            B * M, H, W, D
        )
        loc = sampling_locations[:, :, :, lid].transpose(0, 2, 1, 3, 4)  # (B,M,Q,P,2)
        attn = attention_weights[:, :, :, lid].transpose(0, 2, 1, 3)  # (B,M,Q,P)
        fx = loc[..., 0] * W - 0.5
        fy = loc[..., 1] * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        lx = (fx - x0).astype(dtype)
        ly = (fy - y0).astype(dtype)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        # per-axis weights with validity (zero outside the image)
        wy0 = (1 - ly) * ((y0i >= 0) & (y0i < H)).astype(dtype)
        wy1 = ly * ((y0i + 1 >= 0) & (y0i + 1 < H)).astype(dtype)
        wx0 = (1 - lx) * ((x0i >= 0) & (x0i < W)).astype(dtype)
        wx1 = lx * ((x0i + 1 >= 0) & (x0i + 1 < W)).astype(dtype)

        ys = jnp.clip(y0i, 0, max(H - 2, 0))
        xs = jnp.clip(x0i, 0, max(W - 2, 0))
        # in-patch row/col of each corner after clamping (0 or 1; invalid
        # corners have zero weight so their position is irrelevant, but we
        # still clip it into the patch)
        ry0 = jnp.clip(y0i - ys, 0, 1)
        ry1 = jnp.clip(y0i + 1 - ys, 0, 1)
        cx0 = jnp.clip(x0i - xs, 0, 1)
        cx1 = jnp.clip(x0i + 1 - xs, 0, 1)

        # per-axis patch weights: (..., 2)
        wy_patch = jnp.stack(
            [
                wy0 * (ry0 == 0) + wy1 * (ry1 == 0),
                wy0 * (ry0 == 1) + wy1 * (ry1 == 1),
            ],
            axis=-1,
        )
        wx_patch = jnp.stack(
            [
                wx0 * (cx0 == 0) + wx1 * (cx1 == 0),
                wx0 * (cx0 == 1) + wx1 * (cx1 == 1),
            ],
            axis=-1,
        )
        # (B, M, Q, P, 2, 2) with attention folded in
        w_patch = (
            attn[..., None, None] * wy_patch[..., :, None] * wx_patch[..., None, :]
        )

        starts = jnp.stack(
            [
                jnp.broadcast_to(bm_ids, y0i.shape).reshape(-1),
                ys.reshape(-1),
                xs.reshape(-1),
            ],
            axis=-1,
        )  # (B*M*Q*P, 3)
        patches = lax.gather(
            img, starts, dn, slice_sizes=(1, 2, 2, D),
            mode=lax.GatherScatterMode.CLIP,
        )  # (N, 2, 2, D)
        patches = patches.reshape(B, M, Q, P, 2, 2, D)
        out = out + jnp.einsum("bmqpij,bmqpijd->bmqd", w_patch, patches)

    return out.transpose(0, 2, 1, 3).reshape(B, Q, M * D).astype(dtype)


def _ms_deform_attn_im2col(value, spatial_shapes, sampling_locations,
                           attention_weights, q_chunks: int = 1):
    """im2col formulation — the fast TPU path (~4x the row-gather variants
    on v5e, where XLA gather cost is per-descriptor and row width is free up
    to 128 floats):

    1. precompute, per pixel, its 2x2 neighborhood as ONE contiguous
       (4*D = 128)-float row (three shifted copies, pure vector ops);
    2. ONE row gather per (batch, head, query, level, point) sample —
       4x fewer descriptors than per-corner gathers;
    3. fold bilinear + attention weights into a single einsum, placing the
       per-axis weights at their clamped in-patch offsets so out-of-image
       corners (weight 0 by validity) and borders match grid_sample
       zero-padding exactly.
    """
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    starts_lvl = level_start_index(spatial_shapes)
    dtype = value.dtype

    vbm = value.transpose(0, 2, 1, 3)  # (B, M, S, D)

    # --- step 1: per-pixel 2x2 patch rows ---
    patch_rows = []
    for lid, (H, W) in enumerate(spatial_shapes):
        img = vbm[:, :, starts_lvl[lid] : starts_lvl[lid] + H * W].reshape(
            B, M, H, W, D
        )
        right = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 0)))[:, :, :, 1:]
        down = jnp.pad(img, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))[:, :, 1:]
        downright = jnp.pad(
            img, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0))
        )[:, :, 1:, 1:]
        p = jnp.concatenate([img, right, down, downright], -1)  # (B,M,H,W,4D)
        patch_rows.append(p.reshape(B, M, H * W, 4 * D))
    patches = jnp.concatenate(patch_rows, 2).reshape(B * M * S, 4 * D)

    # --- step 2: per-sample start indices + in-patch weights ---
    idx_all, w_all = [], []
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

        wy0 = (1 - ly) * ((y0i >= 0) & (y0i < H)).astype(dtype)
        wy1 = ly * ((y0i + 1 >= 0) & (y0i + 1 < H)).astype(dtype)
        wx0 = (1 - lx) * ((x0i >= 0) & (x0i < W)).astype(dtype)
        wx1 = lx * ((x0i + 1 >= 0) & (x0i + 1 < W)).astype(dtype)

        ys = jnp.clip(y0i, 0, max(H - 2, 0))
        xs = jnp.clip(x0i, 0, max(W - 2, 0))
        sy = (y0i - ys).astype(dtype)  # 0 normally; 1 at bottom; -1 at top
        sx = (x0i - xs).astype(dtype)
        # per-axis weights placed at clamped in-patch rows/cols 0/1:
        # corner c sits at row (y0 + c - ys) = sy + c
        wyp0 = wy0 * (sy == 0) + wy1 * (sy == -1)
        wyp1 = wy0 * (sy == 1) + wy1 * (sy == 0)
        wxp0 = wx0 * (sx == 0) + wx1 * (sx == -1)
        wxp1 = wx0 * (sx == 1) + wx1 * (sx == 0)

        # patch row layout: [p(ys,xs), p(ys,xs+1), p(ys+1,xs), p(ys+1,xs+1)]
        w4 = jnp.stack(
            [wyp0 * wxp0, wyp0 * wxp1, wyp1 * wxp0, wyp1 * wxp1], axis=-1
        ) * attn[..., None]  # (B,Q,M,P,4)
        idx_all.append(starts_lvl[lid] + ys * W + xs)
        w_all.append(w4)

    idx = jnp.stack(idx_all, axis=3)  # (B,Q,M,L,P)
    w = jnp.stack(w_all, axis=3)  # (B,Q,M,L,P,4)
    K = L * P
    bm = (
        jnp.arange(B, dtype=jnp.int32).reshape(B, 1, 1, 1, 1) * M
        + jnp.arange(M, dtype=jnp.int32).reshape(1, 1, M, 1, 1)
    ) * S
    flat = (idx + bm).transpose(0, 2, 1, 3, 4).reshape(-1)

    w = w.transpose(0, 2, 1, 3, 4, 5).reshape(B, M, Q, K, 4)
    flat = flat.reshape(B, M, Q, K)

    # Optional chunking over Q: the gathered-rows tensor is the layer's
    # dominant transient (~2 GB at 1024^2 B=4); processing Q in chunks keeps
    # peak memory ~1/q_chunks with negligible overhead.
    if q_chunks > 1 and Q % q_chunks == 0:
        qc = Q // q_chunks
        outs = []
        for c in range(q_chunks):
            sl = slice(c * qc, (c + 1) * qc)
            rows = jnp.take(patches, flat[:, :, sl].reshape(-1), axis=0)
            rows = rows.reshape(B, M, qc, K, 4, D)
            outs.append(jnp.einsum("bmqkc,bmqkcd->bqmd", w[:, :, sl], rows))
        out = jnp.concatenate(outs, axis=1)
    else:
        rows = jnp.take(patches, flat.reshape(-1), axis=0)
        rows = rows.reshape(B, M, Q, K, 4, D)
        out = jnp.einsum("bmqkc,bmqkcd->bqmd", w, rows)
    return out.reshape(B, Q, M * D).astype(dtype)


def resolve_impl(impl: str) -> str:
    """"auto" -> the Pallas kernel on TPU, XLA im2col elsewhere."""
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "im2col"
    return impl


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    *,
    impl: str = "im2col",
    q_chunks: int = 1,
) -> jnp.ndarray:
    """Multi-scale deformable attention core (see module docstring)."""
    impl = resolve_impl(impl)
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
    elif impl == "patch":
        return _ms_deform_attn_patch(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    elif impl == "im2col":
        return _ms_deform_attn_im2col(
            value, spatial_shapes, sampling_locations, attention_weights,
            q_chunks=q_chunks,
        )
    elif impl == "pallas":
        from bm2f_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas

        return ms_deform_attn_pallas(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    raise ValueError(f"unknown impl {impl!r}")
