"""Point sampling ops matching torch `F.grid_sample` / point_rend
`point_sample` semantics (bilinear, align_corners=False, zero padding).

These back both the deformable-attention oracle and the point-sampled
mask losses (reference: criterion.py:853-873 uses
detectron2.projects.point_rend.point_features.point_sample, which is
grid_sample(2*coords - 1, align_corners=False)).

Layout: NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear grid sample, zeros padding, align_corners=False.

    img:  (B, H, W, C)
    grid: (B, N, 2) with (x, y) in [-1, 1] (torch grid_sample convention,
          but flattened spatially: a (B, Hg, Wg, 2) torch grid corresponds
          to grid.reshape(B, Hg*Wg, 2)).
    returns (B, N, C)
    """
    B, H, W, C = img.shape
    x = (grid[..., 0] + 1.0) * (W * 0.5) - 0.5  # unnormalized source coords
    y = (grid[..., 1] + 1.0) * (H * 0.5) - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    # flat row-gather (embedding-lookup pattern — XLA's fast TPU gather path)
    flat = img.reshape(B * H * W, C)
    b_offset = jnp.arange(B, dtype=jnp.int32)[:, None] * (H * W)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        idx = (b_offset + yc * W + xc).reshape(-1)  # (B*N,)
        v = jnp.take(flat, idx, axis=0).reshape(B, -1, C)
        return v * valid[..., None].astype(img.dtype)

    w00 = ((1 - lx) * (1 - ly))[..., None].astype(img.dtype)
    w01 = (lx * (1 - ly))[..., None].astype(img.dtype)
    w10 = ((1 - lx) * ly)[..., None].astype(img.dtype)
    w11 = (lx * ly)[..., None].astype(img.dtype)

    return (
        gather(y0i, x0i) * w00
        + gather(y0i, x1i) * w01
        + gather(y1i, x0i) * w10
        + gather(y1i, x1i) * w11
    )


def point_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """point_rend-style sampling: coords in [0, 1] (x, y).

    img: (B, H, W, C); coords: (B, N, 2) -> (B, N, C)
    """
    return grid_sample(img, coords * 2.0 - 1.0)


def build_corner_table(img: jnp.ndarray) -> jnp.ndarray:
    """Corner-pack an image for `point_sample_packed`.

    Returns a (B*(H+2)*(W+2), 4*C) row table where the row at padded base
    position (b, y+1, x+1) holds the 2x2 bilinear neighborhood
    [v(y,x), v(y,x+1), v(y+1,x), v(y+1,x+1)], zero outside the image. One
    row gather fetches everything one sample point needs — 4x fewer gather
    descriptors than per-corner gathers, which is what the point-sampled
    mask losses are bound by on TPU (v5e XLA gather ~10 ns/descriptor,
    row width free to 128 f32 lanes).

    The 1-pixel border exists because a sample point within half a pixel of
    the top/left edge has base (y0, x0) = -1 while its +1 corners are still
    in range; indexing the padded grid keeps those rows addressable without
    per-corner clipping.
    """
    B, H, W, C = img.shape
    p = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)))  # (B, H+3, W+3, C)
    tl = p[:, : H + 2, : W + 2]
    tr = p[:, : H + 2, 1: W + 3]
    bl = p[:, 1: H + 3, : W + 2]
    br = p[:, 1: H + 3, 1: W + 3]
    table = jnp.concatenate([tl, tr, bl, br], axis=-1)
    return table.reshape(B * (H + 2) * (W + 2), 4 * C)


def point_sample_packed(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    table: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Exactly `point_sample(img, coords)` via ONE row gather per point.

    img: (B, H, W, C); coords: (B, N, 2) in [0, 1] -> (B, N, C).
    Pass a prebuilt `table = build_corner_table(img)` to amortize the table
    build across several calls on the same image (e.g. per decoder layer on
    constant targets). Numerics are identical to `point_sample`: same corner
    values, same validity masks, same weight products and sum order.
    """
    B, H, W, C = img.shape
    if table is None:
        table = build_corner_table(img)

    grid = coords * 2.0 - 1.0
    x = (grid[..., 0] + 1.0) * (W * 0.5) - 0.5
    y = (grid[..., 1] + 1.0) * (H * 0.5) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    # base row in the padded grid; clip keeps off-grid points addressable
    # (their corners are invalid and masked to zero below, as in grid_sample)
    yb = jnp.clip(y0i, -1, H) + 1
    xb = jnp.clip(x0i, -1, W) + 1
    b_offset = jnp.arange(B, dtype=jnp.int32)[:, None] * ((H + 2) * (W + 2))
    idx = (b_offset + yb * (W + 2) + xb).reshape(-1)
    rows = jnp.take(table, idx, axis=0).reshape(B, -1, 4, C)

    dt = img.dtype
    if rows.dtype != dt:
        # narrow storage tables (e.g. int8 for binary {0,1} masks): the
        # v5e gather is row-BYTE-bound from HBM-resident tables (measured
        # f32 165 / bf16 84 / int8 33 ns per 32-lane row on a 2.1M-row
        # table), so storing exact-in-int8 values quarters the gather cost;
        # converting rows back before the weight math keeps the result
        # bitwise identical to an f32 table
        rows = rows.astype(dt)

    def vmask(yi, xi):
        return (
            ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
            .astype(dt)[..., None]
        )

    w00 = ((1 - lx) * (1 - ly))[..., None].astype(dt)
    w01 = (lx * (1 - ly))[..., None].astype(dt)
    w10 = ((1 - lx) * ly)[..., None].astype(dt)
    w11 = (lx * ly)[..., None].astype(dt)

    return (
        rows[:, :, 0] * vmask(y0i, x0i) * w00
        + rows[:, :, 1] * vmask(y0i, x1i) * w01
        + rows[:, :, 2] * vmask(y1i, x0i) * w10
        + rows[:, :, 3] * vmask(y1i, x1i) * w11
    )
