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
