"""Sine position embeddings (DETR-style), matching the reference
`PositionEmbeddingSine` (reference: position_encoding.py:12-52) and its 3D
video variant (mask2former_video/modeling/transformer_decoder/position_encoding.py).

All spatial sizes are static, and the model never masks padded pixels in the
encoder (the reference passes an all-False mask, msdeformattn.py:62), so the
embedding is a compile-time constant table — computed in numpy-free jnp but
fully foldable by XLA.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _interleave_sin_cos(pos: np.ndarray) -> np.ndarray:
    """torch: stack((p[..., 0::2].sin(), p[..., 1::2].cos()), -1).flatten(-2)."""
    s = np.sin(pos[..., 0::2])
    c = np.cos(pos[..., 1::2])
    return np.stack((s, c), axis=-1).reshape(*pos.shape[:-1], -1)


def sine_position_embedding_2d(
    h: int,
    w: int,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Returns (H, W, 2*num_pos_feats) with channel order [y-feats, x-feats]."""
    scale = 2 * math.pi
    y = np.arange(1, h + 1, dtype=np.float64)[:, None] * np.ones((1, w))
    x = np.arange(1, w + 1, dtype=np.float64)[None, :] * np.ones((h, 1))
    if normalize:
        eps = 1e-6
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_y = _interleave_sin_cos(y[..., None] / dim_t)
    pos_x = _interleave_sin_cos(x[..., None] / dim_t)
    pos = np.concatenate([pos_y, pos_x], axis=-1).astype(np.float32)
    return jnp.asarray(pos, dtype=dtype)


def sine_position_embedding_3d(
    t: int,
    h: int,
    w: int,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Video variant (reference: mask2former_video/.../position_encoding.py:29-57
    PositionEmbeddingSine3D): pos = cat(pos_y, pos_x) + pos_z, where the
    temporal features use a 2*num_pos_feats dim_t and are ADDED across the
    full channel width. Returns (T, H, W, 2*num_pos_feats)."""
    scale = 2 * math.pi
    z = np.arange(1, t + 1, dtype=np.float64)[:, None, None] * np.ones((1, h, w))
    y = np.arange(1, h + 1, dtype=np.float64)[None, :, None] * np.ones((t, 1, w))
    x = np.arange(1, w + 1, dtype=np.float64)[None, None, :] * np.ones((t, h, 1))
    if normalize:
        eps = 1e-6
        z = z / (t + eps) * scale
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    dim_t_z = np.arange(num_pos_feats * 2, dtype=np.float64)
    dim_t_z = temperature ** (2 * (dim_t_z // 2) / (num_pos_feats * 2))
    pos_y = _interleave_sin_cos(y[..., None] / dim_t)
    pos_x = _interleave_sin_cos(x[..., None] / dim_t)
    pos_z = _interleave_sin_cos(z[..., None] / dim_t_z)
    pos = (np.concatenate([pos_y, pos_x], axis=-1) + pos_z).astype(np.float32)
    return jnp.asarray(pos, dtype=dtype)


def sine_position_embedding_3d_masked(
    frame_valid,
    h: int,
    w: int,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    dtype=jnp.float32,
):
    """Frame-masked video PE (reference PositionEmbeddingSine3D computes
    z_embed = not_mask.cumsum(1) / z_embed[:, -1:], so the temporal
    normalization sees only REAL frames): padding frames to a static T
    bucket leaves the valid frames' embeddings equal to a true-length
    clip's up to f32 rounding (the temporal term is traced, so it runs in
    f32; the unmasked static path precomputes in f64 — difference ~1e-7,
    see the rtol in tests/test_video.py). frame_valid: (B, T) bool.
    Returns (B, T, H, W, 2*num_pos_feats)."""
    B, t = frame_valid.shape
    scale = 2 * math.pi
    eps = 1e-6
    fv = frame_valid.astype(jnp.float32)
    z = jnp.cumsum(fv, axis=1)  # (B, T): 1..T_true on valid frames
    t_true = z[:, -1:]
    z = z / (t_true + eps) * scale  # (B, T)
    y = (np.arange(1, h + 1, dtype=np.float64) / (h + eps) * scale)
    x = (np.arange(1, w + 1, dtype=np.float64) / (w + eps) * scale)
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    dim_t_z = np.arange(num_pos_feats * 2, dtype=np.float64)
    dim_t_z = temperature ** (2 * (dim_t_z // 2) / (num_pos_feats * 2))
    pos_y = _interleave_sin_cos(y[:, None] / dim_t)  # (H, F) np
    pos_x = _interleave_sin_cos(x[:, None] / dim_t)  # (W, F)
    pos_yx = np.concatenate(
        [np.broadcast_to(pos_y[:, None], (h, w, num_pos_feats)),
         np.broadcast_to(pos_x[None, :], (h, w, num_pos_feats))], axis=-1,
    )  # (H, W, 2F)
    arg_z = z[..., None] / dim_t_z  # (B, T, 2F) traced
    pos_z = jnp.stack(
        [jnp.sin(arg_z[..., 0::2]), jnp.cos(arg_z[..., 1::2])], axis=-1
    ).reshape(B, t, 2 * num_pos_feats)
    pos = jnp.asarray(pos_yx)[None, None] + pos_z[:, :, None, None]
    return pos.astype(dtype)
