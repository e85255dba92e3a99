"""Torch-compatible image resizing.

The reference model's numerics depend on PyTorch's `F.interpolate` semantics
(`align_corners=False` bilinear WITHOUT antialiasing, and legacy `nearest`).
`jax.image.resize` antialiases on downscale, so it is NOT equivalent — the
decoder's attention-mask pathway *downsamples* predicted masks every layer
(reference: mask2former_transformer_decoder.py:446-450). We therefore
implement interpolation from scratch with exact torch index math.

Layout: NHWC (TPU-native). The H/W axes are assumed static (jit-time).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_index_weights(in_size: int, out_size: int):
    """Source indices and lambda weights for 1-D half-pixel bilinear
    (torch `upsample_bilinear2d` with align_corners=False)."""
    i = np.arange(out_size, dtype=np.float64)
    scale = in_size / out_size
    src = np.maximum((i + 0.5) * scale - 0.5, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    w0 = 1.0 - w1
    return i0, i1, w0, w1


def _nearest_indices(in_size: int, out_size: int):
    """torch legacy 'nearest': src = floor(i * in/out)."""
    i = np.arange(out_size, dtype=np.float64)
    src = np.floor(i * (in_size / out_size)).astype(np.int64)
    return np.minimum(src, in_size - 1)


def _interp_axis(x: jnp.ndarray, axis: int, i0, i1, w0, w1) -> jnp.ndarray:
    i0 = jnp.asarray(i0)
    i1 = jnp.asarray(i1)
    shape = [1] * x.ndim
    shape[axis] = -1
    w0 = jnp.asarray(w0).reshape(shape).astype(x.dtype)
    w1 = jnp.asarray(w1).reshape(shape).astype(x.dtype)
    x0 = jnp.take(x, i0, axis=axis)
    x1 = jnp.take(x, i1, axis=axis)
    return x0 * w0 + x1 * w1


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize matching torch F.interpolate(..., mode='bilinear',
    align_corners=False, antialias=False).

    x: (..., H, W, C) — the last three axes are (H, W, C).
    """
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    if in_h != out_h:
        i0, i1, w0, w1 = _bilinear_index_weights(in_h, out_h)
        x = _interp_axis(x, h_axis, i0, i1, w0, w1)
    if in_w != out_w:
        i0, i1, w0, w1 = _bilinear_index_weights(in_w, out_w)
        x = _interp_axis(x, w_axis, i0, i1, w0, w1)
    return x


def _dyn_bilinear_index_weights(src_size, dst_size, out_size: int):
    """Traced-scalar variant of `_bilinear_index_weights`: source indices /
    weights for resizing a dynamic src_size-long prefix region to a dynamic
    dst_size-long prefix of a static out_size axis. Entries at i >= dst_size
    clamp inside the source region (garbage the caller crops away).

    The source position (i+0.5)*src/dst - 0.5 is handled as an EXACT int32
    numerator (2i+1)*src - dst over 2*dst: the index comes from integer
    floor division and the lambda weight from the integer REMAINDER (< 2*dst,
    so full f32 precision). Computing s = num/(2*dst) in f32 and taking
    s - floor(s) instead loses precision to ulp(s) ~ src_size * 2^-23
    (measured 3e-4 absolute output error at 300-wide sources on TPU)."""
    i = jnp.arange(out_size, dtype=jnp.int32)
    num = (2 * i + 1) * src_size - dst_size  # exact in int32 (< 2^24 here)
    num = jnp.maximum(num, 0)  # torch clamps the source position at 0
    den = 2 * dst_size
    i0 = jnp.minimum(num // den, src_size - 1)
    i1 = jnp.minimum(i0 + 1, src_size - 1)
    # remainder w.r.t. the UNCLAMPED index, so edge-clamped entries get
    # w1 >= 1 with x0 == x1 (value unchanged), like the static path
    w1 = (num - i0 * den).astype(jnp.float32) / den.astype(jnp.float32)
    return i0, i1, 1.0 - w1, w1


def resize_bilinear_dynamic(
    x: jnp.ndarray, src_hw, dst_hw, out_h: int, out_w: int
) -> jnp.ndarray:
    """Bilinear-resize the dynamic (src_h, src_w) top-left region of a padded
    static array to the (dst_h, dst_w) top-left region of a static
    (out_h, out_w) output — same torch half-pixel index math as
    `resize_bilinear`, with traced region sizes. Pixels beyond the dst region
    hold edge-clamped garbage; crop or mask them downstream.

    x: (..., H, W, C); src_hw/dst_hw: int32 scalars or (2,) arrays.
    """
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    src_h, src_w = src_hw[0], src_hw[1]
    dst_h, dst_w = dst_hw[0], dst_hw[1]
    i0, i1, w0, w1 = _dyn_bilinear_index_weights(src_h, dst_h, out_h)
    x = _interp_axis(x, h_axis, i0, i1, w0, w1)
    i0, i1, w0, w1 = _dyn_bilinear_index_weights(src_w, dst_w, out_w)
    x = _interp_axis(x, w_axis, i0, i1, w0, w1)
    return x


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest resize matching torch F.interpolate(..., mode='nearest').

    x: (..., H, W, C).
    """
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    if in_h != out_h:
        x = jnp.take(x, jnp.asarray(_nearest_indices(in_h, out_h)), axis=h_axis)
    if in_w != out_w:
        x = jnp.take(x, jnp.asarray(_nearest_indices(in_w, out_w)), axis=w_axis)
    return x
