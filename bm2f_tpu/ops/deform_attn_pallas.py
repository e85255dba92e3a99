"""Pallas TPU kernels for multi-scale deformable attention.

TPU counterpart of the reference's CUDA op (reference:
ops/src/cuda/ms_deform_im2col_cuda.cuh:242-304 forward, :306-927 backward).

Design (v5e-measured, 800^2 B=4 encoder shapes — one layer = 5.04M
descriptors):
  XLA's gather emitter issues ~10 ns per descriptor (~50 ms/layer). The
  wall is descriptor issue rate, not HBM bandwidth. This kernel keeps each
  (batch*head)'s im2col patch table VMEM-resident (constant-index input
  block, raised vmem limit) and drives a scalar-addressed VMEM row-copy
  loop with indices prefetched to SMEM — measured ~2.4 ns per copy;
  17.2 ms/layer forward, 46.6 ms fwd+bwd (2.8x / 3.4x XLA end to end).

  Layout choices that matter (each measured):
  - k-major scratch (row for sample k of query q lives at k*QT + q): the
    K-reduction becomes K sublane-aligned (QT, 4D) slice FMAs; q-major
    needs a misaligned (QT, K, 4D) reduction (~+4 ms/layer).
  - weights are passed Q-MINOR as (BM, K*4, Qp) and expanded per k with
    dot_general against a 0/1 selector E (4, 4D) — no transposes anywhere.
    The earlier (.., QT, K, 4) blocks left 31/32 lanes of every weight
    vreg empty and hid ~12 ms/layer of relayout + bandwidth across prep
    and kernel. A hi/lo split (w = f32(bf16(w)) + residual, two
    default-precision dots) keeps the expansion exact in f32 at no
    measurable cost; a single HIGHEST-precision dot costs +3.4 ms/layer,
    and VPU select/broadcast formulations are slower still.
  - prep builds the patch table in the value dtype (bf16) and casts to
    f32 once at the end (the lane-concat relayout halves in bf16), and
    runs all index/weight math on Q-minor arrays.
  - the 4-corner -> D-channel fold is three lane-slice adds in-kernel
    (outputting (QT, 4D) and folding in XLA costs ~1 ms/layer more).

Shared semantics with the XLA paths (ops/deform_attn.py): one im2col'd
(4*D)-float row per pixel holds its 2x2 neighborhood; per-sample clamped
start indices + per-corner weights reproduce grid_sample zero-padding
exactly.

Backward is a custom VJP (reference uses atomicAdd col2im kernels —
nondeterministic; ours is a deterministic sequential scatter):
  d_patches: expand w128 * g to per-row gradients in VMEM, then a scalar
    scatter-add loop into an (S, 4D) accumulator held as a constant-index
    output block across the query-tile grid axis (zeroed at tile 0).
  d_w4: re-gather the rows (same loop as forward), multiply by the
    corner-tiled incoming gradient, fold lanes per corner with an exact
    hi/lo MXU dot against E^T.
Gradients flow to value / sampling_locations / attention_weights through
the XLA preprocessing (patch building + weight construction), which JAX
autodiffs; only the gather core is hand-written.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bm2f_tpu.ops.deform_attn import level_start_index

_VMEM_LIMIT = 100 * 1024 * 1024


def _expand_mat(D: int):
    """E (4, 4D) 0/1 selector: E[c, l] = 1 iff l // D == c."""
    lanes = 4 * D
    c = jax.lax.broadcasted_iota(jnp.int32, (4, lanes), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (4, lanes), 1)
    return (l // D == c).astype(jnp.float32)


def _gather_rows(idx_ref, table_ref, scratch_ref, QT, K):
    """scratch[k*QT + q] = table[idx[k, q]] — the scalar-issue hot loop."""

    def body(qi, _):
        for k in range(K):
            a = idx_ref[0, k, qi]
            scratch_ref[pl.ds(k * QT + qi, 1), :] = table_ref[0, pl.ds(a, 1), :]
        return 0

    jax.lax.fori_loop(0, QT, body, 0)


_DN0 = (((0,), (0,)), ((), ()))  # dot_general: contract dim0 x dim0
_DN1 = (((1,), (1,)), ((), ()))  # dot_general: contract dim1 x dim1


def _w128_slice(w_ref, k, QT, D):
    """Per-k corner-weight expansion: (4, QT) block -> (QT, 4D), exact via
    hi/lo split, no transposes (dot_general contracts the corner dim
    directly). Weights live Q-minor — a (.., K, QT, 4) block would waste
    31/32 lanes of VMEM bandwidth (measured +4 ms/layer)."""
    wk = w_ref[0, k * 4 : (k + 1) * 4, :]
    wkh = wk.astype(jnp.bfloat16).astype(jnp.float32)
    E = _expand_mat(D)
    return (jax.lax.dot_general(wkh, E, _DN0)
            + jax.lax.dot_general(wk - wkh, E, _DN0))


def _fwd_kernel(idx_ref, w_ref, table_ref, out_ref, scratch_ref, *, QT, K, D):
    _gather_rows(idx_ref, table_ref, scratch_ref, QT, K)
    acc = None
    for k in range(K):
        t = scratch_ref[k * QT : (k + 1) * QT] * _w128_slice(w_ref, k, QT, D)
        acc = t if acc is None else acc + t
    out_ref[0] = acc[:, 0:D] + acc[:, D : 2 * D] + acc[:, 2 * D : 3 * D] + acc[
        :, 3 * D : 4 * D
    ]


def _corner_tile(g, D):
    """(QT, D) -> (QT, 4D): the query gradient repeated per corner block."""
    return jnp.concatenate([g, g, g, g], axis=1)


def _bwd_kernel(idx_ref, w_ref, g_ref, table_ref, dpatch_ref, dw4_ref,
                rows_ref, wg_ref, *, QT, K, D):
    """Fused backward: ONE re-gather of the forward's rows serves both
    d_w4 (rows x tiled grad, folded per corner) and d_patches (w128 x tiled
    grad scatter-added into an (S, 4D) accumulator block that stays
    resident across the query-tile grid axis)."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        dpatch_ref[0] = jnp.zeros_like(dpatch_ref[0])

    _gather_rows(idx_ref, table_ref, rows_ref, QT, K)
    E = _expand_mat(D)
    g128 = _corner_tile(g_ref[0], D)

    # d_w (Q-minor (4, QT) per k) = fold lanes per corner of rows * g128;
    # d_patches rows' gradient = w128_k * g128 (staged into wg for scatter)
    for k in range(K):
        s = k * QT
        p = rows_ref[s : s + QT, :] * g128  # (QT, 4D)
        ph = p.astype(jnp.bfloat16).astype(jnp.float32)
        dw4_ref[0, k * 4 : (k + 1) * 4, :] = (
            jax.lax.dot_general(E, ph, _DN1)
            + jax.lax.dot_general(E, p - ph, _DN1)
        )  # (4, QT)
        wg_ref[s : s + QT, :] = _w128_slice(w_ref, k, QT, D) * g128

    def body(qi, _):
        for k in range(K):
            a = idx_ref[0, k, qi]
            dpatch_ref[0, pl.ds(a, 1), :] += wg_ref[pl.ds(k * QT + qi, 1), :]
        return 0

    jax.lax.fori_loop(0, QT, body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gather_core(patches, idx, w4, q_tile, interpret):
    """out[bm, q, d] = sum_{k,c} w4[bm,4k+c,q] * patches[bm, idx[bm,k,q], c*D+d].

    patches: (BM, S, 4D) f32; idx: (BM, K, Qp) int32; w4: (BM, K*4, Qp) f32
    (Q-minor). Returns (BM, Qp, D) f32. Qp must be a multiple of q_tile.
    """
    BM, S, D4 = patches.shape
    _, K, Qp = idx.shape
    D = D4 // 4
    QT = q_tile
    n_qt = Qp // QT
    return pl.pallas_call(
        functools.partial(_fwd_kernel, QT=QT, K=K, D=D),
        grid=(BM, n_qt),
        in_specs=[
            pl.BlockSpec((1, K, QT), lambda b, i: (b, 0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K * 4, QT), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D4), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, QT, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, Qp, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K * QT, D4), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(idx, w4, patches)


def _gather_core_fwd(patches, idx, w4, q_tile, interpret):
    out = _gather_core(patches, idx, w4, q_tile, interpret)
    return out, (patches, idx, w4)


def _gather_core_bwd(q_tile, interpret, res, g):
    patches, idx, w4 = res
    BM, S, D4 = patches.shape
    _, K, Qp = idx.shape
    D = D4 // 4
    QT = q_tile
    n_qt = Qp // QT
    g = g.astype(jnp.float32)

    d_patches, d_w4 = pl.pallas_call(
        functools.partial(_bwd_kernel, QT=QT, K=K, D=D),
        grid=(BM, n_qt),
        in_specs=[
            pl.BlockSpec((1, K, QT), lambda b, i: (b, 0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K * 4, QT), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QT, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D4), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S, D4), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K * 4, QT), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BM, S, D4), jnp.float32),
            jax.ShapeDtypeStruct((BM, K * 4, Qp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K * QT, D4), jnp.float32),
            pltpu.VMEM((K * QT, D4), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(idx, w4, g, patches)

    return d_patches, None, d_w4


_gather_core.defvjp(_gather_core_fwd, _gather_core_bwd)


def _build_patches_and_indices(
    value, spatial_shapes, sampling_locations, attention_weights,
    head_major: bool = False, q_minor: bool = False,
):
    """Same im2col preprocessing as ops/deform_attn.py `_ms_deform_attn_im2col`
    (see there for the border-clamp weight placement proof): per-pixel 2x2
    patch rows (B*M, S, 4D) + per-sample start indices (B*M, K, Q) and
    folded per-corner weights (B*M, K, Q, 4), k-major for the kernel.
    All in f32. head_major: value arrives pre-transposed as (B, M, S, D)
    (the module's value projection can emit that layout directly, skipping
    a ~1.3 ms relayout per layer)."""
    if value.ndim == 4 and head_major:
        B, M, S, D = value.shape
        vbm = value
    else:
        B, S, M, D = value.shape
        vbm = value.transpose(0, 2, 1, 3)
    if q_minor:
        _, _, L, P, _, Q = sampling_locations.shape
    else:
        _, Q, _, L, P, _ = sampling_locations.shape
    starts_lvl = level_start_index(spatial_shapes)

    # build the 2x2-neighborhood rows in the VALUE dtype and cast to f32
    # LAST: the lane-concat relayout is the dominant cost and halves in bf16
    # (measured 3.2 -> 1.8 ms/layer at 800^2 B=4)
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
    patches = jnp.concatenate(patch_rows, 2).astype(jnp.float32)  # (B,M,S,4D)

    # one up-front relayout to Q-minor; all index/weight math then runs on
    # (..., Q)-minor arrays and the outputs land in the kernel's layouts
    # with no further transposes. With q_minor=True the caller already
    # produced Q-minor (B, M, L, P, [2,] Q) arrays (e.g. straight from the
    # projection matmuls) and even that relayout is skipped.
    if q_minor:
        locq = sampling_locations.astype(jnp.float32)
        attq = attention_weights.astype(jnp.float32)
    else:
        locq = sampling_locations.astype(jnp.float32).transpose(0, 2, 3, 4, 5, 1)
        attq = attention_weights.astype(jnp.float32).transpose(0, 2, 3, 4, 1)
    idx_all, w_all = [], []
    for lid, (H, W) in enumerate(spatial_shapes):
        loc = locq[:, :, lid]  # (B, M, P, 2, Q)
        attn = attq[:, :, lid]  # (B, M, P, Q)
        fx = loc[:, :, :, 0] * W - 0.5
        fy = loc[:, :, :, 1] * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        lx = fx - x0
        ly = fy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        wy0 = (1 - ly) * ((y0i >= 0) & (y0i < H))
        wy1 = ly * ((y0i + 1 >= 0) & (y0i + 1 < H))
        wx0 = (1 - lx) * ((x0i >= 0) & (x0i < W))
        wx1 = lx * ((x0i + 1 >= 0) & (x0i + 1 < W))
        ys = jnp.clip(y0i, 0, max(H - 2, 0))
        xs = jnp.clip(x0i, 0, max(W - 2, 0))
        sy = (y0i - ys).astype(jnp.float32)
        sx = (x0i - xs).astype(jnp.float32)
        wyp0 = wy0 * (sy == 0) + wy1 * (sy == -1)
        wyp1 = wy0 * (sy == 1) + wy1 * (sy == 0)
        wxp0 = wx0 * (sx == 0) + wx1 * (sx == -1)
        wxp1 = wx0 * (sx == 1) + wx1 * (sx == 0)
        w4 = jnp.stack(
            [wyp0 * wxp0, wyp0 * wxp1, wyp1 * wxp0, wyp1 * wxp1], 3
        ) * attn[:, :, :, None]  # (B, M, P, 4, Q)
        idx_all.append(starts_lvl[lid] + ys * W + xs)  # (B, M, P, Q)
        w_all.append(w4)

    K = L * P
    idx = jnp.stack(idx_all, 2)  # (B, M, L, P, Q)
    w = jnp.stack(w_all, 2)  # (B, M, L, P, 4, Q)
    return (
        patches.reshape(B * M, S, 4 * D),
        idx.reshape(B * M, K, Q),
        w.reshape(B * M, K * 4, Q),
    )


def ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    *,
    q_tile: int = 256,
    interpret: bool | None = None,
    head_major: bool = False,
    q_minor: bool = False,
    out_head_major: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.ms_deform_attn (same contract; see deform_attn.py).
    head_major=True: value is (B, M, S, D) instead of (B, S, M, D).
    q_minor=True: sampling_locations is (B, M, L, P, 2, Q) and
      attention_weights (B, M, L, P, Q) — the layouts the kernel wants,
      skipping the up-front relayout (the module's projections can emit
      these directly from dot_general).
    out_head_major=True: return (B, M, Q, D) f32 in the kernel's native
      layout; the caller folds heads in its output projection (einsum
      bmqd,mdc->bqc) instead of paying an explicit relayout here."""
    if head_major:
        B, M, S, D = value.shape
    else:
        B, S, M, D = value.shape
    if q_minor:
        Q = sampling_locations.shape[-1]
    else:
        Q = sampling_locations.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret is True:
        # TPU-semantics interpreter (supports in-kernel refs + program_id)
        interpret = pltpu.InterpretParams()
    patches, idx, w4 = _build_patches_and_indices(
        value, spatial_shapes, sampling_locations, attention_weights,
        head_major=head_major, q_minor=q_minor,
    )
    q_tile = min(q_tile, ((Q + 7) // 8) * 8)
    Qp = (Q + q_tile - 1) // q_tile * q_tile
    if Qp != Q:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, Qp - Q)))
        w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, Qp - Q)))
    out = _gather_core(patches, idx, w4, q_tile, interpret)  # (BM, Qp, D)
    if out_head_major:
        return out[:, :Q].reshape(B, M, Q, D)
    out = out[:, :Q].reshape(B, M, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, M * D).astype(value.dtype)
