"""MSDeformAttn pixel decoder — the default pixel decoder of Mask2Former
(reference: mask2former/modeling/pixel_decoder/msdeformattn.py:165-358),
rebuilt TPU-first:

- NHWC layout, batch-first sequences, static level geometry;
- the deformable-attention core is `bm2f_tpu.ops.ms_deform_attn`
  (Pallas / XLA gather) instead of the CUDA extension;
- no padding masks: the reference feeds an all-False mask
  (msdeformattn.py:62), so valid ratios are 1 and reference points are a
  compile-time constant grid.

Also provides the simpler FPN `BasePixelDecoder` (reference: fpn.py:38-204).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from bm2f_tpu.config import PixelDecoderConfig
from bm2f_tpu.models.layers import MLP, c2_xavier_init, get_norm, xavier_uniform
from bm2f_tpu.models.position_encoding import sine_position_embedding_2d
from bm2f_tpu.ops import ms_deform_attn, resize_bilinear
from bm2f_tpu.ops.interpolate import resize_nearest


def _offset_bias_ring_init(n_heads: int, n_levels: int, n_points: int):
    """Ring init of sampling-offset biases (reference:
    ops/modules/ms_deform_attn.py:66-74): head h points at angle
    2*pi*h/n_heads, normalized to unit Linf, scaled by point index."""
    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (M, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1

    def init(key, shape, dtype=jnp.float32):
        return jnp.asarray(grid.reshape(-1), dtype)

    return init


class MSDeformAttnModule(nn.Module):
    """Deformable attention module (reference: ops/modules/ms_deform_attn.py:34-125).

    query/value are batch-first (B, N, C). Spatial shapes are static.
    """

    d_model: int
    n_levels: int
    n_heads: int
    n_points: int
    dtype: Any = jnp.float32
    impl: str = "im2col"
    q_chunks: int = 1
    q_tile: int = 256

    @nn.compact
    def __call__(self, query, reference_points, value_src, spatial_shapes):
        """
        query: (B, Q, C) (content + positional already summed)
        reference_points: (Q, L, 2) in [0,1] (x, y) — batch-independent
        value_src: (B, S, C)
        """
        B, Q, C = query.shape
        M, L, P = self.n_heads, self.n_levels, self.n_points
        D = C // M

        from bm2f_tpu.ops.deform_attn import resolve_impl

        impl = resolve_impl(self.impl)
        value = _ValueProj(
            C, M, head_major=(impl == "pallas"), dtype=self.dtype,
            name="value_proj",
        )(value_src)  # (B, S, M, D) or head-major (B, M, S, D)

        # normalizer per level: (W, H) (reference ms_deform_attn.py:107-109)
        normalizer = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], dtype=jnp.float32
        )  # (L, 2)

        if impl == "pallas":
            from bm2f_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas

            # Q-minor prep: projections emit (F, B, Q) straight from
            # dot_general; every downstream operand keeps Q minor, the
            # layout the Pallas kernel consumes — no lane relayouts
            offsets = _QMinorProj(
                M * L * P * 2, kernel_init=nn.initializers.zeros,
                bias_init=_offset_bias_ring_init(M, L, P), dtype=self.dtype,
                name="sampling_offsets",
            )(query).reshape(M, L, P, 2, B, Q).transpose(4, 0, 1, 2, 3, 5)
            attn = _QMinorProj(
                M * L * P, kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name="attention_weights",
            )(query).reshape(M, L * P, B, Q)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=1)
            attn = attn.reshape(M, L, P, B, Q).transpose(3, 0, 1, 2, 4)
            ref_t = reference_points.transpose(1, 2, 0)  # (L, 2, Q) const
            loc = (
                ref_t[None, None, :, None]
                + offsets.astype(jnp.float32)
                / normalizer[None, None, :, None, :, None]
            )  # (B, M, L, P, 2, Q)
            out = ms_deform_attn_pallas(
                value, spatial_shapes, loc, attn,
                head_major=True, q_minor=True, out_head_major=True,
                q_tile=self.q_tile,
            )  # (B, M, Q, D) f32
            # named for the encoder remat policy: output_proj's weight grad
            # consumes this tensor, so unless it is saved the backward-pass
            # recompute must re-run the Pallas gather (~11 ms/layer at
            # 1024^2 B=2) just to rebuild it
            out = checkpoint_name(out, "deform_gather_out")
            return _HeadMajorOutProj(C, M, dtype=self.dtype,
                                     name="output_proj")(out)

        offsets = nn.Dense(
            M * L * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_ring_init(M, L, P),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).reshape(B, Q, M, L, P, 2)

        attn = nn.Dense(
            M * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(query).reshape(B, Q, M, L * P)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = attn.reshape(B, Q, M, L, P)

        loc = (
            reference_points[None, :, None, :, None, :]
            + offsets.astype(jnp.float32) / normalizer[None, None, None, :, None, :]
        )

        out = ms_deform_attn(value, spatial_shapes, loc, attn, impl=impl,
                             q_chunks=self.q_chunks)
        out = nn.Dense(
            C, kernel_init=xavier_uniform, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="output_proj",
        )(out)
        return out


class _QMinorProj(nn.Module):
    """Linear projection emitting a Q-MINOR (F, B, Q) output straight from
    dot_general (kernel (C, F) contracted on C against (B, Q, C)) — the
    deform-attn kernel wants every per-query operand Q-minor, and producing
    it at the matmul avoids a (B, Q, F) -> (..., Q) lane relayout of ~5M
    floats per layer. Param tree matches nn.Dense (kernel + bias)."""

    features: int
    kernel_init: Any = xavier_uniform
    bias_init: Any = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        y = jax.lax.dot_general(
            kernel.astype(self.dtype), x.astype(self.dtype),
            (((0,), (2,)), ((), ())),
        )  # (F, B, Q)
        return y + bias.astype(self.dtype)[:, None, None]


class _HeadMajorOutProj(nn.Module):
    """Output projection consuming the kernel's native (B, M, Q, D) layout:
    einsum bmqd,mdc->bqc folds the heads inside the matmul instead of an
    explicit (B, M, Q, D) -> (B, Q, M*D) relayout. Param tree matches
    nn.Dense("output_proj") (kernel (M*D, C) + bias)."""

    features: int
    n_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C, M = self.features, self.n_heads
        D = C // M
        kernel = self.param("kernel", xavier_uniform, (M * D, C))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        k = kernel.reshape(M, D, C).astype(self.dtype)
        y = jnp.einsum("bmqd,mdc->bqc", x.astype(self.dtype), k)
        return y + bias.astype(self.dtype)


class _ValueProj(nn.Module):
    """Value projection with the SAME param tree as nn.Dense("value_proj")
    (kernel (C, C) + bias (C,), checkpoint/converter-compatible) that can
    emit the head-major (B, M, S, D) layout directly from the matmul — the
    layout the Pallas kernel's im2col table wants — instead of paying a
    separate (B, S, M, D) -> (B, M, S, D) relayout (~1.3 ms/layer)."""

    features: int
    n_heads: int
    head_major: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C, M = self.features, self.n_heads
        D = C // M
        kernel = self.param("kernel", xavier_uniform, (x.shape[-1], C))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if not self.head_major:
            y = x.astype(self.dtype) @ kernel.astype(self.dtype)
            y = y + bias.astype(self.dtype)
            return y.reshape(*x.shape[:-1], M, D)
        B, S, _ = x.shape
        k = kernel.reshape(x.shape[-1], M, D).astype(self.dtype)
        y = jnp.einsum("bsc,cmd->bmsd", x.astype(self.dtype), k)
        return y + bias.reshape(M, D)[None, :, None, :].astype(self.dtype)


class DeformableEncoderLayer(nn.Module):
    """Post-norm deformable encoder layer (reference: msdeformattn.py:92-131)."""

    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    dtype: Any = jnp.float32
    impl: str = "im2col"
    q_chunks: int = 1
    q_tile: int = 256

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        attn_out = MSDeformAttnModule(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            dtype=self.dtype, impl=self.impl, q_chunks=self.q_chunks,
            q_tile=self.q_tile, name="self_attn",
        )(src + pos, reference_points, src, spatial_shapes)
        # named for the remat policy: saving this one tensor (B,S,C bf16,
        # ~11 MB/layer at 1024^2 B=2) lets the backward-pass recompute skip
        # the Pallas gather forward entirely (its custom-VJP residuals are
        # prep outputs, so the re-run is dead code once attn_out is saved) —
        # measured 6x ~11 ms/step of recomputed kernel time at 1024^2 B=2
        attn_out = checkpoint_name(attn_out, "deform_attn_out")
        src = src + attn_out
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src)

        ffn = nn.Dense(self.d_ffn, kernel_init=xavier_uniform,
                       bias_init=nn.initializers.zeros, dtype=self.dtype,
                       name="linear1")(src)
        ffn = nn.relu(ffn)
        ffn = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                       bias_init=nn.initializers.zeros, dtype=self.dtype,
                       name="linear2")(ffn)
        src = src + ffn
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src)
        return src


def encoder_reference_points(spatial_shapes) -> jnp.ndarray:
    """Constant reference grid (reference: msdeformattn.py:141-153 with
    valid_ratios == 1): pixel centers normalized per level, broadcast to all
    sampling levels. Returns (S, L, 2) (x, y)."""
    refs = []
    for h, w in spatial_shapes:
        ys = (np.arange(h, dtype=np.float64) + 0.5) / h
        xs = (np.arange(w, dtype=np.float64) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = np.concatenate(refs, 0).astype(np.float32)  # (S, 2)
    L = len(spatial_shapes)
    return jnp.asarray(np.tile(ref[:, None, :], (1, L, 1)))


class MSDeformAttnPixelDecoder(nn.Module):
    """See module docstring. Features arrive as {res2..res5: (B,H,W,C)}.

    Returns (mask_features, encoder_top_feature, multi_scale_features)
    where multi_scale_features = [stride32, stride16, stride8] and
    mask_features is stride `common_stride` (4).
    """

    cfg: PixelDecoderConfig
    in_channels: Dict[str, int]
    in_strides: Dict[str, int]
    dtype: Any = jnp.float32
    # overrides cfg.deform_impl when set (tests); None = use config
    deform_impl: Any = None

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        cfg = self.cfg
        conv_dim = cfg.conv_dim

        # transformer levels, top-down order (res5, res4, res3)
        tr_feats = sorted(cfg.transformer_in_features,
                          key=lambda f: self.in_strides[f], reverse=True)
        srcs, poss, shapes = [], [], []
        for i, f in enumerate(tr_feats):
            x = features[f].astype(self.dtype)
            x = nn.Conv(conv_dim, (1, 1), use_bias=True,
                        kernel_init=xavier_uniform,
                        bias_init=nn.initializers.zeros,
                        dtype=self.dtype, name=f"input_proj_{i}_conv")(x)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name=f"input_proj_{i}_norm")(x)
            B, H, W, _ = x.shape
            shapes.append((H, W))
            srcs.append(x.reshape(B, H * W, conv_dim))
            pe = sine_position_embedding_2d(H, W, conv_dim // 2, dtype=self.dtype)
            poss.append(pe.reshape(H * W, conv_dim))

        L = len(tr_feats)
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (L, conv_dim)
        )
        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate(
            [p + level_embed[i].astype(self.dtype) for i, p in enumerate(poss)], axis=0
        )[None]  # (1, S, C)
        ref_points = encoder_reference_points(shapes)

        layer_cls = (
            nn.remat(
                DeformableEncoderLayer,
                static_argnums=(4,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "deform_attn_out", "deform_gather_out"
                ),
            )
            if cfg.remat
            else DeformableEncoderLayer
        )
        # All encoder layers run under ONE nn.scan with stacked params
        # (leading axis = layer): the layer body is compiled once instead of
        # transformer_enc_layers times. Identical math and execution order to
        # the unrolled loop (lax.scan semantics); the win is COMPILE time —
        # the unrolled 6-layer encoder was the largest repeated block in the
        # train step's ~23 min cold XLA compile (round-5 verdict item 1).
        # Param tree: encoder_layers/... with shape (n_layers, ...), mapped
        # from the reference's transformer.encoder.layers.{i} by the
        # checkpoint converter (utils/convert_weights.py).
        if cfg.transformer_enc_layers > 0:  # length-0 scan would create
            # zero-size stacked params (orbax refuses to checkpoint those);
            # no layers means no params, like the unrolled loop
            layer = layer_cls(
                d_model=conv_dim,
                d_ffn=cfg.transformer_dim_feedforward,
                n_levels=L,
                n_heads=cfg.transformer_nheads,
                n_points=cfg.transformer_n_points,
                dtype=self.dtype,
                impl=self.deform_impl or getattr(cfg, "deform_impl", "im2col"),
                q_chunks=cfg.deform_q_chunks,
                q_tile=getattr(cfg, "deform_q_tile", 256),
                name="encoder_layers",
            )

            def body(mod, carry, _):
                return mod(carry, pos, ref_points, shapes), None

            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.transformer_enc_layers,
            )
            src, _ = scan(layer, src, None)

        # split back to images, top-down order (res5 first)
        out: List[jnp.ndarray] = []
        start = 0
        B = src.shape[0]
        for (H, W) in shapes:
            out.append(src[:, start : start + H * W].reshape(B, H, W, conv_dim))
            start += H * W

        # extra FPN levels down to common_stride (reference:
        # msdeformattn.py:257-292,343-351 — bilinear top-down here, unlike
        # the vanilla FPN decoder which uses nearest)
        fpn_feats = [
            f for f in sorted(self.in_strides, key=self.in_strides.get)
            if f not in cfg.transformer_in_features
            and self.in_strides[f] >= cfg.common_stride
        ]
        use_bias = cfg.norm in ("", None, "none")
        for idx, f in enumerate(reversed(fpn_feats)):
            x = features[f].astype(self.dtype)
            lat = nn.Conv(conv_dim, (1, 1), use_bias=use_bias,
                          kernel_init=c2_xavier_init,
                          dtype=self.dtype, name=f"adapter_{idx}_conv")(x)
            lat = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                               name=f"adapter_{idx}_norm")(lat)
            top = resize_bilinear(out[-1], lat.shape[1], lat.shape[2])
            y = lat + top
            y = nn.Conv(conv_dim, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=use_bias, kernel_init=c2_xavier_init,
                        dtype=self.dtype, name=f"layer_{idx}_conv")(y)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name=f"layer_{idx}_norm")(y)
            y = nn.relu(y)
            out.append(y)

        mask_features = nn.Conv(
            cfg.mask_dim, (1, 1), use_bias=True, kernel_init=c2_xavier_init,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            name="mask_features",
        )(out[-1])

        multi_scale = out[:3]  # stride 32, 16, 8
        return mask_features, out[0], multi_scale


class BasePixelDecoder(nn.Module):
    """Vanilla FPN pixel decoder (reference: fpn.py:38-204): lateral 1x1 +
    3x3 output convs with GN, nearest-neighbor top-down; multi-scale features
    are the three lowest-resolution FPN outputs."""

    cfg: PixelDecoderConfig
    in_channels: Dict[str, int]
    in_strides: Dict[str, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        cfg = self.cfg
        conv_dim = cfg.conv_dim
        names = sorted(self.in_strides, key=self.in_strides.get)  # res2..res5
        use_bias = cfg.norm in ("", None, "none")

        out = []
        y = None
        for idx, f in enumerate(reversed(names)):  # res5 -> res2
            x = features[f].astype(self.dtype)
            if y is None:
                y = nn.Conv(conv_dim, (3, 3), padding=[(1, 1), (1, 1)],
                            use_bias=use_bias, kernel_init=c2_xavier_init,
                            dtype=self.dtype, name=f"layer_{idx}_conv")(x)
                y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                                 name=f"layer_{idx}_norm")(y)
                y = nn.relu(y)
            else:
                lat = nn.Conv(conv_dim, (1, 1), use_bias=use_bias,
                              kernel_init=c2_xavier_init,
                              dtype=self.dtype, name=f"adapter_{idx}_conv")(x)
                lat = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                   dtype=self.dtype, name=f"adapter_{idx}_norm")(lat)
                y = lat + resize_nearest(y, lat.shape[1], lat.shape[2])
                y = nn.Conv(conv_dim, (3, 3), padding=[(1, 1), (1, 1)],
                            use_bias=use_bias, kernel_init=c2_xavier_init,
                            dtype=self.dtype, name=f"layer_{idx}_conv")(y)
                y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                                 name=f"layer_{idx}_norm")(y)
                y = nn.relu(y)
            out.append(y)

        mask_features = nn.Conv(
            cfg.mask_dim, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
            kernel_init=c2_xavier_init, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="mask_features",
        )(out[-1])
        multi_scale = out[:3]
        return mask_features, None, multi_scale
