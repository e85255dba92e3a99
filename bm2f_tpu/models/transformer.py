"""Vanilla DETR transformer (reference:
mask2former/modeling/transformer_decoder/transformer.py:19-369 —
encoder/decoder with pre/post-norm variants), used by the MaskFormer-v1
`StandardTransformerDecoder` and the `TransformerEncoderPixelDecoder`."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from bm2f_tpu.models.layers import MultiHeadAttention, xavier_uniform


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos):
        attn = MultiHeadAttention(self.nhead, dtype=self.dtype, name="self_attn")
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        lin1 = nn.Dense(self.dim_feedforward, kernel_init=xavier_uniform,
                        dtype=self.dtype, name="linear1")
        lin2 = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                        dtype=self.dtype, name="linear2")
        if self.pre_norm:
            s = norm1(src)
            src = src + attn(s + pos, s + pos, s)
            return src + lin2(nn.relu(lin1(norm2(src))))
        src = norm1(src + attn(src + pos, src + pos, src))
        return norm2(src + lin2(nn.relu(lin1(src))))


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos):
        self_attn = MultiHeadAttention(self.nhead, dtype=self.dtype, name="self_attn")
        cross = MultiHeadAttention(self.nhead, dtype=self.dtype, name="multihead_attn")
        n1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        n2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        n3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")
        lin1 = nn.Dense(self.dim_feedforward, kernel_init=xavier_uniform,
                        dtype=self.dtype, name="linear1")
        lin2 = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                        dtype=self.dtype, name="linear2")
        if self.pre_norm:
            t = n1(tgt)
            tgt = tgt + self_attn(t + query_pos, t + query_pos, t)
            t = n2(tgt)
            tgt = tgt + cross(t + query_pos, memory + pos, memory)
            return tgt + lin2(nn.relu(lin1(n3(tgt))))
        tgt = n1(tgt + self_attn(tgt + query_pos, tgt + query_pos, tgt))
        tgt = n2(tgt + cross(tgt + query_pos, memory + pos, memory))
        return n3(tgt + lin2(nn.relu(lin1(tgt))))


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos):
        for i in range(self.num_layers):
            src = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.pre_norm,
                dtype=self.dtype, name=f"layer_{i}",
            )(src, pos)
        if self.pre_norm:
            src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(src)
        return src


class TransformerDecoder(nn.Module):
    """Returns stacked intermediate outputs (num_layers, B, Q, C) for deep
    supervision (reference: TransformerDecoder return_intermediate)."""

    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos):
        norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        outs = []
        for i in range(self.num_layers):
            tgt = TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.pre_norm,
                dtype=self.dtype, name=f"layer_{i}",
            )(tgt, memory, pos, query_pos)
            outs.append(norm(tgt))
        return jnp.stack(outs)
