"""Mask2Former masked transformer decoder (reference:
mask2former/modeling/transformer_decoder/mask2former_transformer_decoder.py:207-465),
rebuilt TPU-first:

- batch-first (B, Q, C) throughout;
- the boolean attention mask becomes an additive -inf bias fused into XLA
  attention (the reference builds a (B*heads, Q, HW) bool tensor per layer);
- the degenerate-row reset (reference :400 — queries whose predicted mask is
  empty attend everywhere) is a vectorized `where`;
- per-layer predictions are stacked into arrays (layers+1, B, ...) so the
  deep-supervision loss is a single vmapped computation instead of a Python
  list of dicts.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bm2f_tpu.config import DecoderConfig
from bm2f_tpu.models.layers import MLP, MultiHeadAttention, xavier_uniform
from bm2f_tpu.models.position_encoding import sine_position_embedding_2d
from bm2f_tpu.ops import resize_bilinear

NEG_INF = -1e9  # finite -inf surrogate: keeps softmax well-defined on TPU


class SelfAttentionLayer(nn.Module):
    d_model: int
    nhead: int
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos):
        attn = MultiHeadAttention(self.nhead, dtype=self.dtype, name="self_attn")
        norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        if self.pre_norm:
            t = norm(tgt)
            q = k = t + query_pos
            return tgt + attn(q, k, t)
        q = k = tgt + query_pos
        return norm(tgt + attn(q, k, tgt))


class CrossAttentionLayer(nn.Module):
    d_model: int
    nhead: int
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, attn_bias, pos, query_pos):
        attn = MultiHeadAttention(self.nhead, dtype=self.dtype, name="multihead_attn")
        norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        if self.pre_norm:
            t = norm(tgt)
            return tgt + attn(t + query_pos, memory + pos, memory, attn_bias)
        return norm(tgt + attn(tgt + query_pos, memory + pos, memory, attn_bias))


class FFNLayer(nn.Module):
    d_model: int
    dim_feedforward: int
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt):
        lin1 = nn.Dense(self.dim_feedforward, kernel_init=xavier_uniform,
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name="linear1")
        lin2 = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name="linear2")
        norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        if self.pre_norm:
            return tgt + lin2(nn.relu(lin1(norm(tgt))))
        return norm(tgt + lin2(nn.relu(lin1(tgt))))


class MultiScaleMaskedTransformerDecoder(nn.Module):
    """Masked-attention decoder over 3 feature scales.

    __call__(x, mask_features):
      x: list of 3 features [(B,H32,W32,C), (B,H16,W16,C), (B,H8,W8,C)]
      mask_features: (B, H4, W4, mask_dim)
    returns dict:
      pred_logits: (B, Q, K+1)          — final layer
      pred_masks:  (B, Q, H4, W4)
      aux_logits:  (Ldec, B, Q, K+1)    — deep supervision (layers 0..L-1)
      aux_masks:   (Ldec, B, Q, H4, W4)
    """

    cfg: DecoderConfig
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Sequence[jnp.ndarray], mask_features: jnp.ndarray):
        cfg = self.cfg
        C = cfg.hidden_dim
        nL = cfg.num_feature_levels
        assert len(x) == nL
        B = x[0].shape[0]
        heads = cfg.nheads

        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (cfg.num_queries, C)
        )
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (cfg.num_queries, C)
        )
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (nL, C)
        )

        srcs, poss, sizes = [], [], []
        for i in range(nL):
            B_, H, W, Ci = x[i].shape
            sizes.append((H, W))
            feat = x[i].astype(self.dtype)
            if Ci != C or cfg.enforce_input_project:
                feat = nn.Conv(C, (1, 1), kernel_init=xavier_uniform,
                               bias_init=nn.initializers.zeros,
                               dtype=self.dtype, name=f"input_proj_{i}")(feat)
            srcs.append(feat.reshape(B, H * W, C) + level_embed[i].astype(self.dtype))
            pe = sine_position_embedding_2d(H, W, C // 2, dtype=self.dtype)
            poss.append(pe.reshape(1, H * W, C))

        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")
        class_embed = nn.Dense(
            self.num_classes + 1, kernel_init=xavier_uniform,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="class_embed",
        )
        mask_embed_mlp = MLP(C, cfg.mask_dim, 3, dtype=self.dtype, name="mask_embed")

        mf = mask_features.astype(self.dtype)
        # mask features pre-resized to each attention resolution: the
        # attention mask is resize(einsum(membed, mf)) in the reference
        # (:446-450), and bilinear resize commutes with the channel
        # contraction (both linear, disjoint axes), so einsum(membed,
        # resize(mf)) is the same mask — computed against a (h*w, C) table
        # resized ONCE instead of resizing a (B, Q, H4, W4) tensor at every
        # prediction head (~4 GB of resize traffic per forward at 800^2)
        mf_lvl = [resize_bilinear(mf, h, w) for (h, w) in sizes]

        def prediction_heads(output, lvl):
            dec = decoder_norm(output)
            logits = class_embed(dec)
            membed = mask_embed_mlp(dec)
            masks = jnp.einsum("bqc,bhwc->bqhw", membed, mf)
            # attention bias for the next layer: block where interpolated
            # sigmoid < 0.5 (reference :446-450), detached; degenerate
            # all-blocked rows are fully unblocked (reference :400).
            am = jnp.einsum("bqc,bhwc->bqhw", membed, mf_lvl[lvl])
            blocked = jax.nn.sigmoid(am.astype(jnp.float32)) < 0.5
            blocked = blocked.reshape(B, cfg.num_queries, -1)
            all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
            blocked = jnp.where(all_blocked, False, blocked)
            bias = jnp.where(blocked, NEG_INF, 0.0)[:, None]  # (B,1,Q,HW)
            bias = jax.lax.stop_gradient(bias)
            return logits, masks, bias

        output = jnp.broadcast_to(query_feat[None], (B, cfg.num_queries, C)).astype(self.dtype)
        qpos = jnp.broadcast_to(query_embed[None], (B, cfg.num_queries, C)).astype(self.dtype)

        all_logits, all_masks = [], []
        logits, masks, bias = prediction_heads(output, 0)
        all_logits.append(logits)
        all_masks.append(masks)

        for i in range(cfg.dec_layers):
            li = i % nL
            output = CrossAttentionLayer(
                C, heads, cfg.pre_norm, dtype=self.dtype,
                name=f"cross_attn_{i}",
            )(output, srcs[li], bias, poss[li], qpos)
            output = SelfAttentionLayer(
                C, heads, cfg.pre_norm, dtype=self.dtype, name=f"self_attn_{i}",
            )(output, qpos)
            output = FFNLayer(
                C, cfg.dim_feedforward, cfg.pre_norm, dtype=self.dtype,
                name=f"ffn_{i}",
            )(output)
            logits, masks, bias = prediction_heads(output, (i + 1) % nL)
            all_logits.append(logits)
            all_masks.append(masks)

        return {
            "pred_logits": all_logits[-1].astype(jnp.float32),
            "pred_masks": all_masks[-1].astype(jnp.float32),
            "aux_logits": jnp.stack(all_logits[:-1]).astype(jnp.float32),
            "aux_masks": jnp.stack(all_masks[:-1]).astype(jnp.float32),
        }
