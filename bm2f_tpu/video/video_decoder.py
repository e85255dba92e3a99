"""Video masked transformer decoder (reference:
mask2former_video/modeling/transformer_decoder/video_mask2former_transformer_decoder.py:380-460):
the image decoder with clip-wide memory — queries cross-attend to T*H*W
tokens per level, masks come out as (B, Q, T, h, w) via einsum bqc,btchw,
and the attention mask flattens T into the key axis. The temporal sine PE
is added to the spatial one (PositionEmbeddingSine3D)."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from bm2f_tpu.config import DecoderConfig
from bm2f_tpu.models.layers import MLP, xavier_uniform
from bm2f_tpu.models.position_encoding import (
    sine_position_embedding_3d,
    sine_position_embedding_3d_masked,
)
from bm2f_tpu.models.transformer_decoder import (
    NEG_INF,
    CrossAttentionLayer,
    FFNLayer,
    SelfAttentionLayer,
)
from bm2f_tpu.ops import resize_bilinear


class VideoMultiScaleMaskedTransformerDecoder(nn.Module):
    """__call__(x, mask_features):
      x: list of 3 features (B, T, H, W, C) (stride 32, 16, 8)
      mask_features: (B, T, h4, w4, mask_dim)
    returns pred_logits (B, Q, K+1), pred_masks (B, Q, T, h4, w4) + stacked
    aux predictions."""

    cfg: DecoderConfig
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Sequence[jnp.ndarray], mask_features: jnp.ndarray,
                 frame_valid=None):
        """frame_valid: optional (B, T) bool — False frames are padding
        (static-shape clip buckets in eval, see eval_video.py); their
        T*H*W keys are masked out of every cross-attention so padded
        frames cannot influence the track predictions."""
        cfg = self.cfg
        C = cfg.hidden_dim
        nL = cfg.num_feature_levels
        B, T = x[0].shape[0], x[0].shape[1]

        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (cfg.num_queries, C)
        )
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (cfg.num_queries, C)
        )
        level_embed = self.param("level_embed", nn.initializers.normal(1.0), (nL, C))

        srcs, poss, sizes = [], [], []
        for i in range(nL):
            _, _, H, W, Ci = x[i].shape
            sizes.append((H, W))
            feat = x[i].astype(self.dtype)
            if Ci != C or cfg.enforce_input_project:
                feat = nn.Conv(C, (1, 1), kernel_init=xavier_uniform,
                               bias_init=nn.initializers.zeros,
                               dtype=self.dtype, name=f"input_proj_{i}")(feat)
            srcs.append(
                feat.reshape(B, T * H * W, C) + level_embed[i].astype(self.dtype)
            )
            if frame_valid is None:
                pe = sine_position_embedding_3d(T, H, W, C // 2, dtype=self.dtype)
                poss.append(pe.reshape(1, T * H * W, C))
            else:
                # temporal normalization over REAL frames only, so bucket
                # padding leaves valid frames' PE unchanged
                pe = sine_position_embedding_3d_masked(
                    frame_valid, H, W, C // 2, dtype=self.dtype)
                poss.append(pe.reshape(B, T * H * W, C))

        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")
        class_embed = nn.Dense(
            self.num_classes + 1, kernel_init=xavier_uniform,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="class_embed",
        )
        mask_embed_mlp = MLP(C, cfg.mask_dim, 3, dtype=self.dtype, name="mask_embed")
        mf = mask_features.astype(self.dtype)
        # per-level pre-resized mask features: bilinear resize commutes with
        # the channel contraction (see the image decoder), so the attention
        # mask comes from one small einsum instead of resizing the
        # (B, Q, T, h4, w4) mask tensor at every prediction head
        mf_lvl = [resize_bilinear(mf, h, w) for (h, w) in sizes]

        def prediction_heads(output, attn_size, lvl):
            dec = decoder_norm(output)
            logits = class_embed(dec)
            membed = mask_embed_mlp(dec)
            masks = jnp.einsum("bqc,bthwc->bqthw", membed, mf)
            am = jnp.einsum("bqc,bthwc->bqthw", membed, mf_lvl[lvl]).reshape(
                B, cfg.num_queries, T * attn_size[0] * attn_size[1])
            blocked = jax.nn.sigmoid(am.astype(jnp.float32)) < 0.5
            if frame_valid is not None:
                inval = jnp.repeat(
                    ~frame_valid, attn_size[0] * attn_size[1], axis=1
                )[:, None]  # (B, 1, T*H*W)
                blocked = blocked | inval
            all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
            if frame_valid is not None:
                # degenerate all-blocked queries fall back to attending all
                # VALID keys, never the padding
                blocked = jnp.where(all_blocked, inval, blocked)
            else:
                blocked = jnp.where(all_blocked, False, blocked)
            bias = jax.lax.stop_gradient(
                jnp.where(blocked, NEG_INF, 0.0)[:, None]
            )
            return logits, masks, bias

        output = jnp.broadcast_to(
            query_feat[None], (B, cfg.num_queries, C)
        ).astype(self.dtype)
        qpos = jnp.broadcast_to(
            query_embed[None], (B, cfg.num_queries, C)
        ).astype(self.dtype)

        all_logits, all_masks = [], []
        logits, masks, bias = prediction_heads(output, sizes[0], 0)
        all_logits.append(logits)
        all_masks.append(masks)

        for i in range(cfg.dec_layers):
            li = i % nL
            output = CrossAttentionLayer(
                C, cfg.nheads, cfg.pre_norm, dtype=self.dtype,
                name=f"cross_attn_{i}",
            )(output, srcs[li], bias, poss[li], qpos)
            output = SelfAttentionLayer(
                C, cfg.nheads, cfg.pre_norm, dtype=self.dtype,
                name=f"self_attn_{i}",
            )(output, qpos)
            output = FFNLayer(
                C, cfg.dim_feedforward, cfg.pre_norm, dtype=self.dtype,
                name=f"ffn_{i}",
            )(output)
            logits, masks, bias = prediction_heads(
                output, sizes[(i + 1) % nL], (i + 1) % nL)
            all_logits.append(logits)
            all_masks.append(masks)

        return {
            "pred_logits": all_logits[-1].astype(jnp.float32),
            "pred_masks": all_masks[-1].astype(jnp.float32),
            "aux_logits": jnp.stack(all_logits[:-1]).astype(jnp.float32),
            "aux_masks": jnp.stack(all_masks[:-1]).astype(jnp.float32),
        }
