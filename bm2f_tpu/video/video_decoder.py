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
from bm2f_tpu.models.layers import xavier_uniform
from bm2f_tpu.models.position_encoding import (
    sine_position_embedding_3d,
    sine_position_embedding_3d_masked,
)
from bm2f_tpu.models.transformer_decoder import (
    NEG_INF,
    CrossAttentionLayer,
    FFNLayer,
    SelfAttentionLayer,
    _DecoderRound,
    _LayerNormParams,
    _MLPParams,
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

        # shared head params as explicit holders (values closed over by the
        # rounds-scan body; checkpoint paths unchanged — see the image
        # decoder, models/transformer_decoder.py)
        dn_scale, dn_bias = _LayerNormParams(C, name="decoder_norm")()
        me_params = _MLPParams(
            ((C, C), (C, C), (C, cfg.mask_dim)), name="mask_embed"
        )()
        class_embed = nn.Dense(
            self.num_classes + 1, kernel_init=xavier_uniform,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="class_embed",
        )
        _ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

        def decoder_norm(x):
            return _ln.apply({"params": {"scale": dn_scale, "bias": dn_bias}}, x)

        def mask_embed_mlp(x):
            for i, (k, b) in enumerate(me_params):
                x = nn.Dense(k.shape[1], dtype=self.dtype).apply(
                    {"params": {"kernel": k, "bias": b}}, x
                )
                if i < len(me_params) - 1:
                    x = nn.relu(x)
            return x

        mf = mask_features.astype(self.dtype)
        # per-level pre-resized mask features: bilinear resize commutes with
        # the channel contraction (see the image decoder), so the attention
        # mask comes from one small einsum instead of resizing the
        # (B, Q, T, h4, w4) mask tensor at every prediction head
        mf_lvl = [resize_bilinear(mf, h, w) for (h, w) in sizes]

        def head_fn(output, lvl):
            """decoder_norm -> mask_embed -> next-layer attention bias;
            returns (dec, membed, bias). Per-layer logits/masks are computed
            POST-scan from the stacked dec/membed (see the image decoder)."""
            attn_size = sizes[lvl]
            dec = decoder_norm(output)
            membed = mask_embed_mlp(dec)
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
            return dec, membed, bias

        output = jnp.broadcast_to(
            query_feat[None], (B, cfg.num_queries, C)
        ).astype(self.dtype)
        qpos = jnp.broadcast_to(
            query_embed[None], (B, cfg.num_queries, C)
        ).astype(self.dtype)

        dec0, membed0, bias = head_fn(output, 0)

        if cfg.dec_layers % nL == 0:
            # rounds-scan over dec_layers/nL structurally identical rounds
            # (shared _DecoderRound with the image decoder)
            n_rounds = cfg.dec_layers // nL
            round_mod = _DecoderRound(
                d_model=C, nhead=cfg.nheads,
                dim_feedforward=cfg.dim_feedforward,
                pre_norm=cfg.pre_norm, nL=nL, dtype=self.dtype,
                name="rounds",
            )

            def body(mod, carry, _):
                return mod(carry[0], carry[1], srcs, poss, qpos, head_fn)

            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=n_rounds,
            )
            (output, bias), (decs, membeds) = scan(
                round_mod, (output, bias), None
            )
            decs = decs.reshape(cfg.dec_layers, B, cfg.num_queries, C)
            membeds = membeds.reshape(
                cfg.dec_layers, B, cfg.num_queries, cfg.mask_dim
            )
        else:  # non-multiple layer counts: plain unrolled loop
            decs_l, membeds_l = [], []
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
                dec, membed, bias = head_fn(output, (i + 1) % nL)
                decs_l.append(dec)
                membeds_l.append(membed)
            decs = jnp.stack(decs_l)
            membeds = jnp.stack(membeds_l)

        decs = jnp.concatenate([dec0[None], decs], axis=0)
        membeds = jnp.concatenate([membed0[None], membeds], axis=0)
        all_logits = class_embed(decs)  # (L+1, B, Q, K+1)
        all_masks = jnp.einsum("lbqc,bthwc->lbqthw", membeds, mf)

        return {
            "pred_logits": all_logits[-1].astype(jnp.float32),
            "pred_masks": all_masks[-1].astype(jnp.float32),
            "aux_logits": all_logits[:-1].astype(jnp.float32),
            "aux_masks": all_masks[:-1].astype(jnp.float32),
        }
