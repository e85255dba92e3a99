"""MaskFormer-v1 components kept for completeness (reference:
maskformer_transformer_decoder.py:31 StandardTransformerDecoder,
fpn.py:205 TransformerEncoderPixelDecoder, per_pixel_baseline.py:18/:127
PerPixelBaselineHead / PerPixelBaselinePlusHead — ablation architectures of
the original MaskFormer paper)."""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from bm2f_tpu.config import DecoderConfig, PixelDecoderConfig
from bm2f_tpu.models.layers import MLP, c2_xavier_init, xavier_uniform
from bm2f_tpu.models.position_encoding import sine_position_embedding_2d
from bm2f_tpu.models.transformer import TransformerDecoder, TransformerEncoder
from bm2f_tpu.ops.interpolate import resize_nearest


class StandardTransformerDecoder(nn.Module):
    """DETR-style decoder head (reference:
    maskformer_transformer_decoder.py:31-188): queries attend to ONE feature
    level (res5); masks from an MLP mask embedding x stride-4 features."""

    cfg: DecoderConfig
    num_classes: int
    dtype: Any = jnp.float32
    # False for PerPixelBaselinePlus: the decoder emits only per-query mask
    # logits (reference StandardTransformerDecoder(mask_classification=False))
    mask_classification: bool = True
    num_queries: int = 0  # override cfg.num_queries when > 0 (baseline+)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask_features: jnp.ndarray):
        """x: (B, H, W, C) transformer-in feature (res5 or encoder output);
        mask_features: (B, H4, W4, mask_dim)."""
        cfg = self.cfg
        C = cfg.hidden_dim
        Q = self.num_queries or cfg.num_queries
        B, H, W, Ci = x.shape
        if Ci != C or cfg.enforce_input_project:
            x = nn.Conv(C, (1, 1), kernel_init=c2_xavier_init,
                        dtype=self.dtype, name="input_proj")(x)
        src = x.reshape(B, H * W, C).astype(self.dtype)
        pos = sine_position_embedding_2d(H, W, C // 2, dtype=self.dtype).reshape(
            1, H * W, C
        )
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (Q, C)
        )
        qpos = jnp.broadcast_to(query_embed[None], (B, Q, C)).astype(self.dtype)
        tgt = jnp.zeros((B, Q, C), self.dtype)

        hs = TransformerDecoder(
            cfg.dec_layers, C, cfg.nheads, cfg.dim_feedforward, cfg.pre_norm,
            dtype=self.dtype, name="decoder",
        )(tgt, src, pos, qpos)  # (L, B, Q, C)

        membed = MLP(C, cfg.mask_dim, 3, dtype=self.dtype, name="mask_embed")(hs)
        masks = jnp.einsum("lbqc,bhwc->lbqhw", membed, mask_features.astype(self.dtype))
        out = {
            "pred_masks": masks[-1].astype(jnp.float32),
            "aux_masks": masks[:-1].astype(jnp.float32),
        }
        if self.mask_classification:
            logits = nn.Dense(self.num_classes + 1, kernel_init=torch_cls_init(),
                              dtype=self.dtype, name="class_embed")(hs)
            out["pred_logits"] = logits[-1].astype(jnp.float32)
            out["aux_logits"] = logits[:-1].astype(jnp.float32)
        return out


def torch_cls_init():
    return xavier_uniform


class TransformerEncoderPixelDecoder(nn.Module):
    """FPN pixel decoder with a transformer encoder at res5 (reference:
    fpn.py:205-312): 6-layer vanilla self-attention over res5 tokens, then
    the standard FPN top-down path."""

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

        # transformer on the lowest-resolution feature
        top = features[names[-1]].astype(self.dtype)
        B, H, W, _ = top.shape
        tin = nn.Conv(conv_dim, (1, 1), kernel_init=c2_xavier_init,
                      dtype=self.dtype, name="input_proj")(top)
        pos = sine_position_embedding_2d(H, W, conv_dim // 2, dtype=self.dtype)
        enc = TransformerEncoder(
            cfg.transformer_enc_layers or 6, conv_dim, cfg.transformer_nheads,
            cfg.transformer_dim_feedforward, False, dtype=self.dtype,
            name="transformer",
        )(tin.reshape(B, H * W, conv_dim), pos.reshape(1, H * W, conv_dim))
        y = enc.reshape(B, H, W, conv_dim)
        transformer_feature = y

        out = []
        y0 = nn.Conv(conv_dim, (3, 3), padding=[(1, 1), (1, 1)],
                     use_bias=use_bias, kernel_init=c2_xavier_init,
                     dtype=self.dtype, name="layer_0_conv")(y)
        y0 = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                          name="layer_0_norm")(y0)
        y = nn.relu(y0)
        out.append(y)
        for idx, f in enumerate(reversed(names[:-1]), start=1):
            x = features[f].astype(self.dtype)
            lat = nn.Conv(conv_dim, (1, 1), use_bias=use_bias,
                          kernel_init=c2_xavier_init, dtype=self.dtype,
                          name=f"adapter_{idx}_conv")(x)
            lat = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                               name=f"adapter_{idx}_norm")(lat)
            y = lat + resize_nearest(y, lat.shape[1], lat.shape[2])
            y = nn.Conv(conv_dim, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=use_bias, kernel_init=c2_xavier_init,
                        dtype=self.dtype, name=f"layer_{idx}_conv")(y)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name=f"layer_{idx}_norm")(y)
            y = nn.relu(y)
            out.append(y)

        mask_features = nn.Conv(
            cfg.mask_dim, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=c2_xavier_init, dtype=self.dtype, name="mask_features",
        )(out[-1])
        return mask_features, transformer_feature, out[:3]


class PerPixelBaselineHead(nn.Module):
    """Per-pixel classification baseline (reference:
    per_pixel_baseline.py:18-126): pixel decoder -> 1x1 classifier, plain
    per-pixel CE training (MaskFormer paper's 'PerPixelBaseline')."""

    cfg: PixelDecoderConfig
    num_classes: int
    in_channels: Dict[str, int]
    in_strides: Dict[str, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        from bm2f_tpu.models.pixel_decoder import BasePixelDecoder

        mask_features, _, _ = BasePixelDecoder(
            self.cfg, self.in_channels, self.in_strides, dtype=self.dtype,
            name="pixel_decoder",
        )(features)
        logits = nn.Conv(
            self.num_classes, (1, 1), kernel_init=c2_xavier_init,
            dtype=self.dtype, name="predictor",
        )(mask_features)
        return logits.astype(jnp.float32)  # (B, H4, W4, K)


class PerPixelBaselinePlusHead(nn.Module):
    """Per-pixel baseline + transformer (reference:
    per_pixel_baseline.py:127-243 PerPixelBaselinePlusHead): a
    TransformerEncoderPixelDecoder feeds a classification-free
    StandardTransformerDecoder whose num_queries == num_classes, so each
    query's mask logits ARE that class's per-pixel scores; every decoder
    layer's masks come back for deep supervision."""

    cfg: PixelDecoderConfig
    dec_cfg: DecoderConfig
    num_classes: int
    in_channels: Dict[str, int]
    in_strides: Dict[str, int]
    dtype: Any = jnp.float32
    deep_supervision: bool = True

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        mask_features, transformer_feature, _ = TransformerEncoderPixelDecoder(
            self.cfg, self.in_channels, self.in_strides, dtype=self.dtype,
            name="pixel_decoder",
        )(features)
        out = StandardTransformerDecoder(
            self.dec_cfg, self.num_classes, dtype=self.dtype,
            mask_classification=False, num_queries=self.num_classes,
            name="predictor",
        )(transformer_feature, mask_features)
        # (B, K, H4, W4) -> (B, H4, W4, K) per-pixel class logits
        logits = out["pred_masks"].transpose(0, 2, 3, 1)
        if not self.deep_supervision:
            return logits
        aux = out["aux_masks"].transpose(0, 1, 3, 4, 2)  # (L-1, B, H4, W4, K)
        return logits, aux
