"""Video MaskFormer meta-architecture (reference:
mask2former_video/video_maskformer_model_WithColor.py — the active
implementation per mask2former_video/__init__.py:13-14).

B clips x T frames are flattened to (B*T) images through the backbone and
pixel decoder in ONE pass (reference :316-324), then the video decoder
attends over the whole clip. `inference_video` keeps the top-k (Q x K)
scores as tracks and thresholds masks at 0 (reference :651-694)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bm2f_tpu.config import Config, ModelConfig
from bm2f_tpu.models.maskformer import normalize_images
from bm2f_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
from bm2f_tpu.models.resnet import (
    RESNET_FEATURE_CHANNELS,
    RESNET_FEATURE_STRIDES,
    ResNet,
)
from bm2f_tpu.video.video_decoder import VideoMultiScaleMaskedTransformerDecoder


class VideoMaskFormer(nn.Module):
    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, frame_valid=None) -> Dict[str, jnp.ndarray]:
        """images: (B, T, H, W, 3) normalized; frame_valid: optional (B, T)
        bool marking padded frames (see VideoMultiScaleMaskedTransformerDecoder)."""
        B, T, H, W, _ = images.shape
        flat = images.reshape(B * T, H, W, 3)

        if self.cfg.backbone.name == "resnet":
            backbone = ResNet(
                depth=self.cfg.backbone.resnet.depth, dtype=self.dtype,
                name="backbone",
            )
            in_channels = RESNET_FEATURE_CHANNELS
        else:
            from bm2f_tpu.models.swin import SwinTransformer

            backbone = SwinTransformer.from_config(
                self.cfg.backbone.swin, dtype=self.dtype, name="backbone"
            )
            ed = self.cfg.backbone.swin.embed_dim
            in_channels = {"res2": ed, "res3": ed * 2, "res4": ed * 4, "res5": ed * 8}

        features = backbone(flat.astype(self.dtype))

        pd_dtype = jnp.float32 if self.cfg.pixel_decoder_f32 else self.dtype
        mask_features, _, ms_feats = MSDeformAttnPixelDecoder(
            self.cfg.pixel_decoder, in_channels, RESNET_FEATURE_STRIDES,
            dtype=pd_dtype, name="sem_seg_head_pixel_decoder",
        )(features)

        # (B*T, H, W, C) -> (B, T, H, W, C)
        ms_feats = [
            f.reshape(B, T, *f.shape[1:]).astype(self.dtype) for f in ms_feats
        ]
        mask_features = mask_features.reshape(B, T, *mask_features.shape[1:])

        out = VideoMultiScaleMaskedTransformerDecoder(
            self.cfg.decoder, self.cfg.num_classes, dtype=self.dtype,
            name="sem_seg_head_predictor",
        )(ms_feats, mask_features, frame_valid)
        out["mask_features"] = mask_features
        return out


def build_video_model(cfg: Config) -> VideoMaskFormer:
    dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    return VideoMaskFormer(cfg.model, dtype=dtype)


def inference_video(
    mask_cls: jnp.ndarray,
    mask_pred: jnp.ndarray,
    *,
    num_classes: int,
    topk: int = 10,
) -> Dict[str, jnp.ndarray]:
    """Track inference (reference: video_maskformer_model.py:651-694):
    top-k over the flattened (Q x K) score matrix, tracks = thresholded
    per-frame masks of the selected queries.

    mask_cls: (Q, K+1); mask_pred: (Q, T, H, W) logits.
    Returns scores (k,), labels (k,), masks (k, T, H, W) bool."""
    scores_all = jax.nn.softmax(mask_cls, axis=-1)[:, :-1]
    flat = scores_all.reshape(-1)
    scores, idx = jax.lax.top_k(flat, topk)
    labels = idx % num_classes
    qidx = idx // num_classes
    masks = mask_pred[qidx] > 0.0
    return {"scores": scores, "labels": labels, "masks": masks}
