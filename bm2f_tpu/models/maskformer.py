"""MaskFormer meta-architecture (reference: mask2former/maskformer_model.py:55-623)
rebuilt TPU-first.

The reference's forward mixes preprocessing, the network, loss, and per-image
Python-loop inference. Here the network is a pure Flax module over
static-shape NHWC batches; preprocessing is `normalize_images`; losses live
in bm2f_tpu.losses; and the three inference modes are standalone jit-able
functions with fixed output shapes (validity masks instead of filtering).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bm2f_tpu.config import Config, ModelConfig
from bm2f_tpu.models.pixel_decoder import BasePixelDecoder, MSDeformAttnPixelDecoder
from bm2f_tpu.models.resnet import (
    RESNET_FEATURE_CHANNELS,
    RESNET_FEATURE_STRIDES,
    ResNet,
)
from bm2f_tpu.models.transformer_decoder import MultiScaleMaskedTransformerDecoder
from bm2f_tpu.ops import resize_bilinear


def normalize_images(images: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """(B, H, W, 3) uint8/float RGB -> normalized float32."""
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
    std = jnp.asarray(cfg.pixel_std, jnp.float32)
    return (images.astype(jnp.float32) - mean) / std


class MaskFormerHead(nn.Module):
    """Pixel decoder + transformer predictor (reference:
    modeling/meta_arch/mask_former_head.py:115-132)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        pd_dtype = jnp.float32 if self.cfg.pixel_decoder_f32 else self.dtype
        if self.cfg.backbone.name == "resnet":
            in_channels = RESNET_FEATURE_CHANNELS
            in_strides = RESNET_FEATURE_STRIDES
        else:
            ed = self.cfg.backbone.swin.embed_dim
            in_channels = {"res2": ed, "res3": ed * 2, "res4": ed * 4, "res5": ed * 8}
            in_strides = RESNET_FEATURE_STRIDES
        # pixel-decoder dispatch (reference: mask_former_head.py from_config,
        # SEM_SEG_HEAD.PIXEL_DECODER_NAME): msdeform | transformer_fpn | fpn
        transformer_feature = None
        if self.cfg.pixel_decoder.name == "msdeform":
            mask_features, _, ms_feats = MSDeformAttnPixelDecoder(
                self.cfg.pixel_decoder, in_channels, in_strides,
                dtype=pd_dtype, name="pixel_decoder",
            )(features)
        elif self.cfg.pixel_decoder.name == "transformer_fpn":
            from bm2f_tpu.models.maskformer_v1 import TransformerEncoderPixelDecoder

            mask_features, transformer_feature, ms_feats = (
                TransformerEncoderPixelDecoder(
                    self.cfg.pixel_decoder, in_channels, in_strides,
                    dtype=pd_dtype, name="pixel_decoder",
                )(features))
        else:
            mask_features, _, ms_feats = BasePixelDecoder(
                self.cfg.pixel_decoder, in_channels, in_strides,
                dtype=pd_dtype, name="pixel_decoder",
            )(features)
        # predictor dispatch (MASK_FORMER.TRANSFORMER_DECODER_NAME):
        # "standard" = MaskFormer-v1 DETR decoder over one feature level
        # (the transformer-encoder output when available, else res5)
        if self.cfg.decoder.name == "standard":
            from bm2f_tpu.models.maskformer_v1 import StandardTransformerDecoder

            x = (transformer_feature if transformer_feature is not None
                 else features["res5"])
            out = StandardTransformerDecoder(
                self.cfg.decoder, self.cfg.num_classes, dtype=self.dtype,
                name="predictor",
            )(x.astype(self.dtype), mask_features)
        else:
            out = MultiScaleMaskedTransformerDecoder(
                self.cfg.decoder, self.cfg.num_classes, dtype=self.dtype,
                name="predictor",
            )([f.astype(self.dtype) for f in ms_feats], mask_features)
        out["mask_features"] = mask_features
        return out


class MaskFormer(nn.Module):
    """Backbone + head. Input: normalized (B, H, W, 3) with H, W divisible by
    `cfg.size_divisibility` (padding handled by the input pipeline)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if self.cfg.backbone.name == "resnet":
            backbone = ResNet(
                depth=self.cfg.backbone.resnet.depth,
                out_features=self.cfg.backbone.resnet.out_features,
                dtype=self.dtype,
                name="backbone",
            )
        elif self.cfg.backbone.name == "swin":
            from bm2f_tpu.models.swin import SwinTransformer

            backbone = SwinTransformer.from_config(
                self.cfg.backbone.swin, dtype=self.dtype, name="backbone"
            )
        else:
            raise ValueError(self.cfg.backbone.name)
        features = backbone(images.astype(self.dtype))
        return MaskFormerHead(self.cfg, dtype=self.dtype, name="sem_seg_head")(features)


def build_model(cfg: Config) -> MaskFormer:
    dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    return MaskFormer(cfg.model, dtype=dtype)


# ---------------------------------------------------------------------------
# Inference (jit-able, static shapes; reference: maskformer_model.py:509-623)
# ---------------------------------------------------------------------------


def semantic_inference(mask_cls: jnp.ndarray, mask_pred: jnp.ndarray) -> jnp.ndarray:
    """(..., Q, K+1), (..., Q, H, W) -> (..., H, W, K) semantic probabilities
    (reference :509-513: softmax x sigmoid einsum)."""
    probs = jax.nn.softmax(mask_cls, axis=-1)[..., :-1]
    masks = jax.nn.sigmoid(mask_pred)
    return jnp.einsum("...qk,...qhw->...hwk", probs, masks)


def instance_inference(
    mask_cls: jnp.ndarray,
    mask_pred: jnp.ndarray,
    *,
    num_classes: int,
    topk: int = 100,
    thing_mask: Optional[Tuple[bool, ...]] = None,
) -> Dict[str, jnp.ndarray]:
    """Top-k over the flattened Q x K score matrix (reference :573-623).

    mask_cls: (Q, K+1); mask_pred: (Q, H, W) logits.
    Returns dict with static shapes: scores (topk,), labels (topk,),
    masks (topk, H, W) bool, valid (topk,) bool.
    """
    Q = mask_cls.shape[0]
    scores_all = jax.nn.softmax(mask_cls, axis=-1)[:, :-1]  # (Q, K)
    flat = scores_all.reshape(-1)
    scores, idx = jax.lax.top_k(flat, min(topk, flat.shape[0]))
    labels = idx % num_classes
    qidx = idx // num_classes
    masks_logits = mask_pred[qidx]  # (topk, H, W)
    masks = masks_logits > 0

    valid = jnp.ones_like(scores, dtype=bool)
    if thing_mask is not None:
        tm = jnp.asarray(thing_mask)
        valid = valid & tm[labels]

    # mask-probability rescoring (reference :621)
    probs = jax.nn.sigmoid(masks_logits)
    mf = masks.astype(probs.dtype)
    mask_scores = jnp.sum(probs * mf, axis=(1, 2)) / (jnp.sum(mf, axis=(1, 2)) + 1e-6)
    return {
        "scores": scores * mask_scores,
        "labels": labels,
        "masks": masks,
        "valid": valid,
    }


def instance_topk_select(
    mask_cls: jnp.ndarray,
    mask_pred: jnp.ndarray,
    *,
    num_classes: int,
    topk: int = 100,
):
    """Static-shape top-k selection only (classification scores + selected
    mask LOGITS at prediction resolution). The resolution-dependent part of
    instance inference — upsampling to the original image size, binarizing
    at 0, and mask-probability rescoring (reference :621) — runs on the host
    in eval (see eval.py), avoiding one XLA compile per distinct image size.
    """
    scores_all = jax.nn.softmax(mask_cls, axis=-1)[:, :-1]
    flat = scores_all.reshape(-1)
    scores, idx = jax.lax.top_k(flat, min(topk, flat.shape[0]))
    labels = idx % num_classes
    qidx = idx // num_classes
    return scores, labels, mask_pred[qidx]


def panoptic_inference(
    mask_cls: jnp.ndarray,
    mask_pred: jnp.ndarray,
    *,
    num_classes: int,
    thing_mask: Tuple[bool, ...],
    object_mask_threshold: float = 0.8,
    overlap_threshold: float = 0.8,
) -> Dict[str, jnp.ndarray]:
    """Vectorized panoptic fusion (reference :515-571).

    The reference loops queries on the host mutating the canvas; here every
    step is a masked reduction over a static Q so the whole thing jits:
      1. keep queries confidently classified as a real class;
      2. pixel owner = argmax over kept queries of score-weighted sigmoid;
      3. drop queries whose claimed area shrank below overlap_threshold;
      4. merge stuff queries of the same class into the earliest query.

    Returns:
      panoptic_quidx: (H, W) int32 — owning query index, or -1 for void;
      valid: (Q,) bool — query produced a segment;
      classes: (Q,) int32; isthing: (Q,) bool;
      canonical: (Q,) int32 — index of the query this one merged into.
    Host-side relabeling to contiguous segment ids is
    `bm2f_tpu.evaluation.panoptic_post.relabel_panoptic`.
    """
    Q, K1 = mask_cls.shape
    probs = jax.nn.softmax(mask_cls, axis=-1)
    scores = probs.max(-1)
    labels = probs.argmax(-1)
    masks = jax.nn.sigmoid(mask_pred)  # (Q, H, W)

    keep = (labels != num_classes) & (scores > object_mask_threshold)

    prob_masks = scores[:, None, None] * masks
    # argmax over kept queries only
    neg = jnp.full_like(prob_masks, -1.0)
    owner = jnp.argmax(jnp.where(keep[:, None, None], prob_masks, neg), axis=0)
    any_kept = jnp.any(keep)

    qids = jnp.arange(Q)
    owner_onehot = owner[None] == qids[:, None, None]  # (Q, H, W)
    binary = masks >= 0.5
    mask_area = jnp.sum(owner_onehot, axis=(1, 2))
    original_area = jnp.sum(binary, axis=(1, 2))
    final_mask = owner_onehot & binary
    final_area = jnp.sum(final_mask, axis=(1, 2))

    valid = (
        keep
        & (mask_area > 0)
        & (original_area > 0)
        & (final_area > 0)
        & (mask_area / jnp.maximum(original_area, 1) >= overlap_threshold)
    )

    tm = jnp.asarray(thing_mask)
    isthing = tm[jnp.clip(labels, 0, num_classes - 1)] & (labels != num_classes)

    # stuff merging: canonical = smallest valid query index of the same class
    same_class = (labels[:, None] == labels[None, :]) & valid[None, :]
    first_same = jnp.argmax(same_class, axis=1)  # argmax returns first True
    has_same = jnp.any(same_class, axis=1)
    canonical = jnp.where(isthing | ~has_same, qids, first_same)

    owner_valid = valid[owner] & any_kept
    # the owning query's mask at each pixel: owner_onehot holds by
    # construction, so only the >=0.5 binary condition remains
    owner_binary = jnp.take_along_axis(binary, owner[None], axis=0)[0]
    pan = jnp.where(owner_valid & owner_binary, canonical[owner], -1)

    return {
        "panoptic_quidx": pan.astype(jnp.int32),
        "valid": valid,
        "classes": labels.astype(jnp.int32),
        "isthing": isthing,
        "canonical": canonical.astype(jnp.int32),
    }


def sem_seg_postprocess(
    logits_hw: jnp.ndarray, pad_hw: Tuple[int, int], img_hw: Tuple[int, int],
    out_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Crop the valid region out of the padded prediction and resize to the
    original image size (reference: detectron2 sem_seg_postprocess, used at
    maskformer_model.py:355). logits_hw: (Q_or_C, Hpad, Wpad)."""
    x = logits_hw[:, : img_hw[0], : img_hw[1]]
    x = x.transpose(1, 2, 0)  # HWC
    x = resize_bilinear(x[None], out_hw[0], out_hw[1])[0]
    return x.transpose(2, 0, 1)
