"""Test-time augmentation (reference: mask2former/test_time_augmentation.py:21
SemanticSegmentorWithTTA — multi-scale + horizontal-flip ensemble averaging
semantic probabilities; used for the zoo's "ms+flip" mIoU numbers)."""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from bm2f_tpu.models.maskformer import semantic_inference
from bm2f_tpu.ops import resize_bilinear


def semantic_tta(
    predict_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    image: jnp.ndarray,  # (H, W, 3) raw
    scales: Sequence[float] = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75),
    flip: bool = True,
) -> jnp.ndarray:
    """Returns (H, W, K) averaged semantic probabilities.

    predict_fn: (1, h, w, 3) -> (pred_logits (1,Q,K+1), pred_masks (1,Q,h4,w4))
    — a jitted model forward; one compilation per distinct scale.
    """
    H, W = image.shape[:2]
    acc = None
    count = 0
    for s in scales:
        h, w = int(round(H * s / 32)) * 32, int(round(W * s / 32)) * 32
        scaled = resize_bilinear(image[None], h, w)
        variants = [scaled]
        if flip:
            variants.append(scaled[:, :, ::-1])
        for vi, v in enumerate(variants):
            logits, masks = predict_fn(v)
            sem = semantic_inference(logits[0], masks[0])  # (h4, w4, K)
            if vi == 1:
                sem = sem[:, ::-1]
            sem = resize_bilinear(sem[None], H, W)[0]
            acc = sem if acc is None else acc + sem
            count += 1
    return acc / count
