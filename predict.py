#!/usr/bin/env python
"""Simple predictor API (reference: predict.py — a cog.BasePredictor serving
Swin-L panoptic with a concatenated 3-task visualization; here a plain class
so any serving wrapper can embed it)."""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


class Predictor:
    """Loads a config + weights once; predict(image) -> dict of task outputs
    and a side-by-side visualization (semantic | instance | panoptic)."""

    def setup(self, config: str = "coco_panoptic_r50", weights: str = ""):
        import jax
        import jax.numpy as jnp

        from bm2f_tpu.config import get_config
        from bm2f_tpu.models import build_model
        from bm2f_tpu.models.maskformer import normalize_images

        self.cfg = get_config(config)
        self.model = build_model(self.cfg)
        dummy = jnp.zeros((1, 64, 64, 3))
        self.variables = self.model.init(
            jax.random.PRNGKey(0), normalize_images(dummy, self.cfg.model)
        )
        if weights.endswith((".pkl", ".pth")):
            from bm2f_tpu.utils.convert_weights import convert_checkpoint

            self.variables = convert_checkpoint(
                weights, backbone=self.cfg.model.backbone.name,
                depth=self.cfg.model.backbone.resnet.depth,
                dec_layers=self.cfg.model.decoder.dec_layers,
            )
        elif weights:
            from bm2f_tpu.train.checkpoint import Checkpointer

            self.variables = Checkpointer(weights).restore_variables()

        self._predict = jax.jit(
            lambda x: self.model.apply(
                self.variables, normalize_images(x, self.cfg.model)
            )
        )

    def predict(self, image: np.ndarray) -> Dict:
        import jax
        import jax.numpy as jnp

        from bm2f_tpu.evaluation.panoptic_post import relabel_panoptic
        from bm2f_tpu.models.maskformer import (
            instance_inference, panoptic_inference, semantic_inference,
        )
        from bm2f_tpu.ops import resize_bilinear
        from demo import color_palette, draw_instances, draw_semantic

        H, W = image.shape[:2]
        d = self.cfg.model.size_divisibility
        ph, pw = (H + d - 1) // d * d, (W + d - 1) // d * d
        x = np.zeros((1, ph, pw, 3), np.float32)
        x[0, :H, :W] = image
        out = self._predict(jnp.asarray(x))
        logits = out["pred_logits"][0]
        masks = resize_bilinear(
            out["pred_masks"][0].transpose(1, 2, 0), ph, pw
        ).transpose(2, 0, 1)[:, :H, :W]

        K = self.cfg.model.num_classes
        sem = semantic_inference(logits, masks)
        inst = jax.tree.map(
            np.asarray,
            instance_inference(logits, masks, num_classes=K, topk=100),
        )
        pan = panoptic_inference(
            logits, masks, num_classes=K, thing_mask=tuple([True] * K),
            object_mask_threshold=self.cfg.model.test.object_mask_threshold,
            overlap_threshold=self.cfg.model.test.overlap_threshold,
        )
        seg_map, seg_info = relabel_panoptic(jax.tree.map(np.asarray, pan))

        vis_sem = draw_semantic(image, sem)
        vis_inst = draw_instances(image, inst["masks"], inst["labels"], inst["scores"])
        palette = color_palette(seg_map.max() + 1)
        vis_pan = (0.5 * image + 0.5 * palette[seg_map]).astype(np.uint8)
        return {
            "semantic": np.asarray(sem),
            "instances": inst,
            "panoptic": (seg_map, seg_info),
            "visualization": np.concatenate([vis_pan, vis_inst, vis_sem], axis=1),
        }


if __name__ == "__main__":
    import argparse

    from bm2f_tpu.data.mappers import read_image
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="coco_panoptic_r50")
    ap.add_argument("--weights", default="")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default="prediction.png")
    args = ap.parse_args()
    p = Predictor()
    p.setup(args.config, args.weights)
    out = p.predict(read_image(args.input))
    Image.fromarray(out["visualization"]).save(args.output)
    print(f"wrote {args.output}")
