#!/usr/bin/env python
"""Demo: run segmentation on images and save visualizations (reference:
demo/demo.py + demo/predictor.py VisualizationDemo; the multi-GPU
AsyncPredictor becomes simple batched jit calls).

Usage:
  python demo.py --config coco_instance_r50 --input img.jpg --output out/
         [--weights ckpt_dir_or_d2.pkl] [--task instance|semantic|panoptic]
"""

from __future__ import annotations

import argparse
import os


def color_palette(n: int):
    import numpy as np

    rng = np.random.RandomState(7)
    return (rng.rand(n, 3) * 180 + 60).astype(np.uint8)


def draw_instances(img, masks, labels, scores, class_names=None, score_thr=0.5):
    import numpy as np
    from PIL import Image, ImageDraw

    out = img.copy().astype(np.float32)
    palette = color_palette(len(masks))
    keep = [i for i, s in enumerate(scores) if s >= score_thr]
    for i in keep:
        m = masks[i].astype(bool)
        out[m] = 0.5 * out[m] + 0.5 * palette[i]
    pil = Image.fromarray(out.astype(np.uint8))
    d = ImageDraw.Draw(pil)
    for i in keep:
        ys, xs = np.nonzero(masks[i])
        if len(ys) == 0:
            continue
        name = (
            class_names[int(labels[i])]
            if class_names and int(labels[i]) < len(class_names)
            else str(int(labels[i]))
        )
        d.text((int(xs.min()), int(ys.min())), f"{name} {scores[i]:.2f}",
               fill=(255, 255, 255))
    return np.asarray(pil)


def draw_semantic(img, sem_probs):
    import numpy as np

    seg = np.asarray(sem_probs).argmax(-1)
    palette = color_palette(int(seg.max()) + 1)
    overlay = palette[seg]
    return (0.5 * img + 0.5 * overlay).astype(np.uint8)


def draw_panoptic(img, seg_map, segments, class_names=None):
    """Per-segment colors + category labels at segment centroids (reference:
    demo/demo.py:39 run_on_image -> d2 Visualizer.draw_panoptic_seg: stuff
    drawn as tinted regions, things with instance colors, every segment
    labeled with its category name)."""
    import numpy as np
    from PIL import Image, ImageDraw

    palette = color_palette(len(segments) + 1)
    out = img.copy().astype(np.float32)
    for seg in segments:
        m = seg_map == seg["id"]
        # stuff regions get a lighter tint than thing instances, like the
        # Visualizer's lower stuff alpha
        alpha = 0.5 if seg["isthing"] else 0.35
        out[m] = (1 - alpha) * out[m] + alpha * palette[seg["id"]]
    pil = Image.fromarray(out.astype(np.uint8))
    d = ImageDraw.Draw(pil)
    for seg in segments:
        ys, xs = np.nonzero(seg_map == seg["id"])
        if len(ys) == 0:
            continue
        cid = int(seg["category_id"])
        name = (
            class_names[cid]
            if class_names and cid < len(class_names)
            else str(cid)
        )
        cy, cx = int(np.median(ys)), int(np.median(xs))
        d.text((cx, cy), name, fill=(255, 255, 255))
    return np.asarray(pil)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="coco_instance_r50")
    ap.add_argument("--input", nargs="+", required=True)
    ap.add_argument("--output", default="demo_out")
    ap.add_argument("--weights", default="")
    ap.add_argument("--task", default="instance",
                    choices=["instance", "semantic", "panoptic"])
    ap.add_argument("--confidence", type=float, default=0.5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bm2f_tpu.config import get_config
    from bm2f_tpu.data.mappers import read_image
    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import (
        instance_inference, normalize_images, panoptic_inference,
        semantic_inference,
    )
    from bm2f_tpu.ops import resize_bilinear

    cfg = get_config(args.config)
    model = build_model(cfg)
    dummy = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), normalize_images(dummy, cfg.model))
    if args.weights.endswith((".pkl", ".pth")):
        from bm2f_tpu.utils.convert_weights import convert_checkpoint

        variables = convert_checkpoint(
            args.weights, backbone=cfg.model.backbone.name,
            depth=cfg.model.backbone.resnet.depth,
            dec_layers=cfg.model.decoder.dec_layers,
        )
    elif args.weights:
        from bm2f_tpu.train.checkpoint import Checkpointer

        variables = Checkpointer(args.weights).restore_variables()

    os.makedirs(args.output, exist_ok=True)

    # label metadata: built-in COCO tables when the config matches (the demo
    # machine need not have dataset jsons); numeric labels otherwise
    from bm2f_tpu.data.datasets.coco_meta import default_demo_metadata

    class_names, thing_mask = default_demo_metadata(cfg.model.num_classes)

    @jax.jit
    def predict(x):
        out = model.apply(variables, normalize_images(x, cfg.model))
        return out["pred_logits"], out["pred_masks"]

    # overlapped pipeline (reference: demo/predictor.py:131-199
    # AsyncPredictor): a loader thread reads + pads the next image while the
    # device runs inference and this thread visualizes the previous result
    from bm2f_tpu.utils.async_predictor import AsyncPredictor

    def preprocess(path):
        img = read_image(path)
        H, W = img.shape[:2]
        d = cfg.model.size_divisibility
        ph, pw = (H + d - 1) // d * d, (W + d - 1) // d * d
        x = np.zeros((1, ph, pw, 3), np.float32)
        x[0, :H, :W] = img
        return {"img": img, "x": x, "hw": (H, W), "phw": (ph, pw)}

    def run_model(inp):
        logits, masks = predict(jnp.asarray(inp["x"]))
        return inp, logits, masks

    def visualize(path, result):
        inp, logits, masks = result
        img = inp["img"]
        H, W = inp["hw"]
        ph, pw = inp["phw"]
        masks_full = resize_bilinear(
            masks[0].transpose(1, 2, 0), ph, pw
        ).transpose(2, 0, 1)[:, :H, :W]

        if args.task == "semantic":
            sem = semantic_inference(logits[0], masks_full)
            vis = draw_semantic(img, sem)
        elif args.task == "panoptic":
            pan = panoptic_inference(
                logits[0], masks_full, num_classes=cfg.model.num_classes,
                thing_mask=thing_mask,
                object_mask_threshold=cfg.model.test.object_mask_threshold,
                overlap_threshold=cfg.model.test.overlap_threshold,
            )
            from bm2f_tpu.evaluation.panoptic_post import relabel_panoptic

            seg_map, segments = relabel_panoptic(jax.tree.map(np.asarray, pan))
            vis = draw_panoptic(img, seg_map, segments, class_names)
        else:
            inst = instance_inference(
                logits[0], masks_full, num_classes=cfg.model.num_classes, topk=100
            )
            inst = jax.tree.map(np.asarray, inst)
            vis = draw_instances(
                img, inst["masks"], inst["labels"], inst["scores"],
                class_names=class_names, score_thr=args.confidence,
            )

        out_path = os.path.join(args.output, os.path.basename(path) + ".viz.png")
        from PIL import Image

        Image.fromarray(vis).save(out_path)
        print(f"wrote {out_path}")
        return out_path

    pipeline = AsyncPredictor(run_model, preprocess, visualize)
    for _ in pipeline(args.input):
        pass


if __name__ == "__main__":
    main()
