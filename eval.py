#!/usr/bin/env python
"""Evaluation entry point (reference: train_net.py --eval-only ->
Trainer.test -> inference_on_dataset). Runs the jitted model + inference
heads over a test loader and the native evaluators."""

from __future__ import annotations

import argparse
from functools import partial


def run_eval(cfg, model, variables, dataset_name: str, max_images: int = 0,
             short_edge: int = 800, max_size: int = 1333, bucket: int = 1344):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bm2f_tpu.data import DatasetCatalog, MetadataCatalog, build_test_loader
    from bm2f_tpu.data.mappers import EvalMapper, read_image
    from bm2f_tpu.data.mask_ops import segmentation_to_mask
    from bm2f_tpu.evaluation.coco_eval import COCOMaskAPEvaluator
    from bm2f_tpu.data.transforms import resize_bilinear_np
    from bm2f_tpu.models.maskformer import (
        instance_topk_select, normalize_images,
    )
    from bm2f_tpu.ops import resize_bilinear

    meta = MetadataCatalog.get(dataset_name)
    num_classes = cfg.model.num_classes
    mapper = EvalMapper(short_edge=short_edge, max_size=max_size, bucket=bucket,
                        pad_value=cfg.model.pixel_mean)
    loader = build_test_loader(dataset_name, mapper, batch_size=1)

    @jax.jit
    def predict(images):
        out = model.apply(variables, normalize_images(images, cfg.model))
        # device side: upsample to the (static) padded input size + top-k
        masks_full = jax.vmap(
            lambda m: resize_bilinear(m.transpose(1, 2, 0), images.shape[1],
                                      images.shape[2]).transpose(2, 0, 1)
        )(out["pred_masks"])
        scores, labels, sel_masks = jax.vmap(
            lambda c, m: instance_topk_select(c, m, num_classes=num_classes, topk=100)
        )(out["pred_logits"], masks_full)
        return scores, labels, sel_masks

    evaluator = COCOMaskAPEvaluator(num_classes)
    dicts = {d["image_id"]: d for d in DatasetCatalog.get(dataset_name)}

    n = 0
    for batch in loader:
        scores_b, labels_b, selmasks_b = jax.tree.map(
            np.asarray, predict(jnp.asarray(batch["images"]))
        )
        for i in range(scores_b.shape[0]):
            nh, nw = batch["resized_hw"][i]
            oh, ow = batch["orig_hw"][i]
            # host side: crop padding, restore original size, binarize at 0,
            # mask-probability rescoring (reference :621)
            m = resize_bilinear_np(selmasks_b[i][:, :nh, :nw], oh, ow)
            binary = m > 0
            prob = 1.0 / (1.0 + np.exp(-m))
            area = binary.reshape(len(binary), -1).sum(-1)
            mask_scores = (prob * binary).reshape(len(binary), -1).sum(-1) / (
                area + 1e-6
            )
            inst = {
                "scores": scores_b[i] * mask_scores,
                "labels": labels_b[i],
                "masks": binary,
                "valid": np.ones(len(binary), bool),
            }
            dd = dicts[int(batch["image_id"][i])]
            # crowd annotations are kept and flagged: the COCO protocol treats
            # them as ignore regions (predictions matching them are neither TP
            # nor FP), which COCOMaskAPEvaluator implements natively.
            gt_masks = [
                segmentation_to_mask(a["segmentation"], oh, ow)
                for a in dd["annotations"]
            ]
            gt = {
                "labels": np.asarray(
                    [a["category_id"] for a in dd["annotations"]], np.int64,
                ),
                "masks": np.stack(gt_masks) if gt_masks else np.zeros((0, oh, ow)),
                "iscrowd": np.asarray(
                    [bool(a.get("iscrowd", 0)) for a in dd["annotations"]], bool,
                ),
            }
            evaluator.process(jax.tree.map(np.asarray, inst), gt)
            n += 1
        if max_images and n >= max_images:
            break
    res = evaluator.evaluate()
    print({k: round(v, 2) for k, v in res.items()})
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--weights", default="", help="orbax checkpoint dir or d2 .pkl/.pth")
    ap.add_argument("--max-images", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bm2f_tpu.config import get_config
    from bm2f_tpu.data.cityscapes import register_all_cityscapes
    from bm2f_tpu.data.datasets import register_all_builtin_datasets
    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import normalize_images

    register_all_builtin_datasets()
    register_all_cityscapes()
    cfg = get_config(args.config)
    model = build_model(cfg)
    dummy = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), normalize_images(dummy, cfg.model))
    if args.weights.endswith((".pkl", ".pth")):
        from bm2f_tpu.utils.convert_weights import convert_checkpoint

        variables = convert_checkpoint(
            args.weights,
            backbone=cfg.model.backbone.name,
            depth=cfg.model.backbone.resnet.depth,
            dec_layers=cfg.model.decoder.dec_layers,
        )
    elif args.weights:
        from bm2f_tpu.train.checkpoint import Checkpointer

        variables = Checkpointer(args.weights).restore_variables()

    run_eval(cfg, model, variables, args.dataset, args.max_images)


if __name__ == "__main__":
    main()
