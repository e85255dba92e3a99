#!/usr/bin/env python
"""Evaluation entry point (reference: train_net.py --eval-only ->
Trainer.test -> inference_on_dataset). Runs the jitted model + inference
heads over a test loader and the native evaluators."""

from __future__ import annotations

import argparse
from functools import partial


def run_eval(cfg, model, variables, dataset_name: str, max_images: int = 0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bm2f_tpu.data import DatasetCatalog, MetadataCatalog, build_test_loader
    from bm2f_tpu.data.mappers import EvalMapper, read_image
    from bm2f_tpu.data.mask_ops import segmentation_to_mask
    from bm2f_tpu.evaluation.coco_eval import COCOMaskAPEvaluator
    from bm2f_tpu.models.maskformer import (
        instance_inference, normalize_images, sem_seg_postprocess,
    )
    from bm2f_tpu.ops import resize_bilinear

    meta = MetadataCatalog.get(dataset_name)
    num_classes = cfg.model.num_classes
    mapper = EvalMapper()
    loader = build_test_loader(dataset_name, mapper, batch_size=1)

    @jax.jit
    def predict(images):
        out = model.apply(variables, normalize_images(images, cfg.model))
        return out["pred_logits"], out["pred_masks"]

    evaluator = COCOMaskAPEvaluator(num_classes)
    dicts = {d["image_id"]: d for d in DatasetCatalog.get(dataset_name)}

    n = 0
    for batch in loader:
        logits, masks = predict(jnp.asarray(batch["images"]))
        for i in range(logits.shape[0]):
            nh, nw = batch["resized_hw"][i]
            oh, ow = batch["orig_hw"][i]
            # upsample mask logits to the padded input size ON DEVICE (static
            # shape, one compile), then crop + restore the original size on
            # the HOST (a device resize would recompile per distinct image
            # size — reference does the same work per image on GPU)
            m = np.asarray(
                resize_bilinear(
                    masks[i].transpose(1, 2, 0),
                    batch["images"].shape[1], batch["images"].shape[2],
                ).transpose(2, 0, 1)
            )
            from bm2f_tpu.data.transforms import resize_bilinear_np

            m = resize_bilinear_np(m[:, :nh, :nw], oh, ow)
            inst = instance_inference(
                jnp.asarray(logits[i]), jnp.asarray(m),
                num_classes=num_classes, topk=100
            )
            dd = dicts[int(batch["image_id"][i])]
            gt_masks = [
                segmentation_to_mask(a["segmentation"], oh, ow)
                for a in dd["annotations"] if not a.get("iscrowd", 0)
            ]
            gt = {
                "labels": np.asarray(
                    [a["category_id"] for a in dd["annotations"]
                     if not a.get("iscrowd", 0)], np.int64,
                ),
                "masks": np.stack(gt_masks) if gt_masks else np.zeros((0, oh, ow)),
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
    from bm2f_tpu.data.datasets import register_all_builtin_datasets
    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import normalize_images

    register_all_builtin_datasets()
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

        ckpt = Checkpointer(args.weights)
        state = ckpt.restore({"params": variables["params"],
                              "frozen": variables.get("frozen", {})})
        variables = state

    run_eval(cfg, model, variables, args.dataset, args.max_images)


if __name__ == "__main__":
    main()
