#!/usr/bin/env python
"""Video-instance-segmentation evaluation (reference: train_net_video.py
--eval-only -> YTVISEvaluator). Whole-clip inference (reference processes
each video in one forward, video_maskformer_model.py:623-694), top-k track
selection on device, host-side original-size restoration, track AP."""

from __future__ import annotations

import argparse


def run_video_eval(cfg, model, variables, dataset_name: str,
                   max_videos: int = 0, short_edge: int = 360,
                   bucket: int = 640, max_frames: int = 20):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bm2f_tpu.data import DatasetCatalog
    from bm2f_tpu.data.mappers import read_image
    from bm2f_tpu.data.mask_ops import segmentation_to_mask
    from bm2f_tpu.data.transforms import resize_bilinear_np, resize_image
    from bm2f_tpu.evaluation.ytvis_eval import YTVISEvaluator
    from bm2f_tpu.models.maskformer import normalize_images

    num_classes = cfg.model.num_classes
    topk = cfg.model.test.topk_per_video
    evaluator = YTVISEvaluator(num_classes)

    @jax.jit
    def predict(clip):
        out = model.apply(variables, normalize_images(clip, cfg.model))
        logits = out["pred_logits"][0]
        masks = out["pred_masks"][0]  # (Q, T, h4, w4)
        scores_all = jax.nn.softmax(logits, axis=-1)[:, :-1]
        flat = scores_all.reshape(-1)
        scores, idx = jax.lax.top_k(flat, min(topk, flat.shape[0]))
        qidx = idx // num_classes
        return scores, idx % num_classes, masks[qidx]

    n = 0
    for dd in DatasetCatalog.get(dataset_name):
        T = min(dd["length"], max_frames)
        h, w = dd["height"], dd["width"]
        scale = short_edge / min(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        clip = np.zeros((1, T, bucket, bucket, 3), np.float32)
        for t in range(T):
            img = read_image(dd["file_names"][t])
            clip[0, t, :nh, :nw] = resize_image(img, nh, nw)

        scores, labels, sel = jax.tree.map(np.asarray, predict(jnp.asarray(clip)))
        # restore original size on host
        k = sel.shape[0]
        m4 = sel.reshape(k * T, *sel.shape[2:])
        full = resize_bilinear_np(m4, bucket, bucket)[:, :nh, :nw]
        full = resize_bilinear_np(full, h, w).reshape(k, T, h, w)
        pred_masks = full > 0

        gts, gt_labels, gt_crowd = [], [], []
        for ann in dd["annotations"]:
            per = np.zeros((T, h, w), bool)
            any_p = False
            for t in range(T):
                seg = ann["segmentations"][t]
                if seg is not None:
                    per[t] = segmentation_to_mask(seg, h, w) > 0
                    any_p = True
            if any_p:
                gts.append(per)
                gt_labels.append(ann["category_id"])
                gt_crowd.append(ann.get("iscrowd", 0))
        evaluator.process(
            {"video_id": dd["video_id"], "scores": scores, "labels": labels,
             "masks": pred_masks},
            {"labels": np.asarray(gt_labels, np.int64),
             "masks": np.stack(gts) if gts else np.zeros((0, T, h, w), bool),
             "iscrowd": np.asarray(gt_crowd, bool)},
        )
        n += 1
        if max_videos and n >= max_videos:
            break
    res = evaluator.evaluate()
    print({k: round(v, 2) for k, v in res.items()})
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="ytvis2019_video_r50")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--weights", default="")
    ap.add_argument("--max-videos", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bm2f_tpu.config import get_config
    from bm2f_tpu.data.ytvis import register_all_ytvis
    from bm2f_tpu.models.maskformer import normalize_images
    from bm2f_tpu.video import build_video_model

    register_all_ytvis()
    cfg = get_config(args.config)
    model = build_video_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        normalize_images(jnp.zeros((1, 2, 64, 64, 3)), cfg.model),
    )
    if args.weights:
        from bm2f_tpu.train.checkpoint import Checkpointer

        variables = Checkpointer(args.weights).restore_variables()
    run_video_eval(cfg, model, variables, args.dataset, args.max_videos)


if __name__ == "__main__":
    main()
