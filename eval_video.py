#!/usr/bin/env python
"""Video-instance-segmentation evaluation (reference: train_net_video.py
--eval-only -> YTVISEvaluator). Whole-clip inference (reference processes
each video in one forward, video_maskformer_model.py:623-694), top-k track
selection on device, host-side original-size restoration, track AP."""

from __future__ import annotations

import argparse


def run_video_eval(cfg, model, variables, dataset_name: str,
                   max_videos: int = 0, short_edge: int = None,
                   bucket=None, max_size: int = None, max_frames: int = 0,
                   t_buckets=(4, 8, 16, 24, 40),
                   rank: int = 0, world_size: int = 1):
    """Clips are padded to the smallest of a few static frame-count buckets
    with a frame-validity mask (instead of one XLA compile per distinct
    video length T): the video decoder masks padded frames out of every
    cross-attention, so predictions match true-length inference exactly
    (tested in tests/test_video.py).

    The WHOLE clip is evaluated in one forward like the reference
    (video_maskformer_model.py:623-694): clips longer than the t_buckets
    ladder get a ceil-to-8 bucket of their own (bounded compiles) rather
    than being truncated. max_frames>0 opts into truncation and LOGS every
    truncated clip. Spatial resolution follows the preset's
    MIN_SIZE_TEST/MAX_SIZE_TEST unless overridden; the spatial bucket
    ladder always covers the max_size-capped resize."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bm2f_tpu.data import DatasetCatalog
    from bm2f_tpu.data.mappers import read_image
    from bm2f_tpu.data.mask_ops import segmentation_to_mask
    from bm2f_tpu.data.transforms import resize_bilinear_np, resize_image
    from bm2f_tpu.evaluation.ytvis_eval import YTVISEvaluator
    from bm2f_tpu.models.maskformer import normalize_images

    if short_edge is None:
        short_edge = cfg.input.min_size_test
    if max_size is None:
        max_size = cfg.input.max_size_test
    if bucket is None:
        # typical landscape (16:9) bucket, a tall-aspect middle step, and a
        # top bucket that always fits the max_size cap
        r32 = lambda s: -(-s // 32) * 32
        bucket = tuple(sorted({r32(short_edge * 16 // 9),
                               r32(short_edge * 2), r32(max_size)}))
    s_buckets = tuple(sorted(
        (bucket,) if isinstance(bucket, int) else tuple(bucket)))

    num_classes = cfg.model.num_classes
    topk = cfg.model.test.topk_per_video
    evaluator = YTVISEvaluator(num_classes)
    t_buckets = tuple(sorted(t_buckets))

    @jax.jit
    def predict(clip, frame_valid):
        out = model.apply(variables, normalize_images(clip, cfg.model),
                          frame_valid)
        logits = out["pred_logits"][0]
        masks = out["pred_masks"][0]  # (Q, T, h4, w4)
        scores_all = jax.nn.softmax(logits, axis=-1)[:, :-1]
        flat = scores_all.reshape(-1)
        scores, idx = jax.lax.top_k(flat, min(topk, flat.shape[0]))
        qidx = idx // num_classes
        return scores, idx % num_classes, masks[qidx]

    from bm2f_tpu.utils.memory import retry_if_oom

    predict = retry_if_oom(predict)

    n = 0
    dicts = DatasetCatalog.get(dataset_name)
    # per-host contiguous shard (InferenceSampler semantics); evaluator
    # state is gathered across hosts before scoring
    shard = (len(dicts) + world_size - 1) // world_size
    dicts = dicts[rank * shard : (rank + 1) * shard]
    for dd in dicts:
        T = dd["length"]
        if max_frames and T > max_frames:
            print(f"WARNING: truncating video {dd.get('video_id')} from "
                  f"{T} to {max_frames} frames (max_frames set)")
            T = max_frames
        # smallest ladder bucket that fits; above the static ladder, extend
        # geometrically (x1.5, ceil to 8) so a dataset of many distinct long
        # lengths costs one XLA compile per ~1.5x band, not one per length —
        # still whole-clip inference, no silent truncation
        Tp = next((t for t in t_buckets if t >= T), None)
        if Tp is None:
            Tp = max(t_buckets)
            while Tp < T:
                Tp = -(-(Tp * 3) // 16) * 8  # ceil(Tp * 1.5 / 8) * 8
        h, w = dd["height"], dd["width"]
        scale = short_edge / min(h, w)
        if max(h, w) * scale > max_size:
            scale = max_size / max(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        S = next((b for b in s_buckets if b >= max(nh, nw)), s_buckets[-1])
        clip = np.zeros((1, Tp, S, S, 3), np.float32)
        for t in range(T):
            img = read_image(dd["file_names"][t])
            clip[0, t, :nh, :nw] = resize_image(img, nh, nw)
        fv = np.zeros((1, Tp), bool)
        fv[0, :T] = True

        scores, labels, sel = jax.tree.map(
            np.asarray, predict(jnp.asarray(clip), jnp.asarray(fv)))
        sel = sel[:, :T]
        # restore original size on host
        k = sel.shape[0]
        m4 = sel.reshape(k * T, *sel.shape[2:])
        full = resize_bilinear_np(m4, S, S)[:, :nh, :nw]
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
    from bm2f_tpu.evaluation.evaluator import gather_evaluator

    res = gather_evaluator(evaluator).evaluate()
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
    run_video_eval(cfg, model, variables, args.dataset, args.max_videos,
                   rank=jax.process_index(), world_size=jax.process_count())


if __name__ == "__main__":
    main()
