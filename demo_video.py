#!/usr/bin/env python
"""Video instance segmentation demo (reference: demo_video/{demo,predictor,
visualizer}.py — clip reader + per-track visualizer).

Usage:
  python demo_video.py --config ytvis2019_video_r50 --input frames_dir/ \
      --output out/ [--weights ckpt]
"""

from __future__ import annotations

import argparse
import glob
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="ytvis2019_video_r50")
    ap.add_argument("--input", required=True, help="directory of frame images")
    ap.add_argument("--output", default="demo_video_out")
    ap.add_argument("--weights", default="")
    ap.add_argument("--confidence", type=float, default=0.5)
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image, ImageDraw

    from bm2f_tpu.config import get_config, update
    from bm2f_tpu.data.mappers import read_image
    from bm2f_tpu.models.maskformer import normalize_images
    from bm2f_tpu.ops import resize_bilinear
    from bm2f_tpu.video import build_video_model
    from bm2f_tpu.video.video_maskformer import inference_video
    from demo import color_palette

    frames = sorted(
        glob.glob(os.path.join(args.input, "*.jpg"))
        + glob.glob(os.path.join(args.input, "*.png"))
    )
    if args.max_frames:
        frames = frames[: args.max_frames]
    assert frames, f"no frames in {args.input}"
    imgs = [read_image(f) for f in frames]
    H, W = imgs[0].shape[:2]
    T = len(imgs)

    cfg = get_config(args.config, {"model.num_frames": T})
    model = build_video_model(cfg)
    d = cfg.model.size_divisibility
    ph, pw = (H + d - 1) // d * d, (W + d - 1) // d * d
    clip = np.zeros((1, T, ph, pw, 3), np.float32)
    for t, im in enumerate(imgs):
        clip[0, t, :H, :W] = im

    variables = model.init(
        jax.random.PRNGKey(0),
        normalize_images(jnp.zeros((1, T, 64, 64, 3)), cfg.model),
    )
    if args.weights:
        from bm2f_tpu.train.checkpoint import Checkpointer

        variables = Checkpointer(args.weights).restore_variables()

    out = model.apply(variables, normalize_images(jnp.asarray(clip), cfg.model))
    masks4 = out["pred_masks"][0]  # (Q, T, h4, w4)
    Q = masks4.shape[0]
    masks_full = jax.vmap(
        lambda m: resize_bilinear(m.transpose(1, 2, 0), ph, pw).transpose(2, 0, 1)
    )(masks4.transpose(1, 0, 2, 3))  # (T, Q, ph, pw)
    masks_full = masks_full.transpose(1, 0, 2, 3)[:, :, :H, :W]
    tracks = inference_video(
        out["pred_logits"][0], masks_full,
        num_classes=cfg.model.num_classes, topk=cfg.model.test.topk_per_video,
    )
    tracks = jax.tree.map(np.asarray, tracks)

    os.makedirs(args.output, exist_ok=True)
    palette = color_palette(len(tracks["scores"]))
    keep = tracks["scores"] >= args.confidence
    for t in range(T):
        vis = imgs[t].astype(np.float32)
        for k in np.where(keep)[0]:
            m = tracks["masks"][k, t]
            vis[m] = 0.5 * vis[m] + 0.5 * palette[k]
        pil = Image.fromarray(vis.astype(np.uint8))
        d_ = ImageDraw.Draw(pil)
        for k in np.where(keep)[0]:
            ys, xs = np.nonzero(tracks["masks"][k, t])
            if len(ys):
                d_.text((int(xs.min()), int(ys.min())),
                        f"track{k} c{int(tracks['labels'][k])} {tracks['scores'][k]:.2f}",
                        fill=(255, 255, 255))
        pil.save(os.path.join(args.output, f"{t:05d}.png"))
    print(f"wrote {T} frames to {args.output}")


if __name__ == "__main__":
    main()
