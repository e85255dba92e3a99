#!/usr/bin/env python
"""Compile-time measurement for the bench graphs (round-5 cold-start work).

The round-4 verdict's #1 item: the R50 train step cold-compiles in ~23 min
on the axon backend (Swin-L ~29, p50 ~19, headline ~7) vs 480 s driver
budgets — the reference (PyTorch eager) reaches its first training step in
under a minute (reference train_net.py:305-322). This tool makes compile
time a first-class measured quantity so every graph-shape change (scan-
ified layers, criterion restructuring) gets a fast feedback loop:

  python tools/compile_timer.py --graph train            # lower+compile
  python tools/compile_timer.py --graph headline --cpu   # on CPU backend
  python tools/compile_timer.py --graph train --no-cache # bypass disk cache

Prints one JSON line: {"graph": ..., "lower_s": ..., "compile_s": ...,
"backend": ..., "cache": ...}. `lower_s` is the local trace+lowering cost
(Python-side, unaffected by the backend); `compile_s` is the XLA/Mosaic
compile (server-side on axon — the cold-start wall).

On CPU the absolute numbers differ from the TPU server's but the RATIO
between two graph shapes tracks, so scan-ification A/Bs can iterate
off-chip.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="train",
                    choices=["train", "headline", "swinl", "p50", "video"])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (fast off-chip iteration)")
    ap.add_argument("--cache", action="store_true",
                    help="enable the LOCAL persistent compile cache "
                    "(default off: on the axon backend a hit does not skip "
                    "the server compile but CAN serve a stale executable "
                    "with a mismatched hoisted-constant calling convention "
                    "— see bench.py's header — and any hit corrupts the "
                    "compile_s measurement this tool exists to produce)")
    ap.add_argument("--no-cache", action="store_true",
                    help="(default; kept for compatibility)")
    ap.add_argument("--run", action="store_true",
                    help="also execute the compiled graph once (sanity)")
    args = ap.parse_args()

    if args.cache and not args.no_cache:
        os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "true")
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    else:
        os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"
        args.no_cache = True
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bm2f_tpu.config import get_config
    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import normalize_images

    t0 = time.time()
    jax.devices()
    init_s = time.time() - t0
    backend = jax.default_backend()

    rng = np.random.RandomState(0)

    if args.graph == "train":
        from bm2f_tpu.parallel.mesh import shard_batch
        from bm2f_tpu.train.trainer import Trainer

        B, H, W, G = 2, 1024, 1024, 8
        cfg = get_config("coco_instance_r50", {
            "model.dtype": "bfloat16",
            "model.pixel_decoder_f32": False,
            "train.matcher": "jv",
            "train.ims_per_batch": B,
            "mesh.data": 1,
        })
        trainer = Trainer(cfg)
        batch = {
            "images": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
            "labels": jnp.asarray(rng.randint(0, 80, (B, G)).astype(np.int32)),
            "masks": jnp.asarray((rng.rand(B, G, H, W) > 0.8).astype(np.float32)),
            "valid": jnp.asarray(np.ones((B, G), bool)),
        }
        # tiny init sample: param shapes are image-size independent and the
        # full-res init graph would cost its own multi-minute server compile
        state = trainer.init_state(jax.random.PRNGKey(0),
                                   batch["images"][:1, :64, :64])
        step_fn = trainer.compile_step(state)
        with trainer.mesh:
            batch = shard_batch(batch, trainer.mesh)
            state = trainer.shard_state(state)
            t0 = time.time()
            lowered = step_fn.lower(state, batch)
            lower_s = time.time() - t0
            t0 = time.time()
            compiled = lowered.compile()
            compile_s = time.time() - t0
            if args.run:
                t0 = time.time()
                state, metrics = compiled(state, batch)
                print(f"# run: loss={float(metrics['total_loss']):.4f} "
                      f"in {time.time() - t0:.1f}s", flush=True)
    else:
        shapes = {
            "headline": ("coco_instance_r50", 4, 800, 800),
            "p50": ("coco_instance_r50", 1, 800, 800),
            "swinl": ("coco_panoptic_swin_l", 2, 800, 800),
            "video": ("ytvis2021_video_r50", 1, 480, 640),
        }
        cfg_name, B, H, W = shapes[args.graph]
        over = {"model.dtype": "bfloat16", "model.pixel_decoder_f32": False}
        cfg = get_config(cfg_name, over)
        if args.graph == "video":
            from bm2f_tpu.video import build_video_model

            model = build_video_model(cfg)
            T = 8  # matches bench.py's video metric clip length
            images = jnp.asarray(
                rng.rand(B, T, H, W, 3).astype(np.float32) * 255)
            norm = lambda im: normalize_images(im, cfg.model)
            init_images = images[:, :2, :64, :64]
        else:
            model = build_model(cfg)
            images = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
            norm = lambda im: normalize_images(im, cfg.model)
            init_images = images[:1, :64, :64]
        variables = model.init(jax.random.PRNGKey(0), norm(init_images))

        @jax.jit
        def fwd(variables, images):
            out = model.apply(variables, norm(images))
            return out["pred_logits"], out["pred_masks"]

        t0 = time.time()
        lowered = fwd.lower(variables, images)
        lower_s = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        compile_s = time.time() - t0
        if args.run:
            t0 = time.time()
            logits, _ = compiled(variables, images)
            print(f"# run: logits[0,0,0]={float(logits[0, 0, 0]):.4f} "
                  f"in {time.time() - t0:.1f}s", flush=True)

    print(json.dumps({
        "graph": args.graph,
        "backend": backend,
        "init_s": round(init_s, 1),
        "lower_s": round(lower_s, 1),
        "compile_s": round(compile_s, 1),
        "cache": "off" if args.no_cache else
        os.environ.get("JAX_COMPILATION_CACHE_DIR", ""),
    }), flush=True)


if __name__ == "__main__":
    main()
