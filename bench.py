"""Benchmark harness: flagship-model forward throughput on the local chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference publishes no throughput numbers (BASELINE.md) — the
Mask2Former paper reports ~8.6 fps for R50 COCO panoptic inference on a
V100; we take 2x that (~17.2 img/s) as the A100 estimate the driver's
"≥3x A100 images/sec/chip" north star refers to.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# persistent XLA compilation cache (this environment ships with
# jax_enable_compilation_cache=False; both knobs are needed)
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "true")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

A100_ESTIMATE_IMG_PER_S = 17.2


def main():
    import jax
    import jax.numpy as jnp

    from bm2f_tpu.config import get_config
    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import normalize_images

    # bf16 compute throughout for the benchmark (the reference keeps its
    # deformable encoder in f32 only because the CUDA kernel lacks half
    # support — msdeformattn.py:314; our im2col path is dtype-generic, and
    # pixel_decoder_f32=True remains available for strict-parity evals)
    cfg = get_config(
        "coco_instance_r50",
        {"model.dtype": "bfloat16", "model.pixel_decoder_f32": False},
    )
    model = build_model(cfg)

    B, H, W = 4, 800, 800  # COCO eval shortest-edge-800 regime, padded square
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
    variables = model.init(jax.random.PRNGKey(0), normalize_images(images[:1], cfg.model))

    @jax.jit
    def fwd(images, shift):
        out = model.apply(
            variables, normalize_images(images + shift, cfg.model)
        )
        return out["pred_logits"], out["pred_masks"]

    # warmup / compile (with the device-scalar arg signature used below —
    # avoids a silent mid-loop recompile)
    shift = jnp.float32(0.0)
    logits, masks = fwd(images, shift)
    logits.block_until_ready()
    shift = logits[0, 0, 0] * 1e-6
    logits, masks = fwd(images, shift)
    logits.block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        # chain each iteration on the previous output so the runtime cannot
        # dedupe identical dispatches
        logits, masks = fwd(images, shift)
        shift = logits[0, 0, 0] * 1e-6
    logits.block_until_ready()
    dt = time.perf_counter() - t0

    img_per_s = B * iters / dt
    print(
        json.dumps(
            {
                "metric": "forward images/sec/chip (R50, 800x800, bf16)",
                "value": round(img_per_s, 2),
                "unit": "img/s",
                "vs_baseline": round(img_per_s / A100_ESTIMATE_IMG_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
