"""Benchmark harness: driver-captured performance metrics on the local chip.

Prints one JSON line per metric (the headline R50 forward throughput is the
LAST line so single-line parsers pick it up):
  1. R50 1024^2 B=2 train step (full fwd+bwd+AdamW, exact JV matching)
  2. Swin-L 200-query forward throughput (the zoo flagship,
     /root/reference/MODEL_ZOO.md:113-121)
  3. p50 single-image forward latency (R50 800^2 B=1)
  4. R50 800^2 B=4 forward throughput (headline)

Baselines: the reference publishes no throughput numbers (BASELINE.md) — the
Mask2Former paper reports ~8.6 fps for R50 and ~2.0 fps for Swin-L COCO
panoptic inference on a V100; we take 2x those (17.2 / 4.0 img/s) as A100
estimates for the driver's ">=3x A100 images/sec/chip" north star, 58.1 ms
(= 1000/17.2) as the A100 p50 latency estimate (vs_baseline =
baseline/value there: higher is better), and the round-1 pre-Pallas train
step (1.46 s/it) as the train baseline (vs_baseline = baseline/value).
These are self-derived estimates — documented, not hidden.
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
A100_ESTIMATE_SWINL_IMG_PER_S = 4.0
A100_ESTIMATE_P50_MS = 1000.0 / A100_ESTIMATE_IMG_PER_S
ROUND1_TRAIN_S_PER_IT = 1.46


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({"metric": metric, "value": round(value, 2),
                      "unit": unit, "vs_baseline": round(vs_baseline, 2)}),
          flush=True)


def _fwd_bench(cfg_name, B, H, W, iters, overrides=None,
               per_iter_sync=False):
    """Forward throughput with data-dependent chaining (the axon runtime
    dedupes identical dispatches). per_iter_sync=True pulls a scalar every
    iteration (for latency percentiles — includes the ~ms host-sync cost);
    throughput mode chains iterations and syncs once at the end."""
    import jax
    import jax.numpy as jnp

    from bm2f_tpu.config import get_config
    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import normalize_images

    over = {"model.dtype": "bfloat16", "model.pixel_decoder_f32": False}
    over.update(overrides or {})
    cfg = get_config(cfg_name, over)
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
    variables = model.init(jax.random.PRNGKey(0),
                           normalize_images(images[:1], cfg.model))

    # params as jit ARGUMENTS, not closure constants: closed-over arrays are
    # embedded in the serialized HLO, and Swin-L's ~200M params overflow the
    # axon remote-compile request (HTTP 413)
    @jax.jit
    def fwd(variables, images, shift):
        out = model.apply(variables, normalize_images(images + shift, cfg.model))
        return out["pred_logits"], out["pred_masks"]

    # warmup MUST sync by pulling a scalar: block_until_ready is a no-op on
    # the axon platform, and an unsynced warmup leaks compile + first-run
    # work into the timed window (measured 9x distortion on Swin-L)
    shift = jnp.float32(0.0)
    logits, _ = fwd(variables, images, shift)
    shift = logits[0, 0, 0].astype(jnp.float32) * 1e-6
    logits, _ = fwd(variables, images, shift)
    shift = logits[0, 0, 0].astype(jnp.float32) * 1e-6
    float(shift)

    times = []
    t0 = time.perf_counter()
    for _ in range(iters):
        t1 = time.perf_counter()
        logits, _ = fwd(variables, images, shift)
        shift = logits[0, 0, 0].astype(jnp.float32) * 1e-6
        if per_iter_sync:
            float(shift)  # host sync (block_until_ready no-ops on axon)
        times.append(time.perf_counter() - t1)
    float(shift)
    dt = time.perf_counter() - t0
    return B * iters / dt, times


def bench_train():
    import jax
    import jax.numpy as jnp

    from bm2f_tpu.config import get_config
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
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        "labels": jnp.asarray(rng.randint(0, 80, (B, G)).astype(np.int32)),
        "masks": jnp.asarray((rng.rand(B, G, H, W) > 0.8).astype(np.float32)),
        "valid": jnp.asarray(np.ones((B, G), bool)),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch["images"][:1])
    step_fn = trainer.compile_step(state)
    with trainer.mesh:
        batch = shard_batch(batch, trainer.mesh)
        state = trainer.shard_state(state)
        state, metrics = step_fn(state, batch)  # compile
        float(metrics["total_loss"])
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step_fn(state, batch)
        float(metrics["total_loss"])  # the state chain defeats dedupe
        dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    # 0. headline FIRST (compiles are not reliably cached across processes
    # on this runtime, so later metrics may take 15-25 min of compile each;
    # printing the headline up front survives an external timeout) — and it
    # is re-emitted as the LAST line so last-line parsers see it too
    headline = None
    try:
        img_per_s, _ = _fwd_bench("coco_instance_r50", 4, 800, 800, iters=20)
        headline = img_per_s
        _emit("forward images/sec/chip (R50, 800x800, bf16)", img_per_s,
              "img/s", img_per_s / A100_ESTIMATE_IMG_PER_S)
    except Exception as e:  # noqa: BLE001
        print(f"# headline bench failed: {e}", flush=True)

    # 1. train step (R50 1024^2 B=2)
    try:
        s_per_it = bench_train()
        _emit("train s/it (R50, 1024x1024, B=2, JV matcher)", s_per_it,
              "s/it", ROUND1_TRAIN_S_PER_IT / s_per_it)
    except Exception as e:  # noqa: BLE001 - never block the headline metric
        print(f"# train bench failed: {e}", flush=True)

    # 2. Swin-L 200 queries (zoo flagship)
    try:
        swinl, _ = _fwd_bench("coco_panoptic_swin_l", 2, 800, 800, iters=10)
        _emit("forward images/sec/chip (Swin-L 200q, 800x800, bf16)", swinl,
              "img/s", swinl / A100_ESTIMATE_SWINL_IMG_PER_S)
    except Exception as e:  # noqa: BLE001
        print(f"# swin-l bench failed: {e}", flush=True)

    # 3. p50 single-image latency (R50), net of the host-sync round trip:
    # per-iteration timing must pull a scalar to the host (block_until_ready
    # no-ops on axon), and that null round trip costs ~25-30 ms on the
    # tunneled chip — a harness artifact, not model time, so it is measured
    # and subtracted (and reported for transparency)
    try:
        import jax
        import jax.numpy as jnp

        _, times = _fwd_bench("coco_instance_r50", 1, 800, 800, iters=20,
                              per_iter_sync=True)
        x = jnp.float32(1.0)
        null = []
        for i in range(10):
            t1 = time.perf_counter()
            x = x * 1.0000001
            float(x)
            null.append(time.perf_counter() - t1)
        sync_ms = float(np.median(null)) * 1e3
        p50 = float(np.median(times)) * 1e3 - sync_ms
        print(f"# host-sync round trip subtracted from p50: {sync_ms:.1f} ms",
              flush=True)
        _emit("p50 single-image forward latency (R50, 800x800)", p50, "ms",
              A100_ESTIMATE_P50_MS / p50)
    except Exception as e:  # noqa: BLE001
        print(f"# latency bench failed: {e}", flush=True)

    # 4. headline re-emitted as the LAST line (same measurement)
    if headline is None:
        headline, _ = _fwd_bench("coco_instance_r50", 4, 800, 800, iters=20)
    _emit("forward images/sec/chip (R50, 800x800, bf16)", headline,
          "img/s", headline / A100_ESTIMATE_IMG_PER_S)


if __name__ == "__main__":
    main()
