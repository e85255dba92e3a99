#!/usr/bin/env python
"""Standalone criterion+matcher benchmark at production train shapes.

The set criterion (10-layer matcher costs + point-sampled mask losses) was
the largest non-kernel cost in the round-3 train trace (~120 ms/step of
gathers at 1024^2 B=2). This times JUST grad(criterion) on synthetic
decoder outputs, so criterion-level changes can be A/B'd on the real chip
without the full train-step compile (~2-3 min vs 15-20 min on axon).

Shapes mirror bench.py's train config: B=2, Q=100, masks 256x256 (stride 4
of 1024^2), G=8 targets at full 1024^2 resolution, 9 aux layers + final.

Usage: python tools/profile_criterion.py [--iters 10] [--trace DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "true")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace", default=None, help="xplane trace dir")
    ap.add_argument("--layers", type=int, default=9, help="aux layers")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bm2f_tpu.losses.criterion import SetCriterionConfig, set_criterion
    from bm2f_tpu.matching.hungarian import make_jv_assign_fn

    print("devices:", jax.devices(), flush=True)

    B, Q, h, w, G, K, L = 2, 100, 256, 256, 8, 80, args.layers
    Hg = Wg = 1024
    rng = np.random.RandomState(0)
    outputs = {
        "pred_logits": jnp.asarray(rng.randn(B, Q, K + 1).astype(np.float32)),
        "pred_masks": jnp.asarray(rng.randn(B, Q, h, w).astype(np.float32)),
        "aux_logits": jnp.asarray(rng.randn(L, B, Q, K + 1).astype(np.float32)),
        "aux_masks": jnp.asarray(rng.randn(L, B, Q, h, w).astype(np.float32)),
    }
    targets = {
        "labels": jnp.asarray(rng.randint(0, K, (B, G)).astype(np.int32)),
        "masks": jnp.asarray((rng.rand(B, G, Hg, Wg) > 0.8).astype(np.float32)),
        "valid": jnp.asarray(np.ones((B, G), bool)),
    }
    cfg = SetCriterionConfig(num_classes=K)

    # on-device exact JV matching (bench.py's train config): the default
    # host-callback LSA is unsupported by the axon runtime
    assign_fn = make_jv_assign_fn()

    def loss_fn(outs, tgts, key):
        total, _ = set_criterion(outs, tgts, cfg, key, assign_fn=assign_fn)
        return total

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    val, g = grad_fn(outputs, targets, key)
    # pull scalars to host: block_until_ready no-ops on axon
    s = float(val) + float(jnp.sum(g["pred_masks"][0, 0, 0, :4]))
    print(f"compile+first step {time.perf_counter() - t0:.1f}s "
          f"loss={float(val):.4f}", flush=True)

    def run(n):
        nonlocal key
        acc = 0.0
        t = time.perf_counter()
        for _ in range(n):
            key, sub = jax.random.split(key)  # vary rng: defeats axon dedupe
            val, g = grad_fn(outputs, targets, sub)
        acc += float(val)  # host pull syncs the chain
        return (time.perf_counter() - t) / n, acc

    run(2)  # warm
    if args.trace:
        with jax.profiler.trace(args.trace):
            dt, _ = run(args.iters)
    else:
        dt, _ = run(args.iters)
    print(f"criterion fwd+bwd: {dt * 1e3:.1f} ms/step over {args.iters} iters",
          flush=True)


if __name__ == "__main__":
    main()
