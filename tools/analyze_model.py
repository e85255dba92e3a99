#!/usr/bin/env python
"""Model analysis: parameter table + XLA-reported FLOPs (reference:
tools/analyze_model.py:52-81 — fvcore FlopCountAnalysis / parameter_count;
here the numbers come from jax's own lowering cost analysis, which reflects
what actually runs on the TPU).

Usage: python tools/analyze_model.py --config coco_instance_r50 --size 800
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))  # runnable without install
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="coco_instance_r50")
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--tasks", default="params,flops", help="comma list: params,flops")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bm2f_tpu.config import get_config
    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import normalize_images

    cfg = get_config(args.config)
    model = build_model(cfg)
    imgs = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), normalize_images(imgs, cfg.model))

    tasks = args.tasks.split(",")
    if "params" in tasks:
        groups = defaultdict(int)
        total = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(variables["params"])[0]:
            keys = [str(getattr(k, "key", k)) for k in path]
            groups["/".join(keys[:2])] += leaf.size
            total += leaf.size
        print(f"total params: {total/1e6:.2f} M")
        for k in sorted(groups, key=groups.get, reverse=True)[:25]:
            print(f"  {k:60s} {groups[k]/1e6:8.3f} M")

    if "flops" in tasks:
        lowered = jax.jit(
            lambda v, x: model.apply(v, normalize_images(x, cfg.model))
        ).lower(variables, imgs)
        cost = lowered.compile().cost_analysis()
        if cost:
            flops = cost.get("flops", float("nan"))
            print(f"forward FLOPs (XLA estimate, batch={args.batch}): {flops/1e9:.1f} G")
            print(f"bytes accessed: {cost.get('bytes accessed', float('nan'))/1e9:.2f} GB")


if __name__ == "__main__":
    main()
