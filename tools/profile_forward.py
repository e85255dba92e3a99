#!/usr/bin/env python
"""Segment-level forward profiling on the real chip (round-2 perf work).

Times, with chained iterations (see memory: dispatches without a data
dependency get pipelined/deduped):
  - full model forward (bench.py config)
  - backbone only
  - pixel decoder only (and with 0 encoder layers)
  - the raw ms_deform_attn op at encoder shapes
  - transformer decoder only
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable without install
import os
import time

os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "true")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters=10, warmup=2, chain=None):
    """chain: fn mapping (out, args) -> args for data-dependent chaining."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
        if chain is not None:
            args = chain(out, args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        if chain is not None:
            args = chain(out, args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def first_leaf(tree):
    return jax.tree_util.tree_leaves(tree)[0]


def main():
    from bm2f_tpu.config import get_config
    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import normalize_images

    print("devices:", jax.devices(), flush=True)
    cfg = get_config(
        "coco_instance_r50",
        {"model.dtype": "bfloat16", "model.pixel_decoder_f32": False},
    )
    B, H, W = 4, 800, 800
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)

    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), normalize_images(images[:1], cfg.model))

    def chain_img(out, args):
        return (args[0] + first_leaf(out).reshape(-1)[0].astype(jnp.float32) * 1e-9,) + args[1:]

    # ---- full model ----
    fwd = jax.jit(lambda im: model.apply(variables, normalize_images(im, cfg.model)))
    t = timed(fwd, (images,), chain=chain_img)
    print(f"full forward: {t*1e3:.1f} ms  ({B/t:.2f} img/s)", flush=True)

    # ---- backbone only ----
    from bm2f_tpu.models.resnet import ResNet

    bb = ResNet(depth=cfg.model.backbone.resnet.depth, dtype=jnp.bfloat16)
    bvars = bb.init(jax.random.PRNGKey(0), images[:1])
    bfwd = jax.jit(lambda im: bb.apply(bvars, im))
    t_bb = timed(bfwd, (images,), chain=chain_img)
    print(f"backbone: {t_bb*1e3:.1f} ms", flush=True)

    feats = jax.tree.map(lambda x: x, bfwd(images))
    feats = jax.block_until_ready(feats)

    # ---- pixel decoder (6 enc layers) ----
    from bm2f_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder

    in_ch = {k: v.shape[-1] for k, v in feats.items()}
    strides = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
    pd = MSDeformAttnPixelDecoder(cfg.model.pixel_decoder, in_ch, strides,
                                  dtype=jnp.bfloat16)
    pvars = pd.init(jax.random.PRNGKey(0), feats)
    pfwd = jax.jit(lambda f: pd.apply(pvars, f))

    def chain_feats(out, args):
        s = first_leaf(out).reshape(-1)[0].astype(jnp.bfloat16) * 1e-9
        return (jax.tree.map(lambda x: x + s, args[0]),)

    t_pd = timed(pfwd, (feats,), chain=chain_feats)
    print(f"pixel decoder (6 enc layers): {t_pd*1e3:.1f} ms", flush=True)

    # ---- pixel decoder with 0 encoder layers ----
    import dataclasses

    cfg0 = dataclasses.replace(cfg.model.pixel_decoder, transformer_enc_layers=0)
    pd0 = MSDeformAttnPixelDecoder(cfg0, in_ch, strides, dtype=jnp.bfloat16)
    p0vars = pd0.init(jax.random.PRNGKey(0), feats)
    p0fwd = jax.jit(lambda f: pd0.apply(p0vars, f))
    t_pd0 = timed(p0fwd, (feats,), chain=chain_feats)
    print(f"pixel decoder (0 enc layers): {t_pd0*1e3:.1f} ms "
          f"-> encoder cost {1e3*(t_pd - t_pd0):.1f} ms "
          f"({1e3*(t_pd-t_pd0)/6:.1f} ms/layer)", flush=True)

    # ---- raw deform-attn op at encoder shapes ----
    from bm2f_tpu.ops import ms_deform_attn

    shapes = ((100, 100), (50, 50), (25, 25))
    S = sum(h * w for h, w in shapes)
    M, D, L, P = 8, 32, 3, 4
    Q = S
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B, Q, M, L, P, 2), jnp.float32)
    attn = jax.nn.softmax(jnp.asarray(rng.randn(B, Q, M, L * P), jnp.bfloat16)
                          ).reshape(B, Q, M, L, P)

    op = jax.jit(lambda v, l: ms_deform_attn(v, shapes, l, attn, impl="im2col"))

    def chain_op(out, args):
        s = out.reshape(-1)[0].astype(jnp.bfloat16) * 1e-9
        return (args[0] + s, args[1])

    t_op = timed(op, (value, loc), chain=chain_op)
    ndesc = B * Q * M * L * P
    print(f"ms_deform_attn op (B={B}, Q={Q}): {t_op*1e3:.2f} ms "
          f"({ndesc/1e6:.2f} M desc, {t_op/ndesc*1e9:.2f} ns/desc)", flush=True)

    # ---- transformer decoder ----
    from bm2f_tpu.models.maskformer import MaskFormerHead

    head = MaskFormerHead(cfg.model, dtype=jnp.bfloat16)
    hvars = head.init(jax.random.PRNGKey(0), feats)
    hfwd = jax.jit(lambda f: head.apply(hvars, f))
    t_head = timed(hfwd, (feats,), chain=chain_feats)
    print(f"head (pixel decoder + transformer decoder): {t_head*1e3:.1f} ms "
          f"-> decoder-only ~{1e3*(t_head - t_pd):.1f} ms", flush=True)

    print("--- summary ---")
    print(f"backbone {t_bb*1e3:.0f} + encoder {(t_pd-t_pd0)*1e3:.0f} + "
          f"pd-rest {t_pd0*1e3:.0f} + decoder {(t_head-t_pd)*1e3:.0f} "
          f"= {(t_bb+t_head)*1e3:.0f} vs full {t*1e3:.0f} ms")


if __name__ == "__main__":
    main()
