#!/usr/bin/env python
"""Deform-attn kernel micro-profiling at encoder shapes (round-3 perf work):
core-only (pre-built patches/idx/w4) vs full op (prep included), q_tile
sweep, and the module-level prep cost (projections + transposes)."""

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
    out = None
    for _ in range(warmup):
        out = fn(*args)
        if chain is not None:
            args = chain(out, args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1, :1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        if chain is not None:
            args = chain(out, args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1, :1]))
    return (time.perf_counter() - t0) / iters


def main():
    from bm2f_tpu.ops.deform_attn_pallas import (
        _build_patches_and_indices, _gather_core, ms_deform_attn_pallas,
    )

    print("devices:", jax.devices(), flush=True)
    B, M, D, L, P = 4, 8, 32, 3, 4
    shapes = ((100, 100), (50, 50), (25, 25))
    S = sum(h * w for h, w in shapes)
    Q = S
    K = L * P
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, M, S, D), jnp.bfloat16)  # head-major
    loc = jnp.asarray(rng.rand(B, Q, M, L, P, 2), jnp.float32)
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(B, Q, M, L * P), jnp.float32)
    ).reshape(B, Q, M, L, P)
    ndesc = B * Q * M * K

    # full op (prep + core + epilogue)
    op = jax.jit(lambda v, l: ms_deform_attn_pallas(
        v, shapes, l, attn, head_major=True))

    def chain_op(out, args):
        return (args[0] + (out.reshape(-1)[0] * 1e-6).astype(args[0].dtype),
                args[1])

    t_full = timed(op, (value, loc), chain=chain_op)
    print(f"full op: {t_full*1e3:.2f} ms ({t_full/ndesc*1e9:.2f} ns/desc)",
          flush=True)

    # prep only
    prep = jax.jit(lambda v, l: _build_patches_and_indices(
        v, shapes, l, attn, head_major=True))
    t_prep = timed(prep, (value, loc), chain=lambda o, a: (
        a[0] + (o[0].reshape(-1)[0] * 1e-6).astype(a[0].dtype), a[1]))
    print(f"prep (patches+idx+w4): {t_prep*1e3:.2f} ms", flush=True)

    # core only at several q_tiles
    patches, idx, w4 = jax.block_until_ready(prep(value, loc))
    for qt in (128, 256, 512, 1024):
        Qp = (Q + qt - 1) // qt * qt
        idx_p = jnp.pad(idx, ((0, 0), (0, 0), (0, Qp - Q)))
        w4_p = jnp.pad(w4, ((0, 0), (0, 0), (0, Qp - Q)))
        core = jax.jit(lambda p, i, w, qt=qt: _gather_core(p, i, w, qt, False))

        def chain_core(out, args):
            return (args[0] + (out.reshape(-1)[0] * 1e-6).astype(args[0].dtype),
                    args[1], args[2])

        try:
            t = timed(core, (patches, idx_p, w4_p), chain=chain_core)
            print(f"core q_tile={qt}: {t*1e3:.2f} ms "
                  f"({t/ndesc*1e9:.2f} ns/desc)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"core q_tile={qt}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
