#!/usr/bin/env python
"""Deformable-attention gather roofline microbenchmarks (VERDICT r3 item 2:
"break the scalar floor or prove it"). Measures, ON THE REAL CHIP, the two
competing gather formulations for ONE level's points at production sizes so
docs/ROOFLINE.md carries checkable numbers instead of assertions:

  scalar : the production formulation — one scalar-addressed VMEM row copy
           per descriptor (table row = 128 f32 lanes = the 2x2 corner
           neighborhood), K copies per query per tile.
  onehot : the MXU escape — per k, build a (QT, S) 0/1 selector in VMEM by
           comparing an iota against the SMEM indices, then one
           (QT, S) @ (S, 4D) dot. FLOPs = 2*QT*S*4D per tile per k vs QT*K
           scalar issues; the selector build itself is QT*S VPU compares.

Production shapes (800^2 B=4, R50): Q=13125 queries x B*M=32 x P=4 points
PER LEVEL = 1.68M descriptors/level/layer; level tables S = 10000 / 2500 /
625 rows (strides 8/16/32). The scalar loop is issue-rate-bound
(~2.4 ns/copy measured end-to-end), so the one-hot dot only wins where
2*S*4D FLOP per descriptor beats one 2.3-cycle issue — i.e. possibly at
S=625, never at S=10000.

Usage: python tools/roofline_microbench.py [--iters 30] [--levels 625 2500 10000]
Prints one JSON line per (impl, S) with ns/descriptor and ms per
level-layer (1.68M descriptors).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "true")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

BM = 32  # B=4 x M=8 heads
QP = 13312  # 13125 queries padded to 26 x 512
QT = 512
K = 4  # points per level
D4 = 128  # table row lanes (2x2 corners x D=32)
UNROLL_Q = 1  # queries handled per fori_loop body (scalar kernel only)


def _kernels():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    VMEM_LIMIT = 100 * 1024 * 1024
    interpret = (
        pltpu.InterpretParams() if jax.default_backend() != "tpu" else False
    )

    def scalar_kernel(idx_ref, table_ref, out_ref, scratch_ref):
        # UNROLL_Q queries per fori_loop body: tests whether the loop is
        # bound by per-BODY overhead (branch/bookkeeping) or per-COPY issue
        def body(bi, _):
            for u in range(UNROLL_Q):
                qi = bi * UNROLL_Q + u
                for k in range(K):
                    a = idx_ref[0, k, qi]
                    scratch_ref[pl.ds(k * QT + qi, 1), :] = table_ref[
                        0, pl.ds(a, 1), :
                    ]
            return 0

        jax.lax.fori_loop(0, QT // UNROLL_Q, body, 0)
        acc = scratch_ref[0:QT]
        for k in range(1, K):
            acc = acc + scratch_ref[k * QT : (k + 1) * QT]
        out_ref[0] = acc

    # one-hot variant: idx arrives as a VMEM block (an SMEM->vector
    # materialization loop would itself be scalar-issue bound)
    def onehot_kernel_v(idxv_ref, table_ref, out_ref, *, S):
        iota = jax.lax.broadcasted_iota(jnp.int32, (QT, S), 1)
        acc = None
        for k in range(K):
            idx_k = idxv_ref[0, k, :]  # (QT,) i32 VMEM
            sel = (iota == idx_k[:, None]).astype(jnp.float32)  # (QT, S)
            t = jax.lax.dot_general(
                sel, table_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
        out_ref[0] = acc

    # bf16 one-hot: the MXU's 197 TF peak is bf16-only (f32 is ~1/4), so
    # give the escape its best shot — 0/1 selector is exact in bf16, the
    # production table is cast-last bf16 anyway, and f32 accumulation of
    # bf16 products keeps the result bitwise-equal to the f32 gather
    def onehot_kernel_bf16(idxv_ref, table_ref, out_ref, *, S):
        iota = jax.lax.broadcasted_iota(jnp.int32, (QT, S), 1)
        acc = None
        for k in range(K):
            idx_k = idxv_ref[0, k, :]
            sel = (iota == idx_k[:, None]).astype(jnp.bfloat16)
            t = jax.lax.dot_general(
                sel, table_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
        out_ref[0] = acc

    def scalar_kernel_bf16(idx_ref, table_ref, out_ref, scratch_ref):
        # bf16 single-table retry (round-2 Mosaic compile failure;
        # VERDICT r3 asked for a re-test): identical issue count, half
        # bandwidth/VMEM; accumulate in f32 after the copies
        def body(qi, _):
            for k in range(K):
                a = idx_ref[0, k, qi]
                scratch_ref[pl.ds(k * QT + qi, 1), :] = table_ref[
                    0, pl.ds(a, 1), :
                ]
            return 0

        jax.lax.fori_loop(0, QT, body, 0)
        acc = scratch_ref[0:QT].astype(jnp.float32)
        for k in range(1, K):
            acc = acc + scratch_ref[k * QT : (k + 1) * QT].astype(jnp.float32)
        out_ref[0] = acc

    def _make_scalar_any(S, dtype, kernel):
        return pl.pallas_call(
            kernel,
            grid=(BM, QP // QT),
            in_specs=[
                pl.BlockSpec((1, K, QT), lambda b, i: (b, 0, i),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, S, D4), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, QT, D4), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BM, QP, D4), jnp.float32),
            scratch_shapes=[pltpu.VMEM((K * QT, D4), dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=interpret,
        )

    def make_scalar(S):
        return _make_scalar_any(S, jnp.float32, scalar_kernel)

    def make_scalar_bf16(S):
        f = _make_scalar_any(S, jnp.bfloat16, scalar_kernel_bf16)
        return lambda i, t: f(i, t.astype(jnp.bfloat16))

    def _make_onehot_any(S, kernel, table_dtype):
        f = pl.pallas_call(
            functools.partial(kernel, S=S),
            grid=(BM, QP // QT),
            in_specs=[
                pl.BlockSpec((1, K, QT), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, D4), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, QT, D4), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BM, QP, D4), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=interpret,
        )
        return lambda i, t: f(i, t.astype(table_dtype))

    def make_onehot(S):
        return _make_onehot_any(S, onehot_kernel_v, jnp.float32)

    def make_onehot_bf16(S):
        return _make_onehot_any(S, onehot_kernel_bf16, jnp.bfloat16)

    return make_scalar, make_onehot, make_scalar_bf16, make_onehot_bf16


def bench_level(S: int, iters: int, coherent: bool = False):
    import jax
    import jax.numpy as jnp

    make_scalar, make_onehot, make_scalar_bf16, make_onehot_bf16 = _kernels()
    rng = np.random.RandomState(0)
    # bf16-representable values so the bf16-table variant is exactly
    # comparable to the f32 oracle (production prep is cast-last bf16 anyway)
    table = jnp.asarray(
        rng.randn(BM, S, D4).astype(np.float32)
    ).astype(jnp.bfloat16).astype(jnp.float32)
    if coherent:
        # production-like addresses: deformable queries sample NEAR their
        # own spatial location (ring init, small learned offsets), so
        # consecutive queries touch nearby table rows. Model: query qi's
        # row = its proportional position in the level + small jitter.
        base = np.linspace(0, S - 1, QP)[None, None, :]
        jit_ = rng.randn(BM, K, QP) * max(2.0, S * 0.01)
        idx_np = np.clip(np.round(base + jit_), 0, S - 1).astype(np.int32)
        idx = jnp.asarray(idx_np)
    else:
        idx = jnp.asarray(rng.randint(0, S, (BM, K, QP)).astype(np.int32))

    n_desc = BM * QP * K
    results = {}
    impls = [("scalar", make_scalar), ("onehot", make_onehot),
             ("onehot_bf16", make_onehot_bf16),
             ("scalar_bf16", make_scalar_bf16)]
    only = os.environ.get("ROOFLINE_IMPLS")
    if only:
        impls = [p for p in impls if p[0] in only.split(",")]
    for name, make in impls:
        try:
            fn = jax.jit(lambda t, i, f=make(S): f(i, t))
            # correctness cross-check (gather sum over K); compile happens
            # here — Mosaic failures are recorded, not fatal
            out = fn(table, idx)
        except Exception as e:  # noqa: BLE001 — record compile failures
            print(json.dumps({"impl": name, "S": S,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        ref = None
        if S <= 640:  # cheap XLA oracle at the small level only
            g = jnp.take_along_axis(
                table[:, None], np.asarray(idx)[..., None].astype(np.int32),
                axis=2,
            ).sum(1)
            ref = float(jnp.max(jnp.abs(out - g)))
        # timing with data-dependent chaining (axon dedupes identical
        # dispatches); sync by pulling a scalar
        shift = out[0, 0, 0] * 1e-9
        float(jnp.sum(shift))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(table + shift, idx)
            shift = out[0, 0, 0] * 1e-9
        float(jnp.sum(shift))
        dt = (time.perf_counter() - t0) / iters
        results[name] = dt
        print(json.dumps({
            "impl": name, "S": S, "ms_per_level_layer": round(dt * 1e3, 3),
            "ns_per_descriptor": round(dt / n_desc * 1e9, 3),
            "max_err_vs_xla": ref, "addresses": ("coherent" if coherent
                                                 else "random"),
            "qt": QT, "k": K, "unroll_q": UNROLL_Q,
        }), flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--levels", type=int, nargs="+", default=[625, 2500])
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes, CPU interpret mode (correctness only)")
    ap.add_argument("--coherent", action="store_true",
                    help="production-like spatially-coherent addresses "
                         "instead of uniform-random ones")
    ap.add_argument("--qt", type=int, default=None, help="query tile size")
    ap.add_argument("--kk", type=int, default=None, help="points per query")
    ap.add_argument("--unroll", type=int, default=None,
                    help="queries per scalar-loop body")
    args = ap.parse_args()

    global BM, QP, QT, K, UNROLL_Q
    if args.qt:
        QT = args.qt
        assert QP % QT == 0
    if args.kk:
        K = args.kk
    if args.unroll:
        UNROLL_Q = args.unroll
        assert QT % UNROLL_Q == 0

    import jax

    if args.smoke:
        # tile-able smoke shapes: block dims must be divisible by (8, 128)
        # or equal the full array dims
        BM, QP, QT = 2, 128, 128
        for S in (40,):
            bench_level(S, iters=1)
        return
    assert jax.default_backend() == "tpu", "run on the real chip"
    for S in args.levels:
        bench_level(S, args.iters, coherent=args.coherent)


if __name__ == "__main__":
    main()
