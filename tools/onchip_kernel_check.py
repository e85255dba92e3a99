#!/usr/bin/env python
"""On-chip Pallas kernel gate (VERDICT r3 item 5): a short NON-interpret
fwd+bwd allclose check of the Pallas deformable-attention kernel against the
XLA im2col oracle ON THE REAL TPU. The committed pytest suite runs the
kernel only in interpreter mode on CPU (tests/conftest.py forces cpu), so a
Mosaic miscompile would pass the whole suite — this gate closes that hole.
Run it on the default axon backend every round (the verify skill documents
it); result is recorded in STATUS.md.

Mirrors the reference kernel test's structure (fwd equality + grad check,
/root/reference/mask2former/modeling/pixel_decoder/ops/test.py:35-89) but
both sides run on the TPU so tolerances reflect device math only.

Prints one JSON line {"onchip_kernel_check": "pass"|"fail", ...}; exit 1 on
mismatch. Uses modest shapes to keep the cold compile short; warm runs take
seconds (server-side HLO cache).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "true")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bm2f_tpu.ops import ms_deform_attn

    backend = jax.default_backend()
    if backend != "tpu":
        print(json.dumps({"onchip_kernel_check": "skip",
                          "reason": f"default backend is {backend}, not tpu"}))
        sys.exit(2)

    # modest production-flavoured shapes: 3 levels, M=8 heads, D=32,
    # K=L*P=12 points — small S/Q keep the cold compile bounded
    rng = np.random.RandomState(0)
    B, M, D, P = 2, 8, 32, 4
    shapes = ((24, 32), (12, 16), (6, 8))
    S = sum(h * w for h, w in shapes)
    Q = 256
    L = len(shapes)
    value = rng.randn(B, S, M, D).astype(np.float32)
    loc = (rng.rand(B, Q, M, L, P, 2) * 1.2 - 0.1).astype(np.float32)
    attn = rng.rand(B, Q, M, L, P).astype(np.float32)
    attn = (attn / attn.sum(axis=(-1, -2), keepdims=True)).astype(np.float32)
    v, l, a = jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)

    def run(impl):
        @jax.jit
        def fwd(v, l, a):
            return ms_deform_attn(v, shapes, l, a, impl=impl)

        @jax.jit
        def grads(v, l, a):
            def loss(v, l, a):
                return jnp.sum(ms_deform_attn(v, shapes, l, a, impl=impl) ** 2)

            return jax.grad(loss, argnums=(0, 1, 2))(v, l, a)

        t0 = time.time()
        out = np.asarray(fwd(v, l, a))
        gv, gl, ga = [np.asarray(g) for g in grads(v, l, a)]
        dt = time.time() - t0
        return out, gv, gl, ga, dt

    out_p, gv_p, gl_p, ga_p, t_pallas = run("pallas")
    out_x, gv_x, gl_x, ga_x, t_xla = run("im2col")

    checks = {
        "fwd": (out_p, out_x, 1e-3, 1e-4),
        "d_value": (gv_p, gv_x, 1e-3, 1e-3),
        "d_loc": (gl_p, gl_x, 5e-3, 5e-3),
        "d_attn": (ga_p, ga_x, 1e-3, 1e-3),
    }
    errs = {}
    ok = True
    for name, (pa, xa, rtol, atol) in checks.items():
        denom = np.maximum(np.abs(xa), atol / max(rtol, 1e-12))
        rel = float(np.max(np.abs(pa - xa) / denom))
        errs[name] = round(rel, 6)
        if not np.allclose(pa, xa, rtol=rtol, atol=atol):
            ok = False
    finite = all(np.all(np.isfinite(x))
                 for x in (out_p, gv_p, gl_p, ga_p))
    ok = ok and finite

    print(json.dumps({
        "onchip_kernel_check": "pass" if ok else "fail",
        "max_rel_err": errs,
        "finite": finite,
        "t_pallas_s": round(t_pallas, 1),
        "t_xla_s": round(t_xla, 1),
        "backend": backend,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
