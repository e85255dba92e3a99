#!/usr/bin/env python
"""Guard for the round-3 remat win: verify JAX DCEs the Pallas gather
forward out of the encoder backward recompute.

With the encoder remat policy saving "deform_attn_out" AND
"deform_gather_out" (models/pixel_decoder.py), the grad jaxpr of one
encoder layer must contain exactly 2 pallas_call equations (primal
forward + fused backward). 3 means the backward-pass re-run is back
(~11 ms/layer at 1024^2 B=2; 0.590 -> 0.527 s/it when fixed).

This is a pure abstract trace (make_jaxpr) — nothing compiles or runs —
but it must execute on the default (TPU/axon) backend: the CPU test
backend forces pallas interpret mode, whose IO effect remat partial-eval
rejects, which is why this guard is a tool rather than a pytest test
(tests/conftest.py pins the suite to CPU).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bm2f_tpu.models.pixel_decoder import (
    DeformableEncoderLayer,
    encoder_reference_points,
)


def main():
    layer = nn.remat(
        DeformableEncoderLayer,
        static_argnums=(4,),
        policy=jax.checkpoint_policies.save_only_these_names(
            "deform_attn_out", "deform_gather_out"
        ),
    )(d_model=256, d_ffn=256, n_levels=3, n_heads=8, n_points=4,
      dtype=jnp.bfloat16, impl="pallas", q_tile=256)

    shapes = ((32, 32), (16, 16), (8, 8))
    S = sum(h * w for h, w in shapes)
    refs = encoder_reference_points(shapes)
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(1, S, 256), jnp.bfloat16)
    pos = jnp.asarray(rng.randn(1, S, 256), jnp.bfloat16)
    variables = jax.eval_shape(
        lambda: layer.init(jax.random.PRNGKey(0), src, pos, refs, shapes)
    )
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )

    def loss(params, s_):
        out = layer.apply(params, s_, pos, refs, shapes)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    jaxpr = str(jax.make_jaxpr(jax.grad(loss, argnums=(0, 1)))(variables, src))
    n = jaxpr.count("pallas_call[")
    assert n == 2, (
        f"expected 2 pallas_call eqns (fwd+bwd), got {n} — "
        "the encoder remat re-run is back"
    )
    print(f"remat DCE OK: {n} pallas_call eqns in the grad jaxpr (fwd+bwd)")


if __name__ == "__main__":
    main()
