"""Shared Flax building blocks (NHWC, batch-first)."""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Torch-parity initializers --------------------------------------------------
# xavier_uniform matches torch.nn.init.xavier_uniform_.
xavier_uniform = nn.initializers.xavier_uniform()


def c2_xavier_init(key, shape, dtype=jnp.float32):
    """detectron2 `c2_xavier_fill`: kaiming_uniform(a=1) == uniform with
    bound sqrt(6 / ((1 + a^2) * fan_in)) = sqrt(3 / fan_in)."""
    if len(shape) == 4:  # HWIO conv
        fan_in = shape[0] * shape[1] * shape[2]
    else:  # (in, out) dense
        fan_in = shape[0]
    bound = (3.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    fan_in = shape[0] if len(shape) == 2 else shape[0] * shape[1] * shape[2]
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class FrozenBatchNorm(nn.Module):
    """detectron2 FrozenBN folded to affine scale/bias, stored in the
    non-trainable 'frozen' collection (never receives gradients).

    At weight-conversion time: scale = gamma / sqrt(var + 1e-5),
    bias = beta - mean * scale.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.variable(
            "frozen", "scale", lambda: jnp.ones((self.features,), jnp.float32)
        )
        bias = self.variable(
            "frozen", "bias", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        return x * scale.value.astype(x.dtype) + bias.value.astype(x.dtype)


class MLP(nn.Module):
    """DETR-style MLP: (num_layers-1) hidden ReLU layers + linear output
    (reference: mask2former_transformer_decoder.py:192-204)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(
                out,
                kernel_init=torch_linear_init,
                bias_init=torch_linear_init_bias,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


def torch_linear_init_bias(key, shape, dtype=jnp.float32):
    # torch Linear bias: U(+-1/sqrt(fan_in)); fan_in unknown here, use 0
    # (bias init is numerically immaterial; exact parity comes from converted
    # checkpoints).
    return jnp.zeros(shape, dtype)


def get_norm(name: str, features: int, dtype=jnp.float32):
    if name in ("", None, "none"):
        return None
    if name == "group_norm":
        # detectron2 "GN" = GroupNorm(32, C)
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype)
    if name == "layer_norm":
        return nn.LayerNorm(epsilon=1e-5, dtype=dtype)
    if name == "frozen_bn":
        return FrozenBatchNorm(features)
    raise ValueError(f"unknown norm {name!r}")


class MultiHeadAttention(nn.Module):
    """Multi-head attention with torch nn.MultiheadAttention layout:
    packed qkv projection + out projection, xavier_uniform init.

    Inputs are batch-first (B, N, C). `attn_bias` is an additive float bias
    broadcastable to (B, heads, Nq, Nk) — the TPU-native expression of the
    reference's boolean attn_mask (True == blocked == -inf).
    """

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, attn_bias=None):
        C = query.shape[-1]
        H = self.num_heads
        D = C // H
        qkv_kernel = self.param("in_proj_weight", xavier_uniform, (C, 3 * C))
        qkv_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,))
        q = query @ qkv_kernel[:, :C].astype(self.dtype) + qkv_bias[:C].astype(self.dtype)
        k = key @ qkv_kernel[:, C : 2 * C].astype(self.dtype) + qkv_bias[C : 2 * C].astype(self.dtype)
        v = value @ qkv_kernel[:, 2 * C :].astype(self.dtype) + qkv_bias[2 * C :].astype(self.dtype)

        B, Nq, _ = q.shape
        Nk = k.shape[1]
        q = q.reshape(B, Nq, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, Nk, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, Nk, H, D).transpose(0, 2, 1, 3)

        scale = 1.0 / (D**0.5)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        if attn_bias is not None:
            logits = logits + attn_bias.astype(logits.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
        out = nn.Dense(
            C,
            kernel_init=xavier_uniform,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out_proj",
        )(out)
        return out
