"""Swin Transformer backbone (reference: mask2former/modeling/backbone/swin.py,
a Detectron2 wrap of the official Swin), rebuilt in Flax for TPU:

- NHWC throughout; window partition/reverse are reshapes (no copies for XLA);
- shifted-window attention masks are compile-time numpy constants per static
  feature size (the reference builds them per forward on device);
- relative-position-bias tables are gathered once per block per shape;
- stochastic depth (DropPath) active only when `deterministic=False`.

Variants (reference config.py:74-90): T (96, [2,2,6,2], [3,6,12,24], w7),
S (96, [2,2,18,2]), B (128, [2,2,18,2], [4,8,16,32]), L (192, [2,2,18,2],
[6,12,24,48], w7 or w12 for 384 pretrain).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bm2f_tpu.config import SwinConfig
from bm2f_tpu.models.layers import torch_linear_init, xavier_uniform


def trunc_normal_init(std=0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def _relative_position_index(window: int) -> np.ndarray:
    """(w*w, w*w) indices into the (2w-1)^2 bias table (standard Swin)."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    )  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, w*w, w*w)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # (w*w, w*w)


def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """Additive mask (num_windows, w*w, w*w) with -100 where tokens belong to
    different pre-shift regions (standard Swin shifted-window masking)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // window, window, wp // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _shift_attn_mask_device(hp: int, wp: int, window: int, shift: int):
    """On-device `_shift_attn_mask` (identical values, built from iota): the
    numpy version embeds (nW, w^2, w^2) f32 constants in the HLO — ~24 MB
    per shifted block at Swin-L 800^2 stride 4, which overflows the axon
    remote-compile request (HTTP 413) and bloats every executable. The
    region-id zoning is 0 for [0, n-w), 1 for [n-w, n-shift), 2 for the
    final shift rows (matching the reference's cnt ordering because zone
    ids are monotone in position)."""

    def zone(n):
        i = jax.lax.iota(jnp.int32, n)
        return (i >= n - window).astype(jnp.int32) + (i >= n - shift).astype(
            jnp.int32
        )

    ids = zone(hp)[:, None] * 3 + zone(wp)[None, :]  # (hp, wp)
    win = ids.reshape(hp // window, window, wp // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, :, None] != win[:, None, :]
    return jnp.where(diff, -100.0, 0.0).astype(jnp.float32)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, window*window, C); H, W divisible by window."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, C)


def window_reverse(x: jnp.ndarray, window: int, B: int, H: int, W: int) -> jnp.ndarray:
    C = x.shape[-1]
    x = x.reshape(B, H // window, W // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class DropPath(nn.Module):
    """Stochastic depth. `rate` may be overridden per call with a (possibly
    traced) scalar — required by the stage-scan path, where the per-block
    rate is a scanned input rather than a static attribute."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool, rate=None):
        if deterministic or (rate is None and self.rate == 0.0):
            return x
        r = self.rate if rate is None else rate
        keep = 1.0 - r
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask):
        """x: (nW*B, N, C) with N = window^2; attn_mask (nW, N, N) or None."""
        Bw, N, C = x.shape
        H = self.num_heads
        D = C // H
        scale = self.qk_scale or D**-0.5

        bias_table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(0.02),
            ((2 * self.window - 1) ** 2, H),
        )
        rel_idx = jnp.asarray(_relative_position_index(self.window))

        qkv = nn.Dense(
            3 * C, use_bias=self.qkv_bias, kernel_init=torch_linear_init,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="qkv",
        )(x)
        q, k, v = jnp.split(qkv.reshape(Bw, N, 3, H, D).transpose(2, 0, 3, 1, 4), 3)
        q, k, v = q[0], k[0], v[0]  # (Bw, H, N, D)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        rel_bias = bias_table[rel_idx.reshape(-1)].reshape(N, N, H)
        attn = attn + rel_bias.transpose(2, 0, 1)[None].astype(attn.dtype)
        if attn_mask is not None:
            nW = attn_mask.shape[0]
            attn = attn.reshape(Bw // nW, nW, H, N, N) + attn_mask[
                None, :, None
            ].astype(attn.dtype)
            attn = attn.reshape(Bw, H, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bw, N, C)
        return nn.Dense(
            C, kernel_init=torch_linear_init, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="proj",
        )(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    drop_path: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dp_rate=None):
        """x: (B, H, W, C). `dp_rate` optionally overrides the static
        drop_path rate (traced scalar under the stage scan)."""
        B, H, W, C = x.shape
        w = self.window
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)

        # pad to window multiples (right/bottom, like torch F.pad)
        hp = int(math.ceil(H / w)) * w
        wp = int(math.ceil(W / w)) * w
        x = jnp.pad(x, ((0, 0), (0, hp - H), (0, wp - W), (0, 0)))

        # The reference backbone (mask2former swin.py) always rolls and relies
        # on the region attention mask, even when the padded map is a single
        # window — keep that so converted checkpoints match at small inputs.
        shift = self.shift
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = _shift_attn_mask_device(hp, wp, w, shift)
        else:
            mask = None

        xw = window_partition(x, w)
        xw = WindowAttention(
            self.dim, w, self.num_heads, self.qkv_bias, self.qk_scale,
            dtype=self.dtype, name="attn",
        )(xw, mask)
        x = window_reverse(xw, w, B, hp, wp)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :H, :W]

        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(x, deterministic, dp_rate)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(
            int(self.dim * self.mlp_ratio), kernel_init=torch_linear_init,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="mlp_fc1",
        )(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(
            self.dim, kernel_init=torch_linear_init,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="mlp_fc2",
        )(y)
        return x + dp(y, deterministic, dp_rate)


class SwinBlockPair(nn.Module):
    """One (unshifted, shifted) block pair — the nn.scan unit of a Swin
    stage. Swin's blocks strictly alternate shift=0 / shift=window//2
    (reference swin.py:446: `shift_size=0 if (i % 2 == 0) else ...`) and all
    stage depths are even in every published variant, so a stage of depth d
    is d/2 identical-structure pairs: scanning them compiles the pair body
    ONCE instead of d times (Swin-L stage 2: 18 blocks -> 1 compiled pair;
    the unrolled form was the bulk of the Swin-L forward's ~29 min cold
    XLA compile). Per-block drop-path rates arrive as scanned inputs.

    Param tree: stage{s}_pairs/block{0,1}/... with a leading (d/2,) axis,
    mapped from the reference's layers.{s}.blocks.{i} by
    utils/convert_weights.py (block0 <- even i, block1 <- odd i)."""

    dim: int
    num_heads: int
    window: int
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    dtype: Any = jnp.float32
    use_remat: bool = False

    @nn.compact
    def __call__(self, x, dp_rates, deterministic: bool = True):
        block_cls = (
            nn.remat(SwinBlock, static_argnums=(2,))
            if self.use_remat
            else SwinBlock
        )
        common = dict(
            dim=self.dim, num_heads=self.num_heads, window=self.window,
            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, drop_path=0.0, dtype=self.dtype,
        )
        x = block_cls(shift=0, name="block0", **common)(
            x, deterministic, dp_rates[0]
        )
        x = block_cls(shift=self.window // 2, name="block1", **common)(
            x, deterministic, dp_rates[1]
        )
        return x


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, H, W, C) -> (B, ceil(H/2), ceil(W/2), 2C)."""
        B, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], -1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(
            2 * self.dim, use_bias=False, kernel_init=torch_linear_init,
            dtype=self.dtype, name="reduction",
        )(x)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path_rate: float = 0.3
    ape: bool = False
    patch_norm: bool = True
    pretrain_img_size: int = 224
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: SwinConfig, dtype=jnp.float32, name=None):
        return cls(
            embed_dim=cfg.embed_dim,
            depths=tuple(cfg.depths),
            num_heads=tuple(cfg.num_heads),
            window=cfg.window_size,
            patch_size=cfg.patch_size,
            mlp_ratio=cfg.mlp_ratio,
            qkv_bias=cfg.qkv_bias,
            qk_scale=cfg.qk_scale,
            drop_path_rate=cfg.drop_path_rate,
            ape=cfg.ape,
            patch_norm=cfg.patch_norm,
            pretrain_img_size=cfg.pretrain_img_size,
            out_features=tuple(cfg.out_features),
            use_checkpoint=cfg.use_checkpoint,
            dtype=dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.dtype)
        p = self.patch_size
        B, H, W, _ = x.shape
        x = jnp.pad(x, ((0, 0), (0, (-H) % p), (0, (-W) % p), (0, 0)))
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            kernel_init=torch_linear_init, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="patch_embed_proj",
        )(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_embed_norm")(x)
        if self.ape:
            gs = self.pretrain_img_size // p
            ape = self.param(
                "absolute_pos_embed", trunc_normal_init(0.02),
                (gs, gs, self.embed_dim),
            )
            from bm2f_tpu.ops import resize_bilinear

            x = x + resize_bilinear(ape[None], x.shape[1], x.shape[2]).astype(self.dtype)

        total_depth = sum(self.depths)
        dpr = [
            self.drop_path_rate * i / max(total_depth - 1, 1)
            for i in range(total_depth)
        ]

        outs: Dict[str, jnp.ndarray] = {}
        dim = self.embed_dim
        di = 0
        num_stages = len(self.depths)
        for stage in range(num_stages):
            depth = self.depths[stage]
            if depth % 2 == 0:
                # the common case (every published variant): scan the
                # (unshifted, shifted) block pairs — see SwinBlockPair
                n_pairs = depth // 2
                rates = jnp.asarray(
                    dpr[di : di + depth], jnp.float32
                ).reshape(n_pairs, 2)
                pair = SwinBlockPair(
                    dim=dim,
                    num_heads=self.num_heads[stage],
                    window=self.window,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale,
                    dtype=self.dtype,
                    use_remat=self.use_checkpoint,
                    name=f"stage{stage}_pairs",
                )

                def body(mod, carry, xs):
                    return mod(carry, xs, deterministic), None

                scan = nn.scan(
                    body,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    length=n_pairs,
                )
                x, _ = scan(pair, x, rates)
                di += depth
            else:
                block_cls = (
                    nn.remat(SwinBlock, static_argnums=(2,))
                    if self.use_checkpoint
                    else SwinBlock
                )
                for b in range(depth):
                    x = block_cls(
                        dim=dim,
                        num_heads=self.num_heads[stage],
                        window=self.window,
                        shift=0 if b % 2 == 0 else self.window // 2,
                        mlp_ratio=self.mlp_ratio,
                        qkv_bias=self.qkv_bias,
                        qk_scale=self.qk_scale,
                        drop_path=dpr[di],
                        dtype=self.dtype,
                        name=f"stage{stage}_block{b}",
                    )(x, deterministic)
                    di += 1
            name = f"res{stage + 2}"
            if name in self.out_features:
                outs[name] = nn.LayerNorm(
                    epsilon=1e-5, dtype=self.dtype, name=f"out_norm{stage}"
                )(x)
            if stage < num_stages - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"downsample{stage}")(x)
                dim *= 2
        return outs


SWIN_VARIANTS = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "small": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "base": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "large": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
}
