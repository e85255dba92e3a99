"""Optimizer with the reference's parameter-group policy (reference:
train_net.py:184-263 `Trainer.build_optimizer`):

- AdamW, base LR 1e-4, weight decay 0.05;
- backbone parameters at 0.1x LR (BACKBONE_MULTIPLIER);
- zero weight decay on norm parameters and on embedding-like parameters
  (query_feat / query_embed / level_embed / relative position tables);
- FULL-MODEL gradient clipping at global L2 norm 0.01
  (FullModelGradientClippingOptimizer, train_net.py:233-248);
- WarmupMultiStep LR schedule (d2 WarmupParamScheduler semantics).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from bm2f_tpu.config import OptimizerConfig

_NO_DECAY_TOKENS = (
    "norm",
    "query_feat",
    "query_embed",
    "level_embed",
    "relative_position_bias_table",
    "absolute_pos_embed",
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path).lower()


def _no_decay(path_s: str) -> bool:
    return any(t in path_s for t in _NO_DECAY_TOKENS)


def _is_backbone(path_s: str) -> bool:
    return path_s.startswith("backbone")


def make_lr_schedule(cfg: OptimizerConfig):
    """WarmupMultiStep (COCO/YTVIS) or WarmupPolyLR (ADE20K/Cityscapes/
    Mapillary semantic configs; d2 WarmupPolyLR semantics: base_lr *
    (1 - step/max_iter)^power, floored at constant_ending * base_lr —
    Base-ADE20K-SemanticSegmentation.yaml:27-31)."""
    steps = jnp.asarray(cfg.steps) if cfg.steps else jnp.zeros((0,))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(
            step < cfg.warmup_iters,
            cfg.warmup_factor + (1.0 - cfg.warmup_factor)
            * step / jnp.maximum(cfg.warmup_iters, 1),
            1.0,
        )
        if cfg.lr_schedule == "poly":
            frac = jnp.clip(step / max(cfg.max_iter, 1), 0.0, 1.0)
            decay = jnp.maximum(
                (1.0 - frac) ** cfg.poly_power, cfg.poly_constant_ending
            )
        else:
            decay = cfg.gamma ** jnp.sum(step >= steps)
        return cfg.base_lr * warm * decay

    return schedule


def make_optimizer(cfg: OptimizerConfig, params) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg)

    lr_mult = jax.tree_util.tree_map_with_path(
        lambda p, _: cfg.backbone_multiplier if _is_backbone(_path_str(p)) else 1.0,
        params,
    )
    wd_mask = jax.tree_util.tree_map_with_path(
        lambda p, _: 0.0 if _no_decay(_path_str(p)) else 1.0, params
    )

    def add_weight_decay():
        def update_fn(updates, state, params):
            updates = jax.tree.map(
                lambda u, p, m: u + cfg.weight_decay * m * p, updates, params, wd_mask
            )
            return updates, state

        return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)

    def scale_by_lr_mult():
        def update_fn(updates, state, params=None):
            updates = jax.tree.map(lambda u, m: u * m, updates, lr_mult)
            return updates, state

        return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)

    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_gradients),
        optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=1e-8),
        add_weight_decay(),
        scale_by_lr_mult(),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    )
