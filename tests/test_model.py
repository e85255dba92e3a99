"""Model-stack tests: shapes, parameter budget, inference paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bm2f_tpu.config import get_config
from bm2f_tpu.models import build_model
from bm2f_tpu.models.maskformer import (
    instance_inference,
    normalize_images,
    panoptic_inference,
    semantic_inference,
)


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = get_config("coco_instance_r50")
    model = build_model(cfg)
    imgs = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), normalize_images(imgs, cfg.model))
    return cfg, model, variables


@pytest.fixture(scope="module")
def forward_out(model_and_vars):
    """One B=2 forward shared by the shape and inference tests (a second
    apply at a different batch recompiles ~25 s on this 1-core host)."""
    cfg, model, variables = model_and_vars
    imgs = jnp.zeros((2, 128, 128, 3), jnp.float32)
    return model.apply(variables, normalize_images(imgs, cfg.model))


def test_forward_shapes(model_and_vars, forward_out):
    cfg, model, variables = model_and_vars
    out = forward_out
    Q = cfg.model.decoder.num_queries
    assert out["pred_logits"].shape == (2, Q, cfg.model.num_classes + 1)
    assert out["pred_masks"].shape == (2, Q, 32, 32)  # stride 4
    assert out["aux_logits"].shape == (9, 2, Q, cfg.model.num_classes + 1)
    assert out["aux_masks"].shape == (9, 2, Q, 32, 32)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()


def test_param_count_matches_reference(model_and_vars):
    # Mask2Former R50 has ~44.0M params (MODEL_ZOO table). FrozenBN affines
    # live in the 'frozen' collection and are not trained.
    _, _, variables = model_and_vars
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert 43e6 < n < 45.5e6, f"param count {n}"


@pytest.mark.slow
def test_grads_flow(model_and_vars):
    cfg, model, variables = model_and_vars
    imgs = jnp.ones((1, 64, 64, 3), jnp.float32)

    def loss_fn(params):
        out = model.apply(
            {"params": params, "frozen": variables["frozen"]},
            normalize_images(imgs, cfg.model),
        )
        return jnp.sum(out["pred_masks"] ** 2) + jnp.sum(out["pred_logits"] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # deep supervision means every decoder layer gets gradient
    g = grads["sem_seg_head"]["predictor"]["rounds"]["cross_attn_0"][
        "multihead_attn"]
    assert np.abs(np.asarray(g["in_proj_weight"])).sum() > 0


def test_inference_paths(model_and_vars, forward_out):
    cfg, model, variables = model_and_vars
    logits = forward_out["pred_logits"][0]
    masks = forward_out["pred_masks"][0]

    sem = semantic_inference(logits, masks)
    assert sem.shape == (32, 32, 80)
    assert (np.asarray(sem) >= 0).all()

    inst = instance_inference(logits, masks, num_classes=80, topk=50)
    assert inst["scores"].shape == (50,)
    s = np.asarray(inst["scores"])
    # scores are mask-rescored after top-k (reference :621), so not sorted —
    # but must lie in [0, 1] and labels in range
    assert (s >= 0).all() and (s <= 1).all()
    assert (np.asarray(inst["labels"]) < 80).all()

    pan = panoptic_inference(
        logits, masks, num_classes=80, thing_mask=tuple([True] * 80),
        object_mask_threshold=0.0, overlap_threshold=0.0,
    )
    quidx = np.asarray(pan["panoptic_quidx"])
    valid = np.asarray(pan["valid"])
    claimed = np.unique(quidx[quidx >= 0])
    # every owning query must be flagged valid
    assert all(valid[q] for q in claimed)


@pytest.mark.slow
def test_maskformer_v1_dispatch():
    """MaskFormer-v1 family is reachable from the config: pixel_decoder
    "transformer_fpn" (fpn.py:205 TransformerEncoderPixelDecoder) +
    decoder "standard" (maskformer_transformer_decoder.py:31)."""
    cfg = get_config("coco_instance_r50", {
        "model.pixel_decoder.name": "transformer_fpn",
        "model.pixel_decoder.transformer_enc_layers": 1,
        "model.decoder.name": "standard",
        "model.decoder.dec_layers": 2,
        "model.decoder.num_queries": 8,
        "model.num_classes": 5,
    })
    model = build_model(cfg)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), normalize_images(imgs, cfg.model))
    # the v1 param tree must contain the encoder + DETR decoder
    head = variables["params"]["sem_seg_head"]
    assert "transformer" in head["pixel_decoder"]
    assert "decoder" in head["predictor"]
    out = model.apply(variables, normalize_images(imgs, cfg.model))
    assert out["pred_logits"].shape == (1, 8, 6)
    assert out["pred_masks"].shape == (1, 8, 16, 16)
    assert out["aux_masks"].shape == (1, 1, 8, 16, 16)
    assert np.all(np.isfinite(np.asarray(out["pred_masks"])))


@pytest.mark.slow
def test_per_pixel_baseline_plus_head():
    """PerPixelBaselinePlusHead (per_pixel_baseline.py:127): per-query mask
    logits double as per-pixel class scores; aux per decoder layer."""
    from bm2f_tpu.config import DecoderConfig, PixelDecoderConfig
    from bm2f_tpu.models.maskformer_v1 import PerPixelBaselinePlusHead

    K = 7
    head = PerPixelBaselinePlusHead(
        cfg=PixelDecoderConfig(transformer_enc_layers=1),
        dec_cfg=DecoderConfig(dec_layers=2, num_queries=999),  # overridden
        num_classes=K,
        in_channels={"res2": 8, "res3": 16, "res4": 32, "res5": 64},
        in_strides={"res2": 4, "res3": 8, "res4": 16, "res5": 32},
    )
    feats = {
        "res2": jnp.zeros((1, 16, 16, 8)),
        "res3": jnp.zeros((1, 8, 8, 16)),
        "res4": jnp.zeros((1, 4, 4, 32)),
        "res5": jnp.zeros((1, 2, 2, 64)),
    }
    variables = head.init(jax.random.PRNGKey(0), feats)
    logits, aux = head.apply(variables, feats)
    assert logits.shape == (1, 16, 16, K)
    assert aux.shape == (1, 1, 16, 16, K)
    # queries == classes (the whole point of baseline+)
    q = variables["params"]["predictor"]["query_embed"]
    assert q.shape[0] == K
