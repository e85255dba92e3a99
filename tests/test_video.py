"""Video stack tests: clip-flattened forward, track inference, video
criterion end-to-end with grads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bm2f_tpu.config import get_config
from bm2f_tpu.losses.criterion import SetCriterionConfig
from bm2f_tpu.losses.video_criterion import video_set_criterion
from bm2f_tpu.models.maskformer import normalize_images
from bm2f_tpu.video import build_video_model
from bm2f_tpu.video.video_maskformer import inference_video


@pytest.fixture(scope="module")
def video_setup():
    # dryrun-style width shrink: clip flattening / 3D PE / track inference
    # are width-independent, and full-width R50+decoder compiles cost ~100 s
    # on this 1-core host (video-path numerics parity lives in the slow-tier
    # test_video_golden.py at reference widths)
    cfg = get_config(
        "ytvis2019_video_r50",
        {
            "model.decoder.dec_layers": 3,
            "model.loss.train_num_points": 256,
            "model.backbone.resnet.depth": 14,
            "model.pixel_decoder.conv_dim": 64,
            "model.pixel_decoder.mask_dim": 64,
            "model.pixel_decoder.transformer_enc_layers": 2,
            "model.pixel_decoder.transformer_nheads": 4,
            "model.pixel_decoder.transformer_dim_feedforward": 128,
            "model.decoder.hidden_dim": 64,
            "model.decoder.mask_dim": 64,
            "model.decoder.num_queries": 20,
            "model.decoder.nheads": 4,
            "model.decoder.dim_feedforward": 128,
        },
    )
    model = build_video_model(cfg)
    imgs = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), normalize_images(imgs, cfg.model))
    return cfg, model, variables


def test_video_forward_shapes(video_setup):
    cfg, model, variables = video_setup
    imgs = jnp.zeros((2, 2, 64, 64, 3), jnp.float32)
    out = model.apply(variables, normalize_images(imgs, cfg.model))
    Q = cfg.model.decoder.num_queries
    assert out["pred_logits"].shape == (2, Q, 41)
    assert out["pred_masks"].shape == (2, Q, 2, 16, 16)
    assert out["aux_masks"].shape == (3, 2, Q, 2, 16, 16)


def test_inference_video(video_setup):
    cfg, model, variables = video_setup
    imgs = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    out = model.apply(variables, normalize_images(imgs, cfg.model))
    tracks = inference_video(
        out["pred_logits"][0], out["pred_masks"][0], num_classes=40, topk=10
    )
    assert tracks["scores"].shape == (10,)
    assert tracks["masks"].shape == (10, 2, 16, 16)
    assert tracks["masks"].dtype == bool


@pytest.mark.slow
def test_video_criterion_and_grads(rng):
    B, Q, K, G, T, h, w = 2, 6, 4, 3, 2, 16, 16
    logits = jnp.asarray(rng.randn(B, Q, K + 1).astype(np.float32))
    masks = jnp.asarray(rng.randn(B, Q, T, h, w).astype(np.float32))
    targets = {
        "labels": jnp.asarray(rng.randint(0, K, (B, G)).astype(np.int32)),
        "masks": jnp.asarray((rng.rand(B, G, T, h * 4, w * 4) > 0.8).astype(np.float32)),
        "valid": jnp.asarray(np.array([[1, 1, 0], [1, 1, 1]], bool)),
    }
    cfg = SetCriterionConfig(num_classes=K, num_points=128)

    def f(logits, masks):
        outputs = {
            "pred_logits": logits,
            "pred_masks": masks,
            "aux_logits": logits[None],
            "aux_masks": masks[None],
        }
        total, losses = video_set_criterion(outputs, targets, cfg, jax.random.PRNGKey(0))
        return total, losses

    (total, losses), (gl, gm) = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
        logits, masks
    )
    assert np.isfinite(float(total))
    assert np.isfinite(np.asarray(gm)).all()
    assert np.abs(np.asarray(gm)).sum() > 0
    assert "loss_dice_0" in losses  # aux layer losses present


@pytest.mark.slow
def test_frame_validity_padding_equivalence():
    """Padding a clip to a larger static T bucket with frame_valid gives
    EXACTLY the prediction of true-length inference (the padded frames'
    keys are masked out of every cross-attention) — the static-shape
    replacement for the reference's per-length dynamic clips."""
    import jax
    import jax.numpy as jnp

    from bm2f_tpu.config import get_config
    from bm2f_tpu.models.maskformer import normalize_images
    from bm2f_tpu.video import build_video_model

    cfg = get_config("ytvis2019_video_r50", {
        "model.decoder.dec_layers": 2,
        "model.decoder.num_queries": 8,
        "model.pixel_decoder.transformer_enc_layers": 1,
        "model.num_classes": 5,
    })
    model = build_video_model(cfg)
    rng = np.random.RandomState(0)
    T = 2
    clip = rng.rand(1, T, 64, 64, 3).astype(np.float32) * 255
    imgs = normalize_images(jnp.asarray(clip), cfg.model)
    variables = model.init(jax.random.PRNGKey(0), imgs)
    out_true = model.apply(variables, imgs)

    Tp = 5
    padded = np.zeros((1, Tp, 64, 64, 3), np.float32)
    padded[:, :T] = clip
    fv = np.zeros((1, Tp), bool)
    fv[:, :T] = True
    out_pad = model.apply(
        variables, normalize_images(jnp.asarray(padded), cfg.model),
        jnp.asarray(fv))

    np.testing.assert_allclose(
        np.asarray(out_pad["pred_logits"]), np.asarray(out_true["pred_logits"]),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_pad["pred_masks"])[:, :, :T],
        np.asarray(out_true["pred_masks"]), rtol=1e-4, atol=1e-4)
