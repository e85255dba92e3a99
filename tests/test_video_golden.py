"""Video-stack golden parity vs the torch oracle (round-3 verdict item 4):
3D sine PE, the clip decoder (einsum bqc,btchw->bqthw + T*H*W attention-mask
flatten, reference video_mask2former_transformer_decoder.py:449-458), the
FULL video model forward with converted weights
(video_maskformer_model.py:278-393), and inference_video track selection
(:651-694). The image stack has had this protection since round 2
(test_full_model_golden.py); this closes the same hole for video."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from torch_oracle import (
    make_r50_m2f_state_dict,
    sine_pos_3d,
    torch_inference_video,
    torch_video_decoder,
    torch_video_mask2former_forward,
)

pytestmark = pytest.mark.slow

B, T, H, W = 1, 2, 96, 128
NUM_CLASSES, NUM_QUERIES = 40, 100


def test_sine_position_embedding_3d_matches_reference():
    from bm2f_tpu.models.position_encoding import sine_position_embedding_3d

    ours = np.asarray(sine_position_embedding_3d(3, 8, 11, 128))  # (T,H,W,C)
    ref = sine_pos_3d(3, 8, 11, 128).numpy()  # (T, C, H, W)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-5, atol=1e-5)


def _video_variables(sd):
    """Convert the torch state dict and regraft the image tree onto the
    video model's module names (identical leaves; the video decoder shares
    the image decoder's parameter shapes)."""
    from bm2f_tpu.utils.convert_weights import convert_checkpoint

    v = convert_checkpoint(sd)
    params = {
        "backbone": v["params"]["backbone"],
        "sem_seg_head_pixel_decoder": v["params"]["sem_seg_head"]["pixel_decoder"],
        "sem_seg_head_predictor": v["params"]["sem_seg_head"]["predictor"],
    }
    return {"params": params, "frozen": v["frozen"]}


@pytest.fixture(scope="module")
def video_outputs():
    from bm2f_tpu.config import get_config
    from bm2f_tpu.video import build_video_model

    rng = np.random.RandomState(7)
    sd = make_r50_m2f_state_dict(rng, NUM_CLASSES, NUM_QUERIES)
    clip = rng.randn(B, T, H, W, 3).astype(np.float32)  # already-normalized

    with torch.no_grad():
        ref = torch_video_mask2former_forward(
            sd, torch.from_numpy(clip.transpose(0, 1, 4, 2, 3)),
            NUM_CLASSES, NUM_QUERIES,
        )

    cfg = get_config(
        "ytvis2019_video_r50",
        {"model.dtype": "float32", "model.pixel_decoder_f32": True},
    )
    model = build_video_model(cfg)
    variables = _video_variables(sd)
    ours = jax.jit(lambda c: model.apply(variables, c))(jnp.asarray(clip))
    return ref, jax.tree.map(np.asarray, ours)


def test_video_forward_logits_and_masks_match(video_outputs):
    ref, ours = video_outputs
    np.testing.assert_allclose(
        ours["pred_logits"], ref["pred_logits"].numpy(), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        ours["pred_masks"], ref["pred_masks"].numpy(), rtol=1e-3, atol=1.5e-3
    )


def test_video_forward_aux_outputs_match(video_outputs):
    ref, ours = video_outputs
    np.testing.assert_allclose(
        ours["aux_logits"], ref["aux_logits"].numpy(), rtol=1e-3, atol=1.5e-3
    )
    np.testing.assert_allclose(
        ours["aux_masks"], ref["aux_masks"].numpy(), rtol=1e-3, atol=2e-3
    )


def test_video_decoder_isolated_golden():
    """Clip decoder alone on random features — a tighter tolerance than the
    full model (no backbone/pixel-decoder error accumulation)."""
    from bm2f_tpu.config import get_config
    from bm2f_tpu.video.video_decoder import (
        VideoMultiScaleMaskedTransformerDecoder,
    )

    rng = np.random.RandomState(9)
    sd = make_r50_m2f_state_dict(rng, NUM_CLASSES, NUM_QUERIES)
    sizes = [(3, 4), (6, 8), (12, 16)]
    ms = [rng.randn(B, T, h, w, 256).astype(np.float32) for h, w in sizes]
    mf = rng.randn(B, T, 24, 32, 256).astype(np.float32)

    with torch.no_grad():
        ref = torch_video_decoder(
            sd,
            [torch.from_numpy(m.transpose(0, 1, 4, 2, 3)) for m in ms],
            torch.from_numpy(mf.transpose(0, 1, 4, 2, 3)),
            NUM_CLASSES, NUM_QUERIES,
        )

    cfg = get_config("ytvis2019_video_r50")
    dec = VideoMultiScaleMaskedTransformerDecoder(cfg.model.decoder, NUM_CLASSES)
    variables = _video_variables(sd)
    params = variables["params"]["sem_seg_head_predictor"]
    ours = jax.jit(
        lambda ms, mf: dec.apply({"params": params},
                                 [jnp.asarray(m) for m in ms], jnp.asarray(mf))
    )(ms, mf)
    ours = jax.tree.map(np.asarray, ours)
    np.testing.assert_allclose(ours["pred_logits"], ref["pred_logits"].numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ours["pred_masks"], ref["pred_masks"].numpy(),
                               rtol=1e-4, atol=1e-4)


def test_inference_video_matches_reference():
    from bm2f_tpu.video.video_maskformer import inference_video

    rng = np.random.RandomState(4)
    cls = (rng.randn(NUM_QUERIES, NUM_CLASSES + 1) * 3).astype(np.float32)
    masks = (rng.randn(NUM_QUERIES, T, 24, 32) * 2).astype(np.float32)

    ours = inference_video(jnp.asarray(cls), jnp.asarray(masks),
                           num_classes=NUM_CLASSES, topk=10)
    s_r, l_r, m_r = torch_inference_video(
        torch.from_numpy(cls), torch.from_numpy(masks), NUM_CLASSES, 10)

    np.testing.assert_allclose(np.asarray(ours["scores"]), s_r.numpy(),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(ours["labels"]), l_r.numpy())
    np.testing.assert_array_equal(np.asarray(ours["masks"]), m_r.numpy())


def test_video_loss_masks_validity_ordering():
    """_video_loss_masks rows are ordered (b, t, g); the validity weights
    must follow the SAME order. With a padded (invalid) instance present,
    the loss must equal the loss of the valid-only batch exactly (candidate
    points are shared per (image, frame), so the valid instance's rows see
    identical samples either way)."""
    import jax.numpy as jnp

    from bm2f_tpu.losses.criterion import SetCriterionConfig
    from bm2f_tpu.losses.video_criterion import _video_loss_masks

    rng = np.random.RandomState(2)
    B, Q, T, h, w = 1, 4, 3, 12, 16
    cfg = SetCriterionConfig(
        num_classes=5, eos_coef=0.1, class_weight=2.0, mask_weight=5.0,
        dice_weight=5.0, num_points=32, oversample_ratio=3.0,
        importance_sample_ratio=0.75,
    )
    pred = jnp.asarray(rng.randn(B, Q, T, h, w).astype(np.float32))
    tgt2 = jnp.asarray((rng.rand(B, 2, T, h, w) > 0.6).astype(np.float32))
    key = jax.random.PRNGKey(7)

    # padded: instance 1 invalid (its masks are garbage on purpose)
    lm2, ld2 = _video_loss_masks(
        key, pred, tgt2, jnp.asarray([[True, False]]),
        jnp.asarray([[0, 3]]), 1.0, cfg,
    )
    # valid-only
    lm1, ld1 = _video_loss_masks(
        key, pred, tgt2[:, :1], jnp.asarray([[True]]),
        jnp.asarray([[0]]), 1.0, cfg,
    )
    np.testing.assert_allclose(float(lm2), float(lm1), rtol=1e-6)
    np.testing.assert_allclose(float(ld2), float(ld1), rtol=1e-6)
