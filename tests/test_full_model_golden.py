"""Full-model golden parity: the complete R50 Mask2Former forward — stem ->
res5 -> MSDeformAttn encoder -> FPN fuse -> 9-layer masked decoder -> logits/
masks (reference maskformer_model.py:258-377) — with weights converted through
`utils.convert_weights.convert_checkpoint`, against the from-scratch torch
reimplementation in tests/torch_oracle.py. Plus the three inference modes
(:509-623) on shared inputs. This is the in-container stand-in for
zoo-checkpoint AP parity (VERDICT round 1, item 2)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from torch_oracle import (
    make_r50_m2f_state_dict,
    torch_instance_inference,
    torch_mask2former_forward,
    torch_panoptic_inference,
    torch_semantic_inference,
)

pytestmark = pytest.mark.slow

B, H, W = 2, 96, 128
NUM_CLASSES, NUM_QUERIES = 80, 100


@pytest.fixture(scope="module")
def full_model_outputs():
    from bm2f_tpu.config import get_config
    from bm2f_tpu.models import build_model
    from bm2f_tpu.utils.convert_weights import convert_checkpoint

    rng = np.random.RandomState(3)
    sd = make_r50_m2f_state_dict(rng, NUM_CLASSES, NUM_QUERIES)
    images = rng.randn(B, H, W, 3).astype(np.float32)  # already-normalized

    with torch.no_grad():
        ref = torch_mask2former_forward(
            sd, torch.from_numpy(images.transpose(0, 3, 1, 2)),
            NUM_CLASSES, NUM_QUERIES,
        )

    cfg = get_config(
        "coco_instance_r50",
        {"model.dtype": "float32", "model.pixel_decoder_f32": True},
    )
    model = build_model(cfg)
    variables = convert_checkpoint(sd)
    ours = jax.jit(lambda im: model.apply(variables, im))(jnp.asarray(images))
    return ref, jax.tree.map(np.asarray, ours)


def test_full_forward_logits_and_masks_match(full_model_outputs):
    ref, ours = full_model_outputs
    np.testing.assert_allclose(
        ours["pred_logits"], ref["pred_logits"].numpy(), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        ours["pred_masks"], ref["pred_masks"].numpy(), rtol=1e-3, atol=1.5e-3
    )


def test_full_forward_aux_outputs_match(full_model_outputs):
    """Deep-supervision outputs of every decoder layer (incl. the layer-0
    prediction on raw queries, reference :391-396)."""
    ref, ours = full_model_outputs
    np.testing.assert_allclose(
        ours["aux_logits"], ref["aux_logits"].numpy(), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        ours["aux_masks"], ref["aux_masks"].numpy(), rtol=1e-3, atol=1.5e-3
    )


# ---------------------------------------------------------------------------
# inference modes on shared synthetic logits (isolates threshold semantics
# from network numerics)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def shared_logits():
    rng = np.random.RandomState(11)
    mask_cls = (rng.randn(NUM_QUERIES, NUM_CLASSES + 1) * 3).astype(np.float32)
    mask_pred = (rng.randn(NUM_QUERIES, 24, 32) * 2).astype(np.float32)
    return mask_cls, mask_pred


def test_semantic_inference_matches_reference(shared_logits):
    from bm2f_tpu.models.maskformer import semantic_inference

    mask_cls, mask_pred = shared_logits
    ours = np.asarray(
        semantic_inference(jnp.asarray(mask_cls), jnp.asarray(mask_pred))
    )  # (H, W, K)
    ref = torch_semantic_inference(
        torch.from_numpy(mask_cls), torch.from_numpy(mask_pred)
    ).numpy()  # (K, H, W)
    np.testing.assert_allclose(ours.transpose(2, 0, 1), ref, rtol=1e-5, atol=1e-6)


def test_instance_inference_matches_reference(shared_logits):
    from bm2f_tpu.models.maskformer import instance_inference

    mask_cls, mask_pred = shared_logits
    ours = instance_inference(
        jnp.asarray(mask_cls), jnp.asarray(mask_pred),
        num_classes=NUM_CLASSES, topk=100,
    )
    scores_r, labels_r, masks_r = torch_instance_inference(
        torch.from_numpy(mask_cls), torch.from_numpy(mask_pred), NUM_CLASSES, 100
    )
    np.testing.assert_allclose(
        np.asarray(ours["scores"]), scores_r.numpy(), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(ours["labels"]), labels_r.numpy())
    np.testing.assert_array_equal(np.asarray(ours["masks"]), masks_r.numpy())


@pytest.mark.parametrize("thr", [0.015, 0.05])
def test_panoptic_inference_matches_reference(thr):
    """Vectorized fusion + host relabel == the reference's sequential canvas
    loop (keep/overlap thresholds, stuff merging). Masks are mostly-disjoint
    blocks (random masks all fail the 0.8 overlap test, making the comparison
    vacuous); queries 48+ predict empty masks to exercise the area-0 drop."""
    from bm2f_tpu.evaluation.panoptic_post import relabel_panoptic
    from bm2f_tpu.models.maskformer import panoptic_inference

    rng = np.random.RandomState(11)
    mask_cls = (rng.randn(NUM_QUERIES, NUM_CLASSES + 1) * 3).astype(np.float32)
    mask_pred = np.full((NUM_QUERIES, 24, 32), -4.0, np.float32)
    for q in range(48):  # 6x8 grid of 4x4 blocks
        by, bx = divmod(q, 8)
        mask_pred[q, by * 4:(by + 1) * 4, bx * 4:(bx + 1) * 4] = 4.0
    mask_pred += rng.randn(*mask_pred.shape).astype(np.float32) * 0.1
    thing_mask = tuple(c < 40 for c in range(NUM_CLASSES))
    thing_ids = set(range(40))

    pan = panoptic_inference(
        jnp.asarray(mask_cls), jnp.asarray(mask_pred),
        num_classes=NUM_CLASSES, thing_mask=thing_mask,
        object_mask_threshold=thr, overlap_threshold=0.8,
    )
    seg_ours, info_ours = relabel_panoptic(jax.tree.map(np.asarray, pan))

    seg_ref, info_ref = torch_panoptic_inference(
        torch.from_numpy(mask_cls), torch.from_numpy(mask_pred),
        NUM_CLASSES, thing_ids, object_mask_threshold=thr,
        overlap_threshold=0.8,
    )
    assert len(info_ours) > 5, "test vacuous: too few segments produced"
    assert info_ours == info_ref
    np.testing.assert_array_equal(seg_ours, seg_ref.numpy())
