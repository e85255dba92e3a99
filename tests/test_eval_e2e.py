"""End-to-end eval smoke tests: synthetic datasets -> run_eval dispatch
(instance AP / semantic mIoU / panoptic PQ, reference train_net.py:68-148)
-> metric keys. Uses tiny models; mainly validates the eval wiring
(device inference + host postprocess + evaluator + bucketing)."""

import numpy as np
import pytest

import jax

from bm2f_tpu.config import get_config
from bm2f_tpu.data.catalog import DatasetCatalog, MetadataCatalog


def _tiny_cfg(preset="coco_instance_r50", **extra):
    over = {
        "model.decoder.dec_layers": 1,
        "model.decoder.num_queries": 8,
        "model.pixel_decoder.transformer_enc_layers": 1,
        "model.num_classes": 5,
    }
    over.update(extra)
    return get_config(preset, over)


def _tiny_model(cfg):
    import jax.numpy as jnp

    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import normalize_images

    model = build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), normalize_images(jnp.zeros((1, 64, 64, 3)), cfg.model)
    )
    return model, variables


@pytest.mark.slow
def test_run_eval_synthetic():
    from eval import run_eval
    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import normalize_images
    from tests.test_data import _synthetic_instance_dicts

    name = "bm2f_eval_synth"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda: _synthetic_instance_dicts(3, h=96, w=128))

    cfg = get_config("coco_instance_r50", {
        "model.decoder.dec_layers": 1,
        "model.decoder.num_queries": 8,
        "model.pixel_decoder.transformer_enc_layers": 1,
        "model.num_classes": 5,
    })
    model = build_model(cfg)
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0), normalize_images(jnp.zeros((1, 64, 64, 3)), cfg.model)
    )
    res = run_eval(cfg, model, variables, name, short_edge=96, max_size=160,
                   bucket=160)
    assert "AP" in res and np.isfinite(res["AP"])


@pytest.mark.slow
def test_run_video_eval_synthetic():
    from eval_video import run_video_eval
    from bm2f_tpu.models.maskformer import normalize_images
    from bm2f_tpu.video import build_video_model
    from tests.test_ytvis import _synthetic_video_dicts
    import jax.numpy as jnp

    name = "bm2f_video_eval_synth"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)

    # loader must read real files; synthesize tiny frames on disk
    import os, tempfile
    from PIL import Image

    tmp = tempfile.mkdtemp()
    dicts = _synthetic_video_dicts(2, length=3, h=48, w=64)
    for dd in dicts:
        vdir = os.path.join(tmp, str(dd["video_id"]))
        os.makedirs(vdir, exist_ok=True)
        files = []
        for fi in range(dd["length"]):
            p = os.path.join(vdir, f"{fi}.jpg")
            Image.fromarray(dd["images"][fi]).save(p)
            files.append(p)
        dd["file_names"] = files
        dd.pop("images")
    DatasetCatalog.register(name, lambda: dicts)

    cfg = get_config("ytvis2019_video_r50", {
        "model.decoder.dec_layers": 1,
        "model.decoder.num_queries": 8,
        "model.pixel_decoder.transformer_enc_layers": 1,
        "model.num_classes": 5,
        "model.num_frames": 3,
    })
    model = build_video_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        normalize_images(jnp.zeros((1, 3, 64, 64, 3)), cfg.model),
    )
    res = run_video_eval(cfg, model, variables, name, short_edge=48,
                         bucket=64, max_frames=3)
    assert "AP" in res and np.isfinite(res["AP"])


def _register(name, fn, **meta):
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, fn)
    if meta:
        MetadataCatalog.get(name).set(**meta)


@pytest.mark.slow
def test_run_eval_semantic_dispatch():
    """run_eval dispatches on evaluator_type=sem_seg and returns mIoU."""
    from eval import run_eval

    rng = np.random.RandomState(0)
    dicts = []
    for i in range(2):
        img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        sem = rng.randint(0, 5, (96, 128)).astype(np.int32)
        sem[:8] = 255  # ignore strip
        dicts.append({"image": img, "sem_seg": sem, "image_id": i,
                      "height": 96, "width": 128})
    name = "bm2f_eval_sem_synth"
    _register(name, lambda: dicts, evaluator_type="sem_seg", ignore_label=255)

    cfg = _tiny_cfg()
    model, variables = _tiny_model(cfg)
    res = run_eval(cfg, model, variables, name, short_edge=96, max_size=160,
                   bucket=160)
    assert "mIoU" in res and np.isfinite(res["mIoU"])
    assert "pACC" in res


@pytest.mark.slow
def test_run_eval_panoptic_dispatch():
    """run_eval dispatches on evaluator_type=coco_panoptic_seg; PQ keys."""
    from eval import run_eval

    rng = np.random.RandomState(1)
    dicts = []
    for i in range(2):
        img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        pan = np.zeros((96, 128), np.uint32)
        pan[10:50, 10:60] = 1
        pan[50:90, 60:120] = 2
        dicts.append({
            "image": img, "pan_seg": pan, "image_id": i,
            "height": 96, "width": 128,
            "segments_info": [
                {"id": 1, "category_id": 0, "iscrowd": 0, "isthing": True},
                {"id": 2, "category_id": 3, "iscrowd": 0, "isthing": False},
            ],
        })
    name = "bm2f_eval_pan_synth"

    def load_lazy():
        # the REAL panoptic registrars populate the thing/stuff maps only
        # when the loader runs (data/coco.py); mirror that so eval_panoptic
        # regressions that read metadata before materializing the dataset
        # get caught here (all-False thing_mask -> everything fused as stuff)
        MetadataCatalog.get(name).set(
            thing_dataset_id_to_contiguous_id={1: 0, 2: 1},
            stuff_dataset_id_to_contiguous_id={3: 2, 4: 3, 5: 4})
        return dicts

    _register(name, load_lazy, evaluator_type="coco_panoptic_seg")

    cfg = _tiny_cfg()
    model, variables = _tiny_model(cfg)
    res = run_eval(cfg, model, variables, name, short_edge=96, max_size=160,
                   bucket=160)
    for k in ("PQ", "SQ", "RQ", "PQ_th", "PQ_st"):
        assert k in res and np.isfinite(res[k])


def test_eval_mapper_bucket_selection():
    """Multi-bucket padding picks the smallest bucket that fits (kills the
    pad-everything-to-1344 waste; bounded compiles, one per bucket)."""
    from bm2f_tpu.data.mappers import EvalMapper

    m = EvalMapper(short_edge=480, max_size=1333, bucket=(512, 704, 1344),
                   pad_value=(0.0, 0.0, 0.0))
    img_small = (np.zeros((480, 640, 3))).astype(np.uint8)   # 480x640 -> 704
    img_wide = (np.zeros((480, 1300, 3))).astype(np.uint8)   # long side caps
    s1 = m({"image": img_small, "image_id": 0})
    assert s1["images"].shape == (704, 704, 3)
    s2 = m({"image": img_wide, "image_id": 1})
    assert s2["images"].shape[0] == s2["images"].shape[1]
    assert s2["images"].shape[0] in (512, 704, 1344)
    # int bucket still accepted (back-compat)
    m2 = EvalMapper(short_edge=96, max_size=160, bucket=160,
                    pad_value=(0.0, 0.0, 0.0))
    s3 = m2({"image": np.zeros((96, 128, 3), np.uint8), "image_id": 2})
    assert s3["images"].shape == (160, 160, 3)


def test_evaluator_merge_state():
    """Cross-host gather building block: merging two evaluators' states
    equals processing everything in one (reference: ytvis_eval.py:120-126)."""
    from bm2f_tpu.evaluation import (
        COCOMaskAPEvaluator, PanopticEvaluator, SemSegEvaluator,
    )

    rng = np.random.RandomState(0)
    # SemSeg: conf matrices add
    a, b, c = (SemSegEvaluator(3) for _ in range(3))
    g1, p1 = rng.randint(0, 3, (8, 8)), rng.randint(0, 3, (8, 8))
    g2, p2 = rng.randint(0, 3, (8, 8)), rng.randint(0, 3, (8, 8))
    a.process(p1, g1); b.process(p2, g2)
    c.process(p1, g1); c.process(p2, g2)
    a.merge_state(b.state_dict())
    assert a.evaluate() == c.evaluate()

    # COCO AP: entry lists concatenate
    def mk_pred(seed):
        r = np.random.RandomState(seed)
        masks = r.rand(4, 16, 16) > 0.5
        return ({"scores": r.rand(4), "labels": r.randint(0, 3, 4),
                 "masks": masks, "valid": np.ones(4, bool)},
                {"labels": r.randint(0, 3, 2), "masks": r.rand(2, 16, 16) > 0.5,
                 "iscrowd": np.zeros(2, bool)})
    a, b, c = (COCOMaskAPEvaluator(3) for _ in range(3))
    pr1, gt1 = mk_pred(1); pr2, gt2 = mk_pred(2)
    a.process(pr1, gt1); b.process(pr2, gt2)
    c.process(pr1, gt1); c.process(pr2, gt2)
    a.merge_state(b.state_dict())
    assert a.evaluate() == c.evaluate()

    # Panoptic: count arrays add
    a, b, c = (PanopticEvaluator(3, (True, False, False)) for _ in range(3))
    m1 = np.zeros((8, 8), np.int64); m1[:4] = 0; m1[4:] = 1
    segs = [{"id": 0, "category_id": 0}, {"id": 1, "category_id": 2}]
    a.process(m1, segs, m1, segs)
    b.process(m1, segs, 1 - m1, segs[::-1])
    c.process(m1, segs, m1, segs)
    c.process(m1, segs, 1 - m1, segs[::-1])
    a.merge_state(b.state_dict())
    assert a.evaluate() == c.evaluate()


@pytest.mark.slow
def test_semantic_tta_ensemble():
    """semantic_tta averages per-scale/flip probabilities into an
    original-size (H, W, K) map (test_time_augmentation.py:21 analogue)."""
    import jax.numpy as jnp

    from bm2f_tpu.models.tta import semantic_tta

    cfg = _tiny_cfg()
    model, variables = _tiny_model(cfg)
    from bm2f_tpu.models.maskformer import normalize_images

    @jax.jit
    def predict(images):
        out = model.apply(variables, normalize_images(images, cfg.model))
        return out["pred_logits"], out["pred_masks"]

    img = jnp.asarray(np.random.RandomState(0).rand(96, 128, 3) * 255,
                      jnp.float32)
    sem = semantic_tta(predict, img, scales=(0.75, 1.0), flip=True)
    assert sem.shape == (96, 128, cfg.model.num_classes)
    assert bool(jnp.all(jnp.isfinite(sem)))
    assert float(sem.min()) >= 0.0


def test_per_host_loader_sharding_and_gathered_eval():
    """Multi-host correctness building blocks, simulated in-process: two
    ranks' test loaders cover the dataset disjointly and completely, two
    ranks' train loaders draw disjoint per-step indices, and merging the
    two ranks' evaluator states reproduces the single-process result
    (reference: d2 per-rank DataLoader shards + ytvis_eval.py:120-126)."""
    from bm2f_tpu.data.loader import InferenceSampler, TrainingSampler
    from bm2f_tpu.evaluation import SemSegEvaluator

    # inference: contiguous disjoint cover
    n = 11
    parts = [list(InferenceSampler(n, rank=r, world_size=2).indices)
             for r in (0, 1)]
    assert sorted(parts[0] + parts[1]) == list(range(n))
    assert not (set(parts[0]) & set(parts[1]))

    # training: rank-strided disjoint draws from the same seed
    s0 = iter(TrainingSampler(16, seed=7, rank=0, world_size=2))
    s1 = iter(TrainingSampler(16, seed=7, rank=1, world_size=2))
    d0 = [next(s0) for _ in range(8)]
    d1 = [next(s1) for _ in range(8)]
    assert not (set(d0) & set(d1))

    # gathered eval == single-process eval
    rng = np.random.RandomState(0)
    preds = [rng.randint(0, 4, (8, 8)) for _ in range(4)]
    gts = [rng.randint(0, 4, (8, 8)) for _ in range(4)]
    single = SemSegEvaluator(4)
    for p, g in zip(preds, gts):
        single.process(p, g)
    r0, r1 = SemSegEvaluator(4), SemSegEvaluator(4)
    for p, g in zip(preds[:2], gts[:2]):
        r0.process(p, g)
    for p, g in zip(preds[2:], gts[2:]):
        r1.process(p, g)
    r0.merge_state(r1.state_dict())
    assert r0.evaluate() == single.evaluate()


def test_eval_mapper_extreme_aspect_fits_bucket():
    """A 512x1500 image (aspect > 2, real in ADE20K) exceeds every bucket at
    short_edge 512 / max_size 2048; the mapper must shrink it to fit instead
    of crashing on the canvas assignment."""
    from bm2f_tpu.data.mappers import EvalMapper

    m = EvalMapper(short_edge=512, max_size=2048, bucket=(512, 768, 1024),
                   pad_value=(0.0, 0.0, 0.0))
    s = m({"image": np.zeros((512, 1500, 3), np.uint8), "image_id": 0})
    assert s["images"].shape == (1024, 1024, 3)
    nh, nw = s["resized_hw"]
    assert max(nh, nw) <= 1024 and nw > nh


@pytest.mark.slow
def test_video_eval_untruncated_long_clip():
    """Clips longer than the T-bucket ladder are evaluated WHOLE (reference
    feeds the entire video in one forward, video_maskformer_model.py:623):
    a 44-frame synthetic video gets a ceil-to-8 bucket (48), not a silent
    40-frame truncation (round-2 behavior)."""
    import os, tempfile

    import jax.numpy as jnp
    from PIL import Image

    from eval_video import run_video_eval
    from bm2f_tpu.models.maskformer import normalize_images
    from bm2f_tpu.video import build_video_model
    from tests.test_ytvis import _synthetic_video_dicts

    name = "bm2f_video_eval_long"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)

    tmp = tempfile.mkdtemp()
    dicts = _synthetic_video_dicts(1, length=44, h=48, w=64)
    for dd in dicts:
        vdir = os.path.join(tmp, str(dd["video_id"]))
        os.makedirs(vdir, exist_ok=True)
        files = []
        for fi in range(dd["length"]):
            p = os.path.join(vdir, f"{fi}.jpg")
            Image.fromarray(dd["images"][fi]).save(p)
            files.append(p)
        dd["file_names"] = files
        dd.pop("images")
    DatasetCatalog.register(name, lambda: dicts)

    cfg = get_config("ytvis2019_video_r50", {
        "model.decoder.dec_layers": 1,
        "model.decoder.num_queries": 8,
        "model.pixel_decoder.transformer_enc_layers": 1,
        "model.num_classes": 5,
    })
    model = build_video_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        normalize_images(jnp.zeros((1, 2, 64, 64, 3)), cfg.model),
    )
    res = run_video_eval(cfg, model, variables, name, short_edge=48,
                         bucket=64, t_buckets=(4, 8, 16, 24, 40))
    assert "AP" in res and np.isfinite(res["AP"])


@pytest.mark.slow
def test_zoo_parity_runner_gate():
    """tools/zoo_parity.py wiring: convert/eval/verify glue over a synthetic
    dataset (the verify_results analogue of reference train_net.py:317).
    Random weights vs zoo numbers must FAIL the gate; an absurdly wide
    tolerance must PASS it — both through the one public entry point."""
    import sys

    sys.path.insert(0, "tools")
    from zoo_parity import zoo_parity

    from tests.test_data import _synthetic_instance_dicts

    name = "bm2f_zoo_parity_synth"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda: _synthetic_instance_dicts(2, h=96, w=128))

    over = {
        "model.decoder.dec_layers": 1,
        "model.decoder.num_queries": 8,
        "model.pixel_decoder.transformer_enc_layers": 1,
        "model.num_classes": 5,
        "input.min_size_test": 96,
        "input.max_size_test": 160,
    }
    res, ok = zoo_parity("coco_instance_r50", name, weights="",
                         expected={"AP": 43.7}, tolerance=0.3,
                         do_assert=False, cfg_overrides=over)
    assert "AP" in res and not ok  # random weights are nowhere near the zoo
    res2, ok2 = zoo_parity("coco_instance_r50", name, weights="",
                           expected={"AP": 43.7}, tolerance=1000.0,
                           do_assert=False, cfg_overrides=over)
    assert ok2


@pytest.mark.slow
def test_checkpoint_roundtrip_matches_oracle_eval(tmp_path):
    """VERDICT r4 item 8: close the converter -> orbax checkpoint -> e2e
    eval loop, which golden ACTIVATION tests don't cover.

    A torch-oracle-initialized checkpoint (reference naming) is converted,
    evaluated end-to-end, saved through the production orbax Checkpointer,
    restored, and evaluated again. GT is DERIVED from the oracle's own
    top predictions so the AP is high and meaningful — a broken converter,
    save, or restore scores ~0 (the zoo-parity failure mode) instead of
    comparing zeros against zeros. Asserts:
      1. converted-model eval matches the oracle's eval (same host
         protocol, model forward torch vs JAX) within 2e-3 AP;
      2. the orbax save -> restore round trip is BIT-exact and its eval
         metrics are identical.

    Reference analogue: train_net.py:305-321 (resume_or_load + eval-only)
    with verify_results (train_net.py:317).
    """
    import jax.numpy as jnp
    import torch

    from eval import eval_instance
    from bm2f_tpu.data.mask_ops import rle_encode, segmentation_to_mask
    from bm2f_tpu.evaluation.coco_eval import COCOMaskAPEvaluator
    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import instance_topk_select
    from bm2f_tpu.train.checkpoint import Checkpointer
    from bm2f_tpu.utils.convert_weights import convert_checkpoint
    from tests.torch_oracle import (
        make_r50_m2f_state_dict,
        torch_mask2former_forward,
    )

    S, N_IMG, K = 96, 2, 80
    rng = np.random.RandomState(11)
    sd = make_r50_m2f_state_dict(rng, K, 100)
    images = (rng.rand(N_IMG, S, S, 3) * 255).astype(np.float32)

    cfg = get_config("coco_instance_r50", {
        "model.dtype": "float32", "model.pixel_decoder_f32": True,
    })
    mean = np.asarray(cfg.model.pixel_mean, np.float32)
    std = np.asarray(cfg.model.pixel_std, np.float32)

    # --- oracle forward on exactly the pixels the eval loader produces
    # (square S x S images + short_edge=max_size=bucket=S -> identity
    # resize, no padding)
    normed = (images - mean) / std
    with torch.no_grad():
        ref = torch_mask2former_forward(
            sd, torch.from_numpy(normed.transpose(0, 3, 1, 2)), K, 100)
    ref_logits = np.asarray(ref["pred_logits"], np.float32)
    ref_masks_t = torch.nn.functional.interpolate(
        torch.as_tensor(np.asarray(ref["pred_masks"], np.float32)),
        size=(S, S), mode="bilinear", align_corners=False)
    ref_masks = ref_masks_t.numpy()

    # --- GT := the oracle's own most confident predictions
    def host_select(logits, masks_full):
        scores, labels, sel = jax.jit(
            lambda c, m: instance_topk_select(
                c, m, num_classes=K, topk=100)
        )(jnp.asarray(logits), jnp.asarray(masks_full))
        return np.asarray(scores), np.asarray(labels), np.asarray(sel)

    dicts = []
    oracle_preds = []
    for i in range(N_IMG):
        scores, labels, sel = host_select(ref_logits[i], ref_masks[i])
        binary = sel > 0
        prob = 1.0 / (1.0 + np.exp(-sel))
        area = binary.reshape(len(binary), -1).sum(-1)
        mask_scores = (prob * binary).reshape(len(binary), -1).sum(-1) / (
            area + 1e-6)
        final_scores = scores * mask_scores
        oracle_preds.append({
            "scores": final_scores, "labels": labels, "masks": binary,
            "valid": np.ones(len(binary), bool),
        })
        anns = []
        order = np.argsort(-final_scores)
        seen = np.zeros((S, S), bool)
        for j in order:
            m = binary[j]
            if m.sum() < 40 or len(anns) >= 4:
                continue
            if (m & seen).sum() > 0.3 * m.sum():  # keep GT non-overlapping-ish
                continue
            seen |= m
            anns.append({
                "bbox": [0, 0, 1, 1],
                "category_id": int(labels[j]),
                "segmentation": rle_encode(m),
                "iscrowd": 0,
            })
        assert anns, "oracle produced no usable GT masks"
        dicts.append({"image": images[i].astype(np.uint8), "height": S,
                      "width": S, "image_id": i, "annotations": anns})

    # NOTE: GT built from uint8-cast images' predictions? No — GT comes from
    # the float images' forward; the dataset stores uint8 pixels, so the
    # eval-path forward sees slightly different pixels than the GT-building
    # forward. Rebuild the oracle outputs from the UINT8 pixels so both
    # sides (oracle eval and converted-model eval) consume identical input.
    images_u8 = np.stack([d["image"] for d in dicts]).astype(np.float32)
    normed = (images_u8 - mean) / std
    with torch.no_grad():
        ref = torch_mask2former_forward(
            sd, torch.from_numpy(normed.transpose(0, 3, 1, 2)), K, 100)
    ref_logits = np.asarray(ref["pred_logits"], np.float32)
    ref_masks = torch.nn.functional.interpolate(
        torch.as_tensor(np.asarray(ref["pred_masks"], np.float32)),
        size=(S, S), mode="bilinear", align_corners=False).numpy()

    # --- oracle-side eval through the SAME host protocol/evaluator
    ev = COCOMaskAPEvaluator(K)
    for i, dd in enumerate(dicts):
        scores, labels, sel = host_select(ref_logits[i], ref_masks[i])
        binary = sel > 0
        prob = 1.0 / (1.0 + np.exp(-sel))
        area = binary.reshape(len(binary), -1).sum(-1)
        mask_scores = (prob * binary).reshape(len(binary), -1).sum(-1) / (
            area + 1e-6)
        inst = {"scores": scores * mask_scores, "labels": labels,
                "masks": binary, "valid": np.ones(len(binary), bool)}
        gt = {
            "labels": np.asarray(
                [a["category_id"] for a in dd["annotations"]], np.int64),
            "masks": np.stack([
                segmentation_to_mask(a["segmentation"], S, S)
                for a in dd["annotations"]]),
            "iscrowd": np.zeros(len(dd["annotations"]), bool),
        }
        ev.process(inst, gt)
    res_oracle = ev.evaluate()
    assert res_oracle["AP"] > 0.5, res_oracle  # GT from own preds => high AP

    # --- converted model, e2e eval through the production path
    name = "bm2f_roundtrip_synth"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda: dicts)

    model = build_model(cfg)
    variables = convert_checkpoint(sd)
    res_a = eval_instance(cfg, model, variables, name, short_edge=S,
                          max_size=S, bucket=(S,))
    assert abs(res_a["AP"] - res_oracle["AP"]) < 2e-3, (res_a, res_oracle)

    # --- FULL orbax save -> restore round trip
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(0, variables, force=True)
    template = jax.tree.map(np.zeros_like, variables)
    restored = ckpt.restore(template)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables)[0],
        jax.tree_util.tree_flatten_with_path(restored)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    res_b = eval_instance(cfg, model, restored, name, short_edge=S,
                          max_size=S, bucket=(S,))
    assert res_b == res_a, (res_b, res_a)
