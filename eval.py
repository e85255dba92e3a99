#!/usr/bin/env python
"""Evaluation entry point (reference: train_net.py --eval-only ->
Trainer.test -> inference_on_dataset). Dispatches on the dataset's
`evaluator_type` like the reference's build_evaluator (train_net.py:68-148):

  coco               -> instance mask AP       (COCOMaskAPEvaluator)
  sem_seg            -> semantic mIoU          (SemSegEvaluator)
  coco_panoptic_seg  -> panoptic PQ/SQ/RQ      (PanopticEvaluator)
  lvis               -> federated LVIS mask AP (LVISMaskAPEvaluator)

Runs the jitted model + inference heads over a test loader (images padded
to one of a few static buckets — one XLA compile per bucket) and the
native evaluators; merges evaluator state across hosts before scoring."""

from __future__ import annotations

import argparse


def _predict_raw(cfg, model, variables):
    """Jitted model forward -> (pred_logits, pred_masks) (one compile per
    input bucket)."""
    import jax

    from bm2f_tpu.models.maskformer import normalize_images

    @jax.jit
    def predict(images):
        out = model.apply(variables, normalize_images(images, cfg.model))
        return out["pred_logits"], out["pred_masks"]

    return predict


def _build_loader(cfg, dataset_name, short_edge, max_size, bucket,
                  rank=0, world_size=1, carry_dict=False):
    from bm2f_tpu.data import build_test_loader
    from bm2f_tpu.data.mappers import EvalMapper

    base = EvalMapper(short_edge=short_edge, max_size=max_size,
                      bucket=bucket, pad_value=cfg.model.pixel_mean)
    if carry_dict:
        # keep the raw dataset dict with each sample (collate passes
        # non-array values through as ragged lists) so GT lookup does not
        # depend on image_id being present
        def mapper(dd):
            s = base(dd)
            s["_dd"] = dd
            return s
    else:
        mapper = base
    return build_test_loader(dataset_name, mapper, batch_size=1,
                             rank=rank, world_size=world_size)


def eval_instance(cfg, model, variables, dataset_name: str, max_images: int = 0,
                  short_edge: int = 800, max_size: int = 1333,
                  bucket=(704, 960, 1344), rank: int = 0, world_size: int = 1,
                  protocol: str = "coco"):
    """Instance mask AP (reference inference: maskformer_model.py:573-623).
    protocol="lvis" applies the federated LVIS protocol (300 dets/image,
    neg/not-exhaustive category handling; reference train_net.py:126-128)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bm2f_tpu.data import DatasetCatalog, MetadataCatalog
    from bm2f_tpu.data.mask_ops import segmentation_to_mask
    from bm2f_tpu.data.transforms import resize_bilinear_np
    from bm2f_tpu.evaluation.coco_eval import COCOMaskAPEvaluator
    from bm2f_tpu.evaluation.evaluator import gather_evaluator
    from bm2f_tpu.models.maskformer import instance_topk_select, normalize_images
    from bm2f_tpu.ops import resize_bilinear

    num_classes = cfg.model.num_classes
    topk = 300 if protocol == "lvis" else 100
    loader = _build_loader(cfg, dataset_name, short_edge, max_size, bucket,
                           rank, world_size)

    @jax.jit
    def predict(images):
        out = model.apply(variables, normalize_images(images, cfg.model))
        # device side: upsample to the (static) padded input size + top-k
        masks_full = jax.vmap(
            lambda m: resize_bilinear(m.transpose(1, 2, 0), images.shape[1],
                                      images.shape[2]).transpose(2, 0, 1)
        )(out["pred_masks"])
        scores, labels, sel_masks = jax.vmap(
            lambda c, m: instance_topk_select(c, m, num_classes=num_classes, topk=topk)
        )(out["pred_logits"], masks_full)
        return scores, labels, sel_masks

    # reference wraps every inference step in retry_if_cuda_oom
    # (maskformer_model.py:355-374); the TPU ladder retries, then splits
    # the batch, then falls back to CPU
    from bm2f_tpu.utils.memory import retry_if_oom

    predict = retry_if_oom(predict)

    dicts = {d["image_id"]: d for d in DatasetCatalog.get(dataset_name)}
    if protocol == "lvis":
        from bm2f_tpu.evaluation.lvis_eval import LVISMaskAPEvaluator

        freqs = getattr(MetadataCatalog.get(dataset_name),
                        "class_frequencies", None)
        evaluator = LVISMaskAPEvaluator(num_classes, frequencies=freqs)
    else:
        evaluator = COCOMaskAPEvaluator(num_classes)

    n = 0
    for batch in loader:
        scores_b, labels_b, selmasks_b = jax.tree.map(
            np.asarray, predict(jnp.asarray(batch["images"]))
        )
        for i in range(scores_b.shape[0]):
            nh, nw = batch["resized_hw"][i]
            oh, ow = batch["orig_hw"][i]
            # host side: crop padding, restore original size, binarize at 0,
            # mask-probability rescoring (reference :621)
            m = resize_bilinear_np(selmasks_b[i][:, :nh, :nw], oh, ow)
            binary = m > 0
            prob = 1.0 / (1.0 + np.exp(-m))
            area = binary.reshape(len(binary), -1).sum(-1)
            mask_scores = (prob * binary).reshape(len(binary), -1).sum(-1) / (
                area + 1e-6
            )
            inst = {
                "scores": scores_b[i] * mask_scores,
                "labels": labels_b[i],
                "masks": binary,
                "valid": np.ones(len(binary), bool),
            }
            dd = dicts[int(batch["image_id"][i])]
            # crowd annotations are kept and flagged: the COCO protocol treats
            # them as ignore regions (predictions matching them are neither TP
            # nor FP), which COCOMaskAPEvaluator implements natively.
            gt_masks = [
                segmentation_to_mask(a["segmentation"], oh, ow)
                for a in dd["annotations"]
            ]
            gt = {
                "labels": np.asarray(
                    [a["category_id"] for a in dd["annotations"]], np.int64,
                ),
                "masks": np.stack(gt_masks) if gt_masks else np.zeros((0, oh, ow)),
                "iscrowd": np.asarray(
                    [bool(a.get("iscrowd", 0)) for a in dd["annotations"]], bool,
                ),
            }
            if protocol == "lvis":
                gt["neg_categories"] = dd.get("neg_category_ids", ())
                gt["not_exhaustive_categories"] = dd.get(
                    "not_exhaustive_category_ids", ())
            evaluator.process(jax.tree.map(np.asarray, inst), gt)
            n += 1
        if max_images and n >= max_images:
            break
    res = gather_evaluator(evaluator).evaluate()
    print({k: round(v, 2) for k, v in res.items()})
    return res


def eval_semantic(cfg, model, variables, dataset_name: str, max_images: int = 0,
                  short_edge: int = 512, max_size: int = 2048,
                  bucket=(512, 768, 1024), tta: bool = False,
                  rank: int = 0, world_size: int = 1):
    """Semantic mIoU (reference: semantic_inference maskformer_model.py:509-513
    + d2 SemSegEvaluator, train_net.py:78-86).

    Class probabilities are computed at the prediction stride and resized to
    the original image size on the host (the reference upsamples logits to
    the padded size first; bilinear resizes compose, so only sub-pixel
    interpolation details differ). With --tta, multi-scale + flip ensembling
    (test_time_augmentation.py:21) replaces the single-scale path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bm2f_tpu.data import DatasetCatalog, MetadataCatalog
    from bm2f_tpu.data.mappers import read_image
    from bm2f_tpu.data.transforms import resize_bilinear_np
    from bm2f_tpu.evaluation import SemSegEvaluator
    from bm2f_tpu.evaluation.evaluator import gather_evaluator
    from bm2f_tpu.models.maskformer import semantic_inference

    meta = MetadataCatalog.get(dataset_name)
    num_classes = cfg.model.num_classes
    ignore_label = getattr(meta, "ignore_label", 255)
    evaluator = SemSegEvaluator(num_classes, ignore_label=ignore_label)

    predict = _predict_raw(cfg, model, variables)

    if tta:
        from bm2f_tpu.models.tta import semantic_tta

        n = 0
        # shard by rank like the non-TTA loader path (otherwise every host
        # evaluates every image and the gather merges duplicates)
        for dd in DatasetCatalog.get(dataset_name)[rank::world_size]:
            img = dd.get("image")
            if img is None:
                img = read_image(dd["file_name"])
            sem = semantic_tta(predict, jnp.asarray(img, jnp.float32))
            pred = np.asarray(jnp.argmax(sem, -1))
            evaluator.process(pred, _load_sem_gt(dd))
            n += 1
            if max_images and n >= max_images:
                break
        res = gather_evaluator(evaluator).evaluate()
        print({k: round(v, 2) for k, v in res.items()})
        return res

    loader = _build_loader(cfg, dataset_name, short_edge, max_size, bucket,
                           rank, world_size, carry_dict=True)

    @jax.jit
    def predict_sem(images):
        logits, masks = predict(images)
        # (B, h4, w4, K) class probabilities at prediction stride
        return jax.vmap(semantic_inference)(logits, masks)

    from bm2f_tpu.utils.memory import retry_if_oom

    predict_sem = retry_if_oom(predict_sem)

    n = 0
    for batch in loader:
        sem_b = np.asarray(predict_sem(jnp.asarray(batch["images"])),
                           np.float32)
        stride = batch["images"].shape[1] / sem_b.shape[1]
        for i in range(sem_b.shape[0]):
            nh, nw = batch["resized_hw"][i]
            oh, ow = batch["orig_hw"][i]
            h4 = max(int(round(nh / stride)), 1)
            w4 = max(int(round(nw / stride)), 1)
            probs = resize_bilinear_np(
                sem_b[i, :h4, :w4].transpose(2, 0, 1), oh, ow)
            pred = probs.argmax(0)
            evaluator.process(pred, _load_sem_gt(batch["_dd"][i]))
            n += 1
        if max_images and n >= max_images:
            break
    res = gather_evaluator(evaluator).evaluate()
    print({k: round(v, 2) for k, v in res.items()})
    return res


def _load_sem_gt(dd):
    import numpy as np

    if dd.get("sem_seg") is not None:
        return np.asarray(dd["sem_seg"])
    from PIL import Image

    with Image.open(dd["sem_seg_file_name"]) as im:
        return np.asarray(im)


def eval_panoptic(cfg, model, variables, dataset_name: str, max_images: int = 0,
                  short_edge: int = 800, max_size: int = 1333,
                  bucket=(704, 960, 1344), rank: int = 0, world_size: int = 1):
    """Panoptic PQ/SQ/RQ (reference: panoptic_inference
    maskformer_model.py:515-571 + d2 COCOPanopticEvaluator).

    Reference-faithful resize order (maskformer_model.py:337-371): mask
    logits are bilinear-upsampled to the padded input size, the padding is
    cropped off, the crop is bilinear-resized to the original image size
    (sem_seg_postprocess), and only THEN does fusion run. On TPU the crop +
    original-size resize is a dynamic-region bilinear gather into a static
    original-size bucket (one light fusion compile per bucket pair), with
    pixels beyond the original size masked to -1e9 so areas/overlap pruning
    see only real pixels; the fused query-id map is cropped on the host."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bm2f_tpu.data import MetadataCatalog
    from bm2f_tpu.data.panoptic_io import read_panoptic_png
    from bm2f_tpu.evaluation import PanopticEvaluator
    from bm2f_tpu.evaluation.evaluator import gather_evaluator
    from bm2f_tpu.evaluation.panoptic_post import relabel_panoptic
    from bm2f_tpu.models.maskformer import panoptic_inference
    from bm2f_tpu.ops import resize_bilinear, resize_bilinear_dynamic

    from bm2f_tpu.data import DatasetCatalog

    # materialize the dataset FIRST: panoptic registrations populate the
    # thing/stuff id maps lazily inside their loader (data/coco.py), so
    # reading metadata before DatasetCatalog.get would bake an all-stuff
    # thing_mask into the jitted fusion
    DatasetCatalog.get(dataset_name)
    meta = MetadataCatalog.get(dataset_name)
    num_classes = cfg.model.num_classes
    thing_map = getattr(meta, "thing_dataset_id_to_contiguous_id", {})
    thing_ids = set(thing_map.values())
    thing_mask = tuple(c in thing_ids for c in range(num_classes))
    if not thing_ids:
        print(f"WARNING: {dataset_name} registered no thing classes — "
              "panoptic fusion will merge every class as stuff")

    evaluator = PanopticEvaluator(num_classes, thing_mask)
    predict = _predict_raw(cfg, model, variables)

    def fuse_one(images, valid_hw, orig_hw, out_bucket):
        """Full reference order for ONE image; out_bucket is the static
        original-size bucket, orig_hw the true (oh, ow) within it."""
        logits, masks = predict(images)
        H, W = images.shape[1], images.shape[2]
        OH, OW = out_bucket
        cls, m = logits[0], masks[0]

        # 1. upsample mask logits to the padded input (reference :337)
        mf = resize_bilinear(m.transpose(1, 2, 0), H, W)
        # 2. crop padding + resize to the original size (sem_seg_postprocess)
        mo = resize_bilinear_dynamic(mf, valid_hw, orig_hw, OH, OW)
        mo = mo.transpose(2, 0, 1)  # (Q, OH, OW)
        # mask bucket padding so fusion areas/argmax see only real pixels
        yy = jnp.arange(OH)[:, None] < orig_hw[0]
        xx = jnp.arange(OW)[None, :] < orig_hw[1]
        mo = jnp.where(yy & xx, mo, -1e9)
        # 3. fuse at the original size
        return panoptic_inference(
            cls, mo, num_classes=num_classes, thing_mask=thing_mask,
            object_mask_threshold=cfg.model.test.object_mask_threshold,
            overlap_threshold=cfg.model.test.overlap_threshold,
        )

    from bm2f_tpu.utils.memory import retry_if_oom

    # one fusion compile per (input bucket, original-size bucket) pair;
    # fusion numerics are bucket-independent (the resize/fusion only reads
    # the real (oh, ow) region). LRU-capped: datasets with very diverse
    # original sizes would otherwise hold one compiled program per 128-px
    # bucket pair forever (ADVICE r3)
    from collections import OrderedDict

    _fns: "OrderedDict" = OrderedDict()
    _FNS_CAP = 32

    def predict_pan(images, valid_hw, orig_hw, OH, OW):
        key = (images.shape, OH, OW)
        if key not in _fns:
            if len(_fns) >= _FNS_CAP:
                _fns.popitem(last=False)
            _fns[key] = retry_if_oom(jax.jit(
                lambda im, v, o: fuse_one(im, v, o, (OH, OW))
            ))
        else:
            _fns.move_to_end(key)
        return _fns[key](images, valid_hw, orig_hw)

    def _orig_bucket(s: int) -> int:
        return max(128, -(-s // 128) * 128)

    n = 0
    loader = _build_loader(cfg, dataset_name, short_edge, max_size, bucket,
                           rank, world_size, carry_dict=True)
    for batch in loader:
        for i in range(len(batch["resized_hw"])):
            nh, nw = batch["resized_hw"][i]
            oh, ow = batch["orig_hw"][i]
            pan = jax.tree.map(np.asarray, predict_pan(
                jnp.asarray(batch["images"][i : i + 1]),
                jnp.asarray((nh, nw), jnp.int32),
                jnp.asarray((oh, ow), jnp.int32),
                _orig_bucket(oh), _orig_bucket(ow),
            ))
            seg_map, segments = relabel_panoptic(pan)
            pred_map = seg_map[:oh, :ow].astype(np.int64) - 1
            # evaluator wants -1 = void; relabel used 0 = void, ids from 1
            pred_segments = [
                {"id": s["id"] - 1, "category_id": s["category_id"]}
                for s in segments
            ]

            dd = batch["_dd"][i]
            gt_png = dd.get("pan_seg")
            if gt_png is None:
                gt_png = read_panoptic_png(dd["pan_seg_file_name"])
            gt_map = gt_png.astype(np.int64) - 1  # png id 0 = void -> -1
            gt_segments = [
                {"id": s["id"] - 1, "category_id": s["category_id"],
                 "iscrowd": s.get("iscrowd", 0)}
                for s in dd["segments_info"]
            ]
            evaluator.process(pred_map, pred_segments, gt_map, gt_segments)
            n += 1
        if max_images and n >= max_images:
            break
    res = gather_evaluator(evaluator).evaluate()
    print({k: round(v, 2) for k, v in res.items()})
    return res


def bucket_ladder(max_size: int, steps=(0.5, 0.72, 1.0)):
    """Static padding-bucket ladder for eval: the largest bucket is
    ceil(max_size/32)*32, so the max_size-capped resize ALWAYS fits (no
    silent shrink-to-fit); smaller buckets bound padding waste for typical
    aspect ratios at the cost of one extra XLA compile each."""
    top = -(-max_size // 32) * 32
    return tuple(sorted({-(-int(top * f) // 32) * 32 for f in steps}))


def run_eval(cfg, model, variables, dataset_name: str, max_images: int = 0,
             short_edge: int = None, max_size: int = None,
             bucket=None, tta: bool = False,
             rank: int = 0, world_size: int = 1):
    """Evaluator dispatch on the dataset's evaluator_type (reference:
    train_net.py:68-148 build_evaluator). Test resolution comes from the
    preset's MIN_SIZE_TEST/MAX_SIZE_TEST (cfg.input.min_size_test /
    max_size_test — e.g. ADE20K 512, Cityscapes 1024, Mapillary 2048) unless
    explicitly overridden."""
    from bm2f_tpu.data import MetadataCatalog

    if short_edge is None:
        short_edge = cfg.input.min_size_test
    if max_size is None:
        max_size = cfg.input.max_size_test
    if bucket is None:
        bucket = bucket_ladder(max_size)

    etype = getattr(MetadataCatalog.get(dataset_name), "evaluator_type", "coco")
    if etype == "sem_seg":
        return eval_semantic(cfg, model, variables, dataset_name, max_images,
                             short_edge, max_size, bucket, tta,
                             rank, world_size)
    if etype == "coco_panoptic_seg":
        return eval_panoptic(cfg, model, variables, dataset_name, max_images,
                             short_edge, max_size, bucket, rank, world_size)
    if etype == "lvis":
        return eval_instance(cfg, model, variables, dataset_name, max_images,
                             short_edge, max_size, bucket, rank, world_size,
                             protocol="lvis")
    return eval_instance(cfg, model, variables, dataset_name, max_images,
                         short_edge, max_size, bucket, rank, world_size)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--weights", default="", help="orbax checkpoint dir or d2 .pkl/.pth")
    ap.add_argument("--max-images", type=int, default=0)
    ap.add_argument("--tta", action="store_true",
                    help="multi-scale + flip ensembling (semantic only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bm2f_tpu.config import get_config
    from bm2f_tpu.data.cityscapes import register_all_cityscapes
    from bm2f_tpu.data.datasets import register_all_builtin_datasets
    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import normalize_images

    register_all_builtin_datasets()
    register_all_cityscapes()
    cfg = get_config(args.config)
    model = build_model(cfg)
    dummy = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), normalize_images(dummy, cfg.model))
    if args.weights.endswith((".pkl", ".pth")):
        from bm2f_tpu.utils.convert_weights import convert_checkpoint

        variables = convert_checkpoint(
            args.weights,
            backbone=cfg.model.backbone.name,
            depth=cfg.model.backbone.resnet.depth,
            dec_layers=cfg.model.decoder.dec_layers,
        )
    elif args.weights:
        from bm2f_tpu.train.checkpoint import Checkpointer

        variables = Checkpointer(args.weights).restore_variables()

    run_eval(cfg, model, variables, args.dataset, args.max_images,
             tta=args.tta, rank=jax.process_index(),
             world_size=jax.process_count())


if __name__ == "__main__":
    main()
