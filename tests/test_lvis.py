"""LVIS federated-protocol tests: evaluator behavior (unknown-image drops,
verified-negative FPs, not-exhaustive ignores, frequency bands) and the
schema-faithful json loader (reference dispatch: train_net.py:126-128)."""

import json
import os

import numpy as np

from bm2f_tpu.evaluation.lvis_eval import LVISMaskAPEvaluator


def _blob(h, w, y0, x0, bh, bw):
    m = np.zeros((h, w), bool)
    m[y0 : y0 + bh, x0 : x0 + bw] = True
    return m


def _perfect_image(ev, cat=0, extra_gt=None, **gt_extra):
    m = _blob(32, 32, 4, 4, 12, 12)
    gt = {"labels": np.array([cat]), "masks": m[None], **gt_extra}
    pred = {"scores": np.array([0.9]), "labels": np.array([cat]),
            "masks": m[None].copy()}
    ev.process(pred, gt)


def test_lvis_perfect():
    ev = LVISMaskAPEvaluator(num_classes=3)
    for _ in range(3):
        _perfect_image(ev)
    assert ev.evaluate()["AP"] > 99.0


def test_lvis_unknown_image_detection_dropped():
    """A detection of category c on an image where c is neither positive nor
    verified-negative must not count as a false positive."""
    ev = LVISMaskAPEvaluator(num_classes=3)
    _perfect_image(ev, cat=0)
    # image with GT only for cat 1; a cat-0 detection here is "unknown"
    m = _blob(32, 32, 10, 10, 10, 10)
    ev.process(
        {"scores": np.array([0.95, 0.9]), "labels": np.array([0, 1]),
         "masks": np.stack([_blob(32, 32, 0, 20, 8, 8), m])},
        {"labels": np.array([1]), "masks": m[None]},
    )
    assert ev.evaluate()["AP"] > 99.0  # the stray cat-0 det was dropped


def test_lvis_negative_image_detection_is_fp():
    """Same detection, but the image declares cat 0 verified-absent — now it
    IS a false positive and AP must drop."""
    ev = LVISMaskAPEvaluator(num_classes=3)
    _perfect_image(ev, cat=0)
    m = _blob(32, 32, 10, 10, 10, 10)
    ev.process(
        {"scores": np.array([0.95, 0.9]), "labels": np.array([0, 1]),
         "masks": np.stack([_blob(32, 32, 0, 20, 8, 8), m])},
        {"labels": np.array([1]), "masks": m[None],
         "neg_categories": [0]},
    )
    res = ev.evaluate()
    assert res["AP"] < 90.0


def test_lvis_not_exhaustive_ignores_unmatched():
    """Unmatched detections of c on an image marked not-exhaustive for c are
    ignored, not false positives."""
    ev = LVISMaskAPEvaluator(num_classes=2)
    m = _blob(32, 32, 4, 4, 12, 12)
    ev.process(
        {"scores": np.array([0.9, 0.85]), "labels": np.array([0, 0]),
         # one matches GT, one is an un-annotated (real but unlabeled) object
         "masks": np.stack([m, _blob(32, 32, 20, 20, 8, 8)])},
        {"labels": np.array([0]), "masks": m[None],
         "not_exhaustive_categories": [0]},
    )
    assert ev.evaluate()["AP"] > 99.0


def test_lvis_frequency_bands():
    ev = LVISMaskAPEvaluator(num_classes=3, frequencies=["r", "c", "f"])
    for cat in (0, 1, 2):
        _perfect_image(ev, cat=cat)
    res = ev.evaluate()
    for key in ("APr", "APc", "APf"):
        assert res[key] > 99.0, (key, res)


def test_lvis_json_loader(tmp_path):
    """Byte-faithful LVIS v1 schema: no file_name (coco_url), per-image
    neg/not-exhaustive ids, polygon-only segmentation, frequency field."""
    from bm2f_tpu.data.catalog import DatasetCatalog
    from bm2f_tpu.data.datasets.lvis import load_lvis_json, register_lvis_instances

    lvis = {
        "images": [
            {
                "id": 17,
                "width": 64,
                "height": 48,
                "coco_url": "http://images.cocodataset.org/val2017/000000000017.jpg",
                "neg_category_ids": [3],
                "not_exhaustive_category_ids": [1],
            }
        ],
        "annotations": [
            {
                "id": 1,
                "image_id": 17,
                "category_id": 1,
                "segmentation": [[4.0, 4.0, 20.0, 4.0, 20.0, 20.0, 4.0, 20.0]],
                "bbox": [4.0, 4.0, 16.0, 16.0],
                "area": 256.0,
            }
        ],
        "categories": [
            {"id": 1, "name": "aerosol_can", "synonyms": ["aerosol_can"],
             "frequency": "c"},
            {"id": 3, "name": "alarm_clock", "synonyms": ["alarm_clock"],
             "frequency": "f"},
        ],
    }
    jf = os.path.join(tmp_path, "lvis_v1_val.json")
    with open(jf, "w") as f:
        json.dump(lvis, f)

    DatasetCatalog.allow_overwrite = True
    register_lvis_instances("lvis_v1_test_fixture", jf, str(tmp_path))
    dicts = load_lvis_json(jf, str(tmp_path), "lvis_v1_test_fixture")
    assert len(dicts) == 1
    d = dicts[0]
    assert d["file_name"].endswith("val2017/000000000017.jpg")
    assert d["neg_category_ids"] == [1]  # json id 3 -> contiguous 1
    assert d["not_exhaustive_category_ids"] == [0]  # json id 1 -> 0
    assert d["annotations"][0]["category_id"] == 0
    assert d["annotations"][0]["iscrowd"] == 0

    from bm2f_tpu.data.catalog import MetadataCatalog

    meta = MetadataCatalog.get("lvis_v1_test_fixture")
    assert meta.evaluator_type == "lvis"
    assert meta.thing_classes == ["aerosol_can", "alarm_clock"]
    assert meta.class_frequencies == ["c", "f"]
