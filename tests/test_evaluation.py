"""Evaluator tests: perfect predictions give perfect metrics; controlled
degradations move metrics the right way."""

import numpy as np
import pytest

from bm2f_tpu.evaluation.coco_eval import COCOMaskAPEvaluator, mask_iou_matrix
from bm2f_tpu.evaluation.panoptic_eval import PanopticEvaluator
from bm2f_tpu.evaluation.sem_seg_eval import SemSegEvaluator


def _blob(h, w, y0, x0, bh, bw):
    m = np.zeros((h, w), bool)
    m[y0 : y0 + bh, x0 : x0 + bw] = True
    return m


def test_mask_iou_matrix():
    a = _blob(20, 20, 0, 0, 10, 10)
    b = _blob(20, 20, 5, 5, 10, 10)
    iou = mask_iou_matrix(np.stack([a]), np.stack([a, b]), [False, False])
    assert iou[0, 0] == 1.0
    assert abs(iou[0, 1] - 25 / 175) < 1e-6


def test_coco_ap_perfect():
    ev = COCOMaskAPEvaluator(num_classes=3)
    for i in range(4):
        gt_masks = np.stack([_blob(64, 64, 5 * i, 5, 20, 20), _blob(64, 64, 30, 30, 20, 15)])
        gt = {"labels": np.array([0, 1]), "masks": gt_masks}
        pred = {
            "image_id": i,
            "scores": np.array([0.9, 0.8]),
            "labels": np.array([0, 1]),
            "masks": gt_masks.copy(),
        }
        ev.process(pred, gt)
    res = ev.evaluate()
    assert res["AP"] > 99.0
    assert res["AP50"] > 99.0


def test_coco_ap_penalizes_fp_and_miss():
    ev = COCOMaskAPEvaluator(num_classes=2)
    gt_masks = np.stack([_blob(64, 64, 5, 5, 20, 20), _blob(64, 64, 35, 35, 20, 20)])
    gt = {"labels": np.array([0, 0]), "masks": gt_masks}
    pred = {
        "image_id": 0,
        "scores": np.array([0.9, 0.8]),
        "labels": np.array([0, 0]),
        # one perfect, one totally wrong
        "masks": np.stack([gt_masks[0], _blob(64, 64, 0, 40, 10, 10)]),
    }
    ev.process(pred, gt)
    res = ev.evaluate()
    assert 20.0 < res["AP"] < 60.0  # half recall, half precision-ish


def test_sem_seg_perfect_and_noisy(rng):
    ev = SemSegEvaluator(num_classes=4)
    gt = rng.randint(0, 4, (50, 50))
    ev.process(gt, gt)
    res = ev.evaluate()
    assert res["mIoU"] == 100.0 and res["pACC"] == 100.0

    ev.reset()
    pred = gt.copy()
    pred[:10] = (pred[:10] + 1) % 4
    ev.process(pred, gt)
    res = ev.evaluate()
    assert 50 < res["mIoU"] < 100


def test_sem_seg_ignores_255(rng):
    ev = SemSegEvaluator(num_classes=3)
    gt = rng.randint(0, 3, (20, 20))
    gt[0] = 255
    pred = gt.copy()
    pred[0] = 0  # disagrees only on ignored pixels
    ev.process(pred, gt)
    assert ev.evaluate()["mIoU"] == 100.0


def test_panoptic_pq_perfect():
    ev = PanopticEvaluator(num_classes=3, thing_mask=[True, True, False])
    seg = np.zeros((40, 40), np.int64)
    seg[:20] = 1
    seg[20:, :20] = 2
    seg[20:, 20:] = 3
    infos = [
        {"id": 1, "category_id": 0},
        {"id": 2, "category_id": 1},
        {"id": 3, "category_id": 2},
    ]
    ev.process(seg, infos, seg, infos)
    res = ev.evaluate()
    assert res["PQ"] == 100.0 and res["PQ_th"] == 100.0 and res["PQ_st"] == 100.0


def test_panoptic_pq_fp_fn():
    ev = PanopticEvaluator(num_classes=2, thing_mask=[True, False])
    gt = np.zeros((40, 40), np.int64)
    gt[:20] = 1
    gt[20:] = 2
    gt_infos = [{"id": 1, "category_id": 0}, {"id": 2, "category_id": 1}]
    # pred misses segment 2, adds spurious segment 9
    pred = np.zeros((40, 40), np.int64)
    pred[:20] = 1
    pred[20:] = 9
    pred_infos = [{"id": 1, "category_id": 0}, {"id": 9, "category_id": 0}]
    ev.process(pred, pred_infos, gt, gt_infos)
    res = ev.evaluate()
    assert res["PQ"] < 100.0
    assert res["PQ_st"] == 0.0  # stuff class entirely missed


def test_panoptic_relabel_roundtrip():
    from bm2f_tpu.evaluation.panoptic_post import relabel_panoptic

    quidx = np.full((10, 10), -1, np.int32)
    quidx[:5] = 2
    quidx[5:, :5] = 0
    pan = {
        "panoptic_quidx": quidx,
        "valid": np.array([True, False, True, False]),
        "classes": np.array([7, 1, 3, 2]),
        "isthing": np.array([True, True, False, False]),
        "canonical": np.array([0, 1, 2, 3]),
    }
    seg_map, infos = relabel_panoptic(pan)
    assert len(infos) == 2
    ids = {i["id"] for i in infos}
    assert set(np.unique(seg_map)) - {0} == ids
