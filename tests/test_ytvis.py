"""YTVIS data + eval tests on synthetic videos."""

import numpy as np
import pytest

from bm2f_tpu.config import InputConfig
from bm2f_tpu.data.catalog import DatasetCatalog
from bm2f_tpu.data.ytvis import CocoClipDatasetMapper, YTVISDatasetMapper
from bm2f_tpu.evaluation.ytvis_eval import YTVISEvaluator


def _synthetic_video_dicts(n=3, length=6, h=72, w=96, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for v in range(n):
        images = {
            fi: (rng.rand(h, w, 3) * 255).astype(np.uint8) for fi in range(length)
        }
        anns = []
        for a in range(2):
            segs = []
            for fi in range(length):
                if fi == 0 and a == 1:
                    segs.append(None)  # absent in first frame
                else:
                    x0, y0 = 10 + 5 * a, 10 + 3 * a
                    segs.append([[x0, y0, x0 + 30, y0, x0 + 30, y0 + 25, x0, y0 + 25]])
            anns.append(
                {"id": a, "category_id": a, "segmentations": segs,
                 "bboxes": [None] * length, "iscrowd": 0}
            )
        out.append(
            {"video_id": v, "height": h, "width": w, "length": length,
             "file_names": [f"f{fi}.jpg" for fi in range(length)],
             "annotations": anns, "images": images}
        )
    return out


def test_ytvis_mapper_shapes_and_alignment():
    cfg = InputConfig(image_size=64, max_instances=5, sampling_frame_num=2,
                      sampling_frame_range=3)
    mapper = YTVISDatasetMapper(cfg, seed=0, short_edge_choices=(64,))
    for dd in _synthetic_video_dicts():
        s = mapper(dd)
        assert s["images"].shape == (2, 64, 64, 3)
        assert s["masks"].shape == (5, 2, 64, 64)
        assert s["valid"][:2].all() and not s["valid"][2:].any()
        # instance 0 present in both frames
        assert (s["masks"][0].sum(axis=(1, 2)) > 0).all()


def test_coco_clip_mapper():
    from tests.test_data import _synthetic_instance_dicts

    cfg = InputConfig(image_size=64, max_instances=4, sampling_frame_num=2)
    mapper = CocoClipDatasetMapper(cfg, seed=1)
    s = mapper(_synthetic_instance_dicts(1)[0])
    assert s["images"].shape == (2, 64, 64, 3)
    np.testing.assert_array_equal(s["images"][0], s["images"][1])
    np.testing.assert_array_equal(s["masks"][:, 0], s["masks"][:, 1])


def test_ytvis_eval_perfect_tracks(rng):
    ev = YTVISEvaluator(num_classes=3)
    for v in range(3):
        T, H, W = 4, 32, 32
        g = np.zeros((2, T, H, W), bool)
        g[0, :, 4:16, 4:16] = True
        g[1, 1:, 18:30, 18:28] = True  # appears from frame 1
        ev.process(
            {"video_id": v, "scores": np.array([0.9, 0.8]),
             "labels": np.array([0, 1]), "masks": g.copy()},
            {"labels": np.array([0, 1]), "masks": g},
        )
    res = ev.evaluate()
    assert res["AP"] > 99.0


def test_ytvis_eval_temporal_mismatch_penalized(rng):
    """A prediction with the right per-frame masks but shifted one frame has
    lower track IoU and must score below the perfect one."""
    ev = YTVISEvaluator(num_classes=1)
    T, H, W = 4, 32, 32
    g = np.zeros((1, T, H, W), bool)
    g[0, :, 8:24, 8:24] = True
    shifted = np.roll(g, 1, axis=1)
    shifted[0, 0] = False
    ev.process(
        {"video_id": 0, "scores": np.array([0.9]), "labels": np.array([0]),
         "masks": shifted},
        {"labels": np.array([0]), "masks": g},
    )
    res = ev.evaluate()
    assert res["AP"] < 99.0
