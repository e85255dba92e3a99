"""Cityscapes instance loader test on a synthetic gtFine tree."""

import json
import os

import numpy as np
import pytest

from bm2f_tpu.data.cityscapes import load_cityscapes_instances


def test_load_cityscapes_instances(tmp_path):
    img_dir = tmp_path / "leftImg8bit" / "val"
    gt_dir = tmp_path / "gtFine" / "val"
    (img_dir / "cityA").mkdir(parents=True)
    (gt_dir / "cityA").mkdir(parents=True)
    from PIL import Image

    Image.new("RGB", (64, 32)).save(img_dir / "cityA" / "f0_leftImg8bit.png")
    gt = {
        "imgHeight": 32, "imgWidth": 64,
        "objects": [
            {"label": "car", "polygon": [[4, 4], [20, 4], [20, 16], [4, 16]]},
            {"label": "sky", "polygon": [[0, 0], [64, 0], [64, 8]]},  # stuff: skip
            {"label": "persongroup", "polygon": [[30, 10], [40, 10], [40, 20]]},
        ],
    }
    with open(gt_dir / "cityA" / "f0_gtFine_polygons.json", "w") as f:
        json.dump(gt, f)

    dicts = load_cityscapes_instances(str(img_dir), str(gt_dir))
    assert len(dicts) == 1
    anns = dicts[0]["annotations"]
    assert len(anns) == 2
    assert anns[0]["category_id"] == 2  # car
    assert anns[1]["iscrowd"] == 1  # persongroup -> crowd person
    assert anns[1]["category_id"] == 0
