#!/usr/bin/env python
"""Offline GT converter: ADE20K instance-segmentation json (reference:
datasets/prepare_ade20k_ins_seg.py). Reads the SceneParsing
`annotations_instance` pngs (R channel = thing-class id 1..100, G channel =
instance id within the image) and writes a COCO-format instances json with
compressed-RLE masks.

Usage: python tools/prepare_ade20k_ins_seg.py [--dataset-root .../ADEChallengeData2016]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable without install
import argparse
import glob
import json
import os

import numpy as np
from PIL import Image


def main():
    from bm2f_tpu.data.mask_ops import mask_to_box, rle_encode

    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-root", default=os.path.join(
        os.environ.get("DETECTRON2_DATASETS", "datasets"), "ADEChallengeData2016"))
    args = ap.parse_args()

    for split, sdir in (("train", "training"), ("val", "validation")):
        ann_dir = os.path.join(args.dataset_root, "annotations_instance", sdir)
        img_dir = os.path.join(args.dataset_root, "images", sdir)
        if not os.path.isdir(ann_dir):
            print(f"skip {split}: {ann_dir} missing")
            continue
        images, annotations = [], []
        ann_id = 1
        cat_ids = set()
        for i, f in enumerate(sorted(glob.glob(os.path.join(ann_dir, "*.png")))):
            stem = os.path.splitext(os.path.basename(f))[0]
            arr = np.asarray(Image.open(f))
            h, w = arr.shape[:2]
            images.append({
                "id": i + 1, "file_name": stem + ".jpg",
                "height": h, "width": w,
            })
            cls = arr[..., 0].astype(np.int32)
            inst = arr[..., 1].astype(np.int32)
            for cid in np.unique(cls):
                if cid == 0:
                    continue
                sel = cls == cid
                for iid in np.unique(inst[sel]):
                    m = (sel & (inst == iid)).astype(np.uint8)
                    if m.sum() < 1:
                        continue
                    x0, y0, x1, y1 = mask_to_box(m)
                    annotations.append({
                        "id": ann_id, "image_id": i + 1,
                        "category_id": int(cid),
                        "segmentation": rle_encode(m),
                        "area": int(m.sum()),
                        "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
                        "iscrowd": 0,
                    })
                    ann_id += 1
                    cat_ids.add(int(cid))
        out = {
            "images": images,
            "annotations": annotations,
            "categories": [{"id": c, "name": f"ade_thing_{c}"} for c in sorted(cat_ids)],
        }
        out_path = os.path.join(args.dataset_root, f"ade20k_instance_{split}.json")
        with open(out_path, "w") as fp:
            json.dump(out, fp)
        print(f"{split}: {len(images)} images, {len(annotations)} instances -> {out_path}")


if __name__ == "__main__":
    main()
