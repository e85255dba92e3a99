#!/usr/bin/env python
"""Standalone PQ for semantic-segmentation outputs (reference:
tools/evaluate_pq_for_semantic_segmentation.py:21-50): treats each connected
class region... the reference treats each CLASS MAP as one segment per class
(semantic PQ). Inputs: directories of predicted + GT class pngs."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable without install
import argparse
import glob
import os

import numpy as np
from PIL import Image

from bm2f_tpu.evaluation.panoptic_eval import PanopticEvaluator


def class_map_to_segments(seg: np.ndarray, num_classes: int):
    """One segment per class present (semantic PQ convention)."""
    ids = np.full(seg.shape, -1, np.int64)
    infos = []
    for c in np.unique(seg):
        if c >= num_classes:
            continue
        ids[seg == c] = int(c) + 1
        infos.append({"id": int(c) + 1, "category_id": int(c)})
    return ids, infos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred-dir", required=True)
    ap.add_argument("--gt-dir", required=True)
    ap.add_argument("--num-classes", type=int, required=True)
    ap.add_argument("--num-stuff", type=int, default=0,
                    help="classes >= this index are stuff (0 = all stuff)")
    args = ap.parse_args()

    thing_mask = [i < args.num_stuff for i in range(args.num_classes)]
    ev = PanopticEvaluator(args.num_classes, thing_mask)
    preds = sorted(glob.glob(os.path.join(args.pred_dir, "*.png")))
    for p in preds:
        g = os.path.join(args.gt_dir, os.path.basename(p))
        pred = np.asarray(Image.open(p)).astype(np.int64)
        gt = np.asarray(Image.open(g)).astype(np.int64)
        pm, pi = class_map_to_segments(pred, args.num_classes)
        gm, gi = class_map_to_segments(gt, args.num_classes)
        ev.process(pm, pi, gm, gi)
    print(ev.evaluate())


if __name__ == "__main__":
    main()
