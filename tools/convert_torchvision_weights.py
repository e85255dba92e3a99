#!/usr/bin/env python
"""Convert torchvision ResNet / timm-Swin pretrained weights into bm2f_tpu
init checkpoints (reference: tools/convert-torchvision-to-d2.py and
convert-pretrained-swin-model-to-d2.py — we convert straight to our Flax
layout instead of the d2 pkl intermediate).

Usage:
  python tools/convert_torchvision_weights.py resnet50.pth out_dir --arch resnet50
  python tools/convert_torchvision_weights.py swin_large.pth out_dir --arch swin
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # runnable without install
import pickle

import numpy as np


def convert_torchvision_resnet(sd):
    """torchvision names (conv1, bn1, layerX.Y.convZ/bnZ/downsample) ->
    d2-style names consumed by bm2f_tpu.utils.convert_weights."""
    out = {}
    out["backbone.stem.conv1.weight"] = sd["conv1.weight"]
    for k in ("weight", "bias", "running_mean", "running_var"):
        out[f"backbone.stem.conv1.norm.{k}"] = sd[f"bn1.{k}"]
    for layer in range(1, 5):
        b = 0
        while f"layer{layer}.{b}.conv1.weight" in sd:
            src = f"layer{layer}.{b}"
            dst = f"backbone.res{layer + 1}.{b}"
            for c in (1, 2, 3):
                out[f"{dst}.conv{c}.weight"] = sd[f"{src}.conv{c}.weight"]
                for k in ("weight", "bias", "running_mean", "running_var"):
                    out[f"{dst}.conv{c}.norm.{k}"] = sd[f"{src}.bn{c}.{k}"]
            if f"{src}.downsample.0.weight" in sd:
                out[f"{dst}.shortcut.weight"] = sd[f"{src}.downsample.0.weight"]
                for k in ("weight", "bias", "running_mean", "running_var"):
                    out[f"{dst}.shortcut.norm.{k}"] = sd[f"{src}.downsample.1.{k}"]
            b += 1
    return out


def convert_timm_swin(sd):
    """timm/official swin names -> d2-style 'backbone.*' names."""
    out = {}
    for k, v in sd.items():
        if k.startswith("head."):
            continue
        out["backbone." + k] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("out")
    ap.add_argument("--arch", default="resnet50", choices=["resnet50", "resnet101", "swin"])
    args = ap.parse_args()

    import torch

    data = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = data.get("model", data.get("state_dict", data))
    sd = {k: np.asarray(v) for k, v in sd.items() if hasattr(v, "numpy") or isinstance(v, np.ndarray)}

    if args.arch.startswith("resnet"):
        d2sd = convert_torchvision_resnet(sd)
    else:
        d2sd = convert_timm_swin(sd)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump({"model": d2sd, "__author__": "bm2f_tpu"}, f)
    print(f"wrote {len(d2sd)} tensors to {args.out}")


if __name__ == "__main__":
    main()
