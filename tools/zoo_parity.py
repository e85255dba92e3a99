#!/usr/bin/env python
"""Zoo-parity regression runner: one command from a reference checkpoint +
data root to asserted AP/PQ/mIoU (the analogue of the reference's
`verify_results(cfg, res)` gate driven by TEST.EXPECTED_RESULTS,
/root/reference/train_net.py:317; published numbers:
/root/reference/MODEL_ZOO.md and BASELINE.md).

    python tools/zoo_parity.py --config coco_instance_r50 \
        --dataset coco_2017_val --weights model_final_3c8ec9.pkl \
        --data-root /data/datasets            # expects mask AP 43.7 +- 0.3

    # explicit expectations / tolerance / subset:
    python tools/zoo_parity.py --config coco_panoptic_r50 \
        --dataset coco_2017_val_panoptic --weights model_final_94dc52.pkl \
        --expected PQ=51.9 --tolerance 0.5 --max-images 500

Exit code 0 iff every expected metric is within tolerance. With no
--expected, the built-in zoo table below supplies the preset's published
numbers (BASELINE.md rows; full-dataset single-scale protocol — pass
--max-images only for smoke runs, with --no-assert or wide tolerance).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable without install
import argparse
import os
import sys

# checkpoint id -> metrics: /root/reference/MODEL_ZOO.md (see BASELINE.md)
ZOO_EXPECTED = {
    "coco_instance_r50": {"AP": 43.7},
    "coco_instance_r101": {"AP": 44.2},
    "coco_instance_swin_l": {"AP": 50.1},
    "coco_panoptic_r50": {"PQ": 51.9},
    "coco_panoptic_r101": {"PQ": 52.6},
    "coco_panoptic_swin_l": {"PQ": 57.8},
    "ade20k_semantic_r50": {"mIoU": 47.2},
    "ade20k_panoptic_r50": {"PQ": 39.7},
    "ade20k_instance_r50": {"AP": 26.4},
    "cityscapes_semantic_r50": {"mIoU": 79.4},
    "ytvis2019_video_r50": {"AP": 46.4},
    "ytvis2021_video_r50": {"AP": 40.6},
}


def load_weights(cfg, weights: str):
    """Checkpoint path -> model variables (d2 .pkl/.pth converted; orbax
    restored; '' = random init for wiring smoke tests)."""
    import jax
    import jax.numpy as jnp

    if cfg.task == "video":
        from bm2f_tpu.video import build_video_model as build
    else:
        from bm2f_tpu.models import build_model as build
    from bm2f_tpu.models.maskformer import normalize_images

    model = build(cfg)
    if weights.endswith((".pkl", ".pth")):
        from bm2f_tpu.utils.convert_weights import convert_checkpoint

        variables = convert_checkpoint(
            weights,
            backbone=cfg.model.backbone.name,
            depth=cfg.model.backbone.resnet.depth,
            dec_layers=cfg.model.decoder.dec_layers,
        )
    elif weights:
        from bm2f_tpu.train.checkpoint import Checkpointer

        variables = Checkpointer(weights).restore_variables()
    else:
        if cfg.task == "video":
            dummy = jnp.zeros((1, 1, 64, 64, 3))
        else:
            dummy = jnp.zeros((1, 64, 64, 3))
        variables = model.init(
            jax.random.PRNGKey(0), normalize_images(dummy, cfg.model)
        )
    return model, variables


def zoo_parity(cfg_name: str, dataset: str, weights: str = "",
               expected=None, tolerance: float = 0.3, max_images: int = 0,
               do_assert: bool = True, cfg_overrides=None):
    """Convert -> eval -> verify. Returns (results, ok)."""
    import jax

    from bm2f_tpu.config import get_config
    from bm2f_tpu.evaluation.evaluator import verify_results

    cfg = get_config(cfg_name, cfg_overrides or {})
    model, variables = load_weights(cfg, weights)

    if cfg.task == "video":
        from eval_video import run_video_eval

        results = run_video_eval(cfg, model, variables, dataset,
                                 max_videos=max_images)
    else:
        from eval import run_eval

        results = run_eval(cfg, model, variables, dataset, max_images,
                           rank=jax.process_index(),
                           world_size=jax.process_count())

    if expected is None:
        expected = ZOO_EXPECTED.get(cfg_name)
    if not expected:
        print(f"# no expected metrics for preset {cfg_name!r}; skipping gate")
        return results, True
    ok = verify_results(expected, results, tolerance=tolerance)
    if not do_assert:
        return results, ok
    return results, ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--weights", default="",
                    help="reference d2 .pkl/.pth (auto-converted) or orbax dir")
    ap.add_argument("--data-root", default="",
                    help="dataset root (sets $DETECTRON2_DATASETS)")
    ap.add_argument("--expected", default="",
                    help="comma list k=v, e.g. 'AP=43.7,AP50=65.0'; defaults "
                         "to the built-in zoo table for the preset")
    ap.add_argument("--tolerance", type=float, default=0.3)
    ap.add_argument("--max-images", type=int, default=0)
    ap.add_argument("--no-assert", action="store_true",
                    help="report, but always exit 0 (smoke runs)")
    args = ap.parse_args()

    if args.data_root:
        os.environ["DETECTRON2_DATASETS"] = args.data_root

    from bm2f_tpu.data.cityscapes import register_all_cityscapes
    from bm2f_tpu.data.datasets import register_all_builtin_datasets
    from bm2f_tpu.data.ytvis import register_all_ytvis

    register_all_builtin_datasets()
    register_all_cityscapes()
    register_all_ytvis()

    expected = None
    if args.expected:
        expected = {
            k: float(v)
            for k, v in (kv.split("=") for kv in args.expected.split(","))
        }

    results, ok = zoo_parity(
        args.config, args.dataset, args.weights, expected,
        args.tolerance, args.max_images, do_assert=not args.no_assert,
    )
    print({k: round(v, 2) for k, v in results.items()})
    if args.no_assert:
        return
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
