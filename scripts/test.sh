#!/bin/bash
# Eval-only against a checkpoint (reference test.sh)
python eval.py --config coco_instance_r50 --dataset coco_2017_val \
  --weights ./output/weaksup_coco/checkpoints "$@"
