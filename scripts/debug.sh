#!/bin/bash
# Single-device tiny-batch smoke run (reference debug.sh: 1 GPU, batch 1)
python train.py --config coco_instance_r50 --dataset coco_2017_debug \
  --max-iter 20 --output ./output/debug \
  train.ims_per_batch=1 mesh.data=1 train.log_period=1 "$@"
