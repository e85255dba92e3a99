#!/bin/bash
# Weak-sup COCO training (reference train.sh: 4-GPU DDP + wandb ->
# here one SPMD process over the local mesh)
python train.py --config coco_instance_r50 --dataset coco_2017_train \
  --wandb --output ./output/weaksup_coco \
  model.loss.sup_type=mask_projection_and_pairwise train.ims_per_batch=16 "$@"
