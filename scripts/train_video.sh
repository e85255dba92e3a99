#!/bin/bash
# YTVIS-mini video training (reference train_video.sh)
python train.py --config ytvis2019_video_r50 --dataset ytvis_2021_train_mini \
  --output ./output/ytvis_mini train.ims_per_batch=8 "$@"
