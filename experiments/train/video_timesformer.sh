#!/usr/bin/env bash
# TimeSformer + CAM video training. The reference's --visual_device manual
# model split is subsumed by the mesh (--n_model shards the towers over ICI).

python train.py -c configs/pretrained_clip_timesformer_comments_attention.jsonc \
            --num_comms 5 \
            --residual_activation none \
            --epochs 1 \
            --freeze none \
            --save_dir "checkpoints/timesformer" \
            --exp_name "timesformer" \
            --branch_to_adapt image --branch_to_adapt_val image \
            --n_model 2

python train.py -c configs/pretrained_clip_timesformer_comments_attention.jsonc \
            --num_comms 5 \
            --residual_activation none \
            --epochs 1 \
            --freeze none \
            --save_dir "checkpoints/timesformer" \
            --exp_name "timesformer_adapt_text" \
            --branch_to_adapt text --branch_to_adapt_val text \
            --n_model 2

python train.py -c configs/pretrained_clip_1frame_comments_attention.jsonc \
            --num_comms 5 \
            --residual_activation none \
            --epochs 1 \
            --freeze none \
            --save_dir "checkpoints/timesformer" \
            --exp_name "clip_1frame_comments" \
            --branch_to_adapt text --branch_to_adapt_val text
