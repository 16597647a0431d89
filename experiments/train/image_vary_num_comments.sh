#!/usr/bin/env bash
# Train the frozen CAM model with different numbers of comments.
for n_comms in 1 3 5 7 9 ; do
    echo "Training exp with $n_comms comments"
    python train.py --config "configs/pretrained_clip_comments_attn_frozen.jsonc" \
                    --branch_to_adapt text \
                    --save_dir "varying_comm_experiments" \
                    --exp_name "frozen_pretrained_clip_${n_comms}_comments" \
                    --num_comms $n_comms --batch_size 128 \
                    --epochs 12 \
                    --cached_vision_features "./clip_vit_embeddings.npz" &
done
wait
