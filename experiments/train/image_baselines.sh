#!/usr/bin/env bash
# Image-model training baselines (mirrors the reference experiment grid;
# -d selects the number of TPU chips on the mesh's data axis).

# clip baseline, title only
python train.py --config "configs/pretrained_clip.jsonc" \
                --add_comments never --comment_fusion None \
                --exp_name "pretrained_clip_title_only" \
                --epochs 11 --batch_size 50 &

# finetune clip + averaged title&comments
python train.py --config "configs/pretrained_clip.jsonc" \
                --add_comments always --comment_fusion averaging \
                --exp_name "pretrained_clip_averaging_comments" \
                --num_comms 5 --epochs 11 --batch_size 50 &

# frozen adapted title/image with comments (cached CLIP features)
for br in text image; do
    python train.py --config "configs/pretrained_clip_comments_attn_frozen.jsonc" \
                    --branch_to_adapt "$br" --branch_to_adapt_val "$br" \
                    --exp_name "frozen_clip_comments_${br}_branch" \
                    --num_comms 5 --epochs 12 \
                    --cached_vision_features "./clip_vit_embeddings.npz" &
done

# finetune adapted title/image with comments, warm-started from the frozen run
for br in text image; do
    python train.py --config "configs/pretrained_clip_comments_attention.jsonc" \
                    --branch_to_adapt "$br" --branch_to_adapt_val "$br" \
                    --exp_name "finetuned_clip_comments_${br}_branch" \
                    --num_comms 5 --epochs 22 \
                    --cached_vision_features "./clip_vit_embeddings.npz" \
                    --resume "saved/models/frozen_clip_comments_${br}_branch/001_*/checkpoint-epoch12" &
done
wait
