#!/usr/bin/env bash
# Evaluate the image baselines on the VTC test split.
# (The reference invokes a non-existent repo-root evaluate.py here —
# documented defect; the correct entry point is evaluation/eval.py.)

python evaluation/eval.py -c configs/pretrained_clip.jsonc \
       --add_comments never

python evaluation/eval.py -c configs/pretrained_clip_avg_comments.jsonc \
       --comment_fusion averaging --num_comms 5

for br in text image; do
    python evaluation/eval.py -c configs/pretrained_clip_comments_attention.jsonc \
           -r "saved/models/finetuned_clip_comments_${br}_branch/001_*/model_best" \
           --bv "$br" --num_comms 5
done
