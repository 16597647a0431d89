#!/usr/bin/env bash
# Evaluate the varying-comment-count models.
for n_comms in 1 3 5 7 9 ; do
    python evaluation/eval.py -c configs/pretrained_clip_comments_attn_frozen.jsonc \
           -r "varying_comm_experiments/models/frozen_pretrained_clip_${n_comms}_comments/001_*/model_best" \
           --num_comms $n_comms
done
