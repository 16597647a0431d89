#!/usr/bin/env bash
# Robustness probe: pollute eval batches with other videos' comments.
for n_irr in 1 3 5 10 ; do
    python evaluation/eval.py -c configs/pretrained_clip_comments_attention.jsonc \
           -r "saved/models/finetuned_clip_comments_text_branch/001_*/model_best" \
           --num_irrelevant_comments $n_irr --num_comms 5
done
