#!/usr/bin/env bash
# Transfer retrieval eval of the TimeSformer models.
# (The reference points at a repo-root retrieval_evaluation.py — documented
# defect; the entry point lives under evaluation/.)

for ds in MSRVTT_videos MSVD_videos Reddit_videos; do
    python evaluation/retrieval_evaluation.py \
        -c "$ds" -s full-test \
        -m clip_timesformer_finaltf \
        -r "checkpoints/timesformer/models/timesformer_adapt_text/001_*/model_best" \
        --branch_to_adapt text \
        --out_csv "eval_${ds}.csv"
done
