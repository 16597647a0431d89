"""Livebot (Bilibili danmaku) test-set preprocessing.

Mirrors the reference's ``livebot/translate_livebot.py``: translate the
titles and up to 5 non-spam comments per video of the OpenNMT-Livebot test
set to English, join against the video-id mapping
(``video_map_opennmt_livebot.json``), and emit
``livebot_test_translated_5comms.csv`` for ``VideoDatasetLivebot``.

Comment filtering follows the reference: drop "哈哈" spam, deduplicate by
timestamp, keep the first 5. Translation uses google-cloud-translate when
installed; a ``--no_translate`` mode passes the raw text through (for
offline environments).
"""

import argparse
import html
import json
import os
from pathlib import Path

import pandas as pd

HERE = Path(__file__).parent
VIDEO_MAPPING = HERE / "video_map_opennmt_livebot.json"


def get_translator():
    try:
        from google.cloud import translate_v2 as translate

        client = translate.Client()
        return lambda text: html.unescape(
            client.translate(text, target_language="en")["translatedText"]
        )
    except ImportError:
        return None


def is_spam(comment: str) -> bool:
    return "哈哈" in comment


def select_comments(danmaku, max_comments: int = 5):
    """Reference selection (``translate_livebot.py:61-81``): skip "哈哈"
    spam, skip a comment whose timestamp equals the PREVIOUSLY KEPT
    comment's (not a global dedup — a timestamp may repeat later), keep the
    first ``max_comments``."""
    prev_time = -1
    out = []
    for i, entry in enumerate(danmaku):
        if isinstance(entry, dict):
            ts, text = entry.get("time", i), entry.get("danmu", "")
        else:
            ts, text = entry
        if is_spam(text):
            continue
        if ts == prev_time:
            continue
        prev_time = ts
        out.append(text)
        if len(out) >= max_comments:
            break
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test_json", required=True,
                    help="OpenNMT-Livebot test set json")
    ap.add_argument("--video_dir", default="data/video/video")
    ap.add_argument("--out_csv", default="livebot_test_translated_5comms.csv")
    ap.add_argument("--no_translate", action="store_true",
                    help="pass raw text through (offline mode)")
    args = ap.parse_args()

    with open(VIDEO_MAPPING, "r") as f:
        video_map = json.load(f)

    translate = None if args.no_translate else get_translator()
    if translate is None and not args.no_translate:
        raise SystemExit(
            "google-cloud-translate is not installed; rerun with "
            "--no_translate to emit untranslated text"
        )
    tr = translate or (lambda t: t)

    with open(args.test_json, "r") as f:
        test_set = json.load(f)

    rows = []
    for title, vid_id in video_map.items():
        entry = test_set.get(str(vid_id)) or test_set.get(title)
        if entry is None:
            continue
        comments = select_comments(entry.get("danmaku", entry.get("comments", [])))
        # the reference keeps zero-comment videos in the CSV (their comment
        # columns are empty); dropping them would shrink the test set
        video_path = os.path.join(args.video_dir, f"{vid_id}.mp4")
        rows.append(
            {
                "video_path": video_path,
                "title": tr(title),
                "comments": str([tr(c) for c in comments]),
            }
        )
        print(vid_id, rows[-1]["title"])

    pd.DataFrame(rows).to_csv(args.out_csv, index=False)
    print("wrote", args.out_csv, len(rows), "rows")


if __name__ == "__main__":
    main()
