"""Livebot preprocessing pipeline: comment selection semantics and the
offline (``--no_translate``) CSV emission path.

Mirrors the reference's ``livebot/translate_livebot.py`` behavior; the
translation client itself needs credentials (same as the reference), so
these tests exercise everything up to that boundary.
"""

import ast
import json
import sys

import pandas as pd

from livebot.translate_livebot import VIDEO_MAPPING, is_spam, main, select_comments


def test_spam_filter():
    assert is_spam("哈哈哈哈")
    assert is_spam("前方高能 哈哈")
    assert not is_spam("前方高能")


def test_select_comments_skips_spam_and_adjacent_duplicate_timestamps():
    danmaku = [
        {"time": 1.0, "danmu": "哈哈哈"},      # spam -> skipped
        {"time": 2.0, "danmu": "first"},
        {"time": 2.0, "danmu": "same ts as previously KEPT"},  # skipped
        {"time": 3.0, "danmu": "second"},
        # dedup is vs the previously kept comment only, not global:
        {"time": 2.0, "danmu": "ts repeats later"},            # kept
    ]
    assert select_comments(danmaku) == ["first", "second", "ts repeats later"]


def test_select_comments_caps_at_max_and_accepts_tuples():
    danmaku = [(float(i), f"c{i}") for i in range(10)]
    assert select_comments(danmaku) == [f"c{i}" for i in range(5)]
    assert select_comments(danmaku, max_comments=2) == ["c0", "c1"]


def test_main_offline_emits_csv(tmp_path, monkeypatch, capsys):
    video_map = json.load(open(VIDEO_MAPPING))
    (title_a, vid_a), (title_b, vid_b) = list(video_map.items())[:2]

    test_json = tmp_path / "test_set.json"
    test_json.write_text(
        json.dumps(
            {
                str(vid_a): {
                    "danmaku": [
                        {"time": 0.5, "danmu": "哈哈"},
                        {"time": 1.0, "danmu": "好看"},
                        {"time": 1.0, "danmu": "dup ts"},
                        {"time": 2.0, "danmu": "666"},
                    ]
                },
                # zero-comment video stays in the CSV (reference keeps it)
                str(vid_b): {"danmaku": []},
            },
            ensure_ascii=False,
        ),
        encoding="utf-8",
    )
    out_csv = tmp_path / "livebot.csv"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "translate_livebot.py",
            "--test_json", str(test_json),
            "--video_dir", "vids",
            "--out_csv", str(out_csv),
            "--no_translate",
        ],
    )
    main()

    df = pd.read_csv(out_csv).sort_values("video_path").reset_index(drop=True)
    assert len(df) == 2
    by_path = {row.video_path: row for row in df.itertuples()}
    row_a = by_path[f"vids/{vid_a}.mp4"]
    assert row_a.title == title_a  # passthrough, untranslated
    assert ast.literal_eval(row_a.comments) == ["好看", "666"]
    row_b = by_path[f"vids/{vid_b}.mp4"]
    assert ast.literal_eval(row_b.comments) == []
