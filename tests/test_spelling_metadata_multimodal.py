"""Tests for spelling suggestions (Q14), HTML metadata scrape (T5), and
the multimodal binary-column plumbing."""

import pytest
from pyspark.sql import functions as F

from search_suite_spark.functions.html_meta import page_metadata, scrape_html
from search_suite_spark.operators.build import build_index
from search_suite_spark.operators.multimodal import (
    decode_media_meta,
    decode_image_real,
    frame_sample,
    resize_plan,
    synthesize_media,
)
from search_suite_spark.operators.spelling import spelling_suggestions, suggestion_map
from search_suite_spark.sources.corpus import pages_from_docs_list


# -- spelling (Q14) ----------------------------------------------------------


@pytest.fixture(scope="module")
def idx(spark):
    docs = [
        ("http://d1", "food fool fools cool fan"),
        ("http://d2", "foo bar bat cat fit"),
    ]
    return build_index(pages_from_docs_list(spark, docs), dedupe=False)


def test_spelling_distance_one(spark, idx):
    rows = spelling_suggestions(idx.terms, "fool", max_dist=1).collect()
    got = suggestion_map(rows)
    # exact hit at dist 0; cool/food (sub), foo (del), fools (ins) at 1
    assert got["fool"][0] == {"fool"}
    assert got["fool"][1] == {"cool", "food", "foo", "fools"}


def test_spelling_multi_word_and_distance_two(spark, idx):
    rows = spelling_suggestions(idx.terms, "fo bbat", max_dist=2).collect()
    got = suggestion_map(rows)
    assert "foo" in got["fo"][1]
    assert "food" in got["fo"][2] and "fool" in got["fo"][2]
    assert got["bbat"][1] == {"bat"}
    # no hallucinated words
    all_sugg = {s for d in got.values() for ss in d.values() for s in ss}
    vocab = {r["term"] for r in idx.terms.collect()}
    assert all_sugg <= vocab


def test_spelling_empty_query(spark, idx):
    assert spelling_suggestions(idx.terms, "...").count() == 0


# -- html metadata (T5) ------------------------------------------------------


def test_scrape_html_title_and_meta():
    html = (
        "<html><head><TITLE> Hello World </TITLE>"
        "<meta name='Description' content='a page'>"
        "<meta content='kw1,kw2' name='keywords'/></head>"
        "<body><title>not this one?</title></body></html>"
    )
    title, meta = scrape_html("http://x", html)
    assert title == "Hello World"
    assert meta == {"description": "a page", "keywords": "kw1,kw2"}


def test_scrape_html_file_uri_fallback():
    title, meta = scrape_html("file:///tmp/notes.txt", "<p>no head</p>")
    assert title == "notes.txt"
    assert meta == {}
    assert scrape_html("http://x", "<p>no head</p>") == (None, {})


def test_page_metadata_frame(spark):
    rows = [
        ("http://a", "<head><title>A</title><meta name=\"x\" content=\"1\"></head>"),
        ("file:///b/c.md", "<body></body>"),
    ]
    df = spark.createDataFrame(rows, "url string, html_text string")
    got = {r["url"]: (r["title"], dict(r["meta"] or {}))
           for r in page_metadata(df).collect()}
    assert got["http://a"] == ("A", {"x": "1"})
    assert got["file:///b/c.md"] == ("c.md", {})


# -- multimodal --------------------------------------------------------------


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(f"doc://{i}",) for i in range(30)], "url string"
    )
    return synthesize_media(docs)


def test_media_meta_roundtrip(spark, media):
    meta = decode_media_meta(media)
    rows = meta.collect()
    assert len(rows) == 30
    kinds = {r["kind"] for r in rows}
    assert kinds <= {"image", "audio", "video"} and len(kinds) == 3
    for r in rows:
        if r["kind"] == "image":
            assert 1 <= r["width"] <= 1920 and 1 <= r["height"] <= 1080
            assert r["n_frames"] is None
        elif r["kind"] == "audio":
            assert 16000 <= r["sample_rate"] < 48000 and r["n_samples"] >= 1
            assert r["width"] is None
        else:
            assert r["n_frames"] >= 1
        assert r["n_bytes"] > 10


def test_media_meta_deterministic(spark, media):
    a = sorted(map(tuple, decode_media_meta(media).collect()))
    b = sorted(map(tuple, decode_media_meta(media).collect()))
    assert a == b


def test_resize_plan_aspect(spark, media):
    meta = decode_media_meta(media)
    for r in resize_plan(meta, max_side=256).collect():
        # exact scale math: eff = min(256/max_side, 1), round half-up
        eff = min(256.0 / max(r["width"], r["height"]), 1.0)
        from decimal import Decimal, ROUND_HALF_UP

        want_w = max(int(Decimal(r["width"] * eff).quantize(0, ROUND_HALF_UP)), 1)
        want_h = max(int(Decimal(r["height"] * eff).quantize(0, ROUND_HALF_UP)), 1)
        assert (r["out_w"], r["out_h"]) == (want_w, want_h)
        # never upscale
        assert r["out_w"] <= r["width"] and r["out_h"] <= r["height"]


def test_frame_sample(spark, media):
    meta = decode_media_meta(media)
    vids = {r["url"]: r["n_frames"] for r in meta.filter("kind = 'video'").collect()}
    got = frame_sample(meta, every_n=500).collect()
    per_url: dict[str, list[int]] = {}
    for r in got:
        per_url.setdefault(r["url"], []).append(r["frame_idx"])
    assert set(per_url) == set(vids)
    for url, idxs in per_url.items():
        assert idxs == sorted(idxs)
        assert idxs[0] == 0
        assert len(idxs) == (vids[url] - 1) // 500 + 1


def test_frame_sample_zero_frame_video_contributes_nothing(spark):
    """A corrupt/empty container (n_frames = 0) must yield no sampled
    rows — not an IllegalArgumentException from sequence(0, -1, +step)
    killing the whole job (one bad row in a 100 TB scan)."""
    meta = spark.createDataFrame(
        [("u0", "video", 0), ("u1", "video", 3), ("u2", "image", 0)],
        "url string, kind string, n_frames int",
    )
    got = frame_sample(meta, every_n=2).collect()
    assert {(r["url"], r["frame_idx"]) for r in got} == {("u1", 0), ("u1", 2)}


def test_real_decode_is_marked_stub():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_unknown_blob(spark):
    df = spark.createDataFrame([("u1", bytearray(b"random-bytes"))],
                               "url string, blob binary")
    r = decode_media_meta(df).collect()[0]
    assert r["kind"] == "unknown" and r["n_bytes"] == 12
