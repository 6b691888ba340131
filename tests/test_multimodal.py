"""Multimodal plumbing: deterministic stub kernels through real
mapInPandas plans — schema, modality pruning, 1-to-N fan-out shape,
and agreement with a row-by-row Python reference.
"""

from __future__ import annotations

import pytest

from go_integ_spark.operators.multimodal import (
    FEATURE_DIM,
    FRAME_COUNT,
    THUMB_SIZE,
    _fake_decode,
    decode_media,
    resize_images,
    sample_frames,
    synthesize_media,
)
from go_integ_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(load_table(spark, SF_DIR, "documents").limit(60))


def test_decode_matches_python_reference(spark, media):
    rows = decode_media(media).collect()
    src = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    assert len(rows) == len(src)
    for r in rows:
        assert len(r["feature"]) == FEATURE_DIM
        assert r["byte_len"] == len(src[r["doc_id"]])
        assert r["feature"] == pytest.approx(_fake_decode(src[r["doc_id"]]))


def test_resize_prunes_to_images_only(spark, media):
    out = resize_images(media).collect()
    image_ids = {r["doc_id"] for r in media.collect() if r["media_type"] == "image"}
    assert {r["doc_id"] for r in out} == image_ids
    for r in out:
        assert (r["width"], r["height"]) == (THUMB_SIZE, THUMB_SIZE)
        assert len(r["thumb"]) <= THUMB_SIZE * THUMB_SIZE


def test_frame_sample_fans_out(spark, media):
    out = sample_frames(media).collect()
    video_ids = {r["doc_id"] for r in media.collect() if r["media_type"] == "video"}
    per_doc: dict = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_no"])
    assert set(per_doc) == video_ids
    for frames in per_doc.values():
        assert sorted(frames) == list(range(FRAME_COUNT))


def test_decode_is_deterministic(spark, media):
    a = sorted(map(tuple, decode_media(media).collect()))
    b = sorted(map(tuple, decode_media(media).collect()))
    assert a == b


def test_phash_groups_permuted_payloads_together(spark, tmp_path):
    """The perceptual hash must be invariant to byte ORDER (it is a
    histogram sketch): two docs with permuted but equal byte
    multisets share a phash group, while a doc with a different byte
    distribution does not; groups never cross media_type."""
    from go_integ_spark.operators.multimodal import phash_groups

    # doc 0 and 3 share media_type (0 % 3 == 3 % 3) AND a byte multiset
    rows = [
        (0, "aabbccdd"),
        (3, "ddccbbaa"),
        (6, "zzzzzzzz"),
        (1, "aabbccdd"),  # same bytes, different media_type -> no group
    ]
    path = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        path + "/documents.parquet"
    )
    got = {
        (r["media_type"], tuple(r["doc_ids"])): r["keep_doc_id"]
        for r in phash_groups(spark, path).collect()
    }
    assert got == {("image", (0, 3)): 0}
