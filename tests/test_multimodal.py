"""Multimodal plumbing tests: binary columns through Arrow batches —
metadata, fake featurization, frame expansion. The decode stub must be
gated, not crash the plan."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from juniper_syslog_filter_spark.operators import multimodal as M

BLOBS = [
    (1, b"\x89PNG fake image bytes " * 10),
    (2, b"RIFF fake audio bytes " * 5),
    (3, b""),
    (4, None),
]


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(BLOBS, "doc_id long, content binary")


def test_media_metadata(media):
    got = {r.doc_id: (r.n_bytes, r.fp_md5) for r in M.media_metadata(media).collect()}
    for i, b in BLOBS:
        if b is None:
            assert got[i] == (0, "")
        else:
            assert got[i] == (len(b), hashlib.md5(b).hexdigest())


def test_extract_features_deterministic_and_fixed_width(media):
    f1 = {r.doc_id: list(r.feature) for r in M.extract_features(media).collect()}
    f2 = {r.doc_id: list(r.feature) for r in M.extract_features(media.repartition(3)).collect()}
    assert f1 == f2  # content-addressed → partitioning-independent
    assert all(len(v) == M.FEATURE_DIM for v in f1.values())
    assert f1[1] != f1[2]


def test_sample_frames_expansion(media):
    rows = M.sample_frames(media, n_frames=4).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2}  # empty/null blobs yield no frames
    for doc_id, frames in by_doc.items():
        assert [f.frame_idx for f in sorted(frames, key=lambda x: x.frame_idx)] == list(
            range(len(frames))
        )
        blob = dict(BLOBS)[doc_id]
        for f in frames:
            assert bytes(f.frame) in blob


def test_decode_stub_is_gated():
    if not M.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            M._decode_image(b"anything")


def test_resize_media_exact_mean_pool(spark):
    from juniper_syslog_filter_spark.operators.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, bytes([0, 1, 2, 3, 100, 101, 102, 104, 7]))],  # 9 bytes, factor 4
        "doc_id long, content binary",
    )
    (row,) = resize_media(df, factor=4, max_out=16).collect()
    # (0+1+2+3)//4 = 1; (100+101+102+104)//4 = 101; trailing byte dropped
    assert row.pooled == [1, 101]
    assert row.n_pooled == 2


def test_resize_media_short_blob_empty_pool(spark):
    from juniper_syslog_filter_spark.operators.multimodal import resize_media

    df = spark.createDataFrame([(1, b"abc")], "doc_id long, content binary")
    (row,) = resize_media(df, factor=4).collect()
    assert row.pooled == [] and row.n_pooled == 0
