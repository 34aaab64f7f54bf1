"""Multimodal plumbing: schema normalization, Arrow-batched decode,
content-hash dedup, frame-sampling plan."""

import pyspark.sql.functions as F

from cryptocurrency_data_pipeline_spark.operators import multimodal as mm


def _media_df(spark):
    rows = [
        (1, mm.encode_fake_media("image", 640, 480, 1, b"px" * 10)),
        (2, mm.encode_fake_media("image", 640, 480, 1, b"px" * 10)),   # dup payload
        (3, mm.encode_fake_media("image", 1920, 1080, 1, b"other")),
        (4, b"\x00garbage-without-header"),                            # undecodable
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    return mm.media_table(df, "id", "image", "payload")


def test_media_table_hash_and_size(spark):
    out = _media_df(spark).collect()
    by_id = {r.media_id: r for r in out}
    assert by_id[1].content_hash == by_id[2].content_hash
    assert by_id[1].content_hash != by_id[3].content_hash
    assert by_id[1].n_bytes == len(mm.encode_fake_media("image", 640, 480, 1, b"px" * 10))


def test_decode_image_meta_stub(spark):
    meta = {r.media_id: r for r in mm.decode_image_meta(_media_df(spark)).collect()}
    assert (meta[1].width, meta[1].height) == (640, 480)
    assert (meta[3].width, meta[3].height) == (1920, 1080)
    # Undecodable row degrades to null metadata, job survives.
    assert meta[4].width is None and meta[4].feature_norm is None
    assert meta[1].feature_norm == meta[1].content_hash[:16]


def test_exact_media_dedup(spark):
    out = mm.exact_media_dedup(_media_df(spark))
    dups = {r.media_id: r.n_copies for r in out.collect()}
    assert dups[1] == 2          # ids 1,2 collapse; keeper is min id
    assert 2 not in dups


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, "video", "h", 25), (2, "image", "h2", 1)],
        "media_id long, kind string, content_hash string, n_frames int",
    )
    frames = mm.frame_sample_plan(df, every_n=10).collect()
    assert [(r.media_id, r.frame_idx) for r in frames] == [(1, 0), (1, 10), (1, 20)]
