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


def test_resize_images_stub(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        _parse_header,
        encode_fake_media,
        media_table,
        resize_images,
    )

    rows = [
        (1, "image", encode_fake_media("image", 1024, 512, 1, bytes(1000))),
        (2, "image", encode_fake_media("image", 100, 50, 1, bytes(64))),  # no upscale
    ]
    df = media_table(
        spark.createDataFrame(rows, "media_id long, kind string, payload binary"),
        "media_id", "image", "payload",
    )
    got = {r.media_id: r for r in resize_images(df, max_side=256).collect()}
    assert (got[1].width, got[1].height) == (256, 128)
    assert (got[2].width, got[2].height) == (100, 50)  # small image untouched
    # Payload is itself a valid decodable media blob after resize.
    w, h, _ = _parse_header(bytes(got[1].payload))
    assert (w, h) == (256, 128)
    # Body scales by the area ratio over the 17-byte header: 1000 * 0.25^2.
    assert len(bytes(got[1].payload)) == 17 + int(1000 * 0.25 * 0.25)
    # Unscaled image keeps its body byte-for-byte in length.
    assert len(bytes(got[2].payload)) == 17 + 64

def test_parse_ppm_variants():
    from cryptocurrency_data_pipeline_spark.operators.multimodal import _parse_ppm, _parse_header

    # Canonical single-space header.
    assert _parse_ppm(b"P6 640 480 255\n" + b"\x00" * 10) == (640, 480, 1)
    # Newline-separated with a comment line between fields.
    assert _parse_ppm(b"P6\n# made by hand\n12 34\n255\n") == (12, 34, 1)
    # Comment jammed directly after a value, CR line ending.
    assert _parse_ppm(b"P6 7#c\r9 255 ") == (7, 9, 1)
    import pytest
    with pytest.raises(ValueError):
        _parse_ppm(b"P6 640 480")          # truncated: only two fields
    with pytest.raises(ValueError):
        _parse_ppm(b"P6 640 abc 255")      # non-numeric field
    # Dispatch routes P6 payloads to the PPM parser.
    assert _parse_header(b"P6 2 3 255\nxxxxxx") == (2, 3, 1)


def test_parse_bmp_variants():
    import pytest

    from cryptocurrency_data_pipeline_spark.operators.multimodal import _parse_bmp, _parse_header

    def bmp_info(w, h):
        # 14-byte file header + BITMAPINFOHEADER with only size/dims filled.
        return (
            b"BM" + bytes(12)
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
        )

    def bmp_core(w, h):
        return (
            b"BM" + bytes(12)
            + (12).to_bytes(4, "little")
            + w.to_bytes(2, "little")
            + h.to_bytes(2, "little")
            + bytes(4)
        )

    assert _parse_bmp(bmp_info(800, 600)) == (800, 600, 1)
    # Top-down BMP stores height negative; decoded height is its magnitude.
    assert _parse_bmp(bmp_info(800, -600)) == (800, 600, 1)
    assert _parse_bmp(bmp_core(320, 200)) == (320, 200, 1)
    with pytest.raises(ValueError):
        _parse_bmp(b"BM" + bytes(10))       # truncated
    with pytest.raises(ValueError):
        _parse_bmp(b"BM" + bytes(12) + (16).to_bytes(4, "little") + bytes(8))
    assert _parse_header(bmp_info(1, 2)) == (1, 2, 1)


def _wav(rate=16000, channels=2, bits=16, n_samples=4, extra_chunk=False):
    block = channels * bits // 8
    data = b"\x00" * (n_samples * block)
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    mid = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00" if extra_chunk else b""
    body = fmt + mid + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def test_parse_wav_variants():
    import pytest

    from cryptocurrency_data_pipeline_spark.operators.multimodal import _parse_wav

    assert _parse_wav(_wav()) == (16000, 2, 16, 4)
    assert _parse_wav(_wav(rate=8000, channels=1, n_samples=7)) == (8000, 1, 16, 7)
    # Odd-size intermediate chunk exercises RIFF word-alignment padding.
    assert _parse_wav(_wav(extra_chunk=True)) == (16000, 2, 16, 4)
    with pytest.raises(ValueError):
        _parse_wav(b"RIFX" + b"\x00" * 20)           # wrong magic
    with pytest.raises(ValueError):
        _parse_wav(_wav()[:20])                       # truncated: no data chunk


def test_decode_audio_meta_roundtrip(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_audio_meta,
        media_table,
    )

    rows = [(1, _wav()), (2, _wav(rate=44100, channels=1, n_samples=10)),
            (3, b"not audio at all")]
    df = media_table(
        spark.createDataFrame(rows, "id long, payload binary"), "id", "audio", "payload"
    )
    got = {r.media_id: r for r in decode_audio_meta(df).collect()}
    assert (got[1].sample_rate, got[1].channels, got[1].n_samples) == (16000, 2, 4)
    assert (got[2].sample_rate, got[2].bits, got[2].n_samples) == (44100, 16, 10)
    assert got[3].sample_rate is None  # DLQ pattern: nulls, job survives


def test_le_hex_matches_python(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import le_hex

    df = spark.createDataFrame([(0,), (1,), (258,), (44100,), (16777215,)], "v long")
    got = [r.h for r in df.select(le_hex(F.col("v"), 4).alias("h")).orderBy("v").collect()]
    want = [int.to_bytes(v, 4, "little").hex() for v in [0, 1, 258, 44100, 16777215]]
    assert got == want


def _y4m(w=4, h=4, fps=25, frames=3, frame_fill=b"\x00"):
    fb = w * h * 3 // 2
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1\n".encode()
    return head + b"".join(b"FRAME\n" + frame_fill * fb for _ in range(frames))


def test_parse_y4m_variants():
    import pytest

    from cryptocurrency_data_pipeline_spark.operators.multimodal import _parse_y4m

    assert _parse_y4m(_y4m()) == (4, 4, 25, 1, 3)
    assert _parse_y4m(_y4m(w=16, h=8, fps=30, frames=0)) == (16, 8, 30, 1, 0)
    # Frame bytes that themselves contain the marker must not inflate the
    # count — the walker advances by plane size, never by search.
    tricky = _y4m(frames=2, frame_fill=b"F")  # planes full of 'F's
    assert _parse_y4m(tricky)[4] == 2
    with pytest.raises(ValueError):
        _parse_y4m(b"JUNK")
    with pytest.raises(ValueError):
        _parse_y4m(_y4m()[:-5])               # truncated last frame
    with pytest.raises(ValueError):
        _parse_y4m(b"YUV4MPEG2 W4 H4\n")      # missing F param


def test_decode_video_meta_roundtrip(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_video_meta,
        media_table,
    )

    rows = [(1, _y4m(frames=5)), (2, b"garbage")]
    df = media_table(
        spark.createDataFrame(rows, "id long, payload binary"), "id", "video", "payload"
    )
    got = {r.media_id: r for r in decode_video_meta(df).collect()}
    assert (got[1].width, got[1].fps_num, got[1].n_frames) == (4, 25, 5)
    assert got[2].n_frames is None


def test_media_dir_table_binary_file_source(spark, tmp_path):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_image_meta,
        media_dir_table,
    )

    d = tmp_path / "imgs"
    sub = d / "nested"
    sub.mkdir(parents=True)
    (d / "a.ppm").write_bytes(b"P6 640 480 255\n" + b"\x00" * 16)
    (sub / "b.ppm").write_bytes(b"P6\n12 34\n255\n" + b"\x01" * 8)
    (d / "ignore.txt").write_text("not media")

    tab = media_dir_table(spark, str(d), "image", glob="*.ppm")
    rows = tab.collect()
    assert len(rows) == 2  # glob filtered, recursive listing
    assert {r.n_bytes > 0 for r in rows} == {True}
    assert len({r.media_id for r in rows}) == 2  # path-hash ids distinct

    meta = {
        (r.width, r.height): r.media_id
        for r in decode_image_meta(tab).collect()
    }
    assert set(meta) == {(640, 480), (12, 34)}


def test_media_dir_table_glob_pushdown_in_plan(spark, tmp_path):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        media_dir_table,
    )

    d = tmp_path / "imgs2"
    d.mkdir()
    (d / "x.ppm").write_bytes(b"P6 1 1 255\n\x00\x00\x00")
    tab = media_dir_table(spark, str(d), "image", glob="*.ppm")
    assert tab.count() == 1
    # ids are stable across repeated listings
    again = media_dir_table(spark, str(d), "image", glob="*.ppm")
    assert tab.select("media_id").collect() == again.select("media_id").collect()


def test_le_hex_masks_overflow_to_low_bytes(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import le_hex

    # Values wider than n_bytes must keep the LOW bytes (conventional
    # truncation), not the most-significant hex digits lpad would keep.
    vals = [65536, 16777216 + 258, (1 << 32) + 5]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [
        r.h
        for r in df.select(le_hex(F.col("v"), 2).alias("h"), "v")
        .orderBy("v")
        .collect()
    ]
    want = [int.to_bytes(v & 0xFFFF, 2, "little").hex() for v in sorted(vals)]
    assert got == want


def test_parse_wav_rejects_truncated_chunks():
    import pytest

    from cryptocurrency_data_pipeline_spark.operators.multimodal import _parse_wav

    good = _wav()
    # Truncate the payload mid-data-chunk: the declared chunk size now
    # exceeds the bytes present; the decoder must raise (-> null/DLQ row),
    # not report an inflated sample count from the declared size.
    with pytest.raises(ValueError):
        _parse_wav(good[:-4])
    # Same for an over-declared fmt chunk reading zero-filled fields.
    bad_fmt = bytearray(good)
    bad_fmt[16:20] = int.to_bytes(1000, 4, "little")  # fmt csize -> 1000
    with pytest.raises(ValueError):
        _parse_wav(bytes(bad_fmt))


# ---------------------------------------------------------------------------
# PNG: real compressed decode (stdlib zlib) — roundtrip + corruption paths.
# ---------------------------------------------------------------------------


def _px(n, seed=0):
    return bytes((seed + i) % 256 for i in range(n))


def test_png_roundtrip_grey_all_filters():
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    # 6 rows -> filter types 0,1,2,3,4,0 all exercised by the encoder.
    w, h = 7, 6
    pixels = _px(w * h, seed=13)
    payload = encode_png(w, h, pixels)
    gw, gh, ch, raw = decode_png(payload)
    assert (gw, gh, ch) == (w, h, 1)
    assert bytes(raw) == pixels


def test_png_roundtrip_rgb():
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    w, h = 5, 5
    pixels = _px(w * h * 3, seed=101)
    payload = encode_png(w, h, pixels, color_type=2)
    gw, gh, ch, raw = decode_png(payload)
    assert (gw, gh, ch) == (w, h, 3)
    assert bytes(raw) == pixels


def test_png_split_idat_streams_concatenate():
    import zlib

    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    # Real encoders split IDAT; rebuild a payload with the zlib stream cut
    # across two IDAT chunks and re-CRC'd — must decode identically.
    w, h = 4, 3
    pixels = _px(w * h, seed=7)
    one = encode_png(w, h, pixels)
    sig, rest = one[:8], one[8:]
    ihdr_len = int.from_bytes(rest[0:4], "big")
    ihdr = rest[: 12 + ihdr_len]
    idat_off = 12 + ihdr_len
    idat_len = int.from_bytes(rest[idat_off : idat_off + 4], "big")
    stream = rest[idat_off + 8 : idat_off + 8 + idat_len]
    half = len(stream) // 2

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    two = (
        sig + ihdr
        + chunk(b"IDAT", stream[:half]) + chunk(b"IDAT", stream[half:])
        + chunk(b"IEND", b"")
    )
    assert decode_png(two)[3] == decode_png(one)[3]


def test_png_rejects_bad_crc_and_unsupported():
    import pytest

    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    good = encode_png(3, 3, _px(9))
    flipped = bytearray(good)
    flipped[-16] ^= 0xFF  # corrupt a byte inside IDAT -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(flipped))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)  # truncated/garbage
    with pytest.raises(ValueError):
        decode_png(good[:20])  # mid-IHDR truncation


def test_decode_png_stats_and_meta_dispatch(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_image_meta,
        decode_png_stats,
        encode_png,
        media_table,
    )

    rows = [
        (1, encode_png(4, 2, _px(8, seed=3))),
        (2, encode_png(2, 2, _px(12, seed=5), color_type=2)),
        (3, b"\x89PNG\r\n\x1a\nnot really"),
    ]
    df = media_table(
        spark.createDataFrame(rows, "id long, payload binary"),
        "id", "image", "payload",
    )
    got = {r.media_id: r for r in decode_png_stats(df).collect()}
    assert (got[1].width, got[1].height, got[1].channels) == (4, 2, 1)
    assert got[1].pixel_sum == sum(_px(8, seed=3))
    assert (got[2].width, got[2].channels) == (2, 3)
    assert got[2].pixel_sum == sum(_px(12, seed=5))
    assert got[3].width is None  # DLQ: nulls, job survives

    # the generic metadata path dispatches PNG headers too
    meta = {r.media_id: r for r in decode_image_meta(df).collect()}
    assert (meta[1].width, meta[1].height) == (4, 2)


def test_parse_jpeg_marker_walk():
    import pytest

    from cryptocurrency_data_pipeline_spark.operators.multimodal import _parse_jpeg

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    sof0 = seg(0xC0, bytes([8]) + (480).to_bytes(2, "big")
               + (640).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    # COM body containing 0xFF bytes must be skipped by length, not
    # mistaken for a marker; DQT/DHT likewise; RST0 is standalone.
    com = seg(0xFE, b"hello \xff\xd8 world")
    dqt = seg(0xDB, bytes(65))
    soi, eoi, rst = b"\xff\xd8", b"\xff\xd9", b"\xff\xd0"
    assert _parse_jpeg(soi + com + dqt + rst + sof0 + eoi) == (640, 480, 1)
    # progressive (SOF2) carries dims the same way
    sof2 = seg(0xC2, bytes([8]) + (12).to_bytes(2, "big")
               + (34).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    assert _parse_jpeg(soi + sof2 + eoi) == (34, 12, 1)
    # C4 (DHT) must NOT be treated as a frame header
    dht = seg(0xC4, bytes(20))
    assert _parse_jpeg(soi + dht + sof0 + eoi) == (640, 480, 1)
    with pytest.raises(ValueError):
        _parse_jpeg(soi + com + eoi)           # no SOF
    with pytest.raises(ValueError):
        _parse_jpeg(soi + seg(0xDA, b"\x01\x01\x00") + eoi)  # SOS before SOF
    with pytest.raises(ValueError):
        _parse_jpeg((soi + sof0)[: len(soi) + 5])  # truncated segment
    with pytest.raises(ValueError):
        _parse_jpeg(b"\x89PNG....")             # wrong magic


# ---------------------------------------------------------------- GIF / LZW


def test_lzw_roundtrip_randomized():
    import random

    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = random.Random(7)
    for _ in range(150):
        mcs = rng.choice([2, 3, 4, 5, 8])
        n = rng.randrange(0, 1500)
        ncol = 1 << mcs
        mode = rng.random()
        if mode < 0.3:
            data = bytes(rng.randrange(ncol) for _ in range(n))
        elif mode < 0.6:
            data = bytes((i * 3) % ncol for i in range(n))
        else:
            data = bytes([rng.randrange(ncol)] * n)  # kwkwk runs
        assert bytes(_lzw_decode(_lzw_encode(data, mcs), mcs, n)) == data


def test_lzw_dictionary_reset_path():
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    # >4096 dictionary entries forces the in-stream clear/reset.
    data = bytes((i * 17 + i // 5) % 16 for i in range(120_000))
    enc = _lzw_encode(data, 4)
    assert bytes(_lzw_decode(enc, 4, len(data))) == data
    assert len(enc) < len(data) // 10  # actually compressing


def test_gif_roundtrip_and_palette():
    import random

    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = random.Random(11)
    for _ in range(40):
        w, h = rng.randrange(1, 30), rng.randrange(1, 20)
        nc = rng.randrange(2, 17)
        palette = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(nc)
        ]
        idx = bytes(rng.randrange(nc) for _ in range(w * h))
        gw, gh, pal, got = decode_gif(encode_gif(w, h, idx, palette))
        assert (gw, gh) == (w, h)
        assert bytes(got) == idx
        assert pal[:nc] == palette  # GCT parsed; padding beyond nc is zeros


def test_gif_large_image_crosses_dict_reset():
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    w, h, nc = 400, 300, 16
    palette = [(j * 7 % 256, j * 11 % 256, j * 13 % 256) for j in range(nc)]
    idx = bytes((i * 17 + i // 7) % nc for i in range(w * h))
    gw, gh, _, got = decode_gif(encode_gif(w, h, idx, palette))
    assert (gw, gh) == (w, h) and bytes(got) == idx


def test_gif_skips_extension_blocks():
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    palette = [(1, 2, 3), (4, 5, 6)]
    idx = bytes([0, 1, 1, 0])
    g = bytearray(encode_gif(2, 2, idx, palette))
    # splice a Graphic Control Extension before the image descriptor
    at = g.index(0x2C, 13)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    g[at:at] = gce
    gw, gh, _, got = decode_gif(bytes(g))
    assert (gw, gh) == (2, 2) and bytes(got) == idx


def test_gif_rejects_corrupt():
    import pytest

    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    g = encode_gif(3, 2, bytes([0, 1, 2, 0, 1, 2]), [(9, 9, 9)] * 3)
    for bad in (b"", b"GIF89a", g[:15], b"NOPE" + g[4:], g[:-10]):
        with pytest.raises(ValueError):
            decode_gif(bad)
    # interlace flag set -> unsupported, raises (DLQ path)
    at = g.index(0x2C, 13)
    tweaked = bytearray(g)
    tweaked[at + 9] |= 0x40
    with pytest.raises(ValueError):
        decode_gif(bytes(tweaked))


def test_decode_gif_stats_dlq(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_gif_stats,
        encode_gif,
        media_table,
    )

    palette = [(10, 20, 30), (1, 1, 1), (200, 0, 50)]
    idx = bytes([0, 2, 1, 2])
    rows = [(1, encode_gif(2, 2, idx, palette)), (2, b"GIF89a\x00corrupt")]
    df = media_table(
        spark.createDataFrame(rows, "id long, payload binary"),
        "id", "image", "payload",
    )
    got = {r.media_id: r for r in decode_gif_stats(df).collect()}
    assert (got[1].width, got[1].height, got[1].n_colors) == (2, 2, 4)
    assert got[1].index_sum == sum(idx)
    assert got[1].rgb_sum == sum(sum(palette[i]) for i in idx)
    assert got[2].width is None and got[2].rgb_sum is None


# ------------------------------------------------------- audio features


def test_wav_samples_roundtrip_and_reject():
    import pytest

    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        _wav_samples,
        encode_wav,
    )

    s = [((7 * 5 + 3 * i) % 4001) - 2000 for i in range(100)]
    rate, got = _wav_samples(encode_wav(8000, s))
    assert rate == 8000 and got == s
    with pytest.raises(ValueError):
        _wav_samples(b"RIFF\x00\x00\x00\x00WAVEjunk")
    with pytest.raises(ValueError):
        _wav_samples(encode_wav(8000, s)[:30])  # truncated chunk


def test_decode_audio_features_exact_integers(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_audio_features,
        encode_wav,
        media_table,
    )

    s1 = [0, 100, -50, 50, -1, 2, 0, -3]
    rows = [(1, encode_wav(16000, s1)), (2, b"not a wav")]
    df = media_table(
        spark.createDataFrame(rows, "id long, payload binary"),
        "id", "audio", "payload",
    )
    got = {r.media_id: r for r in decode_audio_features(df).collect()}
    assert got[1].sample_rate == 16000
    assert got[1].n_samples == 8
    assert got[1].peak == 100
    assert got[1].sum_sq == sum(x * x for x in s1)
    assert got[1].zero_crossings == sum(
        1 for i in range(1, len(s1)) if s1[i] * s1[i - 1] < 0
    )
    assert got[2].peak is None  # DLQ row


def test_gif_anim_roundtrip_all_frames():
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_anim,
    )

    pal = [(j * 7 % 256, j * 11 % 256, j * 13 % 256) for j in range(5)]
    frames = [bytes((3 * f + i) % 5 for i in range(6 * 4)) for f in range(3)]
    w, h, nf, isum, rsum = decode_gif_frames(encode_gif_anim(6, 4, frames, pal))
    assert (w, h, nf) == (6, 4, 3)
    assert isum == sum(sum(fr) for fr in frames)
    assert rsum == sum(sum(pal[i]) for fr in frames for i in fr)


def test_gif_anim_single_frame_compat_and_reject():
    import pytest

    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif,
        encode_gif_anim,
    )

    # plain single-image GIFs walk through the animation decoder too
    g1 = encode_gif(3, 2, bytes([0, 1, 2, 3, 0, 1]), [(9, 9, 9)] * 4)
    assert decode_gif_frames(g1)[2] == 1
    g = encode_gif_anim(2, 2, [bytes([0, 1, 1, 0])], [(1, 2, 3), (4, 5, 6)])
    for bad in (g[:-4], g[:20], b""):
        with pytest.raises(ValueError):
            decode_gif_frames(bad)
    with pytest.raises(ValueError):
        encode_gif_anim(2, 2, [], [(0, 0, 0)])


def test_decode_gif_anim_stats_dlq(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_gif_anim_stats,
        encode_gif_anim,
        media_table,
    )

    pal = [(10, 0, 0), (0, 10, 0)]
    frames = [bytes([0, 1, 0, 1]), bytes([1, 1, 1, 1])]
    rows = [(1, encode_gif_anim(2, 2, frames, pal)), (2, b"GIF89a broken")]
    df = media_table(
        spark.createDataFrame(rows, "id long, payload binary"),
        "id", "video", "payload",
    )
    got = {r.media_id: r for r in decode_gif_anim_stats(df).collect()}
    assert got[1].n_frames == 2
    assert got[1].index_sum == 2 + 4
    assert got[1].rgb_sum == 10 * 8
    assert got[2].n_frames is None


def test_decode_image_meta_dispatches_gif(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_image_meta,
        encode_gif,
        media_table,
    )

    g = encode_gif(5, 3, bytes([0] * 15), [(1, 2, 3), (4, 5, 6)])
    df = media_table(
        spark.createDataFrame([(1, g)], "id long, payload binary"),
        "id", "image", "payload",
    )
    meta = decode_image_meta(df).collect()[0]
    assert (meta.width, meta.height) == (5, 3)


def test_decode_audio_bands_square_wave_selectivity(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_audio_bands,
        encode_wav,
        media_table,
    )

    # A period-4 square wave correlates perfectly with w_4 and nulls
    # against w_2 (orthogonal Rademacher rows).
    s1 = [100, 100, -100, -100] * 4
    s2 = [7, -3, 12, 5]  # hand-computable small clip
    rows = [(1, encode_wav(8000, s1)), (2, encode_wav(8000, s2)),
            (3, b"RIFFjunk")]
    df = media_table(
        spark.createDataFrame(rows, "id long, payload binary"),
        "id", "audio", "payload",
    )
    got = {r.media_id: r for r in decode_audio_bands(df).collect()}
    assert got[1].band_p4 == 100 * len(s1)  # full-scale correlation
    assert got[1].band_p2 == 0              # orthogonal band
    # w_2 = +,-,+,- ; w_4 = +,+,-,-
    assert got[2].band_p2 == 7 + 3 + 12 - 5
    assert got[2].band_p4 == 7 - 3 - 12 - 5
    assert got[3].band_p2 is None  # DLQ row


def test_avi_roundtrip_and_tamper_audit():
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        _parse_avi,
        encode_avi,
    )

    frames = [bytes((i % 251) for i in range(24 * 8)) for _ in range(3)]
    p = encode_avi(24, 8, 40000, frames)
    assert _parse_avi(p) == (24, 8, 40000, 3, 3)
    # Odd-size frames force RIFF even-padding on every chunk.
    p_odd = encode_avi(7, 3, 33333, [b"x" * 21] * 2)
    assert _parse_avi(p_odd) == (7, 3, 33333, 2, 2)
    # Tampered declared count: the movi walk disagrees.
    tampered = p[:48] + (9).to_bytes(4, "little") + p[52:]
    w, h, us, declared, walked = _parse_avi(tampered)
    assert declared == 9 and walked == 3
    import pytest

    with pytest.raises(ValueError):
        _parse_avi(p[:40])
    with pytest.raises(ValueError):
        _parse_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_decode_avi_meta_dlq_shape(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_avi_meta,
        encode_avi,
        media_table,
    )

    rows = [(1, encode_avi(16, 16, 40000, [b"\x00" * 256])), (2, b"garbage")]
    df = media_table(
        spark.createDataFrame(rows, "id long, payload binary"),
        "id", "video", "payload",
    )
    got = {r.media_id: r for r in decode_avi_meta(df).collect()}
    assert got[1].width == 16 and got[1].walked_frames == 1
    assert got[2].width is None  # DLQ row


def test_mp4_roundtrip_and_guards():
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        _parse_mp4,
        encode_mp4,
    )

    p = encode_mp4(30000, 90000, 640, 360, b"\x01" * 100)
    assert _parse_mp4(p) == (30000, 90000, 640, 360, 100)
    import pytest

    with pytest.raises(ValueError):
        _parse_mp4(p[:20])  # truncated ftyp
    with pytest.raises(ValueError):
        _parse_mp4(b"\x00\x00\x00\x08mdat")  # no ftyp gate
    # size-0 box extends to end of file (spec) — still parses
    import struct

    last = p.rfind(b"mdat") - 4
    p0 = p[:last] + struct.pack(">I", 0) + p[last + 4:]
    assert _parse_mp4(p0)[4] == 100


def test_decode_mp4_meta_dlq_shape(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_mp4_meta,
        encode_mp4,
        media_table,
    )

    rows = [(1, encode_mp4(1000, 5000, 32, 16)), (2, b"not a box")]
    df = media_table(
        spark.createDataFrame(rows, "id long, payload binary"),
        "id", "video", "payload",
    )
    got = {r.media_id: r for r in decode_mp4_meta(df).collect()}
    assert got[1].timescale == 1000 and got[1].width == 32
    assert got[2].timescale is None  # DLQ row


def test_tiff_roundtrip_both_endians(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        _parse_tiff,
        decode_tiff_meta,
        encode_tiff,
        media_table,
    )

    assert _parse_tiff(encode_tiff(640, 480, 8)) == (640, 480, 8, "II")
    assert _parse_tiff(encode_tiff(33, 17, 16, big_endian=True)) == (
        33, 17, 16, "MM",
    )
    import pytest

    with pytest.raises(ValueError):
        _parse_tiff(b"XX\x2a\x00\x08\x00\x00\x00")
    with pytest.raises(ValueError):
        _parse_tiff(encode_tiff(9, 9)[:12])  # truncated IFD
    rows = [(1, encode_tiff(8, 4, 8, True)), (2, b"junk")]
    df = media_table(
        spark.createDataFrame(rows, "id long, payload binary"),
        "id", "image", "payload",
    )
    got = {r.media_id: r for r in decode_tiff_meta(df).collect()}
    assert got[1].byte_order == "MM" and got[1].width == 8
    assert got[2].width is None


def test_mp3_frame_walk_and_guards(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        _parse_mp3,
        decode_mp3_meta,
        encode_mp3,
        media_table,
    )

    p = encode_mp3(9, 0, 7, pad_every=3)  # 128 kbps, 44100, padded
    assert _parse_mp3(p) == (44100, 128, 7)
    import pytest

    with pytest.raises(ValueError):
        _parse_mp3(p[:-1])  # truncated final frame
    with pytest.raises(ValueError):
        _parse_mp3(b"\xff\xfb" + b"\x00" * 10)  # bad bitrate index 0 len
    rows = [(1, encode_mp3(11, 1, 4)), (2, b"ID3 but junk")]
    df = media_table(
        spark.createDataFrame(rows, "id long, payload binary"),
        "id", "audio", "payload",
    )
    got = {r.media_id: r for r in decode_mp3_meta(df).collect()}
    assert got[1].sample_rate == 48000 and got[1].bitrate_kbps == 192
    assert got[1].n_frames == 4
    assert got[2].sample_rate is None  # DLQ row


def test_warc_walk_desync_resistance(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        _parse_warc,
        decode_warc_records,
        encode_warc,
    )

    # A body containing the literal record header must NOT desync the
    # Content-Length walk.
    recs = [
        ("warcinfo", "", b"software: test"),
        ("response", "http://e/x", b"WARC/1.0\r\n\r\nfake inner record"),
    ]
    p = encode_warc(recs)
    got = _parse_warc(p)
    assert [(t, u) for t, u, _ in got] == [
        ("warcinfo", ""), ("response", "http://e/x"),
    ]
    assert got[1][2] == len(recs[1][2])
    import pytest

    with pytest.raises(ValueError):
        _parse_warc(p[:-2])  # missing separator
    with pytest.raises(ValueError):
        _parse_warc(b"WARC/0.9\r\n\r\n\r\n\r\n")
    # Exploding decoder: one row per record; DLQ row for garbage.
    df = spark.createDataFrame(
        [(1, p), (2, b"not warc")], "media_id long, payload binary"
    )
    rows = decode_warc_records(df).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[1]) == 2 and by_id[1][0].warc_type == "warcinfo"
    assert len(by_id[2]) == 1 and by_id[2][0].warc_type is None


def test_zip_roundtrip_stdlib_crosscheck_and_crc(spark):
    import io
    import zipfile

    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        _parse_zip,
        decode_zip_members,
        encode_zip,
    )

    p = encode_zip([("a/text.txt", b"hello world"), ("meta.json", b'{"k":1}')])
    assert _parse_zip(p) == [("a/text.txt", 11, True), ("meta.json", 7, True)]
    # The stdlib must accept our writer's output byte-for-byte.
    zf = zipfile.ZipFile(io.BytesIO(p))
    assert [(z.filename, z.file_size) for z in zf.infolist()] == [
        ("a/text.txt", 11), ("meta.json", 7),
    ]
    assert zf.read("a/text.txt") == b"hello world"
    # Data damage -> crc_ok False for that member only.
    i = p.find(b"hello")
    pc = p[:i] + b"jello" + p[i + 5:]
    assert _parse_zip(pc) == [("a/text.txt", 11, False), ("meta.json", 7, True)]
    import pytest

    with pytest.raises(ValueError):
        _parse_zip(p[:-10])  # EOCD destroyed
    rows = decode_zip_members(
        spark.createDataFrame(
            [(1, p), (2, b"PK but junk")], "media_id long, payload binary"
        )
    ).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[1]) == 2 and all(r.crc_ok for r in by_id[1])
    assert by_id[2][0].member_name is None  # DLQ row


def test_warc_http_extraction_chain(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_warc_http,
        encode_warc,
    )

    html = (
        "<html><head><title> T1 </title></head>"
        "<body><p>hello <b>bold</b> world</p></body></html>"
    )
    ok = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html).encode()
    nf = b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\ngone"
    raw = b"not an http message at all"
    p = encode_warc(
        [
            ("warcinfo", "", b"x"),
            ("request", "u1", b"GET / HTTP/1.1"),
            ("response", "u1", ok),
            ("response", "u2", nf),
            ("response", "u3", raw),
        ]
    )
    df = spark.createDataFrame(
        [(1, p), (2, b"garbage")], "media_id long, payload binary"
    )
    rows = decode_warc_http(df).collect()
    by_uri = {r.target_uri: r for r in rows if r.media_id == 1}
    assert set(by_uri) == {"u1", "u2", "u3"}  # responses only
    r1 = by_uri["u1"]
    assert r1.http_status == 200 and r1.content_type == "text/html"
    assert r1.title == "T1"
    import re

    assert r1.visible_chars == len(re.sub(r"<[^>]*>", "", html))
    assert by_uri["u2"].http_status == 404 and by_uri["u2"].title is None
    assert by_uri["u3"].http_status is None  # non-HTTP body, kept row
    dlq = [r for r in rows if r.media_id == 2]
    assert len(dlq) == 1 and dlq[0].target_uri is None


def test_flac_streaminfo_roundtrip_and_dlq(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        _parse_flac,
        decode_flac_meta,
        encode_flac_header,
    )

    assert _parse_flac(encode_flac_header(44100, 2, 16, 1234567)) == (
        44100, 2, 16, 1234567,
    )
    # 36-bit total-samples ceiling and 8-channel/24-bit packing.
    assert _parse_flac(encode_flac_header(96000, 8, 24, (1 << 36) - 1)) == (
        96000, 8, 24, (1 << 36) - 1,
    )
    import pytest

    with pytest.raises(ValueError):
        _parse_flac(b"fLaC\x80\x00\x00\x22" + b"\x00" * 10)  # truncated
    with pytest.raises(ValueError):
        _parse_flac(b"OggS")
    rows = [(1, encode_flac_header(48000, 1, 16, 480000)), (2, b"junk")]
    got = {
        r.media_id: r
        for r in decode_flac_meta(
            spark.createDataFrame(rows, "media_id long, payload binary")
        ).collect()
    }
    assert got[1].sample_rate == 48000 and got[1].total_samples == 480000
    assert got[2].sample_rate is None


def test_warc_gz_member_walk(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_warc_gz_records,
        encode_warc_gz,
        gzip_member_split,
        _parse_warc,
    )

    recs = [
        ("warcinfo", "", b"sw: x"),
        ("response", "http://e/1", b"HTTP/1.1 200 OK\r\n\r\nhello"),
    ]
    p = encode_warc_gz(recs)
    members = gzip_member_split(p)
    assert len(members) == 2  # one member per record (the CC layout)
    assert _parse_warc(members[1])[0][0] == "response"
    import pytest

    # A flipped compressed byte fails the member's CRC.
    pc = p[:20] + bytes([p[20] ^ 0xFF]) + p[21:]
    with pytest.raises(Exception):
        gzip_member_split(pc)
    with pytest.raises(ValueError):
        gzip_member_split(p[:-4])  # truncated trailer
    rows = decode_warc_gz_records(
        spark.createDataFrame(
            [(1, p), (2, b"\x1f\x8b junk")], "media_id long, payload binary"
        )
    ).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert [r.warc_type for r in by_id[1]] == ["warcinfo", "response"]
    assert by_id[2][0].warc_type is None  # DLQ


def test_tar_roundtrip_stdlib_and_checksum(spark):
    import io
    import tarfile

    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        _parse_tar,
        decode_tar_members,
        encode_tar,
    )

    p = encode_tar([("docs/a.txt", b"hello world"), ("m.json", b'{"x":1}')])
    assert _parse_tar(p) == [("docs/a.txt", 11), ("m.json", 7)]
    tf = tarfile.open(fileobj=io.BytesIO(p))
    assert [(m.name, m.size) for m in tf.getmembers()] == [
        ("docs/a.txt", 11), ("m.json", 7),
    ]
    assert tf.extractfile("docs/a.txt").read() == b"hello world"
    import pytest

    pc = bytearray(p)
    pc[10] ^= 0x01  # name byte flip -> checksum mismatch
    with pytest.raises(ValueError):
        _parse_tar(bytes(pc))
    with pytest.raises(ValueError):
        _parse_tar(p[:700])  # no end blocks
    rows = decode_tar_members(
        spark.createDataFrame(
            [(1, p), (2, bytes(pc))], "media_id long, payload binary"
        )
    ).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[1]) == 2
    assert by_id[2][0].member_name is None  # whole archive DLQs


def test_ogg_page_walk_crc(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        _parse_ogg,
        decode_ogg_meta,
        encode_ogg,
    )

    # 300-byte payload forces a 255+45 lacing split; 255 exactly forces
    # a 255+0 split (spec rule).
    p = encode_ogg(7, [b"a" * 10, b"b" * 300, b"c" * 255])
    assert _parse_ogg(p) == (7, 3, 2880, 565)
    import pytest

    pc = bytearray(p)
    pc[30] ^= 1  # payload byte of page 0 -> CRC mismatch
    with pytest.raises(ValueError):
        _parse_ogg(bytes(pc))
    with pytest.raises(ValueError):
        _parse_ogg(p[:-3])  # truncated page body
    rows = decode_ogg_meta(
        spark.createDataFrame(
            [(1, p), (2, b"OggS junk")], "media_id long, payload binary"
        )
    ).collect()
    got = {r.media_id: r for r in rows}
    assert got[1].n_pages == 3 and got[1].payload_bytes == 565
    assert got[2].serial is None  # DLQ


def test_sniff_media_all_formats(spark):
    from cryptocurrency_data_pipeline_spark.operators import multimodal as mm

    cases = {
        ("image", "ppm"): b"P6\n1 1\n255\n\x00\x00\x00",
        ("image", "png"): b"\x89PNG\r\n\x1a\n" + b"\x00" * 20,
        ("image", "jpeg"): b"\xff\xd8\xff\xe0rest",
        ("image", "gif"): b"GIF89a" + b"\x00" * 10,
        ("image", "tiff"): mm.encode_tiff(1, 1),
        ("audio", "wav"): mm.encode_wav(8000, [0]),
        ("audio", "flac"): mm.encode_flac_header(8000, 1, 16, 1),
        ("audio", "ogg"): mm.encode_ogg(1, [b"x"]),
        ("audio", "mp3"): mm.encode_mp3(9, 0, 1),
        ("video", "y4m"): b"YUV4MPEG2 W2 H2 F25:1\n",
        ("video", "avi"): mm.encode_avi(2, 2, 40000, [b"\x00" * 4]),
        ("video", "mp4"): mm.encode_mp4(1000, 1, 2, 2),
        ("archive", "warc"): mm.encode_warc([("warcinfo", "", b"x")]),
        ("archive", "gzip"): mm.encode_warc_gz([("warcinfo", "", b"x")]),
        ("archive", "zip"): mm.encode_zip([("a", b"b")]),
        ("archive", "tar"): mm.encode_tar([("a", b"b")]),
    }
    for expect, payload in cases.items():
        assert mm.sniff_media(payload) == expect, expect
    import pytest

    with pytest.raises(ValueError):
        mm.sniff_media(b"\x00\x01\x02\x03unknown")
    rows = mm.decode_media_triage(
        spark.createDataFrame(
            [(1, mm.encode_tiff(1, 1)), (2, b"????")],
            "media_id long, payload binary",
        )
    ).collect()
    got = {r.media_id: r for r in rows}
    assert got[1].format == "tiff" and got[2].family is None


def test_ico_directory_roundtrip():
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        _parse_ico,
        encode_ico,
        sniff_media,
    )

    p = encode_ico([(16, 16), (32, 32), (256, 256)])
    assert _parse_ico(p) == [(16, 16), (32, 32), (256, 256)]
    assert sniff_media(p) == ("image", "ico")
    import pytest

    with pytest.raises(ValueError):
        _parse_ico(p[:10])
    with pytest.raises(ValueError):
        _parse_ico(b"\x00\x00\x02\x00\x01\x00")  # cursor type, not icon


def test_bmp_roundtrip_all_variants():
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    # Width 5 forces row padding (5*3=15 -> 16; 5*1 -> 8); exercise both
    # depths and both row orders.
    gray = bytes((i * 37) % 256 for i in range(5 * 3))
    for bits in (8, 24):
        for top_down in (False, True):
            payload = encode_bmp(5, 3, gray, bits=bits, top_down=top_down)
            w, h, out = decode_bmp(payload)
            assert (w, h) == (5, 3)
            assert bytes(out) == gray, (bits, top_down)


def test_bmp_decode_rejects_unsupported():
    import pytest

    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    good = encode_bmp(4, 2, bytes(8), bits=24)
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 20)  # truncated
    rle = bytearray(good)
    rle[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(rle))
    sixteen = bytearray(good)
    sixteen[28:30] = (16).to_bytes(2, "little")
    with pytest.raises(ValueError, match="bit depth"):
        decode_bmp(bytes(sixteen))


def test_bmp_stats_dlq_on_corrupt(spark):
    from cryptocurrency_data_pipeline_spark.operators import multimodal as mm

    good = mm.encode_bmp(3, 2, bytes(range(6)), bits=8)
    df = spark.createDataFrame(
        [(1, good), (2, b"BMnot really a bitmap")],
        "media_id long, payload binary",
    )
    media = mm.media_table(df, "media_id", "image", "payload")
    got = {r.media_id: r for r in mm.decode_bmp_stats(media).collect()}
    assert (got[1].width, got[1].height, got[1].pixel_sum) == (3, 2, 15)
    assert got[2].width is None and got[2].pixel_sum is None


def test_ppm_pixel_roundtrip_and_rejects():
    import pytest

    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        decode_ppm,
    )

    raster = bytes((i * 29) % 256 for i in range(4 * 2 * 3))
    payload = b"P6\n# a comment\n4 2\n255\n" + raster
    w, h, rgb = decode_ppm(payload)
    assert (w, h) == (4, 2) and bytes(rgb) == raster
    with pytest.raises(ValueError, match="truncated PPM raster"):
        decode_ppm(payload[:-1])
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n4 2\n65535\n" + raster * 2)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n4 2\n255\n" + raster)


def test_png_decode_rejects_decompression_bomb():
    import zlib

    from cryptocurrency_data_pipeline_spark.operators import multimodal as mm

    # Valid IHDR declaring 2x2 grey, but the IDAT inflates to a megabyte:
    # the decoder must reject via the OUTPUT BOUND, never materialize it.
    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
    bomb = zlib.compress(b"\x00" * (1 << 20), 9)  # ~1 KB -> 1 MB
    payload = (
        mm._PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    )
    import pytest

    with pytest.raises(ValueError, match="size mismatch"):
        mm.decode_png(payload)
    # And the well-formed case still round-trips after the bound.
    good = mm.encode_png(2, 2, bytes([1, 2, 3, 4]))
    assert mm.decode_png(good)[3] == bytearray([1, 2, 3, 4])


def test_codec_fuzz_truncations_and_bitflips_never_hang_or_leak():
    """Every pure decoder must fail FAST and CLEANLY (any exception is a
    DLQ row; what's forbidden is a hang or a giant allocation) on every
    truncation and on byte-flipped variants of a valid file."""
    import random

    from cryptocurrency_data_pipeline_spark.operators import jpeg as j
    from cryptocurrency_data_pipeline_spark.operators import multimodal as mm

    gray = bytes((i * 7) % 256 for i in range(16))
    samples = [
        (mm.decode_png, mm.encode_png(4, 4, gray)),
        (mm.decode_bmp, mm.encode_bmp(4, 4, gray, bits=24)),
        (mm.decode_bmp, mm.encode_bmp(4, 4, gray, bits=8, top_down=True)),
        (mm.decode_ppm, b"P6\n4 4\n255\n" + gray * 3),
        (j.decode_jpeg_gray, j.encode_jpeg_gray(8, 8, bytes(range(64)))),
        (
            mm.decode_gif,
            mm.encode_gif(
                4, 4, bytes(i % 4 for i in range(16)),
                [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)],
            ),
        ),
    ]
    rng = random.Random(99)
    for decode, payload in samples:
        decode(payload)  # sanity: the pristine file decodes
        for cut in range(0, len(payload), max(1, len(payload) // 23)):
            try:
                decode(payload[:cut])
            except Exception:
                pass  # any exception = DLQ row; hangs would fail the suite
        for _ in range(40):
            b = bytearray(payload)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            try:
                decode(bytes(b))
            except Exception:
                pass


def test_y4m_negative_dims_raise_not_hang(spark):
    """A crafted negative W makes frame_bytes negative and the frame
    walk non-terminating — must raise into the DLQ path, because no
    except can catch a hang."""
    import pytest

    for bad in (b"YUV4MPEG2 W-4 H1 F1:1\nFRAME\n",
                b"YUV4MPEG2 W4 H-1 F1:1\nFRAME\n",
                b"YUV4MPEG2 W4 H2 F-1:1\nFRAME\n",
                b"YUV4MPEG2 W4 H2 F1:-1\nFRAME\n"):
        with pytest.raises(ValueError):
            mm._parse_y4m(bad)


def test_jpeg_trailing_fill_bytes_raise_valueerror(spark):
    """Payload ending in 0xFF fill bytes must raise ValueError (the
    parser contract), not IndexError from an unchecked marker read."""
    import pytest

    with pytest.raises(ValueError):
        mm._parse_header(b"\xff\xd8\xff\xff")


def test_fake_stub_truncation_raises(spark):
    import pytest

    for bad in (mm._MAGIC, mm._MAGIC + b"\x00\x02"):
        with pytest.raises(ValueError, match="truncated"):
            mm._parse_header(bad)


def test_resize_rejects_real_formats_into_dlq(spark):
    """A real PNG through the stub resize must DLQ (null payload), not
    come back as a zero-filled FAKE body that looks like a successful
    resize."""
    png = mm.encode_png(4, 4, bytes(range(16)), color_type=0)
    df = mm.media_table(
        spark.createDataFrame(
            [(1, png), (2, mm.encode_fake_media("image", 512, 256, 1, bytes(100)))],
            "media_id long, payload binary",
        ),
        "media_id", "image", "payload",
    )
    got = {r.media_id: r for r in mm.resize_images(df, max_side=128).collect()}
    assert got[1].payload is None and got[1].width is None
    assert (got[2].width, got[2].height) == (128, 64)


def test_frame_sample_plan_skips_frameless_and_null(spark):
    df = spark.createDataFrame(
        [(1, "video", "h", 25), (2, "video", "h2", 0), (3, "video", "h3", None)],
        "media_id long, kind string, content_hash string, n_frames int",
    )
    frames = mm.frame_sample_plan(df, every_n=10).collect()
    # Frameless (0) gets no phantom frame 0; null n_frames has nothing
    # to sample.
    assert {r.media_id for r in frames} == {1}


def test_exact_media_dedup_ignores_null_hashes(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, "aa"), (3, None), (4, None)],
        "media_id long, content_hash string",
    )
    out = {r.media_id: r.n_copies for r in mm.exact_media_dedup(df).collect()}
    # Distinct unresolved-payload rows must NOT collapse into one
    # "duplicate" null-hash cluster.
    assert out == {1: 2}
