"""Baseline JPEG codec tests (operators/jpeg.py)."""

import random

import pytest

from cryptocurrency_data_pipeline_spark.operators.jpeg import (
    _canonical_codes,
    decode_jpeg_gray,
    decode_jpeg_stats,
    encode_jpeg_gray,
)


def _block_constant_image(wb, hb, consts):
    w, h = wb * 8, hb * 8
    px = bytearray(w * h)
    for by in range(hb):
        for bx in range(wb):
            c = consts[by * wb + bx]
            for y in range(8):
                row = (by * 8 + y) * w + bx * 8
                px[row : row + 8] = bytes([c]) * 8
    return w, h, bytes(px)


def test_block_constant_images_roundtrip_exactly():
    rng = random.Random(3)
    for _ in range(25):
        wb, hb = rng.randrange(1, 4), rng.randrange(1, 3)
        consts = [rng.randrange(256) for _ in range(wb * hb)]
        w, h, px = _block_constant_image(wb, hb, consts)
        dw, dh, dec = decode_jpeg_gray(encode_jpeg_gray(w, h, px))
        assert (dw, dh) == (w, h)
        assert bytes(dec) == px  # DC-only blocks are lossless by contract


def test_decoder_tolerates_fill_bytes_between_segments():
    # B.1.1.2: any number of 0xFF fill bytes may pad the gap before a
    # marker byte; third-party baseline encoders emit them and the decode
    # must not DLQ the stream.
    w, h, px = _block_constant_image(2, 1, [40, 200])
    j = encode_jpeg_gray(w, h, px)
    padded = j[:2] + b"\xff\xff" + j[2:]  # fill bytes before the first DQT
    dw, dh, dec = decode_jpeg_gray(padded)
    assert (dw, dh) == (w, h)
    assert bytes(dec) == px


def test_lossy_roundtrip_bounded_error():
    rng = random.Random(11)
    # random noise is JPEG's worst case; smooth content decodes closely
    px = bytes(rng.randrange(256) for _ in range(16 * 16))
    _, _, dec = decode_jpeg_gray(encode_jpeg_gray(16, 16, px))
    assert max(abs(a - b) for a, b in zip(px, dec)) <= 80
    grad = bytes(((x * 7 + y * 5) % 200 + 20) for y in range(16) for x in range(24))
    _, _, dec = decode_jpeg_gray(encode_jpeg_gray(24, 16, grad))
    assert max(abs(a - b) for a, b in zip(grad, dec)) <= 40


def test_canonical_code_generation_is_prefix_free():
    bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    vals = list(range(12))
    codes = _canonical_codes(bits, vals)
    assert len(codes) == 12
    as_strings = [format(c, f"0{l}b") for c, l in codes.values()]
    for i, a in enumerate(as_strings):
        for j, b in enumerate(as_strings):
            if i != j:
                assert not b.startswith(a)


def test_decoder_rejects_malformed():
    w, h, px = _block_constant_image(1, 1, [42])
    j = encode_jpeg_gray(w, h, px)
    for bad in (b"", b"\xff\xd8", j[:20], j[:-2], b"XX" + j[2:]):
        with pytest.raises(ValueError):
            decode_jpeg_gray(bad)
    # flipping SOF0 to SOF2 (progressive) must raise, not mis-decode
    assert b"\xff\xc0" in j
    with pytest.raises(ValueError):
        decode_jpeg_gray(j.replace(b"\xff\xc0", b"\xff\xc2", 1))


def test_encoder_rejects_bad_dimensions():
    with pytest.raises(ValueError):
        encode_jpeg_gray(12, 8, bytes(96))
    with pytest.raises(ValueError):
        encode_jpeg_gray(8, 8, bytes(63))


def test_decode_jpeg_stats_dlq(spark):
    from cryptocurrency_data_pipeline_spark.operators.multimodal import (
        media_table,
    )

    w, h, px = _block_constant_image(2, 1, [10, 200])
    rows = [(1, encode_jpeg_gray(w, h, px)), (2, b"\xff\xd8broken")]
    df = media_table(
        spark.createDataFrame(rows, "id long, payload binary"),
        "id", "image", "payload",
    )
    got = {r.media_id: r for r in decode_jpeg_stats(df).collect()}
    assert (got[1].width, got[1].height) == (16, 8)
    assert got[1].pixel_sum == 64 * (10 + 200)
    assert got[2].pixel_sum is None
