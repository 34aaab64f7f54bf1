"""Baseline JPEG (ITU-T T.81) for 8-bit grayscale — pure python, zero
dependencies: the LAST image format out from behind the stub.

The decoder is the real thing: marker walk, DQT/DHT/SOF0/SOS parse,
canonical Huffman table construction FROM THE FILE'S OWN DHT segments
(no baked-in Annex K tables — any conforming single-component baseline
stream decodes), entropy decode with 0xFF00 byte-unstuffing, DC
prediction, AC run-length/EOB/ZRL, dezigzag, dequantize, 2-D IDCT with
level shift and clamping.

The encoder (producer/test side) is its mirror: FDCT, quantization,
zigzag, DC-difference + AC run-length coding, canonical Huffman bit
emission with byte stuffing.  It writes its Huffman tables into DHT —
single-length canonical codes, valid per the spec — so encoder and
decoder share no hidden state beyond the file format itself.

Exactness contract for oracles: JPEG is lossy in general, but a block
that is CONSTANT has only a DC coefficient; with the DC quantization
step set to 8, ``round(8*(c-128)/8)`` is exact, and the IDCT of a
DC-only block is exactly that constant — so block-constant images
round-trip bit-exactly and their decoded pixel sums are computable by
formula (what ``jpeg_decode_rollup``'s DuckDB oracle does).  The AC
path is exercised by the lossy-roundtrip unit tests.

Reference semantics: the reference stores media opaquely (reference:
src/ingestion/fetch_coins.py:1); typed decode is engine surface.
"""

from __future__ import annotations

import math
from functools import lru_cache

#: Quantization table in ZIGZAG order position 0 (DC) = 8 (the oracle
#: exactness contract); AC steps moderate.
_QTABLE = [8] + [16] * 63

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Huffman alphabets: DC categories 0..11; AC = EOB, ZRL, (run<<4)|size.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG Annex C canonical code generation: {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _flat_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """A valid single-length canonical table: every symbol gets a code of
    the same length L (smallest L with 2^L > len(symbols), keeping the
    all-ones code unused per the spec's convention)."""
    length = 1
    while (1 << length) <= len(symbols):
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, list(symbols)


_DC_BITS, _DC_VALS = _flat_table(_DC_SYMS)
_AC_BITS, _AC_VALS = _flat_table(_AC_SYMS)


@lru_cache(maxsize=1)
def _dct_matrix():
    """8-point DCT-II basis D with D @ D.T == I (orthonormal), so the
    2-D transforms are the separable matrix products
    ``F = D B D.T`` / ``B = D.T F D`` — numpy-vectorized (numpy ships in
    the target environment; a pure-python fallback would be the
    quadruple loop over the same cosine table)."""
    import numpy as np

    d = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            d[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return d


def _fdct(block: list[float]) -> list[float]:
    import numpy as np

    d = _dct_matrix()
    b = np.asarray(block, dtype=np.float64).reshape(8, 8)
    return (d @ b @ d.T).reshape(64).tolist()


def _idct(coef: list[float]) -> list[float]:
    import numpy as np

    d = _dct_matrix()
    f = np.asarray(coef, dtype=np.float64).reshape(8, 8)
    return (d.T @ f @ d).reshape(64).tolist()


def _category(v: int) -> int:
    """Bit category of a DC difference / AC value (0 -> cat 0)."""
    a = abs(v)
    c = 0
    while a:
        a >>= 1
        c += 1
    return c


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated stuffing")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed 0xFF data byte
                else:
                    raise ValueError("unexpected marker in entropy data")
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.take(1)
            if (code, length) in table:
                return table[(code, length)]
        raise ValueError("invalid Huffman code")


def _receive_extend(bits: int, cat: int) -> int:
    """T.81 EXTEND: map ``cat`` raw bits to the signed value."""
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


def encode_jpeg_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Encode 8-bit grayscale to baseline JPEG.  Dimensions must be
    multiples of 8 (the producer controls its inputs; no padding
    ambiguity in the oracle contract)."""
    if width % 8 or height % 8 or width == 0 or height == 0:
        raise ValueError("encoder requires multiple-of-8 dimensions")
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    for by in range(height // 8):
        for bx in range(width // 8):
            block = [
                float(pixels[(by * 8 + y) * width + bx * 8 + x]) - 128.0
                for y in range(8)
                for x in range(8)
            ]
            coef = _fdct(block)
            q = [
                int(round(coef[_ZIGZAG[i]] / _QTABLE[i]))
                for i in range(64)
            ]
            diff = q[0] - prev_dc
            prev_dc = q[0]
            cat = _category(diff)
            code, length = dc_codes[cat]
            w.put(code, length)
            if cat:
                w.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
            run = 0
            last_nz = 0
            for i in range(1, 64):
                if q[i]:
                    last_nz = i
            for i in range(1, last_nz + 1):
                if q[i] == 0:
                    run += 1
                    continue
                while run >= 16:
                    zc, zl = ac_codes[0xF0]
                    w.put(zc, zl)
                    run -= 16
                acat = _category(q[i])
                code, length = ac_codes[(run << 4) | acat]
                w.put(code, length)
                w.put(q[i] if q[i] >= 0 else q[i] + (1 << acat) - 1, acat)
                run = 0
            if last_nz < 63:
                ec, el = ac_codes[0x00]
                w.put(ec, el)
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dqt = seg(0xDB, bytes([0x00]) + bytes(_QTABLE))
    sof = seg(
        0xC0,
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([1, 0x01, 0x11, 0x00]),
    )
    dht = seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)) + seg(
        0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sos = seg(0xDA, bytes([1, 0x01, 0x00, 0x00, 0x3F, 0x00]))
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, bytearray]:
    """Full baseline JPEG decode of a single-component (grayscale)
    stream: ``(width, height, pixels)``.  Tables come from the file's
    own DQT/DHT segments; progressive, multi-component, 12-bit, and
    restart-interval streams raise -> null/DLQ row."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG SOI")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    qsel = 0
    dc_sel = ac_sel = 0
    scan_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        # The spec permits any number of 0xFF fill bytes between segments
        # (B.1.1.2); skip them so padded conforming streams decode instead
        # of landing in the DLQ (mirrors multimodal._parse_jpeg).
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(payload):
            break
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = list(body[b + 1 : b + 65])
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                codes = _canonical_codes(bits, vals)
                htables[(tc, th)] = {
                    (c, length): sym for sym, (c, length) in codes.items()
                }
                b += 17 + n
        elif marker == 0xC0:
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            if body[5] != 1:
                raise ValueError("only single-component (grayscale) supported")
            if body[7] != 0x11:
                raise ValueError("subsampling unsupported for grayscale")
            qsel = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:
            if body[0] != 1:
                raise ValueError("multi-component scan unsupported")
            dc_sel, ac_sel = body[2] >> 4, body[2] & 0x0F
            scan_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if width is None or scan_start is None:
        raise ValueError("missing SOF0 or SOS")
    if width % 8 or height % 8:
        raise ValueError("non-multiple-of-8 dimensions unsupported")
    if qsel not in qtables:
        raise ValueError("missing quantization table")
    if (0, dc_sel) not in htables or (1, ac_sel) not in htables:
        raise ValueError("missing Huffman table")
    q = qtables[qsel]
    dc_tab = htables[(0, dc_sel)]
    ac_tab = htables[(1, ac_sel)]

    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    r = _BitReader(payload[scan_start:end])
    out = bytearray(width * height)
    prev_dc = 0
    for by in range(height // 8):
        for bx in range(width // 8):
            zz = [0] * 64
            cat = r.read_symbol(dc_tab)
            prev_dc += _receive_extend(r.take(cat), cat)
            zz[0] = prev_dc
            i = 1
            while i < 64:
                sym = r.read_symbol(ac_tab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    i += 16
                    # A conforming ZRL only appears at i <= 47; running
                    # past 64 would exit the loop WITHOUT consuming an
                    # EOB, desynchronizing the entropy stream so the
                    # next block decodes mid-codeword — plausible wrong
                    # stats instead of the contract's raise -> DLQ row.
                    if i >= 64:
                        raise ValueError("ZRL run past block end")
                    continue
                run, acat = sym >> 4, sym & 0x0F
                i += run
                if i >= 64:
                    raise ValueError("AC run past block end")
                zz[i] = _receive_extend(r.take(acat), acat)
                i += 1
            coef = [0.0] * 64
            for i in range(64):
                coef[_ZIGZAG[i]] = float(zz[i] * q[i])
            px = _idct(coef)
            for y in range(8):
                row = (by * 8 + y) * width + bx * 8
                for x in range(8):
                    v = int(round(px[y * 8 + x] + 128.0))
                    out[row + x] = 0 if v < 0 else (255 if v > 255 else v)
    return width, height, out


def decode_jpeg_stats(df):
    """mapInPandas baseline-JPEG decode to pixel stats; the usual
    Arrow-batched null-on-failure DLQ shape (see multimodal.py)."""
    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("content_hash", StringType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("pixel_sum", LongType(), True),
        ]
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    w, h, px = decode_jpeg_gray(r.payload)
                    rows.append((r.media_id, r.content_hash, w, h, sum(px)))
                except Exception:
                    rows.append((r.media_id, r.content_hash, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "content_hash", "width", "height", "pixel_sum"],
            )

    return df.select("media_id", "content_hash", "payload").mapInPandas(
        decode, schema
    )
