"""Build the UNICODE/ENCODING-EXTREMES scale point: ``sfuni``.

Copies every sf0.001 table and appends ``documents`` rows whose ONLY
adversity is the code-point axis — the eighth adversarial input class,
after sf0.01 (driver scale), sfedge (NULL/NaN/ties/orphans), sfempty,
sfone, sfdup (duplicate saturation), sftime (calendar extremes), and
sfbig (giant rows / hot keys).  Every other column stays
contract-respecting (unique doc_ids, existing lang/source values,
``n_chars == length(text)`` in CODE POINTS), so any divergence the
sweep finds is attributable to text/encoding semantics alone.

What the rows probe, and why each is a REAL 100 TB input class (web
crawls are the canonical mixed-encoding corpus — every one of these
shapes appears in Common-Crawl-scale text):

* **NFC/NFD pairs** (``café`` as U+00E9 vs ``e``+U+0301): byte-distinct,
  display-identical.  Dedup/shingles/fingerprints must treat them
  consistently (both engines compare raw code points — no engine-side
  normalization may sneak in on one side only).
* **Astral-plane text** (emoji, math alphanumerics, CJK ext-B): one
  code point = 2 UTF-16 units (Java) = 4 UTF-8 bytes (RE2/DuckDB).
  length()/substring()/regex-dot must count CODE POINTS on both
  engines; surrogate-pair splitting in shingles or chunking would
  diverge instantly.
* **ZWJ emoji sequences + zero-width chars** (U+200B/C/D, U+2060):
  invisible code points that still count — whitespace tokenizers must
  NOT treat them as spaces (they are not in ASCII ``\\s``, the engine's
  asserted discipline, text.py).
* **Exotic whitespace** (U+00A0 NBSP, U+2028 LS, U+2029 PS, U+202F,
  U+3000, U+1680): outside ASCII ``\\s`` — Java's ``\\s`` and RE2's
  ``\\s`` are BOTH ASCII-only by default, so the engines agree, but
  any drift to Unicode-aware classes on one side breaks token counts.
  U+2028/9 also probe line-splitting (they terminate JS/ECMA lines,
  not Java/RE2 ``.``-excluded lines — the dot must span them... by
  default Java ``.`` excludes \\n \\r U+0085 U+2028 U+2029 while RE2
  ``.`` excludes ONLY \\n: a real cross-engine divergence class for
  any ``.*`` pattern — none of the engine's patterns use bare dot, and
  these rows keep it that way).
* **U+FFFD replacement chars + C0/C1 controls**: the standard residue
  of lossy decoding (lone surrogates cannot exist in valid UTF-8 —
  decoders emit U+FFFD, so that is the on-disk reality).
* **Embedded BOM** (U+FEFF, leading and interior): concatenated-file
  residue; counts as a char, not whitespace.
* **Case-fold traps** (Turkish İ/ı, German ß/ẞ, Greek final sigma):
  upper()/lower() must be locale-independent and agree cross-engine.
* **Full-width forms** (ＦＵＬＬ, ＠, ．): visually email-like text
  whose code points are OUTSIDE the ASCII PII classes — the email
  regex must not match a full-width ＠.
* **Unicode digits** (Arabic-Indic, full-width, Roman numerals):
  outside ASCII ``\\d`` on both engines.
* **Combining-mark pileups** (zalgo): dozens of marks per base char —
  quadratic-regex bait and grapheme/code-point confusion bait.
* **Exact astral duplicates** (two docs, identical emoji text):
  exact/near dedup must pair them at full similarity.
* **PII adjacent to non-ASCII**: the email boundary class
  ``[^A-Za-z0-9._%+-]`` matches é/、/NBSP as ONE code point on both
  engines (Java negated classes are code-point-aware since Java 7;
  RE2 is natively so) — pins that the r12 consuming-boundary fix
  holds beyond ASCII.

Usage: python tools/make_uni_sf.py [out_dir]
(default /tmp/spark_graft_sfuni)
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: (doc_id, text, lang, source) — doc_ids 9000+ are unique above
#: sf0.001's 0..499; lang/source values all exist in the base table so
#: group-by cardinalities stay contract-shaped.  n_chars is computed
#: (code points == Python len == Spark length == DuckDB length).
UNI_DOCS: list[tuple[int, str, str, str]] = [
    # NFC / NFD pair: same rendering, different code points.
    (9000, "café résumé touché naïve", "fr", "src0"),
    (9001, "café résumé touché naïve", "fr", "src1"),
    # Astral plane: ZWJ family, skin-tone coder, flag pair.
    (9002, "\U0001F468‍\U0001F469‍\U0001F467‍\U0001F466 family "
           "\U0001F9D1\U0001F3FD‍\U0001F4BB coder \U0001F1FA\U0001F1F3 flag",
     "en", "src2"),
    # Math alphanumerics + Gothic (all astral).
    (9003, "\U0001D54A\U0001D561\U0001D552\U0001D563\U0001D55C engine "
           "\U0001D53C\U0001D55F\U0001D558\U0001D55A\U0001D55F\U0001D556 \U00010348 gothic",
     "en", "src3"),
    # CJK incl. extension-B astral ideographs.
    (9004, "漢字テキスト中文 \U0002000B\U0002A6D6 "
           "にほんご", "zh", "src4"),
    # RTL: Arabic + Hebrew with explicit direction marks and an
    # RLO..PDF override span.
    (9005, "مرحبا بالعالم "
           "‏שלום עולם‎ "
           "‮reversed‬ end", "en", "src5"),
    # Zero-width characters inside one "word".
    (9006, "zero​width‌join‍er⁠test plus normal words",
     "en", "src6"),
    # Exotic whitespace zoo (none of it ASCII \s).
    (9007, "a b c d　e f g h done",
     "en", "src7"),
    # Replacement chars + C0/C1 controls (decoder residue).
    (9008, "bad�decode�ctrltailnext",
     "en", "src8"),
    # Embedded BOMs: leading and interior.
    (9009, "﻿BOM start and mid﻿BOM end", "en", "src9"),
    # Case-fold traps: Turkish dotted/dotless I, sharp s, final sigma.
    (9010, "İstanbul ıssız STRASSE straße ẞ "
           "Σίσυφος σίσυφος",
     "de", "src10"),
    # Full-width forms: looks like an email, is not (code points
    # outside the ASCII PII classes).
    (9011, "ＦＵＬＬｗｉｄｔｈ "
           "１２３ ｅｍａｉｌ＠"
           "ｅｘａｍｐｌｅ．ｃｏｍ",
     "en", "src11"),
    # Unicode digits outside ASCII \d.
    (9012, "١٢٣ arabic-indic ２３ fullwidth "
           "Ⅻ roman ০১ bengali", "en", "src12"),
    # Combining-mark pileup (zalgo): many marks per base char.
    (9013, "z" + "̶̧̖́̏" * 8
           + "a" + "͠҉͓" * 10
           + "lgo text", "en", "src13"),
    # Exact astral duplicate pair for dedup (ids 9014/9015 identical).
    (9014, "\U0001F600\U0001F601\U0001F602\U0001F923\U0001F603 dup emoji doc "
           "\U0001F604\U0001F605\U0001F606\U0001F609\U0001F60A", "en", "src14"),
    (9015, "\U0001F600\U0001F601\U0001F602\U0001F923\U0001F603 dup emoji doc "
           "\U0001F604\U0001F605\U0001F606\U0001F609\U0001F60A", "en", "src15"),
    # PII flush against non-ASCII neighbors: é, NBSP, ideographic
    # comma each serve as the email boundary code point.
    (9016, "contact caféa@b.com and x@y.com、z@w.org ssn "
           "123-45-6789 ١ end", "en", "src16"),
    # Long mixed-script run (shingle/chunk boundaries must split code
    # points, never UTF-16 units).
    (9017, ("\U0001F680unicodeé中مtext" * 12) + " tail",
     "en", "src17"),
    # Lone high/low "surrogate" residue encoded as U+FFFD (the only
    # valid on-disk form) adjacent to astral chars.
    (9018, "�\U0001F4A9� mixed residue \U0001F4A9�",
     "en", "src18"),
    # Superscripts/subscripts + ligatures + accented uppercase.
    (9019, "x² y₂ ﬁnest ﬂow ÉLÈVE Œuvre",
     "en", "src19"),
]


def _append_docs(out_dir: str) -> None:
    src = pq.read_table(f"{SRC}/documents.parquet")
    cols = {
        "doc_id": pa.array([d[0] for d in UNI_DOCS], type=pa.int64()),
        "text": pa.array([d[1] for d in UNI_DOCS], type=pa.string()),
        "lang": pa.array([d[2] for d in UNI_DOCS], type=pa.string()),
        "source": pa.array([d[3] for d in UNI_DOCS], type=pa.string()),
        # Code points: Python len == Spark length() == DuckDB length().
        "n_chars": pa.array([len(d[1]) for d in UNI_DOCS], type=pa.int64()),
    }
    extra = pa.Table.from_arrays(
        [cols[f.name] for f in src.schema], schema=pa.schema(list(src.schema))
    )
    pq.write_table(pa.concat_tables([src, extra]),
                   f"{out_dir}/documents.parquet")


def build(out_dir: str) -> None:
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for name in TABLES:
        if name == "documents":
            continue
        shutil.copyfile(f"{SRC}/{name}.parquet", f"{out_dir}/{name}.parquet")
    _append_docs(out_dir)
    print(f"sfuni written to {out_dir}")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sfuni")
