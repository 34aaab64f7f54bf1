"""Oracle parity on ADVERSARIAL fixture data.

The driver's testdata exercises the common-case distribution; these tests
replay the driver's exact Spark-vs-DuckDB comparison on a hand-built
``documents`` table stuffed with the input classes the generator never
emits — empty text, NULL text, a document past the JPEG COM 65535-byte
segment limit, and multi-byte UTF-8 where char length != byte length.

Each case here pins a real divergence class found by review:

- ``doc_char_entropy``: Spark ``sequence(1, 0)`` auto-steps -1 and yields
  ``[1, 0]`` while DuckDB ``generate_series(1, 0)`` is empty, so an empty
  document produced two phantom char rows (n_chars=2 for a 0-char doc).
- ``jpeg_meta_rollup``: ``F.lpad(hex(len), 4)`` silently TRUNCATES once
  the COM payload exceeds 65533 bytes, desyncing the marker walk.
"""

import os
import shutil

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cryptocurrency_data_pipeline_spark.queries import ORACLES, QUERIES
from tools.check_oracle import table_hash

EDGE_QUERIES = ["doc_char_entropy", "jpeg_meta_rollup"]


@pytest.fixture(scope="module")
def edge_sf_dir():
    d = f"/tmp/spark_graft_edge_docs_{os.getpid()}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    rows = [
        # (doc_id, text, lang, source, n_chars)
        (1, "", "en", "web", 0),                      # empty text
        (2, None, "en", "web", None),                 # NULL text
        (3, "a" * 70_000, "en", "books", 70_000),     # > COM segment max
        (4, "héllo \U0001f30d!", "fr", "web", 8),  # bytes != chars
        (5, "hello world hello", "en", "web", 17),    # ordinary doc
        (6, "zz", "en", "code", 2),                   # minimal repeated
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(pa.Table.from_pandas(df, schema=schema), f"{d}/documents.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def edge_duck(edge_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_docs_parity(spark, edge_sf_dir, edge_duck, name):
    sdf = QUERIES[name](spark, edge_sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = edge_duck.sql(ORACLES[name])
    dcols, drows = rel.columns, rel.fetchall()
    assert sorted(scols) == sorted(dcols)
    # key=str: rows can mix None with ints, which plain sorted() rejects.
    assert len(srows) == len(drows), (
        f"{name}: spark={len(srows)} duck={len(drows)}\n"
        f"spark rows: {sorted(srows, key=str)[:10]}\n"
        f"duck rows: {sorted(drows, key=str)[:10]}"
    )
    assert table_hash(scols, srows) == table_hash(dcols, drows), (
        f"{name}: value-hash mismatch\n"
        f"spark rows: {sorted(srows, key=str)[:10]}\n"
        f"duck rows: {sorted(drows, key=str)[:10]}"
    )


def test_entropy_skips_empty_and_null_docs(spark, edge_sf_dir):
    out = {r["doc_id"]: r for r in QUERIES["doc_char_entropy"](spark, edge_sf_dir).collect()}
    assert 1 not in out and 2 not in out  # empty + NULL text excluded
    assert out[3]["n_chars"] == 70_000 and out[3]["char_entropy"] == 0.0
    assert out[6]["n_chars"] == 2 and out[6]["char_entropy"] == 0.0


def test_jpeg_meta_survives_oversized_com_payload(spark, edge_sf_dir):
    rows = QUERIES["jpeg_meta_rollup"](spark, edge_sf_dir).collect()
    # doc 3: width = 100 + 70000 % 200 = 100, height = 50 + 3 % 100 = 53 —
    # the truncated COM payload must not desync the SOF0 dimension parse.
    assert any(r["width"] == 100 and r["height"] == 53 for r in rows)
