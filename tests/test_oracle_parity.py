"""DuckDB value-parity for the queries parked past the driver's 50-entry
check window (``queries.DEMOTED_PAST_DRIVER_CAP``).

The external harness hashes only the first 50 registry entries, so the 10
demoted queries would otherwise carry no per-round correctness signal.
This test replays the driver's exact comparison — column names, row count,
order-insensitive value hash (columns sorted by name, rows sorted) — at
sf0.001 on every pytest run, using the same canonicalizer as
``tools/check_oracle.py``.
"""

import duckdb
import pytest

from cryptocurrency_data_pipeline_spark.queries import (
    DEMOTED_PAST_DRIVER_CAP,
    ORACLES,
    QUERIES,
    ordered_queries,
)
from tools.check_oracle import TABLES, table_hash

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM read_parquet('{SF}/{tab}.parquet')"
        )
    yield con
    con.close()


def test_registry_order_contract():
    names = list(ordered_queries())
    assert len(names) == len(QUERIES)
    # Every demoted entry sits past position 50, nothing else does.
    assert names[-len(DEMOTED_PAST_DRIVER_CAP):] == DEMOTED_PAST_DRIVER_CAP
    assert len(names) - len(DEMOTED_PAST_DRIVER_CAP) <= 50
    # Demotion is only safe because parity is enforced here: all demoted
    # queries must be oracle-backed.
    assert all(n in ORACLES for n in DEMOTED_PAST_DRIVER_CAP)


@pytest.mark.parametrize("name", DEMOTED_PAST_DRIVER_CAP)
def test_demoted_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(ORACLES[name])
    dcols, drows = rel.columns, rel.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert table_hash(scols, srows) == table_hash(dcols, drows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_emits_no_hugeint(duck, name):
    """DuckDB promotes integer ``sum()`` to HUGEINT (int128); the external
    driver's pandas canonicalizer renders HUGEINT as float64 while Spark
    emits int64, so the value hash mismatches even when every value is
    identical (the round-3 red rows were exactly this).  Rule: every
    integer sum in an oracle's output must be CAST(... AS BIGINT).
    ``rel.types`` only binds/plans the query, so this is cheap."""
    rel = duck.sql(ORACLES[name])
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if "HUGEINT" in str(typ).upper()
    ]
    assert not bad, (
        f"oracle {name} emits HUGEINT columns {bad}; wrap the integer "
        f"aggregate in CAST(... AS BIGINT)"
    )
