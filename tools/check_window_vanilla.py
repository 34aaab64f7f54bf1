"""Rehearse the external gate exactly: a VANILLA SparkSession (none of the
engine's confs) running the first N ``ordered_queries()`` entries — the set
the driver will hash this round — against the DuckDB oracle at sf0.01.

Usage: python tools/check_window_vanilla.py [sf_dir] [n]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_oracle import TABLES, table_hash  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("gate-rehearsal").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM read_parquet('{sf_dir}/{tab}.parquet')"
        )

    failures = []
    window = list(qs)[:n]
    for name in window:
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(srows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols, drows = rel.columns, rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append("schema")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if not problems and table_hash(scols, srows) != table_hash(dcols, drows):
            problems.append("value-hash")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(srows)} rows")

    total = len(window)
    print(f"\n{total - len(failures)}/{total} window queries green under the vanilla session"
          + (f"; FAILURES: {failures}" if failures else ""))
    sys.exit(1 if failures or total == 0 else 0)


if __name__ == "__main__":
    main()
