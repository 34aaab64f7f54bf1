"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # +0.0 collapses -0.0 so sign-of-zero disagreements between engines
        # (e.g. summation order yielding -1e-10 vs +1e-10 before rounding)
        # don't show up as spurious value-hash mismatches.
        return repr(round(v, 9) + 0.0)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


#: Where failure artifacts land.  Every mismatch dumps BOTH full result
#: sets (normalized exactly as hashed), the per-side diff, and the run
#: environment — so a one-off sweep flake is evidence, not anecdote
#: (the r11 sfedge ``event_gap_histogram`` flake was undiagnosable by
#: construction: nothing was captured).
ARTIFACT_ROOT = os.environ.get(
    "SPARK_GRAFT_ARTIFACTS", "/tmp/spark_graft_oracle_artifacts"
)


def _norm_lines(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(norm_value(r[i]) for i in order) for r in rows)


def dump_artifacts(
    name,
    sf_dir,
    problems,
    scols=None,
    srows=None,
    dcols=None,
    drows=None,
    root=None,
):
    """Write a timestamped failure-artifact directory and return its path.

    Captures, for each side that produced rows: the full sorted
    normalized result lines (the exact strings the value hash is
    computed over, so a later diff replays the comparison byte-for-byte)
    plus a set-difference preview, and a ``meta.json`` with the problem
    list, schemas, row counts, host load, and versions.  Called on ANY
    failure — engine exception, schema, rowcount, or value-hash."""
    import json
    import platform

    d = Path(root or ARTIFACT_ROOT) / (
        time.strftime("%Y%m%dT%H%M%S") + f"_{os.getpid()}_{name}"
    )
    d.mkdir(parents=True, exist_ok=True)
    slines = _norm_lines(scols, srows) if srows is not None else None
    dlines = _norm_lines(dcols, drows) if drows is not None else None
    if slines is not None:
        (d / "spark_rows.txt").write_text("\n".join(slines) + "\n")
    if dlines is not None:
        (d / "duck_rows.txt").write_text("\n".join(dlines) + "\n")
    if slines is not None and dlines is not None:
        sset, dset = set(slines), set(dlines)
        (d / "spark_only.txt").write_text(
            "\n".join(sorted(sset - dset)) + "\n"
        )
        (d / "duck_only.txt").write_text(
            "\n".join(sorted(dset - sset)) + "\n"
        )
    meta = {
        "query": name,
        "sf_dir": sf_dir,
        "problems": problems,
        "spark_cols": scols,
        "duck_cols": dcols,
        "spark_rows": None if srows is None else len(srows),
        "duck_rows": None if drows is None else len(drows),
        "loadavg": os.getloadavg(),
        "time_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "python": platform.python_version(),
        "argv": sys.argv,
    }
    (d / "meta.json").write_text(json.dumps(meta, indent=2, default=str))
    return str(d)


def compare_results(name, sf_dir, scols, srows, dcols, drows, root=None):
    """Driver-t2-shaped comparison; returns the problem list (empty =
    match) and dumps a full artifact dir on any problem."""
    problems = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"schema: spark={sorted(scols)} duck={sorted(dcols)}")
    if len(srows) != len(drows):
        problems.append(f"rowcount: spark={len(srows)} duck={len(drows)}")
    if not problems and table_hash(scols, srows) != table_hash(dcols, drows):
        problems.append("value-hash mismatch")
    if problems:
        path = dump_artifacts(
            name, sf_dir, problems, scols, srows, dcols, drows, root=root
        )
        problems.append(f"artifacts: {path}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from cryptocurrency_data_pipeline_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for tab in TABLES:
        path = f"{sf_dir}/{tab}.parquet"
        if os.path.isdir(path):
            # Multi-file drifted table (sfdrift): union part schemas by
            # name, exactly as the engine's mergeSchema read does —
            # missing columns surface as NULL on both sides.
            src = f"read_parquet('{path}/*.parquet', union_by_name=true)"
        else:
            src = f"read_parquet('{path}')"
        con.execute(f"CREATE VIEW {tab} AS SELECT * FROM {src}")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            import traceback

            path = dump_artifacts(
                name, sf_dir, [f"spark error: {traceback.format_exc()}"]
            )
            print(f"FAIL {name}: spark error: {e} (artifacts: {path})")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only check, {len(srows)} rows ({spark_s:.1f}s)")
            if len(srows) == 0:
                print(f"WARN {name}: 0 rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            import traceback

            path = dump_artifacts(
                name,
                sf_dir,
                [f"duckdb error: {traceback.format_exc()}"],
                scols,
                srows,
            )
            print(f"FAIL {name}: duckdb error: {e} (artifacts: {path})")
            failures.append(name)
            continue
        problems = compare_results(name, sf_dir, scols, srows, dcols, drows)
        if problems:
            sset = {tuple(norm_value(v) for v in r) for r in srows}
            dset = {tuple(norm_value(v) for v in r) for r in drows}
            for r in list(sset - dset)[:3]:
                print(f"      spark-only: {r}")
            for r in list(dset - sset)[:3]:
                print(f"      duck-only:  {r}")
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"ok   {name}: {len(srows)} rows match ({spark_s:.1f}s)")

    print(
        f"\n{checked - len(failures)}/{checked} passed"
        + (f"; FAILURES: {failures}" if failures else "")
    )
    # A run that verified zero queries is not a pass.
    sys.exit(1 if failures or checked == 0 else 0)


if __name__ == "__main__":
    main()
