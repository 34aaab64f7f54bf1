"""Failure-artifact capture in the oracle-check tooling.

The r11 closing sweep logged one unreproduced ``event_gap_histogram``
flake whose failure detail was lost — a one-off flake with no artifacts
is undiagnosable by construction.  ``tools/check_oracle.py`` now dumps
both full normalized result sets, the per-side diff, and the run
environment on ANY mismatch; these tests force each mismatch class and
prove the artifact directory drops with replayable content (the dumped
lines are the exact strings the value hash is computed over)."""

import json

from tools.check_oracle import compare_results, table_hash


def test_value_hash_mismatch_drops_full_artifacts(tmp_path):
    scols, dcols = ["k", "v"], ["k", "v"]
    srows = [(1, "a"), (2, "b")]
    drows = [(1, "a"), (2, "DIFFERENT")]
    problems = compare_results(
        "forced_case", "/no/such/sf", scols, srows, dcols, drows,
        root=str(tmp_path),
    )
    assert problems and problems[0] == "value-hash mismatch"
    [art] = list(tmp_path.iterdir())
    assert art.name.endswith("_forced_case")
    spark_lines = (art / "spark_rows.txt").read_text().splitlines()
    duck_lines = (art / "duck_rows.txt").read_text().splitlines()
    # The dump is the hash input: recomputing over it replays the check.
    assert spark_lines == ["1\x01a", "2\x01b"]
    assert duck_lines == ["1\x01a", "2\x01DIFFERENT"]
    assert (art / "spark_only.txt").read_text().splitlines() == ["2\x01b"]
    assert (art / "duck_only.txt").read_text().splitlines() == [
        "2\x01DIFFERENT"
    ]
    meta = json.loads((art / "meta.json").read_text())
    assert meta["query"] == "forced_case"
    assert meta["sf_dir"] == "/no/such/sf"
    assert meta["spark_rows"] == meta["duck_rows"] == 2
    assert len(meta["loadavg"]) == 3 and meta["time_utc"]


def test_schema_and_rowcount_mismatches_also_capture(tmp_path):
    problems = compare_results(
        "schema_case", "sf", ["a"], [(1,)], ["b"], [(1,)],
        root=str(tmp_path),
    )
    assert any(p.startswith("schema:") for p in problems)
    problems = compare_results(
        "rows_case", "sf", ["a"], [(1,)], ["a"], [(1,), (2,)],
        root=str(tmp_path),
    )
    assert any(p.startswith("rowcount:") for p in problems)
    names = sorted(p.name for p in tmp_path.iterdir())
    assert len(names) == 2
    assert names[0].endswith(("_rows_case", "_schema_case"))


def test_matching_results_write_nothing(tmp_path):
    rows = [(1, 2.5), (2, None)]
    assert compare_results(
        "clean", "sf", ["a", "b"], rows, ["b", "a"],
        [(2.5, 1), (None, 2)], root=str(tmp_path),
    ) == []
    assert list(tmp_path.iterdir()) == []
    # Sanity: the column-name sort really is what aligned those rows.
    assert table_hash(["a", "b"], rows) == table_hash(
        ["b", "a"], [(2.5, 1), (None, 2)]
    )
