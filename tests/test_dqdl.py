"""DQDL ruleset parsing + the rules-as-data gate: the reference's verbatim
ruleset string (glue/data_quality_dqdl.py:67-87) must drive the engine's
profile/verify/routing layers unchanged."""

import pytest
from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators import dqdl, quality

#: The reference's ruleset, verbatim (glue/data_quality_dqdl.py:67-87).
REFERENCE_RULESET = """
Rules = [
    ColumnExists "coin_id",
    ColumnExists "current_price",
    ColumnExists "market_cap",
    ColumnExists "symbol",
    ColumnExists "name",
    IsComplete "coin_id",
    IsComplete "symbol",
    IsComplete "name",
    IsComplete "current_price",
    IsComplete "market_cap",
    IsPrimaryKey "coin_id",
    ColumnValues "current_price" > 0,
    ColumnValues "market_cap" > 0,
    RowCount between 50 and 150,
    Completeness "current_price" > 0.95,
    Completeness "market_cap" > 0.95,
    Uniqueness "coin_id" > 0.99
]
"""


def _frame(spark, n=60, tweak=None):
    rows = [
        (f"coin-{i}", f"c{i}", f"Coin {i}", 10.0 + i, 1_000_000 + i)
        for i in range(n)
    ]
    for idx, row in (tweak or {}).items():
        rows[idx] = row
    return spark.createDataFrame(
        rows,
        "coin_id string, symbol string, name string, "
        "current_price double, market_cap long",
    )


def test_parse_reference_ruleset_verbatim():
    rules = dqdl.parse_ruleset(REFERENCE_RULESET)
    assert len(rules) == 17
    by_type = {}
    for r in rules:
        by_type.setdefault(r.rule_type, []).append(r)
    assert len(by_type["ColumnExists"]) == 5
    assert len(by_type["IsComplete"]) == 5
    assert [r.column for r in by_type["IsPrimaryKey"]] == ["coin_id"]
    cv = {r.column: (r.op, r.value) for r in by_type["ColumnValues"]}
    assert cv == {"current_price": (">", 0.0), "market_cap": (">", 0.0)}
    rc = by_type["RowCount"][0]
    assert (rc.op, rc.value, rc.value2) == ("between", 50.0, 150.0)
    assert {r.column: r.value for r in by_type["Completeness"]} == {
        "current_price": 0.95,
        "market_cap": 0.95,
    }
    assert by_type["Uniqueness"][0].value == 0.99


def test_unknown_rule_type_raises():
    with pytest.raises(ValueError, match="unsupported DQDL rule type"):
        dqdl.parse_ruleset('Rules = [ CustomSql "select 1" ]')


def test_reference_ruleset_all_green_on_clean_frame(spark):
    results, tagged = dqdl.evaluate(_frame(spark), REFERENCE_RULESET)
    rows = results.collect()
    # 9 dataset-level rules (5 ColumnExists + RowCount + 2 Completeness +
    # Uniqueness); the other 8 are row-level.
    assert len(rows) == 9
    assert all(r.constraint_status == "Success" for r in rows), rows
    good, bad = quality.route_rows(tagged)
    assert good.count() == 60 and bad.count() == 0


def test_violations_fail_constraints_and_route_rows(spark):
    # one null coin_id + one duplicate key + one negative price
    df = _frame(
        spark,
        tweak={
            0: (None, "c0", "Coin 0", 10.0, 1_000_000),
            1: ("coin-2", "c1", "Coin 1", 11.0, 1_000_001),
            3: ("coin-3", "c3", "Coin 3", -4.0, 1_000_003),
        },
    )
    results, tagged = dqdl.evaluate(df, REFERENCE_RULESET)
    status = {r.constraint_name: r.constraint_status for r in results.collect()}
    assert status['Uniqueness "coin_id" > 0.99'] == "Failure"
    good, bad = quality.route_rows(tagged)
    # null key row, the dup pair (coin-2 twice), and the negative price
    assert bad.count() == 4
    assert good.count() == 56
    with pytest.raises(quality.DQGateError):
        dqdl.evaluate(df, REFERENCE_RULESET, raise_on_failure=True)


def test_row_verdict_matches_python_declared_rules(spark):
    # The parsed-path verdict must equal the Python-declared
    # quality.row_level_rules verdict for the equivalent rule set.
    df = _frame(spark, 20, tweak={2: ("coin-4", "c2", "Coin 2", -1.0, 5)})
    ruleset = 'Rules = [ ColumnValues "current_price" > 0, IsPrimaryKey "coin_id" ]'
    via_dqdl = {
        r.coin_id: r.dq_result
        for r in dqdl.row_verdict(df, dqdl.parse_ruleset(ruleset)).collect()
    }
    via_python = {
        r.coin_id: r.dq_result
        for r in quality.row_level_rules(
            df, positive_cols=["current_price"], primary_key="coin_id"
        ).collect()
    }
    assert via_dqdl == via_python


def test_column_exists_failure_is_synthesized(spark):
    df = _frame(spark, 55).drop("market_cap")
    ruleset = 'Rules = [ ColumnExists "market_cap", RowCount between 50 and 150 ]'
    results, _ = dqdl.evaluate(df, ruleset)
    status = {r.constraint_name: r.constraint_status for r in results.collect()}
    assert status['ColumnExists "market_cap"'] == "Failure"
    assert status["RowCount between 50 and 150"] == "Success"


def test_dataset_failure_fails_all_rows_mode(spark):
    # Glue process_rows granularity (reference observed behavior): a
    # failed DATASET rule stamps every row Failed in this mode, while
    # the default keeps the two layers independent.
    df = _frame(spark, 30)  # RowCount between 50 and 150 fails at 30
    ruleset = 'Rules = [ RowCount between 50 and 150, ColumnValues "current_price" > 0 ]'
    _, default_tagged = dqdl.evaluate(df, ruleset)
    good, bad = quality.route_rows(default_tagged)
    assert good.count() == 30 and bad.count() == 0  # rows pass row rules

    _, glue_tagged = dqdl.evaluate(df, ruleset, dataset_failure_fails_rows=True)
    good2, bad2 = quality.route_rows(glue_tagged)
    assert good2.count() == 0 and bad2.count() == 30
