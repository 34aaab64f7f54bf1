"""DQDL ruleset parser: data-quality rules as DATA, not code.

The reference ships its DQ gate as a DQDL text ruleset handed to Glue's
``EvaluateDataQuality`` (glue/data_quality_dqdl.py:67-87):

    Rules = [
        ColumnExists "coin_id",
        IsComplete "coin_id",
        IsPrimaryKey "coin_id",
        ColumnValues "current_price" > 0,
        RowCount between 50 and 150,
        Completeness "current_price" > 0.95,
        Uniqueness "coin_id" > 0.99
    ]

The engine's DQ layers were previously Python-declared
(``quality.Constraint`` / ``quality.row_level_rules``); this module parses
the DQDL subset the reference uses and compiles it onto those SAME layers,
so a reference user can paste their ruleset string unchanged:

* dataset-level rules (ColumnExists, RowCount, Completeness, Uniqueness)
  → ``quality.Constraint`` list evaluated by ``quality.verify`` over a
  single-scan ``quality.profile`` (O(1) driver-side assertions);
* row-level rules (IsComplete, ColumnValues, IsPrimaryKey)
  → one native boolean verdict column (the ``row_level_rules`` shape),
  routed by two filters — no Python lambdas, no thread pool.

Grammar: ``<RuleType> ["col"] [<op> <number> | between <a> and <b>]``,
comma-separated inside ``Rules = [ ... ]``.  Unknown rule types raise —
a rule silently ignored is a gate silently weakened.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators import quality

#: Rule types evaluated per-row (native boolean columns).
ROW_LEVEL = {"IsComplete", "ColumnValues", "IsPrimaryKey"}
#: Rule types evaluated against dataset metrics (one profile scan).
DATASET_LEVEL = {"ColumnExists", "RowCount", "Completeness", "Uniqueness"}

_RULE_RE = re.compile(
    r'^(?P<type>[A-Za-z]+)\s*(?:"(?P<col>[^"]+)")?\s*(?P<rest>.*)$'
)
_CMP_RE = re.compile(r"^(?P<op>>=|<=|>|<|=)\s*(?P<val>-?\d+(?:\.\d+)?)$")
_BETWEEN_RE = re.compile(
    r"^between\s+(-?\d+(?:\.\d+)?)\s+and\s+(-?\d+(?:\.\d+)?)$", re.IGNORECASE
)


@dataclass(frozen=True)
class DqdlRule:
    """One parsed rule: ``ColumnValues "price" > 0`` →
    ``DqdlRule("ColumnValues", "price", ">", 0.0, None)``."""

    rule_type: str
    column: str | None = None
    op: str | None = None  # '>', '>=', '<', '<=', '=', 'between'
    value: float | None = None
    value2: float | None = None


def parse_ruleset(text: str) -> list[DqdlRule]:
    """Parse a DQDL ruleset string into :class:`DqdlRule` rows."""
    lo, hi = text.find("["), text.rfind("]")
    if lo < 0 or hi < 0 or hi <= lo:
        raise ValueError("DQDL ruleset must contain Rules = [ ... ]")
    rules: list[DqdlRule] = []
    for part in text[lo + 1 : hi].split(","):
        part = part.strip()
        if not part:
            continue
        m = _RULE_RE.match(part)
        if m is None:
            raise ValueError(f"unparseable DQDL rule: {part!r}")
        rtype, col, rest = m.group("type"), m.group("col"), m.group("rest").strip()
        if rtype not in ROW_LEVEL | DATASET_LEVEL:
            raise ValueError(f"unsupported DQDL rule type: {rtype!r}")
        if not rest:
            rules.append(DqdlRule(rtype, col))
            continue
        b = _BETWEEN_RE.match(rest)
        if b:
            rules.append(
                DqdlRule(rtype, col, "between", float(b.group(1)), float(b.group(2)))
            )
            continue
        c = _CMP_RE.match(rest)
        if c:
            rules.append(DqdlRule(rtype, col, c.group("op"), float(c.group("val"))))
            continue
        raise ValueError(f"unparseable DQDL comparison: {rest!r} in {part!r}")
    return rules


def _assertion(rule: DqdlRule):
    op, v, v2 = rule.op, rule.value, rule.value2
    if op is None:
        return lambda x: bool(x)
    return {
        ">": lambda x: x > v,
        ">=": lambda x: x >= v,
        "<": lambda x: x < v,
        "<=": lambda x: x <= v,
        "=": lambda x: x == v,
        "between": lambda x: v <= x <= v2,
    }[op]


def _describe(rule: DqdlRule) -> str:
    parts = [rule.rule_type]
    if rule.column:
        parts.append(f'"{rule.column}"')
    if rule.op == "between":
        parts.append(f"between {rule.value:g} and {rule.value2:g}")
    elif rule.op:
        parts.append(f"{rule.op} {rule.value:g}")
    return " ".join(parts)


def to_constraints(
    rules: list[DqdlRule], columns: list[str]
) -> tuple[list[quality.Constraint], dict[str, float]]:
    """Dataset-level rules → (constraints, synthetic metrics).

    ``ColumnExists`` has no profile analyzer; its metric is synthesized
    here from the frame's column list (1.0/0.0) so every dataset rule
    flows through the same ``quality.verify`` contract.
    """
    constraints: list[quality.Constraint] = []
    synthetic: dict[str, float] = {}
    for r in rules:
        if r.rule_type not in DATASET_LEVEL:
            continue
        if r.rule_type == "ColumnExists":
            metric = f"ColumnExists({r.column})"
            synthetic[metric] = 1.0 if r.column in columns else 0.0
        elif r.rule_type == "RowCount":
            metric = "Size()"
        else:  # Completeness / Uniqueness
            metric = f"{r.rule_type}({r.column})"
        constraints.append(
            quality.Constraint(_describe(r), metric, _assertion(r))
        )
    return constraints, synthetic


def _row_check(rule: DqdlRule) -> Column:
    col = F.col(rule.column)
    if rule.rule_type == "IsComplete":
        return col.isNotNull()
    if rule.rule_type == "IsPrimaryKey":
        w = Window.partitionBy(rule.column)
        return col.isNotNull() & (F.count(F.lit(1)).over(w) == 1)
    # ColumnValues: null never passes a value comparison (DQDL semantics).
    if rule.op == "between":
        cmp = (col >= F.lit(rule.value)) & (col <= F.lit(rule.value2))
    else:
        cmp = {
            ">": col > F.lit(rule.value),
            ">=": col >= F.lit(rule.value),
            "<": col < F.lit(rule.value),
            "<=": col <= F.lit(rule.value),
            "=": col == F.lit(rule.value),
        }[rule.op]
    return col.isNotNull() & cmp


def row_verdict(df: DataFrame, rules: list[DqdlRule]) -> DataFrame:
    """Row-level rules → one ``dq_result`` verdict column
    ('Passed'/'Failed'), identical in shape to
    ``quality.row_level_rules`` so ``quality.route_rows`` applies
    unchanged."""
    verdict = F.lit(True)
    for r in rules:
        if r.rule_type in ROW_LEVEL:
            verdict = verdict & _row_check(r)
    return df.withColumn(
        "dq_result", F.when(verdict, F.lit("Passed")).otherwise(F.lit("Failed"))
    )


def evaluate(
    df: DataFrame,
    ruleset: str,
    raise_on_failure: bool = False,
    dataset_failure_fails_rows: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The full DQDL gate from a ruleset STRING:

    1. parse;
    2. one ``quality.profile`` scan covering exactly the metrics the
       dataset-level rules reference (Completeness columns, the
       Uniqueness key, Size);
    3. ``quality.verify`` over those metrics (+ synthetic ColumnExists)
       → per-constraint result frame, optionally raising
       :class:`quality.DQGateError` on any failure;
    4. row-level verdict column over ``df``.

    Returns ``(constraint_results, tagged_rows)``; route the tagged rows
    with ``quality.route_rows``.  At most one Uniqueness column is
    supported per ruleset (the single-scan profile carries one key).

    ``dataset_failure_fails_rows=True`` reproduces Glue
    ``EvaluateDataQuality.process_rows`` granularity (the reference's
    observed routing, glue/data_quality_dqdl.py:89-106): any FAILED
    dataset-level rule stamps EVERY row 'Failed', not just the rows the
    row-level rules reject.  Default False keeps the two layers
    independent (dataset failures gate the batch via ``verify``/abort,
    row failures route rows).
    """
    rules = parse_ruleset(ruleset)
    uniq = [r.column for r in rules if r.rule_type == "Uniqueness"]
    if len(set(uniq)) > 1:
        raise ValueError("at most one Uniqueness column per ruleset")
    comp = sorted({r.column for r in rules if r.rule_type == "Completeness"})
    metrics = quality.profile(
        df,
        completeness_cols=comp,
        unique_key=uniq[0] if uniq else None,
    )
    constraints, synthetic = to_constraints(rules, df.columns)
    results = quality.verify(
        df.sparkSession,
        {**metrics, **synthetic},
        constraints,
        raise_on_failure=raise_on_failure,
    )
    tagged = row_verdict(df, rules)
    if dataset_failure_fails_rows:
        # O(#constraints) driver-side check — the verify frame is tiny.
        any_failed = any(
            r.constraint_status == "Failure" for r in results.collect()
        )
        if any_failed:
            tagged = tagged.withColumn("dq_result", F.lit("Failed"))
    return results, tagged
