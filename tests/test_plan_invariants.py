"""Global physical-plan invariants over the ENTIRE query registry.

test_plans.py pins specific shapes for specific queries; this module
asserts the two engine-wide guarantees the README makes, for every
registered query, so a future query can't silently regress them:

* no ``CartesianProduct`` — a non-broadcast cross join is always a bug
  at scale (broadcast nested-loop joins against tiny literal/1-row
  frames are fine and appear as ``BroadcastNestedLoopJoin``);
* no ``BatchEvalPython`` — row-at-a-time Python UDFs are banned from
  every plan; Python is allowed only Arrow-batched (``ArrowEvalPython``,
  ``MapInPandas``, ``FlatMapGroupsInPandas``...).
"""

import io
from contextlib import redirect_stdout

import pytest

from cryptocurrency_data_pipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_free_of_cartesian_and_row_python(spark, name):
    df = QUERIES[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
