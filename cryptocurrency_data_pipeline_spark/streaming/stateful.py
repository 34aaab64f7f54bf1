"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference consumer (streaming/consumer.py:21-24,86) receives a
``price_change_pct`` field pre-computed by the producer and alerts when it
exceeds a threshold — it has no memory between invocations, so it cannot
compute the change itself.  Here the engine computes the change *statefully*:
per-coin last-seen price/timestamp lives in Spark's checkpointed state store,
survives micro-batches AND restarts, and the operator emits each tick
enriched with ``prev_price`` / ``price_change_pct`` / ``is_alert``.

Scale notes: state is partitioned by the grouping key (coin_id), so a
1000-executor cluster holds each key's state on exactly one task — no
cross-partition coordination.  State size is O(distinct keys) × ~24 bytes;
RocksDB state store handles key counts far beyond memory.  The per-batch
Python work is Arrow-batched pandas, not per-row.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cryptocurrency_data_pipeline_spark.operators.grouped import NULL_TS_US

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

#: Output: the tick plus stateful enrichment.
PRICE_DELTA_SCHEMA = StructType(
    [
        StructField("coin_id", StringType()),
        # Event time crosses the Arrow/pandas boundary as exact int64
        # micros, never as a timestamp: pandas' datetime64[ns] only spans
        # 1677..2262, so one sentinel tick (epoch-0 default, 9999-12-31
        # "never expires", a mis-parsed crawl date) would abort the whole
        # Arrow batch — and in a STREAMING query that kills the run, not
        # one row.  The public wrapper converts back to TimestampType on
        # the way out, so callers see the same schema as before.
        StructField("event_time_us", LongType()),
        StructField("current_price", DoubleType()),
        StructField("prev_price", DoubleType()),
        StructField("price_change_pct", DoubleType()),
        StructField("is_alert", BooleanType()),
    ]
)

#: State per coin: last price and its event-time epoch-micros.
_STATE_SCHEMA = StructType(
    [StructField("last_price", DoubleType()), StructField("last_ts", DoubleType())]
)


def _make_tracker(alert_pct: float, timeout_ms: int | None = None):
    """Build the per-group stateful function (closure over the threshold —
    default-arg lambdas break PySpark's UDF introspection).

    Null guards use ``pd.isna``, never ``is None``: after the Arrow
    transfer a null price is ``NaN`` in the float64 column and a null
    event_time is ``pd.NaT`` — both are ``is not None``, so identity
    checks would let NaN into the state store (poisoning every later
    delta) and call ``.timestamp()`` on NaT (ValueError, killing the
    whole streaming query for one bad row)."""

    def track(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: "GroupState",
    ) -> Iterator[pd.DataFrame]:
        if timeout_ms is not None and state.hasTimedOut:
            # Expired key: drop its state entirely.  (Without this
            # branch the fall-through would re-update state from the
            # stale values, resurrecting it forever.)
            state.remove()
            return
        last_price, last_ts = state.get if state.exists else (None, None)
        # A group's micro-batch rows arrive as MULTIPLE Arrow chunks with no
        # ordering guarantee across them; sorting each chunk alone would let
        # prev_price run backwards whenever event times interleave between
        # chunks. Event-time order must be global per (key, batch), so the
        # chunks are concatenated and sorted once — O(rows-per-key-per-batch)
        # memory, the same bound Spark already assumes by routing the whole
        # group to one task.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            # event_time_us is NULL-FREE int64 micros (NULL event times
            # were mapped to the NULL_TS_US sentinel JVM-side — one NULL
            # would degrade the whole Arrow column to float64, rounding
            # micros beyond 2^53 for every row in the batch).  The
            # sentinel is int64 MAX, so it sorts last, exactly where NaT
            # sorted before.
            pdf = pdf.sort_values("event_time_us", kind="mergesort", ignore_index=True)
            prevs, pcts, alerts = [], [], []
            for price, ts_us in zip(pdf["current_price"], pdf["event_time_us"]):
                prevs.append(last_price)
                if last_price is None or pd.isna(price) or last_price == 0.0:
                    pct = None
                else:
                    pct = (price - last_price) / last_price * 100.0
                pcts.append(pct)
                alerts.append(pct is not None and abs(pct) > alert_pct)
                if not pd.isna(price):
                    last_price = float(price)
                    last_ts = None if ts_us == NULL_TS_US else float(ts_us) / 1e6
            yield pd.DataFrame(
                {
                    "coin_id": pdf["coin_id"],
                    "event_time_us": pdf["event_time_us"],
                    "current_price": pdf["current_price"],
                    "prev_price": pd.array(prevs, dtype="float64"),
                    "price_change_pct": pd.array(pcts, dtype="float64"),
                    "is_alert": alerts,
                }
            )
        if last_price is not None:
            state.update((last_price, last_ts))
            if timeout_ms is not None:
                # Re-arm on every batch that touches the key: the state
                # expires timeout_ms after the key's LAST activity.
                state.setTimeoutDuration(timeout_ms)

    return track


def stateful_price_deltas(
    ticks: DataFrame,
    alert_pct: float = 10.0,
    timeout: str = "NoTimeout",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-coin cross-batch price-change tracking (streaming).

    ``ticks`` must be a streaming DataFrame with ``coin_id``,
    ``event_time`` (timestamp), ``current_price``.  Returns an append-mode
    stream where each tick carries the previous price from the state store
    and the alert flag the reference computes producer-side
    (streaming/producer.py:58 ``price_change_pct``; consumer.py:86 threshold).

    ``timeout="ProcessingTimeTimeout"`` REQUIRES ``timeout_ms`` and
    evicts a coin's state ``timeout_ms`` after its last activity — the
    bound on state growth for dead keys.  The duration must be plumbed
    through to ``state.setTimeoutDuration`` per invocation; accepting
    the conf without it would be a silent no-op (no expiry ever fires).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeouts = {
        "NoTimeout": GroupStateTimeout.NoTimeout,
        "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
    }
    if timeout == "ProcessingTimeTimeout":
        if not timeout_ms or timeout_ms <= 0:
            raise ValueError(
                "ProcessingTimeTimeout requires timeout_ms > 0: without a "
                "registered duration no timeout ever fires and state for "
                "dead keys grows forever"
            )
    elif timeout_ms is not None:
        raise ValueError("timeout_ms only applies to ProcessingTimeTimeout")
    # Timestamps enter the pandas boundary as int64 micros and come back
    # out as TimestampType (see PRICE_DELTA_SCHEMA note): callers keep the
    # (coin_id, event_time, current_price, ...) schema, while no
    # datetime64[ns]-range cast can ever abort a batch.  timestamp_micros
    # is exact over the full timestamp domain.  NULL event times cross as
    # the NULL_TS_US sentinel (never as NULL long: one NULL degrades the
    # Arrow int64 column to float64 pandas-side, rounding micros beyond
    # 2^53 by up to ~32us for every row in the batch) and are decoded
    # back to NULL timestamps on the way out.
    out = (
        ticks.select(
            "coin_id",
            F.coalesce(
                F.unix_micros(F.col("event_time").cast("timestamp")),
                F.lit(NULL_TS_US),
            ).alias("event_time_us"),
            "current_price",
        )
        .groupBy("coin_id")
        .applyInPandasWithState(
            _make_tracker(alert_pct, timeout_ms),
            outputStructType=PRICE_DELTA_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeouts[timeout],
        )
    )
    return out.select(
        "coin_id",
        F.timestamp_micros(
            F.when(F.col("event_time_us") == NULL_TS_US, F.lit(None))
            .otherwise(F.col("event_time_us"))
        ).alias("event_time"),
        "current_price",
        "prev_price",
        "price_change_pct",
        "is_alert",
    )
