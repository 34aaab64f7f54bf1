"""Round-6/7 additions (epoch 5): rank/quantile two-pass plans, salted
skew operators, table-format layer (time travel, stats-pruned scans,
mergeable matviews, histogram quantiles), privacy suite, consistent
resharding, partition-pruned change feed.

Split from the monolithic ``queries.py`` by REGISTRATION EPOCH — the
import sequence in ``queries/__init__.py`` preserves the original
registration order exactly (pinned by ``tests/test_oracle_parity.py``);
append new queries to the LAST part (or a new part imported last), never
reorder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from cryptocurrency_data_pipeline_spark.operators import silver  # noqa: F401
from cryptocurrency_data_pipeline_spark.operators.caching import track  # noqa: F401
from cryptocurrency_data_pipeline_spark.operators.quantize import cents, epoch_sec, finite  # noqa: F401
from cryptocurrency_data_pipeline_spark.queries._fragments import cents_sql, epoch_sec_sql, finite_sql  # noqa: F401
from cryptocurrency_data_pipeline_spark.queries._registry import query, t  # noqa: F401
from cryptocurrency_data_pipeline_spark.sources.tables import load_table  # noqa: F401


def _orders_merged_snapshot(spark, sf_dir, purpose, commit=None):
    """Shared fixture for the MERGE family: publish v1 of orders
    (priority-partitioned, prices in integer cents), then MERGE ONE
    deterministic update/insert/delete batch to produce v2.
    ``commit`` injects a SnapshotCommit protocol (the conditional-put
    query routes the identical cycle through the object-store CAS).

    ``merge_into_orders``, ``keyed_change_feed``, and
    ``cdc_apply_reconstruction`` — and their three oracles — all assume
    this exact batch (the %5/%7/%11 predicates and the -(key+1) insert
    rule), so it lives in one place: an edit here changes all three
    queries together and each oracle's WITH-block mirrors this function.
    Strictly-negative insert keys are disjoint from real orderkeys
    (>= 0) at ANY scale factor; an additive offset would collide at
    SF >= ~2 and the merge would then DELETE the real colliding row
    (and bare -key collides at key = 0).

    Returns the snapshot table path with v1 and v2 published.
    """
    import os
    import shutil
    import tempfile

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    snap = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        cents("o_totalprice").alias("price_cents"),
    )
    key, pri = F.col("o_orderkey"), F.col("o_orderpriority")
    updates = (
        snap.filter((pri == "1-URGENT") & (key % 5 == 0))
        .withColumn("price_cents", F.col("price_cents") + 7)
        .withColumn("_deleted", F.lit(False))
        .unionByName(
            snap.filter((pri == "5-LOW") & (key % 11 == 0)).select(
                (-(key + 1)).alias("o_orderkey"),
                "o_orderpriority",
                F.lit(999).cast("long").alias("price_cents"),
                F.lit(False).alias("_deleted"),
            )
        )
        .unionByName(
            snap.filter((pri == "3-MEDIUM") & (key % 7 == 0)).withColumn(
                "_deleted", F.lit(True)
            )
        )
    )
    table = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_{purpose}_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(table, ignore_errors=True)  # deterministic v1/v2 per run
    mt.write_snapshot(snap, table, part_col="o_orderpriority", commit=commit)
    mt.merge_into_snapshot(
        updates, table, ["o_orderkey"], delete_col="_deleted", commit=commit
    )
    return table

# --------------------------------------------------------------------------
# RFM customer segmentation: recency / frequency / monetary quartiles
# with ntile(4) SEMANTICS under a DETERMINISTIC total order (measure,
# custkey) — rank-based, so no distributional assumptions and exact
# cross-engine replay; monetary is cents-quantized so its per-segment
# sum stays integer.  The plan is the distributed one: a naive
# ``ntile() OVER (ORDER BY ...)`` compiles to a single-partition window
# (every customer row through ONE task — the 100 TB killer), so each
# quartile is computed as a range-partitioned global rank
# (ids.with_consecutive_ids: one balanced range exchange + an
# O(#partitions) offsets broadcast) fed into the closed-form
# ids.ntile_from_rank projection.  Three range exchanges over the
# customer-sized aggregate, no single-partition stage anywhere —
# pinned by tests/test_plans.py.
# --------------------------------------------------------------------------

@query(
    "rfm_customer_segments",
    oracle=f"""
    WITH per AS (
      SELECT o_custkey AS ck,
             max(o_orderdate) AS last_order,
             count(*) AS freq,
             CAST(sum({cents_sql('o_totalprice')})
               AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
      -- NULL monetary sums (only non-finite prices) are unorderable as
      -- ntile keys cross-engine: quantifiable customers only
      HAVING CAST(sum({cents_sql('o_totalprice')}) AS BIGINT) IS NOT NULL
    ), scored AS (
      -- NULLS FIRST: the ntile-key contract mirrors Spark's ascending
      -- default (a NULL-key customer — null custkey / null last date —
      -- ranks lowest); DuckDB defaults to NULLS LAST (sfnull class)
      SELECT ck, freq, cents,
             ntile(4) OVER (ORDER BY last_order NULLS FIRST, ck NULLS FIRST) AS r_q,
             ntile(4) OVER (ORDER BY freq NULLS FIRST, ck NULLS FIRST) AS f_q,
             ntile(4) OVER (ORDER BY cents NULLS FIRST, ck NULLS FIRST) AS m_q
      FROM per
    )
    SELECT r_q, f_q, m_q,
           count(*) AS n_customers,
           CAST(sum(freq) AS BIGINT) AS total_orders,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM scored GROUP BY r_q, f_q, m_q
    """,
)
def rfm_customer_segments(spark, sf_dir):
    """RFM quartile segmentation over orders: per-(r,f,m) cell counts
    and exact integer order/cents totals.  ntile(4) semantics computed
    distributedly (rank via range exchange + closed-form tile)."""
    from cryptocurrency_data_pipeline_spark.operators.ids import (
        ntile_from_rank,
        with_consecutive_ids,
    )

    per = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(cents("o_totalprice"))
            .cast("long")
            .alias("cents"),
        )
        # Mirrors the oracle HAVING: NULL monetary sums are ntile-key
        # unorderable cross-engine.
        .where(F.col("cents").isNotNull())
    )
    ranked = with_consecutive_ids(per, ["last_order", "ck"], "i_r")
    ranked = with_consecutive_ids(ranked, ["freq", "ck"], "i_f")
    ranked = with_consecutive_ids(ranked, ["cents", "ck"], "i_m")
    n_df = ranked.agg(F.count(F.lit(1)).alias("__n"))
    scored = ranked.crossJoin(F.broadcast(n_df)).select(
        "freq",
        "cents",
        ntile_from_rank("i_r", "__n").alias("r_q"),
        ntile_from_rank("i_f", "__n").alias("f_q"),
        ntile_from_rank("i_m", "__n").alias("m_q"),
    )
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("freq").cast("long").alias("total_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


# --------------------------------------------------------------------------
# OGG decode (multimodal._parse_ogg): page walk with the spec's
# NON-reflected CRC-32 (poly 0x04C11DB7, init 0 — deliberately not
# zlib's) verified on every page with the CRC field zeroed; 255-lacing
# segmentation, BOS/EOS flags, single-stream enforcement.  Payloads
# byte-built in-engine; oracle replays the generating formula.
# --------------------------------------------------------------------------

@query(
    "ogg_decode_rollup",
    oracle="""
    WITH f AS (
      SELECT p_partkey AS k,
             CAST(p_partkey % 9 + 1 AS INT) AS pages,
             CAST((p_partkey % 9 + 1) * 960 AS BIGINT) AS last_granule,
             CAST(list_sum(list_transform(generate_series(1, p_partkey % 9 + 1),
               i -> 100 + (p_partkey + i) % 300)) AS BIGINT) AS body
      FROM part
    )
    SELECT pages AS n_pages,
           count(*) AS n_streams,
           CAST(sum(body) AS BIGINT) AS total_payload_bytes,
           CAST(max(last_granule) AS BIGINT) AS max_granule
    FROM f GROUP BY pages
    """,
)
def ogg_decode_rollup(spark, sf_dir):
    """Real OGG pipeline: part keys → conforming page streams (real
    page CRCs, lacing) → CRC-verified walk → per-page-count rollup."""
    import pandas as pd  # noqa: F811 — executor-side import

    from cryptocurrency_data_pipeline_spark.operators import multimodal as mm

    parts = t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("k")
    ).repartition(spark.sparkContext.defaultParallelism)

    def produce(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                k = int(r.k)
                n = k % 9 + 1
                payloads = [
                    bytes((j % 251) for j in range(100 + (k + i) % 300))
                    for i in range(1, n + 1)
                ]
                rows.append((k, mm.encode_ogg(k % 65536, payloads)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    payloads = parts.mapInPandas(produce, "media_id long, payload binary")
    meta = mm.decode_ogg_meta(payloads)
    return meta.groupBy("n_pages").agg(
        F.count(F.lit(1)).alias("n_streams"),
        F.sum("payload_bytes").cast("long").alias("total_payload_bytes"),
        F.max("last_granule").cast("long").alias("max_granule"),
    )


# --------------------------------------------------------------------------
# Batch sessionization (gaps-and-islands): the BATCH complement to the
# streaming session windows — a session is a maximal per-user run with
# gaps < 30 min, built from one lag + one cumulative sum over the same
# user-keyed window (single exchange), then a session rollup.  All
# integer (epoch seconds), exactly replayable.
# --------------------------------------------------------------------------

@query(
    "user_sessionization_stats",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, {epoch_sec_sql('ts')} AS sec,
             event_id
      FROM events WHERE ts IS NOT NULL
    ), flagged AS (
      SELECT user_id, sec, event_id,
             CASE WHEN sec - lag(sec) OVER w > 1800 OR
                       lag(sec) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ), sess AS (
      SELECT user_id, sec,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), per AS (
      SELECT user_id, sid, count(*) AS n_events,
             max(sec) - min(sec) AS dur_s
      FROM sess GROUP BY user_id, sid
    )
    SELECT count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(max(dur_s) AS BIGINT) AS max_duration_s,
           CAST(sum(dur_s) AS BIGINT) AS total_duration_s,
           round(sum(n_events) * 1.0 / count(*), 6) AS avg_events_per_session
    FROM per
    """,
)
def user_sessionization_stats(spark, sf_dir):
    """30-min-gap sessionization over all user activity: session count,
    event totals, duration extremes, mean session size."""
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    # NULL event times can't be sessionized: the two engines place NULL
    # sort keys on opposite ends (Spark ASC=first, DuckDB=last), so an
    # unfiltered NULL row would shift every session id in its partition.
    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(
            "user_id",
            # Floored (not truncated) epoch seconds: a 23:59:59.5
            # pre-1970 event must gap-test from second -1, matching
            # the oracle's floor semantics (sftime fixture class).
            epoch_sec("ts").alias("sec"),
            "event_id",
        )
    )
    flagged = ev.withColumn(
        "new_s",
        F.when(
            (F.col("sec") - F.lag("sec").over(w) > 1800)
            | F.lag("sec").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("sec") - F.min("sec")).alias("dur_s"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.max("dur_s").cast("long").alias("max_duration_s"),
        F.sum("dur_s").cast("long").alias("total_duration_s"),
        F.round(F.sum("n_events") / F.count(F.lit(1)), 6).alias(
            "avg_events_per_session"
        ),
    )


# --------------------------------------------------------------------------
# Media triage (multimodal.sniff_media): the lake-ingest front door —
# classify a MIXED bag of opaque payloads by magic bytes into
# (family, format) before any per-format decoder runs.  The producer
# emits 12 different real formats round-robin (every encoder the
# engine ships), so one mis-sniff flips a rollup bucket.
# --------------------------------------------------------------------------

@query(
    "media_triage_rollup",
    oracle="""
    WITH f AS (
      SELECT p_partkey % 12 AS slot, count(*) AS n FROM part GROUP BY slot
    ), m(slot, family, fmt) AS (
      VALUES (0, 'image', 'ppm'), (1, 'image', 'bmp'),
             (2, 'image', 'tiff'), (3, 'audio', 'wav'),
             (4, 'audio', 'flac'), (5, 'audio', 'ogg'),
             (6, 'audio', 'mp3'), (7, 'video', 'avi'),
             (8, 'video', 'mp4'), (9, 'archive', 'warc'),
             (10, 'archive', 'zip'), (11, 'archive', 'tar')
    )
    SELECT m.family, m.fmt AS format,
           CAST(sum(f.n) AS BIGINT) AS n_payloads
    FROM f JOIN m USING (slot)
    GROUP BY m.family, m.fmt
    """,
)
def media_triage_rollup(spark, sf_dir):
    """Magic-byte triage over a 12-format mixed corpus: per-(family,
    format) counts."""
    import pandas as pd  # noqa: F811 — executor-side import

    from cryptocurrency_data_pipeline_spark.operators import multimodal as mm

    parts = t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("k")
    ).repartition(spark.sparkContext.defaultParallelism)

    def produce(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                k = int(r.k)
                slot = k % 12
                if slot == 0:
                    pay = b"P6\n2 2\n255\n" + bytes(12)
                elif slot == 1:
                    # minimal BM header (sniff keys on the magic only)
                    pay = (
                        b"BM" + bytes(12) + (40).to_bytes(4, "little")
                        + (2).to_bytes(4, "little")
                        + (2).to_bytes(4, "little") + bytes(100)
                    )
                elif slot == 2:
                    pay = mm.encode_tiff(2, 2, 8, bool(k % 2))
                elif slot == 3:
                    pay = mm.encode_wav(8000, [1, -1, 2])
                elif slot == 4:
                    pay = mm.encode_flac_header(44100, 1, 16, 100)
                elif slot == 5:
                    pay = mm.encode_ogg(k % 1000, [b"x" * 20])
                elif slot == 6:
                    pay = mm.encode_mp3(9, 0, 2)
                elif slot == 7:
                    pay = mm.encode_avi(4, 2, 40000, [b"\x00" * 8])
                elif slot == 8:
                    pay = mm.encode_mp4(1000, 500, 4, 4)
                elif slot == 9:
                    pay = mm.encode_warc([("warcinfo", "", b"x")])
                elif slot == 10:
                    pay = mm.encode_zip([("a.txt", b"x")])
                else:
                    pay = mm.encode_tar([("a.txt", b"x")])
                rows.append((k, pay))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    payloads = parts.mapInPandas(produce, "media_id long, payload binary")
    triage = mm.decode_media_triage(payloads)
    return triage.groupBy("family", "format").agg(
        F.count(F.lit(1)).alias("n_payloads")
    )


# --------------------------------------------------------------------------
# CUSUM change-point detection: per-user maximum cumulative-sum
# deviation over the cents-quantized value sequence, in the SCALED
# integer form |n·S_i − i·S_n| (cross-multiplying away the i/n mean
# fraction, same trick as the OLS and t-closeness queries) so argmax
# and top-k replay exactly.  One user-keyed window pass; top-10 by
# score via TakeOrderedAndProject.
# --------------------------------------------------------------------------

@query(
    "user_value_changepoint",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             {cents_sql('value')} AS y,
             row_number() OVER w AS i,
             CAST(sum({cents_sql('value')}) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_i,
             count(*) OVER (PARTITION BY user_id) AS n,
             CAST(sum({cents_sql('value')}) OVER
               (PARTITION BY user_id) AS BIGINT) AS s_n
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), scored AS (
      SELECT user_id, i, n,
             abs(n * s_i - i * s_n) AS score
      FROM seq WHERE n >= 10 AND i < n
    ), best AS (
      SELECT user_id, i AS change_index, n, score,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY score DESC, i) AS rn
      FROM scored
    )
    SELECT user_id, change_index, CAST(n AS BIGINT) AS n_events,
           CAST(score AS BIGINT) AS cusum_score
    FROM best WHERE rn = 1
    ORDER BY cusum_score DESC, user_id LIMIT 10
    """,
)
def user_value_changepoint(spark, sf_dir):
    """Top-10 users by scaled CUSUM deviation, with the change index
    (first argmax): users whose value level shifts hardest."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = Window.partitionBy("user_id")
    seq = (
        t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            cents("value").alias("y"),
        )
        .select(
            "user_id",
            F.row_number().over(w).alias("i"),
            F.sum("y").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("s_i"),
            F.count(F.lit(1)).over(w_all).alias("n"),
            F.sum("y").over(w_all).cast("long").alias("s_n"),
        )
    )
    scored = seq.where((F.col("n") >= 10) & (F.col("i") < F.col("n"))).select(
        "user_id",
        "i",
        "n",
        F.abs(F.col("n") * F.col("s_i") - F.col("i") * F.col("s_n")).alias(
            "score"
        ),
    )
    w_best = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), "i"
    )
    best = scored.withColumn("rn", F.row_number().over(w_best)).where(
        F.col("rn") == 1
    )
    return (
        best.select(
            "user_id",
            F.col("i").alias("change_index"),
            F.col("n").cast("long").alias("n_events"),
            F.col("score").cast("long").alias("cusum_score"),
        )
        .orderBy(F.col("cusum_score").desc(), "user_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Multi-touch attribution: first-touch, last-touch, and linear credit
# for purchases over the preceding 7-day touch window (view/click/
# signup events).  Linear credit is INTEGER ppm (floor(1e6 /
# n_touches) per touch), so sums replay exactly — no fractional-credit
# float drift.  One user-keyed range join + one window for touch
# counts/rank; per-channel rollup.
# --------------------------------------------------------------------------

@query(
    "purchase_attribution_report",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type,
             {epoch_sec_sql('ts')} AS sec
      FROM events
    ), pairs AS (
      SELECT p.user_id, p.event_id AS conv_id, t.event_id AS touch_id,
             t.event_type AS channel, t.sec AS tsec
      FROM ev p JOIN ev t
        ON p.user_id = t.user_id
       AND t.event_type IN ('view', 'click', 'signup')
       AND t.sec < p.sec AND p.sec - t.sec <= 604800
      WHERE p.event_type = 'purchase'
    ), ranked AS (
      SELECT *,
             count(*) OVER (PARTITION BY conv_id) AS n_t,
             row_number() OVER (PARTITION BY conv_id
                                ORDER BY tsec, touch_id) AS rn_first,
             row_number() OVER (PARTITION BY conv_id
                                ORDER BY tsec DESC, touch_id DESC)
               AS rn_last
      FROM pairs
    )
    SELECT channel,
           count(*) AS n_touches,
           CAST(sum(CAST(floor(1000000.0 / n_t) AS BIGINT)) AS BIGINT)
             AS linear_credit_ppm,
           CAST(sum(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_first_touch,
           CAST(sum(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_last_touch
    FROM ranked GROUP BY channel
    """,
)
def purchase_attribution_report(spark, sf_dir):
    """Per-channel attribution: touch counts, exact linear ppm credit,
    first- and last-touch conversions over a 7-day lookback."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        # Floored epoch seconds (see epoch_sec): lookback windows on
        # pre-1970 sub-second rows must not shift a bucket late.
        epoch_sec("ts").alias("sec"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.col("sec").alias("psec"),
    )
    tch = ev.where(
        F.col("event_type").isin("view", "click", "signup")
    ).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.col("sec").alias("tsec"),
    )
    pairs = p.join(tch, "user_id").where(
        (F.col("tsec") < F.col("psec"))
        & (F.col("psec") - F.col("tsec") <= 604800)
    )
    w_n = Window.partitionBy("conv_id")
    w_f = Window.partitionBy("conv_id").orderBy("tsec", "touch_id")
    w_l = Window.partitionBy("conv_id").orderBy(
        F.col("tsec").desc(), F.col("touch_id").desc()
    )
    ranked = pairs.select(
        "channel",
        F.count(F.lit(1)).over(w_n).alias("n_t"),
        F.row_number().over(w_f).alias("rn_first"),
        F.row_number().over(w_l).alias("rn_last"),
    )
    return ranked.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(F.floor(F.lit(1000000.0) / F.col("n_t")).cast("long"))
        .cast("long")
        .alias("linear_credit_ppm"),
        F.sum(F.when(F.col("rn_first") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_first_touch"),
        F.sum(F.when(F.col("rn_last") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_last_touch"),
    )


# --------------------------------------------------------------------------
# A/B experiment analysis: deterministic md5 arm assignment (the
# sampling.split_assignment discipline), per-arm conversion rates, and
# the 2×2 chi-square χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) computed
# as an EXPLICIT double ladder — ((N·det)·det)/den with N·det still
# exact in int64 — evaluated with the identical expression tree in
# both engines (N·det² can exceed int64 at scale, so the one double
# rounding step is placed deterministically); the α=0.05 decision
# compares the same ladder against 3.841.
# --------------------------------------------------------------------------

@query(
    "ab_test_chi_square",
    oracle="""
    WITH users AS (
      SELECT user_id,
             substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' AS arm_a,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ), cells AS (
      SELECT
        CAST(sum(CASE WHEN arm_a AND converted = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS a,
        CAST(sum(CASE WHEN arm_a AND converted = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS b,
        CAST(sum(CASE WHEN NOT arm_a AND converted = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS c,
        CAST(sum(CASE WHEN NOT arm_a AND converted = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS d
      FROM users
    )
    SELECT a + b AS n_a, c + d AS n_b,
           a AS conv_a, c AS conv_b,
           round(a * 1.0 / (a + b), 6) AS rate_a,
           round(c * 1.0 / (c + d), 6) AS rate_b,
           round(CAST((a + b + c + d) * (a * d - b * c) AS DOUBLE)
                 * (a * d - b * c)
                 / greatest((a + b) * (c + d) * (a + c) * (b + d), 1), 6)
             AS chi2,
           CAST((a + b + c + d) * (a * d - b * c) AS DOUBLE)
             * (a * d - b * c)
             / greatest((a + b) * (c + d) * (a + c) * (b + d), 1) > 3.841
             AS significant_05
    FROM cells
    """,
)
def ab_test_chi_square(spark, sf_dir):
    """Deterministic-arm A/B readout: per-arm conversion to purchase,
    exact-integer chi-square, α=0.05 decision by cross-multiplication."""
    users = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
        .withColumn(
            "arm_a",
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
        )
    )
    cells = users.agg(
        F.sum(F.when(F.col("arm_a") & (F.col("converted") == 1), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("arm_a") & (F.col("converted") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when(~F.col("arm_a") & (F.col("converted") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when(~F.col("arm_a") & (F.col("converted") == 0), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    det = F.col("a") * F.col("d") - F.col("b") * F.col("c")
    den = (
        (F.col("a") + F.col("b"))
        * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("d"))
    )
    # A zero margin (e.g. every user converted) zeroes det as well, so
    # the greatest(den, 1) guard cleanly yields chi2 = 0.
    ladder = (n * det).cast("double") * det / F.greatest(den, F.lit(1))
    return cells.select(
        (F.col("a") + F.col("b")).alias("n_a"),
        (F.col("c") + F.col("d")).alias("n_b"),
        F.col("a").alias("conv_a"),
        F.col("c").alias("conv_b"),
        # try_divide: an EMPTY arm (single-tenant/first-run data) has no
        # rate — NULL, matching DuckDB's x/0, instead of an ANSI abort.
        F.round(F.try_divide(F.col("a"), F.col("a") + F.col("b")), 6).alias("rate_a"),
        F.round(F.try_divide(F.col("c"), F.col("c") + F.col("d")), 6).alias("rate_b"),
        F.round(ladder, 6).alias("chi2"),
        (ladder > F.lit(3.841)).alias("significant_05"),
    )


# --------------------------------------------------------------------------
# ICO directory decode (multimodal._parse_ico): multi-resolution icon
# containers — ICONDIR walk with offset/size bounds checks and the
# spec's 0-means-256 dimension rule (exercised: every 7th icon set
# includes a 256px entry).  Exploding decoder shape inline (one row
# per icon size).
# --------------------------------------------------------------------------

@query(
    "ico_directory_rollup",
    oracle="""
    WITH f AS (
      SELECT p_partkey AS k,
             CAST(p_partkey % 3 + 1 AS INT) AS n_entries
      FROM part
    ), entries AS (
      SELECT k, i,
             CASE WHEN i = 3 AND k % 7 = 0 THEN 256
                  ELSE 16 * i END AS px
      FROM f, unnest(generate_series(1, n_entries)) AS u(i)
    )
    SELECT px AS icon_px,
           count(*) AS n_icons,
           count(DISTINCT k) AS n_files
    FROM entries GROUP BY px
    """,
)
def ico_directory_rollup(spark, sf_dir):
    """Real ICO pipeline: part keys → icon directories (1-3 sizes;
    every 7th 3-entry set carries a 256px icon that encodes as 0) →
    directory walk → per-size rollup."""
    import pandas as pd  # noqa: F811 — executor-side import

    from cryptocurrency_data_pipeline_spark.operators import multimodal as mm

    parts = t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("k")
    ).repartition(spark.sparkContext.defaultParallelism)

    def produce(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                k = int(r.k)
                n = k % 3 + 1
                sizes = [
                    (256, 256) if (i == 3 and k % 7 == 0) else (16 * i, 16 * i)
                    for i in range(1, n + 1)
                ]
                payload = mm.encode_ico(sizes)
                try:
                    parsed = mm._parse_ico(payload)
                except Exception:
                    parsed = []
                for w, h in parsed:
                    rows.append((k, w))
            yield pd.DataFrame(rows, columns=["k", "icon_px"])

    icons = parts.mapInPandas(produce, "k long, icon_px int")
    return icons.groupBy("icon_px").agg(
        F.count(F.lit(1)).alias("n_icons"),
        F.countDistinct("k").alias("n_files"),
    )


# --------------------------------------------------------------------------
# Corpus-linguistics profile: per-source token/type counts, hapax
# legomena (frequency-1 types — the vocabulary's long tail), dis
# legomena, and type–token ratio — the lexical-richness report a
# corpus card needs.  One (source, token) rollup is the only
# data-sized shuffle; everything else is counting over the vocab-sized
# frame.  All integer except the rounded TTR.
# --------------------------------------------------------------------------

@query(
    "lexical_richness_report",
    oracle="""
    WITH tok AS (
      SELECT source, tok, count(*) AS c
      FROM documents,
           unnest(list_filter(string_split_regex(replace(lower(replace(text, 'İ', 'I')), 'ς', 'σ'), '[ \\t\\n\\x0B\\f\\r]+'),
                              t -> t <> '')) AS u(tok)
      GROUP BY source, tok
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS dis_legomena,
           round(count(*) * 1.0 / sum(c), 6) AS type_token_ratio,
           CAST(max(c) AS BIGINT) AS top_type_freq
    FROM tok GROUP BY source
    """,
)
def lexical_richness_report(spark, sf_dir):
    """Per-source lexical richness: tokens, types, hapax/dis legomena,
    TTR, and the modal type's frequency."""
    from cryptocurrency_data_pipeline_spark.operators.text import tokens

    tok = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return tok.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hapax"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("dis_legomena"),
        F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias(
            "type_token_ratio"
        ),
        F.max("c").cast("long").alias("top_type_freq"),
    )


# --------------------------------------------------------------------------
# Seasonal-baseline outliers: flag events whose value exceeds 2× their
# HOUR-OF-DAY mean — the seasonal complement to the global MAD/z-score
# outlier family (a value normal at peak hour is anomalous at 4am).
# The comparison is the integer cross-multiplication
# ``v·n_h > 2·S_h`` on cents (no division), with the per-hour baseline
# attached by broadcast.
# --------------------------------------------------------------------------

@query(
    "hourly_seasonal_outliers",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(extract(hour FROM ts) AS INT) AS hod,
             {cents_sql('value')} AS cents
      FROM events WHERE value IS NOT NULL
    ), base AS (
      SELECT hod, count(*) AS n_h,
             CAST(sum(cents) AS BIGINT) AS s_h
      FROM ev GROUP BY hod
    )
    SELECT e.hod AS hour_of_day,
           CAST(b.n_h AS BIGINT) AS n_events,
           round(b.s_h * 1.0 / b.n_h / 100, 6) AS mean_value,
           CAST(sum(CASE WHEN e.cents * b.n_h > 2 * b.s_h
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM ev e JOIN base b USING (hod)
    GROUP BY e.hod, b.n_h, b.s_h
    """,
)
def hourly_seasonal_outliers(spark, sf_dir):
    """Per-hour-of-day event counts, mean value, and the count of
    events above 2× that hour's mean (exact integer test)."""
    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            F.hour("ts").alias("hod"),
            cents("value").alias("cents"),
        )
    )
    base = ev.groupBy("hod").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("cents").cast("long").alias("s_h"),
    )
    return (
        ev.join(F.broadcast(base), "hod")
        .groupBy("hod", "n_h", "s_h")
        .agg(
            F.sum(
                F.when(
                    F.col("cents") * F.col("n_h") > 2 * F.col("s_h"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            F.col("hod").alias("hour_of_day"),
            F.col("n_h").cast("long").alias("n_events"),
            F.round(F.col("s_h") / F.col("n_h") / 100, 6).alias("mean_value"),
            "n_outliers",
        )
    )


# --------------------------------------------------------------------------
# Inter-event gap histogram: per-user consecutive-event gaps bucketed
# by human-scale thresholds (≤1m / ≤5m / ≤30m / ≤2h / ≤1d / >1d) —
# the burstiness profile that motivates the 30-min sessionization gap.
# One user-keyed window (lag) + one 6-key rollup; all integer.
# --------------------------------------------------------------------------

@query(
    "event_gap_histogram",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, {epoch_sec_sql('ts')} AS sec, event_id
      FROM events
    ), gaps AS (
      SELECT sec - lag(sec) OVER (PARTITION BY user_id
                                  ORDER BY sec, event_id) AS gap
      FROM ev
    )
    SELECT CASE WHEN gap <= 60 THEN '<=1m'
                WHEN gap <= 300 THEN '<=5m'
                WHEN gap <= 1800 THEN '<=30m'
                WHEN gap <= 7200 THEN '<=2h'
                WHEN gap <= 86400 THEN '<=1d'
                ELSE '>1d' END AS bucket,
           count(*) AS n_gaps,
           CAST(sum(gap) AS BIGINT) AS total_gap_s,
           CAST(max(gap) AS BIGINT) AS max_gap_s
    FROM gaps WHERE gap IS NOT NULL GROUP BY bucket
    """,
)
def event_gap_histogram(spark, sf_dir):
    """Distribution of per-user inter-event gaps across six
    human-scale buckets."""
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    gaps = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            # Floored epoch seconds (see epoch_sec), not unix_timestamp
            # truncation — gap widths around the epoch must match SQL.
            epoch_sec("ts").alias("sec"),
            "event_id",
        )
        .select((F.col("sec") - F.lag("sec").over(w)).alias("gap"))
        .where(F.col("gap").isNotNull())
    )
    bucket = (
        F.when(F.col("gap") <= 60, "<=1m")
        .when(F.col("gap") <= 300, "<=5m")
        .when(F.col("gap") <= 1800, "<=30m")
        .when(F.col("gap") <= 7200, "<=2h")
        .when(F.col("gap") <= 86400, "<=1d")
        .otherwise(">1d")
    )
    return gaps.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap").cast("long").alias("total_gap_s"),
        F.max("gap").cast("long").alias("max_gap_s"),
    )


# --------------------------------------------------------------------------
# Value concentration (Gini + top-share): how unequally total event
# value spreads across users — the corpus-curation analogue is "does
# one source dominate the mix".  Gini from the exact rank identity
# G = (2·Σ i·x_(i)) / (n·Σx) − (n+1)/n on cents integers (every cross
# term exact; only the final ratios round); top-1%/top-10% shares by
# the same rank frame.  The rank i is the 100 TB-safe two-pass
# partition-offset rank (ids.with_consecutive_ids: balanced range
# exchange + O(#partitions) offsets broadcast), NOT a global
# ``row_number`` window — no single-partition stage; pinned by
# tests/test_plans.py.
# --------------------------------------------------------------------------

@query(
    "value_concentration_gini",
    oracle=f"""
    WITH per AS (
      SELECT user_id,
             CAST(sum({cents_sql('value')}) AS BIGINT)
               AS cents
      FROM events WHERE value IS NOT NULL GROUP BY user_id
      -- a user whose every measure is non-finite has a NULL cents sum:
      -- NULL rank keys land on opposite ends per engine — rank space
      -- holds quantifiable users only
      HAVING CAST(sum({cents_sql('value')}) AS BIGINT) IS NOT NULL
    ), ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, user_id) AS i,
             count(*) OVER () AS n,
             CAST(sum(cents) OVER () AS BIGINT) AS total
      FROM per
    )
    SELECT CAST(max(n) AS BIGINT) AS n_users,
           CAST(max(total) AS BIGINT) AS total_cents,
           round(2.0 * sum(i * cents) / (max(n) * max(total))
                 - (max(n) + 1.0) / max(n), 6) AS gini,
           round(CAST(sum(CASE WHEN i > max_i - CAST(floor(max_i * 0.01)
                         AS BIGINT) THEN cents ELSE 0 END) AS BIGINT)
                 * 1.0 / max(total), 6) AS top1_share,
           round(CAST(sum(CASE WHEN i > max_i - CAST(floor(max_i * 0.10)
                         AS BIGINT) THEN cents ELSE 0 END) AS BIGINT)
                 * 1.0 / max(total), 6) AS top10_share
    FROM (SELECT *, max(i) OVER () AS max_i FROM ranked)
    """,
)
def value_concentration_gini(spark, sf_dir):
    """One-row inequality readout: Gini coefficient and top-1%/10%
    value shares across users (exact rank identity on cents); global
    rank via the distributed partition-offset pass, not a window."""
    from cryptocurrency_data_pipeline_spark.operators.ids import (
        with_consecutive_ids,
    )

    per = (
        t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(cents("value"))
            .cast("long")
            .alias("cents")
        )
        # NULL cents sum (only non-finite measures) is rank-unorderable
        # cross-engine — quantifiable users only, mirrored in HAVING.
        .where(F.col("cents").isNotNull())
    )
    with_i = with_consecutive_ids(per, ["cents", "user_id"], "i")
    totals = with_i.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("long").alias("total"),
    )
    ranked = with_i.crossJoin(F.broadcast(totals)).withColumn(
        "max_i", F.col("n").cast("long")
    )
    top_cut = lambda frac: F.col("max_i") - F.floor(
        F.col("max_i") * F.lit(frac)
    ).cast("long")
    return ranked.agg(
        F.max("n").cast("long").alias("n_users"),
        F.max("total").cast("long").alias("total_cents"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("cents"))
            / (F.max("n") * F.max("total"))
            - (F.max("n") + F.lit(1.0)) / F.max("n"),
            6,
        ).alias("gini"),
        F.round(
            F.sum(
                F.when(F.col("i") > top_cut(0.01), F.col("cents")).otherwise(0)
            ).cast("long")
            / F.max("total"),
            6,
        ).alias("top1_share"),
        F.round(
            F.sum(
                F.when(F.col("i") > top_cut(0.10), F.col("cents")).otherwise(0)
            ).cast("long")
            / F.max("total"),
            6,
        ).alias("top10_share"),
    )


# --------------------------------------------------------------------------
# Exact rank-selected quantiles: per-event-type p25/p50/p75 picked as
# the element at rank ceil(q·n) under a deterministic (value, id)
# order — the EXACT counterpart to the GK sketch queries
# (approx_price_quantile_sketch): no interpolation, no epsilon, a
# concrete row's value every time, so any engine replays it
# bit-for-bit.  With only ~5 event types, a type-partitioned window
# puts ~N/5 raw events through each task at scale — so the rank comes
# from ids.with_grouped_ranks instead: one balanced range exchange on
# (type, value, id) + an O(#partitions x #types) offsets broadcast,
# no per-type data window; pinned by tests/test_plans.py.
# --------------------------------------------------------------------------

@query(
    "exact_rank_quantiles_by_type",
    oracle=f"""
    WITH ev AS (
      SELECT event_type,
             {cents_sql('value')} AS cents,
             event_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY {cents_sql('value')},
                                         event_id) AS r,
             count(*) OVER (PARTITION BY event_type) AS n
      -- quantizable universe, not merely finite: a finite magnitude
      -- past the cents overflow bound quantizes to NULL, and a NULL
      -- sort key lands on OPPOSITE ends per engine (Spark NULLS FIRST
      -- asc, DuckDB NULLS LAST) — rank over non-NULL cents only
      FROM events WHERE {cents_sql('value')} IS NOT NULL
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_events,
           CAST(max(CASE WHEN r = CAST(ceil(n * 0.25) AS BIGINT)
                    THEN cents END) AS BIGINT) AS p25_cents,
           CAST(max(CASE WHEN r = CAST(ceil(n * 0.50) AS BIGINT)
                    THEN cents END) AS BIGINT) AS p50_cents,
           CAST(max(CASE WHEN r = CAST(ceil(n * 0.75) AS BIGINT)
                    THEN cents END) AS BIGINT) AS p75_cents
    FROM ev GROUP BY event_type
    """,
)
def exact_rank_quantiles_by_type(spark, sf_dir):
    """Exact p25/p50/p75 (rank-selection, lower method) of event value
    per type; deterministic tiebreak on event_id.  Per-type ranks via
    the grouped partition-offset pass, not a per-type window."""
    from cryptocurrency_data_pipeline_spark.operators.ids import (
        with_grouped_ranks,
    )

    ev = with_grouped_ranks(
        t(spark, sf_dir, "events")
        # Quantizable universe (cents non-NULL), not merely finite: a
        # NULL sort key would land on opposite ends per engine.
        .where(cents("value").isNotNull())
        .select(
            "event_type",
            cents("value").alias("cents"),
            "event_id",
        ),
        ["event_type"],
        ["cents", "event_id"],
        rank_name="r",
        count_name="n",
    )
    pick = lambda q: F.max(
        F.when(
            F.col("r") == F.ceil(F.col("n") * F.lit(q)).cast("long"),
            F.col("cents"),
        )
    ).cast("long")
    return ev.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"),
        pick(0.25).alias("p25_cents"),
        pick(0.50).alias("p50_cents"),
        pick(0.75).alias("p75_cents"),
    )


# --------------------------------------------------------------------------
# Asymmetric CONTAINMENT dedup (setjoin.containment_join): ordered pairs
# where >= 80% of A's 3-shingles appear in B — the subset-duplicate
# pattern (quote pages, aggregators, mirrors-with-banners) that
# symmetric Jaccard structurally misses when |B| >> |A|.  Same
# prefix-filter scale shape as jaccard_shingle_pairs: probe prefixes on
# A's rarest shingles, full index on B, candidate-bounded verification,
# all-integer threshold.  Oracle is the O(n²) brute force.
# --------------------------------------------------------------------------

@query(
    "containment_shingle_pairs",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             string_split(regexp_replace(replace(lower(replace(trim(text), 'İ', 'I')), 'ς', 'σ'),
               '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' ') AS w
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, g
      FROM base, unnest(list_transform(generate_series(1, len(w) - 2),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS u(g)
    ), sets AS (
      SELECT doc_id, list(g) AS s, count(*) AS sz FROM sh GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
           CAST(a.sz AS BIGINT) AS sz_a,
           round(len(list_intersect(a.s, b.s)) * 1.0 / a.sz, 6)
             AS containment
    FROM sets a JOIN sets b ON a.doc_id != b.doc_id
    WHERE 5 * len(list_intersect(a.s, b.s)) >= 4 * a.sz
    """,
)
def containment_shingle_pairs(spark, sf_dir):
    """Subset-duplicate pairs: containment(A in B) >= 4/5 over 3-word
    shingle sets, via the asymmetric prefix-filtered join."""
    from cryptocurrency_data_pipeline_spark.operators.setjoin import (
        containment_join,
    )
    from cryptocurrency_data_pipeline_spark.operators.text import (
        shingles,
        tokens,
    )

    tok = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("__toks", tokens("text"))
        .select(
            F.col("doc_id").alias("id"),
            F.explode(shingles(toks=F.col("__toks"), n=3)).alias("elem"),
        )
        .distinct()
    )
    return containment_join(tok, num=4, den=5).select(
        "id_a", "id_b", "inter", "sz_a", "containment"
    )


# --------------------------------------------------------------------------
# Snapshot-versioned table time travel (maintenance.write_snapshot /
# read_snapshot): the transactional-lakehouse pattern with plain parquet
# + an atomically-flipped JSON manifest — immutable snapshot dirs, so a
# reader of v1 is never disturbed by the v2 writer (the reference
# overwrites its S3 layers in place, racing readers against writers).
# The fixture writes two deterministic snapshots of orders, then reports
# the per-priority row delta by reading BOTH versions back; the oracle
# replays the delta from the version predicate directly.
# --------------------------------------------------------------------------

@query(
    "table_time_travel_diff",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS v2_rows,
           CAST(sum(CASE WHEN o_orderkey % 3 != 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS v1_rows,
           CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS added_rows
    FROM orders GROUP BY 1
    """,
)
def table_time_travel_diff(spark, sf_dir):
    """Write v1 (keys % 3 != 0) and v2 (all rows) snapshots, read both
    versions back, report the per-priority delta."""
    import os
    import shutil
    import tempfile

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    table = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_versioned_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(table, ignore_errors=True)  # deterministic v1/v2 per run
    mt.write_snapshot(orders.filter(F.col("o_orderkey") % 3 != 0), table)
    mt.write_snapshot(orders, table)

    v1 = mt.read_snapshot(spark, table, 1).groupBy(
        F.col("o_orderpriority").alias("__p1")
    ).agg(F.count(F.lit(1)).alias("v1_rows"))
    v2 = mt.read_snapshot(spark, table, 2).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("v2_rows")
    )
    # Null-SAFE version join: the NULL-priority group is a real group on
    # both sides (GROUP BY keeps it), but a plain equi-join drops it and
    # its v1 count reads as "all added" (sfnull class).
    return v2.join(
        v1, F.col("o_orderpriority").eqNullSafe(F.col("__p1")), "left"
    ).select(
        "o_orderpriority",
        "v2_rows",
        F.coalesce("v1_rows", F.lit(0)).cast("long").alias("v1_rows"),
        (F.col("v2_rows") - F.coalesce("v1_rows", F.lit(0)))
        .cast("long")
        .alias("added_rows"),
    )


# --------------------------------------------------------------------------
# Skew-safe two-phase aggregation (operators/skew.py salted_agg): the
# explicit tool for the groupBy AQE can't fix — one key holding 30% of
# 100 TB.  Phase 1 groups on (key, salt) spreading the hot key over S
# tasks with map-side combine intact; phase 2 merges the S partials.
# Value-IDENTICAL to the plain aggregate for algebraic functions on
# integers (salting only re-associates), so the oracle is the plain
# GROUP BY — any partial/merge decomposition bug flips the hash.
# --------------------------------------------------------------------------

@query(
    "salted_event_type_stats",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum({cents_sql('value')}) AS BIGINT)
             AS total_cents,
           CAST(min({cents_sql('value')}) AS BIGINT)
             AS min_cents,
           CAST(max({cents_sql('value')}) AS BIGINT)
             AS max_cents
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def salted_event_type_stats(spark, sf_dir):
    """Per-type event stats THROUGH the two-phase salted aggregation
    (~5 hot keys, the salted_agg worst case) — exact integer results."""
    from cryptocurrency_data_pipeline_spark.operators.skew import salted_agg

    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            cents("value").alias("cents"),
            # count(*) carrier: `cents` is NULL for NaN/Inf measures
            # (quantize contract) and count(cents) would undercount
            F.lit(1).alias("__one"),
        )
    )
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("__one", "count"),
            "total_cents": ("cents", "sum"),
            "min_cents": ("cents", "min"),
            "max_cents": ("cents", "max"),
        },
        n_salts=8,
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("total_cents").cast("long").alias("total_cents"),
        F.col("min_cents").cast("long").alias("min_cents"),
        F.col("max_cents").cast("long").alias("max_cents"),
    )


# --------------------------------------------------------------------------
# Skew-safe replicated join (skew.salted_join): big side salted, small
# side replicated S× so a hot join key lands in S tasks instead of one.
# Value-identical to the plain equi-join; the rollup's integer totals
# make the oracle the plain JOIN + GROUP BY.
# --------------------------------------------------------------------------

@query(
    "salted_join_segment_revenue",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           CAST(sum({cents_sql('o_totalprice')}) AS BIGINT)
             AS total_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def salted_join_segment_revenue(spark, sf_dir):
    """Orders⋈customer THROUGH the salt-and-replicate join, rolled up by
    market segment — exact integer totals."""
    from cryptocurrency_data_pipeline_spark.operators.skew import salted_join

    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        cents("o_totalprice").alias("cents"),
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(orders, cust, "c_custkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


# --------------------------------------------------------------------------
# Semi-structured payload extraction (F-family: the reference's consumer
# pulls typed fields out of raw JSON payloads per record,
# streaming/consumer.py:37-45): events.props is a JSON STRING column;
# the typed field comes out JVM-side with get_json_object (no UDF, no
# inference scan), then a two-dimension rollup over (event_type, decile
# of the extracted key) with cents-exact value totals and a two-level
# distinct-user count.  The JSON path evaluates inside the scan stage.
# --------------------------------------------------------------------------

@query(
    "props_json_extraction_stats",
    oracle=f"""
    SELECT event_type,
           -- try_cast mirrors get_json_object: malformed JSON is NULL,
           -- never an error (one bad payload must not kill the rollup)
           CAST(floor(try_cast(try_cast(props AS JSON)->>'k' AS INTEGER) / 10)
             AS INT) AS k_decile,
           count(*) AS n_events,
           CAST(sum({cents_sql('value')}) AS BIGINT)
             AS total_cents,
           count(DISTINCT user_id) AS n_users
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
)
def props_json_extraction_stats(spark, sf_dir):
    """Typed extraction from the JSON props payload + rollup by
    (event_type, extracted-key decile)."""
    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            # try_cast: a non-numeric extracted value is NULL, never an
            # ANSI cast error (get_json_object already nulls malformed
            # JSON; the cast must be as forgiving).
            F.floor(
                F.get_json_object("props", "$.k").try_cast("int") / 10
            )
            .cast("int")
            .alias("k_decile"),
            cents("value").alias("cents"),
            "user_id",
        )
    )
    return ev.groupBy("event_type", "k_decile").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# Bronze schema evolution (S3/P11 family): the reference lands evolving
# raw schemas via parquet ``mergeSchema`` (glue/data_ingestion_s3.py:35);
# the engine's production-parity form is a VERSIONED read
# (sources/ingestion.read_bronze_versioned): rows parse against the
# name-keyed union of registered schema versions, each row is stamped
# with the earliest version covering its key set, and keys in no version
# surface as ``_unknown_fields`` instead of being silently dropped.  The
# fixture derives three deterministic landing batches from orders (v1 =
# even keys, v2 adds o_orderpriority on odd keys, plus an unregistered
# o_experimental field on keys % 97 == 0) — the oracle replays the
# version assignment in SQL over the same table.  One text scan, all
# JVM-side (json_object_keys + array_except); no inference pass.
# --------------------------------------------------------------------------

@query(
    "schema_drift_report",
    oracle="""
    SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                WHEN o_orderkey % 2 = 0 THEN 1
                -- a NULL field never lands in the row's JSON
                -- (to_json(struct) drops nulls), so an odd-key row with
                -- NULL priority presents the v1 KEY SET and stamps v1 —
                -- the whole point of version-by-keyset (sfnull class)
                WHEN o_orderpriority IS NULL THEN 1
                ELSE 2 END AS schema_version,
           count(*) AS n_rows,
           round(sum(o_totalprice), 2) AS total_price,
           CAST(sum(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_unknown_rows
    FROM orders GROUP BY 1
    """,
)
def schema_drift_report(spark, sf_dir):
    """Versioned bronze read over a drifting landing zone: per-version
    row counts, value totals, and unknown-field row counts."""
    import os
    import tempfile

    from pyspark.sql import types as T

    from cryptocurrency_data_pipeline_spark.sources.ingestion import (
        read_bronze_versioned,
    )

    v1 = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    v2 = T.StructType(list(v1.fields) + [T.StructField("o_orderpriority", T.StringType())])

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    key = F.col("o_orderkey")
    base = F.struct("o_orderkey", "o_custkey", "o_totalprice")
    v2_struct = F.struct("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    drift_struct = F.struct(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderpriority",
        F.lit("A").alias("o_experimental"),
    )
    batches = (
        orders.filter((key % 2 == 0) & (key % 97 != 0))
        .select(F.to_json(base).alias("value"))
        .unionAll(
            orders.filter((key % 2 == 1) & (key % 97 != 0)).select(
                F.to_json(v2_struct).alias("value")
            )
        )
        .unionAll(
            orders.filter(key % 97 == 0).select(
                F.to_json(drift_struct).alias("value")
            )
        )
    )
    land = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_schema_drift_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    batches.write.mode("overwrite").text(land)

    bronze = read_bronze_versioned(spark, land, [v1, v2])
    return bronze.groupBy(F.col("_schema_version").alias("schema_version")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.sum(
            F.when(F.size("_unknown_fields") > 0, 1).otherwise(0)
        ).cast("long").alias("n_unknown_rows"),
    )


# --------------------------------------------------------------------------
# File-stats data skipping (maintenance.write_stats_manifest /
# read_with_skipping): the Delta/Iceberg `add.stats` pattern — per-file
# min/max recorded in a manifest, file list pruned driver-side BEFORE the
# scan is planned, residual predicate still applied so the result is
# exact.  At 100 TB the win is skipping the listing/footer/task cost of
# non-matching files, not just their row groups.  Value-identical to the
# plain filtered aggregate, so the oracle is the plain SQL (the pruning
# itself — files_read < files_total — is pinned in
# tests/test_maintenance.py).
# --------------------------------------------------------------------------

@query(
    "stats_pruned_scan",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum({cents_sql('o_totalprice')}) AS BIGINT)
             AS total_cents
    FROM orders
    WHERE o_totalprice >= 50000.0 AND o_totalprice <= 150000.0
    GROUP BY 1
    """,
)
def stats_pruned_scan(spark, sf_dir):
    """Range-cluster orders on o_totalprice, index per-file min/max, then
    answer a selective range query reading only the files whose stats
    envelope intersects the predicate."""
    import os
    import shutil
    import tempfile

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
    table = os.path.join(
        tempfile.gettempdir(),
        # pid-scoped: concurrent harness/bench processes on the same
        # sf_dir must not rmtree each other's mid-scan fixture.
        f"spark_graft_statskip_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(table, ignore_errors=True)  # deterministic layout per run
    orders.repartitionByRange(8, "o_totalprice").sortWithinPartitions(
        "o_totalprice"
    ).write.parquet(table)
    mt.write_stats_manifest(spark, table, ["o_totalprice"])

    pruned, _report = mt.read_with_skipping(
        spark, table, {"o_totalprice": (50000.0, 150000.0)}
    )
    return pruned.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents("o_totalprice"))
        .cast("long")
        .alias("total_cents"),
    )


# --------------------------------------------------------------------------
# Incremental materialized rollup with mergeable partial state
# (operators/matview.py): per-day algebraic partials (count / integer-cent
# sum / min / max / HLL sketch), the newest day refreshed INCREMENTALLY
# via dynamic partition overwrite, then any-range answers from merging
# partial rows — never a raw rescan.  The reference's gold layer
# recomputes from the full Silver scan every run
# (glue/data_aggregate_gold.py:50); this is the O(days × keys) version.
# Exact measures are oracle-checked directly; the sketch path is checked
# as an invariant (merged per-day sketches within 2% of the exact
# distinct — and bit-equal to a single-pass sketch, pinned in
# tests/test_matview.py).
# --------------------------------------------------------------------------

@query(
    "mergeable_sketch_rollup",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_rows,
           CAST(sum({cents_sql('value')}) AS BIGINT) AS sum_cents,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS sketch_within_2pct
    FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1
    """,
)
def mergeable_sketch_rollup(spark, sf_dir):
    """Materialize per-day partials for events (all days but the last),
    refresh the last day incrementally, then answer the all-time rollup
    by merging partials; distinct users via unioned HLL sketches."""
    import os
    import shutil
    import tempfile

    from cryptocurrency_data_pipeline_spark.operators import matview as mv

    # NULL ts has no day partition: the day-range predicates below would
    # silently drop such an event from every partial — excluded
    # explicitly on both sides instead.
    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .withColumn("day", F.to_date("ts"))
    )
    last_day = ev.agg(F.max("day")).collect()[0][0]
    path = os.path.join(
        tempfile.gettempdir(),
        # pid-scoped: see stats_pruned_scan.
        f"spark_graft_matview_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(path, ignore_errors=True)  # deterministic build per run
    mv.write_partials(
        mv.build_partials(
            ev.where(F.col("day") < F.lit(last_day)),
            "day", ["event_type"], "value", "user_id",
        ),
        path, "day",
    )
    mv.refresh_partition(
        spark, path,
        ev.where(F.col("day") == F.lit(last_day)),
        "day", ["event_type"], "value", "user_id",
    )

    merged = mv.merge_partials(
        # Schema pinned from the (never-executed) partials plan: an
        # empty corpus leaves a file-less partials dir, where bare
        # schema inference would crash instead of reading zero rows.
        mv.read_partials(
            spark, path,
            mv.build_partials(ev, "day", ["event_type"], "value", "user_id"),
        ),
        ["event_type"],
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    # eqNullSafe: the NULL event_type group must survive the exact-side
    # join (a plain inner join on the column silently drops it).
    ex = exact.withColumnRenamed("event_type", "__et")
    return merged.join(
        ex, merged["event_type"].eqNullSafe(ex["__et"])
    ).drop("__et").select(
        "event_type",
        "n_rows",
        "sum_cents",
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            <= 0.02 * F.col("exact_distinct") + 1
        ).alias("sketch_within_2pct"),
    )


# --------------------------------------------------------------------------
# Consistent resharding (sources/shards.rendezvous_shard): growing the
# shard count under md5-mod placement remaps ~n/(n+1) of all ids — a
# full-corpus rewrite at 100 TB — while rendezvous (highest-random-
# weight) hashing moves only the ids whose new shard's hash wins,
# ~1/(n+1).  The query measures both movement fractions for 16 → 17
# shards over the documents corpus; the oracle replays the identical
# md5 formulas (mod via hex-prefix cast, argmax via max_by on the hex
# digest — both sides compare lowercase hex lexically).
# --------------------------------------------------------------------------

@query(
    "consistent_reshard_stability",
    oracle="""
    WITH g AS (SELECT CAST(doc_id AS VARCHAR) AS id FROM documents),
    modshards AS (
      SELECT CAST(('0x' || substr(md5(id), 1, 8)) AS BIGINT) % 16 AS s16,
             CAST(('0x' || substr(md5(id), 1, 8)) AS BIGINT) % 17 AS s17
      FROM g
    ),
    rv16 AS (
      SELECT id, max_by(s, md5(id || ':' || CAST(s AS VARCHAR))) AS s16
      FROM g, range(16) t(s) GROUP BY id
    ),
    rv17 AS (
      SELECT id, max_by(s, md5(id || ':' || CAST(s AS VARCHAR))) AS s17
      FROM g, range(17) t(s) GROUP BY id
    ),
    n AS (SELECT count(*) AS n_docs FROM g)
    SELECT strategy, n_docs, n_moved,
           round(n_moved * 1.0 / n_docs, 4) AS moved_frac
    FROM (
      SELECT 'mod' AS strategy, (SELECT n_docs FROM n) AS n_docs,
             count(*) FILTER (WHERE s16 != s17) AS n_moved
      FROM modshards
      UNION ALL
      -- per-ROW accounting like the mod branch and the engine's map:
      -- the GROUP BY id in rv16/rv17 is only how the argmax is
      -- computed (id -> shard is functional), so rejoin the flags to
      -- the row multiset rather than counting distinct ids
      SELECT 'rendezvous', (SELECT n_docs FROM n),
             count(*) FILTER (WHERE rv16.s16 != rv17.s17)
      FROM g JOIN rv16 USING (id) JOIN rv17 USING (id)
    )
    ORDER BY strategy
    """,
)
def consistent_reshard_stability(spark, sf_dir):
    """Fraction of the corpus that changes shard going 16 → 17 shards:
    md5-mod placement vs rendezvous hashing, one map-only pass."""
    from cryptocurrency_data_pipeline_spark.sources.shards import (
        rendezvous_shard,
        shard_assignment,
    )

    flags = t(spark, sf_dir, "documents").select(
        (shard_assignment("doc_id", 16) != shard_assignment("doc_id", 17))
        .cast("long")
        .alias("mod_moved"),
        (rendezvous_shard("doc_id", 16) != rendezvous_shard("doc_id", 17))
        .cast("long")
        .alias("rv_moved"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        # coalesce: sum over an empty corpus is NULL, but "0 of 0 docs
        # moved" is the honest answer (the oracle's FILTER count is 0).
        F.coalesce(F.sum("mod_moved"), F.lit(0)).alias("mod_moved"),
        F.coalesce(F.sum("rv_moved"), F.lit(0)).alias("rv_moved"),
    )
    out = agg.select(
        F.lit("mod").alias("strategy"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("mod_moved").cast("long").alias("n_moved"),
    ).unionByName(
        agg.select(
            F.lit("rendezvous").alias("strategy"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("rv_moved").cast("long").alias("n_moved"),
        )
    )
    return out.select(
        "strategy",
        "n_docs",
        "n_moved",
        F.round(F.try_divide(F.col("n_moved"), F.col("n_docs")), 4).alias("moved_frac"),
    ).orderBy("strategy")


# --------------------------------------------------------------------------
# Pseudonymized join integrity (operators/privacy.pseudonymize): keyed
# deterministic tokenization — sha2(key:value) — replaces identifiers
# while preserving join/group topology, so two tables tokenized with the
# same key still join exactly as their raw keys would.  The query joins
# customer→orders BOTH ways (raw custkey, tokenized custkey) and proves
# per-segment order counts identical; the oracle replays the sha256
# formula verbatim (lowercase hex on both engines).
# --------------------------------------------------------------------------

@query(
    "pseudonymized_join_integrity",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_mktsegment,
             sha256('k1:' || CAST(c_custkey AS VARCHAR)) AS tok
      FROM customer
    ),
    o AS (
      SELECT o_custkey,
             sha256('k1:' || CAST(o_custkey AS VARCHAR)) AS tok
      FROM orders
    ),
    raw_j AS (
      SELECT c_mktsegment, count(*) AS n_orders_raw
      FROM c JOIN o ON c.c_custkey = o.o_custkey GROUP BY 1
    ),
    tok_j AS (
      SELECT c_mktsegment, count(*) AS n_orders_token
      FROM c JOIN o ON c.tok = o.tok GROUP BY 1
    )
    SELECT c_mktsegment, n_orders_raw, n_orders_token,
           n_orders_raw = n_orders_token AS joins_match
    FROM raw_j JOIN tok_j USING (c_mktsegment)
    ORDER BY c_mktsegment
    """,
)
def pseudonymized_join_integrity(spark, sf_dir):
    """Per-segment order counts via the raw custkey join vs the
    tokenized-custkey join — identical by construction."""
    from cryptocurrency_data_pipeline_spark.operators.privacy import token

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", token("c_custkey", "k1").alias("tok")
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey", token("o_custkey", "k1").alias("tok")
    )
    raw_j = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders_raw"))
    )
    tok_j = (
        cust.join(orders, cust.tok == orders.tok)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders_token"))
    )
    return (
        raw_j.join(tok_j, "c_mktsegment")
        .select(
            "c_mktsegment",
            "n_orders_raw",
            "n_orders_token",
            (F.col("n_orders_raw") == F.col("n_orders_token")).alias("joins_match"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Mergeable histogram quantiles (matview.build_histogram_partials /
# histogram_quantiles): per-day equi-width bin counts are the quantile
# state a per-partition percentile can't be — they merge by summation,
# so any date range's p50/p95 comes from folding O(days × keys × bins)
# partial rows with error ≤ one bin width, never re-scanning raw events.
# Fully deterministic closed form (first bin whose cumulative count
# reaches ceil(q·n), upper edge), replayed verbatim in the oracle; the
# ≤-one-bin-width error vs the exact quantile is pinned in
# tests/test_matview.py.
# --------------------------------------------------------------------------

@query(
    "histogram_quantile_rollup",
    oracle="""
    WITH b AS (
      SELECT event_type,
             -- clamp in double space BEFORE the cast (mirrors
             -- build_histogram_partials: an extreme value must land in
             -- the edge bin, not overflow the INT cast)
             CAST(floor(LEAST(49.0, GREATEST(0.0, value / 20.0))) AS INT) AS bin,
             count(*) AS n
      -- mirrors build_histogram_partials: NaN rows are excluded (no bin
      -- arithmetic), +/-Inf clamp into the edge bins like any outlier
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
      GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, bin, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS total
      FROM b
    )
    SELECT event_type,
           CAST(sum(n) AS BIGINT) AS n_values,
           round(20.0 * (min(CASE WHEN cum >= ceil(0.50 * total)
                                  THEN bin END) + 1), 6) AS p50,
           round(20.0 * (min(CASE WHEN cum >= ceil(0.95 * total)
                                  THEN bin END) + 1), 6) AS p95
    FROM c GROUP BY 1
    """,
)
def histogram_quantile_rollup(spark, sf_dir):
    """Per-type p50/p95 of event value from merged per-day histogram
    partials (50 bins over [0, 1000])."""
    from cryptocurrency_data_pipeline_spark.operators import matview as mv

    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .withColumn("day", F.to_date("ts"))
    )
    partials = mv.build_histogram_partials(
        ev, "day", ["event_type"], "value", lo=0.0, hi=1000.0, n_bins=50
    )
    return mv.histogram_quantiles(
        partials, ["event_type"], [0.50, 0.95], lo=0.0, hi=1000.0, n_bins=50
    )


# --------------------------------------------------------------------------
# DP noisy counts (privacy.laplace_noisy_counts): the release side of
# the privacy surface — per-segment customer counts with Laplace(1/ε)
# noise (ε = 0.5, sensitivity-1 count query), noise derived by inverse
# CDF from a seeded hash so the mechanism is deterministic enough to
# oracle-verify (the seed is secret in production — see the operator
# docstring for the exact privacy contract).  true_count is emitted for
# the verification harness only; a real release drops it.
# --------------------------------------------------------------------------

@query(
    "dp_noisy_segment_counts",
    oracle="""
    WITH g AS (
      SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1
    ),
    u AS (
      -- field framing mirrors privacy.laplace_noisy_counts: null marker
      -- ('1' = non-null, '0' = null) + md5(coalesced field), then the
      -- seeded hash — a NULL group gets its own independent draw
      SELECT c_mktsegment, n,
             (CAST(('0x' || substr(md5('s1:'
                     || (CASE WHEN c_mktsegment IS NULL THEN '0' ELSE '1' END)
                     || md5(coalesce(c_mktsegment, ''))), 1, 8))
                   AS BIGINT) + 0.5) / 4294967296.0 AS u
      FROM g
    )
    SELECT c_mktsegment,
           CAST(n AS BIGINT) AS true_count,
           round(n + (-2.0) * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)), 4)
             AS noisy_count
    FROM u ORDER BY c_mktsegment
    """,
)
def dp_noisy_segment_counts(spark, sf_dir):
    """ε=0.5 Laplace-noised customer counts per market segment."""
    from cryptocurrency_data_pipeline_spark.operators.privacy import (
        laplace_noisy_counts,
    )

    return laplace_noisy_counts(
        t(spark, sf_dir, "customer"), ["c_mktsegment"], epsilon=0.5, seed="s1"
    ).orderBy("c_mktsegment")


# --------------------------------------------------------------------------
# Partition-pruned change feed (maintenance.write_snapshot(part_col=) +
# snapshot_changes): snapshots written Hive-partitioned carry a
# per-partition content fingerprint in the manifest (count + decimal sum
# of row xxhash64 — order-insensitive, multiset-sensitive), so the
# v_from→v_to diff first compares fingerprints driver-side (O(partitions),
# zero data read) and then runs its two exceptAll passes over ONLY the
# changed partitions, with a partition-pruned scan on both sides.  At
# 100 TB a one-partition edit diffs one partition, not two full tables —
# the fix for the full-snapshot exceptAll scale note in VERDICT r6.
# The fixture edits exactly two of five priority partitions (one gains
# rows, one loses rows); the oracle replays the same multiset diff with
# DuckDB EXCEPT ALL from the version predicates.
# --------------------------------------------------------------------------

@query(
    "partition_change_feed",
    oracle=f"""
    WITH snap AS (
      SELECT o_orderkey, o_orderpriority,
             {cents_sql('o_totalprice')} AS price_cents
      FROM orders
    ),
    v1 AS (
      SELECT * FROM snap
      WHERE NOT (o_orderpriority IS NOT DISTINCT FROM '2-HIGH'
                 AND o_orderkey % 7 = 0)
    ),
    v2 AS (
      SELECT * FROM snap
      -- null-safe: a NULL-priority key is NOT swept by the 3-MEDIUM
      -- delete rule (plain = makes the NOT(...) NULL and drops it)
      WHERE NOT (o_orderpriority IS NOT DISTINCT FROM '3-MEDIUM'
                 AND o_orderkey % 11 = 0)
    ),
    feed AS (
      SELECT *, 'insert' AS change FROM (
        SELECT * FROM v2 EXCEPT ALL SELECT * FROM v1)
      UNION ALL
      SELECT *, 'delete' AS change FROM (
        SELECT * FROM v1 EXCEPT ALL SELECT * FROM v2)
    )
    SELECT change, o_orderpriority,
           count(*) AS n_rows,
           CAST(sum(price_cents) AS BIGINT) AS sum_cents
    FROM feed GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def partition_change_feed(spark, sf_dir):
    """Diff two partitioned snapshots through the fingerprint-pruned
    change feed; report per-(change, partition) row and cents totals."""
    import os
    import shutil
    import tempfile

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    snap = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        cents("o_totalprice").alias("price_cents"),
    )
    key, pri = F.col("o_orderkey"), F.col("o_orderpriority")
    table = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_partsnap_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(table, ignore_errors=True)  # deterministic v1/v2 per run
    # eqNullSafe: a NULL-priority key is not 2-HIGH/3-MEDIUM and must
    # SURVIVE these exclusions — with a plain ==, ~(NULL & true) is NULL
    # and the filter silently drops the row from one version only.
    mt.write_snapshot(
        snap.filter(~(pri.eqNullSafe("2-HIGH") & (key % 7 == 0))),
        table,
        part_col="o_orderpriority",
    )
    mt.write_snapshot(
        snap.filter(~(pri.eqNullSafe("3-MEDIUM") & (key % 11 == 0))),
        table,
        part_col="o_orderpriority",
    )
    feed = mt.snapshot_changes(spark, table, 1, 2)
    return (
        feed.groupBy(
            F.col("_change").alias("change"),
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price_cents").cast("long").alias("sum_cents"),
        )
        .orderBy("change", "o_orderpriority")
    )



# --------------------------------------------------------------------------
# Copy-on-write partial snapshot (maintenance.upsert_snapshot): a new
# version that rewrites ONLY the partitions present in new_rows and
# inherits every other partition from the previous version by manifest
# reference (per-partition `src` pointer) — the Iceberg/Delta
# overwrite-by-partition shape on plain parquet.  The fixture seeds a
# full partitioned v1 of orders, then publishes v2 by replacing just the
# 2-HIGH partition (keys % 3 != 0 survive); the assembled v2 read unions
# a partition-pruned scan of v2's one rewritten partition with pruned
# scans of v1's four inherited ones.  The oracle replays the replacement
# predicate directly.
# --------------------------------------------------------------------------

@query(
    "cow_snapshot_upsert",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(sum({cents_sql('o_totalprice')}) AS BIGINT)
             AS sum_cents
    FROM orders
    -- IS DISTINCT FROM: a NULL-priority partition is untouched by the
    -- 2-HIGH rewrite and must survive the predicate (plain != is NULL)
    WHERE o_orderpriority IS DISTINCT FROM '2-HIGH' OR o_orderkey % 3 != 0
    GROUP BY 1 ORDER BY 1
    """,
)
def cow_snapshot_upsert(spark, sf_dir):
    """Publish v2 by rewriting one partition copy-on-write; report the
    assembled v2 per-priority totals."""
    import os
    import shutil
    import tempfile

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    snap = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        cents("o_totalprice").alias("price_cents"),
    )
    table = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_cowsnap_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(table, ignore_errors=True)  # deterministic v1/v2 per run
    mt.write_snapshot(snap, table, part_col="o_orderpriority")
    mt.upsert_snapshot(
        snap.filter(
            (F.col("o_orderpriority") == "2-HIGH")
            & (F.col("o_orderkey") % 3 != 0)
        ),
        table,
    )
    return (
        mt.read_snapshot(spark, table, 2)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price_cents").cast("long").alias("sum_cents"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Row-level MERGE INTO on the COW table (maintenance.merge_into_snapshot):
# matched keys update, unmatched insert, delete-flagged keys vanish, and
# only the touched partitions are read+rewritten (everything else
# inherited by reference).  The fixture merges three kinds of edits into
# a full orders snapshot — urgent price bumps (update), synthetic new
# keys in 5-LOW (insert), and a deletion sweep in 3-MEDIUM — then reports
# the merged per-priority totals; the oracle replays the same edits as a
# closed-form predicate over the base table.
# --------------------------------------------------------------------------

@query(
    "merge_into_orders",
    oracle=f"""
    WITH snap AS (
      SELECT o_orderkey, o_orderpriority,
             {cents_sql('o_totalprice')} AS price_cents
      FROM orders
    ),
    v2 AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderpriority = '1-URGENT' AND o_orderkey % 5 = 0
                  THEN price_cents + 7 ELSE price_cents END AS price_cents
      FROM snap
      -- null-safe: a NULL-priority key is NOT swept by the 3-MEDIUM
      -- delete rule (plain = makes the NOT(...) NULL and drops it)
      WHERE NOT (o_orderpriority IS NOT DISTINCT FROM '3-MEDIUM'
                 AND o_orderkey % 7 = 0)
      UNION ALL
      SELECT -(o_orderkey + 1), o_orderpriority, 999
      FROM snap WHERE o_orderpriority = '5-LOW' AND o_orderkey % 11 = 0
    )
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(sum(price_cents) AS BIGINT) AS sum_cents
    FROM v2 GROUP BY 1 ORDER BY 1
    """,
)
def merge_into_orders(spark, sf_dir):
    """MERGE update/insert/delete batches into a partitioned snapshot;
    report the merged per-priority totals from the new version."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = _orders_merged_snapshot(spark, sf_dir, "mergesnap")
    return (
        mt.read_snapshot(spark, table, 2)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price_cents").cast("long").alias("sum_cents"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Schema evolution across snapshot versions: the new version's writer
# defines the column set (recorded in the manifest); the assembled COW
# read surfaces an ADDED column as null on partitions inherited from
# pre-evolution versions.  The fixture seeds v1 without `tier`, then
# rewrites only the 1-URGENT partition with the new column — so in the
# assembled v2, tier is populated exactly on the rewritten partition and
# null everywhere inherited.  The oracle states that closed form.
# --------------------------------------------------------------------------

@query(
    "schema_evolution_read",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_tiered,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          AND o_orderkey % 2 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_gold,
           CAST(sum({cents_sql('o_totalprice')}) AS BIGINT)
             AS sum_cents
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def schema_evolution_read(spark, sf_dir):
    """Upsert one partition with an added column; report per-priority
    totals plus how many rows carry the evolved column."""
    import os
    import shutil
    import tempfile

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    snap = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        cents("o_totalprice").alias("price_cents"),
    )
    table = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_evosnap_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(table, ignore_errors=True)  # deterministic v1/v2 per run
    mt.write_snapshot(snap, table, part_col="o_orderpriority")
    mt.upsert_snapshot(
        snap.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
            "tier",
            F.when(F.col("o_orderkey") % 2 == 0, "gold").otherwise("std"),
        ),
        table,
    )
    cur = mt.read_snapshot(spark, table, 2)
    if "tier" not in cur.columns:
        # An EMPTY evolving upsert (no 1-URGENT rows at this scale
        # point) lands no partition carrying the new column, so the
        # assembled read has no `tier` — the evolved column is all-NULL
        # by definition then (the oracle's priority-gated CASE agrees).
        cur = cur.withColumn("tier", F.lit(None).cast("string"))
    return (
        cur
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("tier").cast("long").alias("n_tiered"),
            F.sum(F.when(F.col("tier") == "gold", 1).otherwise(0))
            .cast("long")
            .alias("n_gold"),
            F.sum("price_cents").cast("long").alias("sum_cents"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Key-aware change feed (maintenance.snapshot_changes(collapse=True)): the
# Delta change-data-feed shape — a key present on both sides of a version
# diff has its delete+insert pair re-tagged update_preimage /
# update_postimage (one window pass over the already-partition-pruned
# change set), so an upsert-driven feed carries NO bare deletes and a
# consumer can apply per-key updates directly.  The merge keys come from
# the manifest (merge_into_snapshot records them).  The fixture replays
# merge_into_orders' edit batch, then aggregates the collapsed feed per
# change type; the oracle states each change class in closed form over
# the base table.  Reference analog: the DynamoDB put_item upserts in
# streaming/consumer.py expose no change history at all — this adds it.
# --------------------------------------------------------------------------

@query(
    "keyed_change_feed",
    oracle=f"""
    WITH snap AS (
      SELECT o_orderkey, o_orderpriority,
             {cents_sql('o_totalprice')} AS price_cents
      FROM orders
    ),
    -- Mirror the collapse contract exactly: a key is re-tagged
    -- update_pre/postimage ONLY when its feed pair is unambiguous
    -- (exactly one physical row per side).  A duplicated key (mk > 1
    -- copies) keeps its raw insert/delete tags — the engine refuses to
    -- mis-pair rows a 1:1 pre/post consumer would misapply.
    upd AS (
      -- STATE-DIFF contract: the feed is a version diff, so an update
      -- whose postimage equals its preimage is invisible by
      -- construction.  price_cents + 7 is a no-op exactly when
      -- price_cents IS NULL (NULL + 7 = NULL — a swept NULL-price
      -- order rewrites to identical content; sfmix class), so those
      -- keys never enter the feed on either tag branch.
      SELECT price_cents,
             sum(count(*)) OVER (PARTITION BY o_orderkey) AS mk,
             count(*) AS m
      FROM snap
      WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 5 = 0
        AND price_cents IS NOT NULL
      GROUP BY o_orderkey, price_cents
    ),
    feed AS (
      SELECT CASE WHEN mk = 1 THEN 'update_postimage' ELSE 'insert' END
               AS change_type,
             price_cents + 7 AS price_cents, m
      FROM upd
      UNION ALL
      SELECT CASE WHEN mk = 1 THEN 'update_preimage' ELSE 'delete' END,
             price_cents, m
      FROM upd
      UNION ALL
      SELECT 'insert', 999, count(*)
      FROM snap WHERE o_orderpriority = '5-LOW' AND o_orderkey % 11 = 0
      GROUP BY o_orderkey
      UNION ALL
      SELECT 'delete', price_cents, count(*)
      FROM snap WHERE o_orderpriority = '3-MEDIUM' AND o_orderkey % 7 = 0
      GROUP BY o_orderkey, price_cents
    )
    SELECT change_type,
           CAST(sum(m) AS BIGINT) AS n_rows,
           CAST(sum(price_cents * m) AS BIGINT) AS sum_cents
    FROM feed GROUP BY 1 ORDER BY 1
    """,
)
def keyed_change_feed(spark, sf_dir):
    """MERGE an update/insert/delete batch into a snapshot of orders,
    then read the collapsed (key-aware) change feed between the two
    versions and aggregate it per change type."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = _orders_merged_snapshot(spark, sf_dir, "cdcfeed")
    return (
        mt.snapshot_changes(spark, table, 1, 2, collapse=True)
        .groupBy(F.col("_change").alias("change_type"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price_cents").cast("long").alias("sum_cents"),
        )
        .orderBy("change_type")
    )


# --------------------------------------------------------------------------
# Streaming snapshot-sink replay cycle (streaming/snapshot_sink.
# merge_batch_into_snapshot): the keyed current-state table driven through
# a full micro-batch life cycle — seed, exact replay (version-stable:
# skip_unchanged withdraws the no-op publish), new data (row-level MERGE,
# only touched buckets rewritten), and a late file (every row strictly
# below its key's stored (order, tiebreak) tuple → discarded, no version
# minted).  The version-stability invariants are asserted in-line (a
# violation fails the query, which the driver records); the returned
# frame is the final current state — latest order per customer — which
# the oracle states directly as a window over the base table.  Reference
# analog: streaming/consumer.py's DynamoDB put_item upserts, which
# re-apply replays and late rows blindly.
# --------------------------------------------------------------------------

@query(
    "stream_snapshot_sink_replay",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderpriority,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn
      FROM orders WHERE o_custkey % 8 = 0
    )
    SELECT o_orderpriority,
           count(*) AS n_keys,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_latest_key
    FROM ranked WHERE rn = 1 GROUP BY 1 ORDER BY 1
    """,
)
def stream_snapshot_sink_replay(spark, sf_dir):
    """Drive the snapshot sink through seed → replay → merge → late-data
    micro-batches; return the final current state (latest order per
    customer) aggregated per priority."""
    import os
    import shutil
    import tempfile

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt
    from cryptocurrency_data_pipeline_spark.streaming import snapshot_sink

    orders = (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
        # An eighth of customers: the cycle's semantics (seed, withdraw,
        # merge, discard) are scale-invariant — bench the write path
        # without dominating the headline set (VERDICT r8: the %4 subset
        # made this one query 12.5% of the whole bench).
        .filter(F.col("o_custkey") % 8 == 0)
        .withColumn("bucket", snapshot_sink.key_bucket(["o_custkey"], 8))
        # One materialization feeds all four micro-batch derivations —
        # without it every cycle re-scans parquet and recomputes the
        # bucket hash (the fixture is driver-job-bound, not data-bound).
        .persist()
    )
    table = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_sinkreplay_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(table, ignore_errors=True)  # deterministic versions per run

    def merge(batch):
        return snapshot_sink.merge_batch_into_snapshot(
            batch, table, ["o_custkey"], part_col="bucket",
            order_col="o_orderdate", tiebreak=["o_orderkey"],
        )

    try:
        b1 = orders.filter(F.col("o_orderkey") % 2 == 0)
        v1 = merge(b1)                  # seed
        v2 = merge(b1)                  # exact replay: withdrawn, no mint
        if v2 != v1:
            raise RuntimeError(f"replay minted a version: {v1} -> {v2}")
        v3 = merge(orders.filter(F.col("o_orderkey") % 2 == 1))  # real merge
        # Late file: every key already present with a strictly newer
        # tuple — all rows discarded, no version minted.
        late = orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
            # Preserve the column's dtype: date_sub returns DATE, and
            # the sink fails fast on order-column dtype drift (a drifted
            # type breaks the stored-tuple comparison silently at scale).
            "o_orderdate",
            F.date_sub("o_orderdate", 1000).cast(
                dict(orders.dtypes)["o_orderdate"]
            ),
        )
        v4 = merge(late)
        if v4 != v3:
            raise RuntimeError(f"late data minted a version: {v3} -> {v4}")
        # Empty input: no batch ever seeded the table (v == 0
        # throughout) — the final state is the empty keyed table, typed
        # off the source.
        cur = mt.read_snapshot(spark, table) if v4 > 0 else orders.limit(0)
    finally:
        # The returned frame reads only the PUBLISHED table files (or a
        # zero-row local plan) — the fixture cache can go now.  In a
        # finally so a failed merge cycle or a tripped invariant cannot
        # leak the cached fixture into the rest of the session.
        orders.unpersist()
    return (
        cur
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("o_orderkey").cast("long").alias("sum_latest_key"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# CDC apply contract (maintenance.snapshot_changes consumer side): the
# whole point of a change feed is that a consumer can reconstruct v_to
# incrementally — v_from MINUS deletes PLUS inserts, multiset semantics —
# without re-reading the new snapshot.  The fixture publishes two
# versions of orders (drop 3-MEDIUM %7 keys, bump 1-URGENT %5 prices,
# add synthetic 5-LOW keys), reads the feed, applies it to v1 with
# exceptAll/unionByName, and aggregates the RECONSTRUCTED state; the
# oracle states v2 directly — so a hash match proves apply(v1, feed)
# == v2 at the driver's scale.  Collapsed update tags fold back into
# delete+insert for the apply (update_preimage is a delete of the old
# row, update_postimage an insert of the new).
# --------------------------------------------------------------------------

@query(
    "cdc_apply_reconstruction",
    oracle=f"""
    WITH snap AS (
      SELECT o_orderkey, o_orderpriority,
             {cents_sql('o_totalprice')} AS price_cents
      FROM orders
    ),
    v2 AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderpriority = '1-URGENT' AND o_orderkey % 5 = 0
                  THEN price_cents + 7 ELSE price_cents END AS price_cents
      FROM snap
      -- null-safe: a NULL-priority key is NOT swept by the 3-MEDIUM
      -- delete rule (plain = makes the NOT(...) NULL and drops it)
      WHERE NOT (o_orderpriority IS NOT DISTINCT FROM '3-MEDIUM'
                 AND o_orderkey % 7 = 0)
      UNION ALL
      SELECT -(o_orderkey + 1), o_orderpriority, 999
      FROM snap WHERE o_orderpriority = '5-LOW' AND o_orderkey % 11 = 0
    )
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(sum(price_cents) AS BIGINT) AS sum_cents,
           -- id sums need 128-bit headroom: one snowflake-scale key
           -- (~9.2e18) overflows an int64 sum (DuckDB widens to HUGEINT
           -- silently, Spark's ANSI sum aborts).  The exact 128-bit sum
           -- is RENDERED AS A DIGIT STRING: a DECIMAL(38,0) result
           -- column hashed green in the repo's replay (both clients
           -- return decimal.Decimal) but red in the driver's check two
           -- rounds running (rows/schema green, hash red) — DuckDB's
           -- pandas conversion turns DECIMAL(38,0) into float64
           -- ('205917.0') while Spark keeps Decimal ('205917'), so any
           -- exact-rendering hash diverges.  A string is identical on
           -- every client path and stays exact at snowflake scale.
           CAST(CAST(sum(o_orderkey) AS DECIMAL(38,0)) AS VARCHAR)
             AS sum_keys
    FROM v2 GROUP BY 1 ORDER BY 1
    """,
)
def cdc_apply_reconstruction(spark, sf_dir):
    """Publish v1 -> v2 via MERGE, then reconstruct v2 FROM v1 + the
    collapsed change feed (updates folded back to delete+insert) and
    aggregate the reconstruction."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = _orders_merged_snapshot(spark, sf_dir, "cdcapply")
    feed = mt.snapshot_changes(spark, table, 1, 2, collapse=True)
    removals = feed.where(
        F.col("_change").isin("delete", "update_preimage")
    ).drop("_change")
    additions = feed.where(
        F.col("_change").isin("insert", "update_postimage")
    ).drop("_change")
    v1 = mt.read_snapshot(spark, table, 1)
    reconstructed = (
        v1.select(*additions.columns)
        .exceptAll(removals)
        .unionByName(additions)
    )
    return (
        reconstructed.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price_cents").cast("long").alias("sum_cents"),
            # decimal(38,0) sum: a snowflake-scale orderkey overflows the
            # int64 sum (ANSI aborts); the decimal accumulator is exact.
            # Rendered as a digit string (see the oracle comment): the
            # driver's hash normalization diverged on Decimal-vs-float64
            # client conversions two rounds running.
            F.sum(F.col("o_orderkey").cast("decimal(38,0)"))
            .cast("string")
            .alias("sum_keys"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Bucket-pruned point lookup (snapshot_sink.lookup_current): the
# reference's DynamoDB get_item (streaming/consumer.py keyed reads)
# over the keyed current-state lakehouse table — probe keys are hashed
# with the recorded layout contract and the scan is pruned to their
# bucket partitions at planning, so a 5-key lookup reads at most 5 of
# n_buckets partitions, never the table.  The fixture seeds a
# current-state table (latest order per customer, one merge batch) and
# looks up a fixed probe set; the oracle states latest-order-per-key
# directly.
# --------------------------------------------------------------------------

@query(
    "bucket_point_lookup",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderpriority,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn
      FROM orders WHERE o_custkey % 10 = 3
    )
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderpriority
    FROM ranked
    WHERE rn = 1 AND o_custkey IN (3, 13, 23, 33, 43)
    ORDER BY o_custkey
    """,
)
def bucket_point_lookup(spark, sf_dir):
    """Seed a keyed current-state table from orders, then point-lookup a
    fixed probe set through the bucket-pruned path."""
    import os
    import shutil
    import tempfile

    from cryptocurrency_data_pipeline_spark.streaming import snapshot_sink

    orders = (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
        .filter(F.col("o_custkey") % 10 == 3)
        .withColumn("bucket", snapshot_sink.key_bucket(["o_custkey"], 16))
    )
    table = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_ptlookup_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(table, ignore_errors=True)  # deterministic per run
    snapshot_sink._check_sink_meta(
        table, {"part_col": "bucket", "n_buckets": 16, "keys": ["o_custkey"]}
    )
    v = snapshot_sink.merge_batch_into_snapshot(
        orders, table, ["o_custkey"], part_col="bucket",
        order_col="o_orderdate", tiebreak=["o_orderkey"],
    )
    if v == 0:
        # An empty input never seeds the table; looking up keys in a
        # table with no published versions is an empty result, not a
        # crash — limit(0) inherits the exact source column types.
        return orders.limit(0).select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            "o_orderpriority",
        )
    return (
        snapshot_sink.lookup_current(spark, table, [3, 13, 23, 33, 43])
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            "o_orderpriority",
        )
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# Incremental stats-manifest refresh (maintenance.update_stats_manifest):
# the stats-per-commit Delta shape — a first wave of files is indexed
# fully, a second wave lands later, and the refresh aggregates ONLY the
# new files (O(new files), not a table rescan) before a skipping read
# answers a range query over the combined layout.  The refresh count is
# asserted in-line (a zero `added` on a changed directory is the
# permanently-stale regression class); the result is value-identical to
# the plain filtered aggregate, so the oracle is the plain SQL.
# --------------------------------------------------------------------------

@query(
    "incremental_stats_refresh_scan",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum({cents_sql('o_totalprice')}) AS BIGINT)
             AS total_cents
    FROM orders
    WHERE o_totalprice >= 200000.0 AND o_totalprice <= 280000.0
    GROUP BY 1
    """,
)
def incremental_stats_refresh_scan(spark, sf_dir):
    """Index wave 1 of a range-clustered orders layout, append wave 2,
    refresh the stats manifest incrementally, and answer a range query
    through the skipping read over both waves."""
    import os
    import shutil
    import tempfile

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    table = os.path.join(
        tempfile.gettempdir(),
        # pid-scoped: see stats_pruned_scan.
        f"spark_graft_statrefresh_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(table, ignore_errors=True)  # deterministic layout per run

    def wave(df):
        return df.repartitionByRange(4, "o_totalprice").sortWithinPartitions(
            "o_totalprice"
        )

    wave(orders.filter(F.col("o_orderkey") % 2 == 0)).write.parquet(table)
    mt.write_stats_manifest(spark, table, ["o_totalprice"])
    wave(orders.filter(F.col("o_orderkey") % 2 == 1)).write.mode(
        "append"
    ).parquet(table)
    out = mt.update_stats_manifest(spark, table)
    if out["added"] == 0:  # refresh must SEE the appended wave
        raise RuntimeError(f"incremental refresh indexed nothing: {out}")

    pruned, _report = mt.read_with_skipping(
        spark, table, {"o_totalprice": (200000.0, 280000.0)}
    )
    return pruned.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents("o_totalprice"))
        .cast("long")
        .alias("total_cents"),
    )


# --------------------------------------------------------------------------
# Conditional-put commit protocol, driver-verified end to end
# (maintenance.ConditionalPutSnapshotCommit over EtagObjectStore): the
# SAME write->MERGE cycle as merge_into_orders, but every manifest
# publish is an etag compare-and-swap against the object store instead
# of a flock'd rename — the S3/GCS deployment shape of the snapshot
# layer.  In-query invariants pin the protocol properties the oracle
# cannot see: the store copy is the truth and the local mirror equals
# it byte-for-byte, exactly two versions committed, and the store saw
# exactly one successful put per commit (no silent retries on the
# uncontended path).  The oracle states the merged v2 directly — a hash
# match proves the CAS-committed lineage produced the identical table.
# --------------------------------------------------------------------------

@query(
    "conditional_put_commit_cycle",
    oracle=f"""
    WITH snap AS (
      SELECT o_orderkey, o_orderpriority,
             {cents_sql('o_totalprice')} AS price_cents
      FROM orders
    ),
    v2 AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderpriority = '1-URGENT' AND o_orderkey % 5 = 0
                  THEN price_cents + 7 ELSE price_cents END AS price_cents
      FROM snap
      WHERE NOT (o_orderpriority IS NOT DISTINCT FROM '3-MEDIUM'
                 AND o_orderkey % 7 = 0)
      UNION ALL
      SELECT -(o_orderkey + 1), o_orderpriority, 999
      FROM snap WHERE o_orderpriority = '5-LOW' AND o_orderkey % 11 = 0
    )
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(sum(price_cents) AS BIGINT) AS sum_cents
    FROM v2 GROUP BY 1 ORDER BY 1
    """,
)
def conditional_put_commit_cycle(spark, sf_dir):
    """The merge_into_orders cycle committed through the object-store
    conditional-put protocol; invariants asserted in-query, final v2
    state per priority returned for the external hash check."""
    import json as _json

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    store = mt.EtagObjectStore()
    commit = mt.ConditionalPutSnapshotCommit(store)
    table = _orders_merged_snapshot(spark, sf_dir, "condput", commit=commit)

    data, etag = store.get(commit._key(table))
    if data is None:
        raise RuntimeError("no manifest ever reached the object store")
    man = _json.loads(data.decode())
    if man != mt._load_manifest(table):
        raise RuntimeError("local mirror diverged from the store manifest")
    if man["current"] != 2 or set(man["snapshots"]) != {"1", "2"}:
        raise RuntimeError(f"expected exactly v1+v2 committed, got {man['current']}")
    if int(etag) != 2:  # uncontended: one successful put per commit
        raise RuntimeError(f"expected 2 store puts, etag says {etag}")

    return (
        mt.read_snapshot(spark, table, 2)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price_cents").cast("long").alias("sum_cents"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Non-finite measure audit (quality.nonfinite_audit): the operational
# companion of the quantize contract — cents quantization and the
# finite-only statistics DEGRADE NaN/±Inf measures to NULL so jobs
# survive them; this is the one-pass gate that tells an operator they
# exist and how many (a NaN spike = an upstream feed regression).  One
# wide map-side-combined aggregate per table, stack()ed to long form on
# a 1-row frame; ratios try_divide'd so an empty day audits as NULL,
# not a dead job.
# --------------------------------------------------------------------------

@query(
    "dq_nonfinite_audit",
    oracle="""
    SELECT 'value' AS col_name,
           count(*) AS n_rows,
           count(CASE WHEN value IS NULL THEN 1 END) AS n_null,
           count(CASE WHEN isnan(value) THEN 1 END) AS n_nan,
           count(CASE WHEN isinf(value) THEN 1 END) AS n_inf,
           round(count(CASE WHEN isfinite(value) THEN 1 END) * 1.0
                 / count(*), 6) AS finite_ratio
    FROM events
    UNION ALL
    SELECT 'o_totalprice',
           count(*),
           count(CASE WHEN o_totalprice IS NULL THEN 1 END),
           count(CASE WHEN isnan(o_totalprice) THEN 1 END),
           count(CASE WHEN isinf(o_totalprice) THEN 1 END),
           round(count(CASE WHEN isfinite(o_totalprice) THEN 1 END) * 1.0
                 / count(*), 6)
    FROM orders
    ORDER BY col_name
    """,
)
def dq_nonfinite_audit(spark, sf_dir):
    """Measure-column health across two fact tables: NULL/NaN/±Inf
    counts and the finite ratio, one wide aggregate per table."""
    from cryptocurrency_data_pipeline_spark.operators import quality

    ev = quality.nonfinite_audit(t(spark, sf_dir, "events"), ["value"])
    orders = quality.nonfinite_audit(
        t(spark, sf_dir, "orders"), ["o_totalprice"]
    )
    return (
        ev.unionByName(orders)
        .withColumnRenamed("column", "col_name")  # DuckDB reserved word
        .orderBy("col_name")
    )


# --------------------------------------------------------------------------
# Object-store READ path (round-10 close of the conditional-put story):
# a reader on a host whose local manifest mirror is ABSENT (fresh
# autoscaled worker) or STALE must bootstrap from the store —
# maintenance.read_snapshot(commit=) resolves versions through
# SnapshotCommit.manifest_for_read, store-authoritative with the mirror
# refreshed as a cache.  The cycle commits v1+v2 through the CAS
# protocol, DELETES the mirror, reads back current AND time-travels to
# v1 through the store, and asserts in-query that the mirror was truly
# gone before the read and was recreated byte-equal to the store copy
# after it.  The oracle states the merged v2 directly — a hash match
# proves the store-resolved read serves the identical table.
# --------------------------------------------------------------------------

@query(
    "object_store_read_path",
    oracle=f"""
    WITH snap AS (
      SELECT o_orderkey, o_orderpriority,
             {cents_sql('o_totalprice')} AS price_cents
      FROM orders
    ),
    v2 AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderpriority = '1-URGENT' AND o_orderkey % 5 = 0
                  THEN price_cents + 7 ELSE price_cents END AS price_cents
      FROM snap
      WHERE NOT (o_orderpriority IS NOT DISTINCT FROM '3-MEDIUM'
                 AND o_orderkey % 7 = 0)
      UNION ALL
      SELECT -(o_orderkey + 1), o_orderpriority, 999
      FROM snap WHERE o_orderpriority = '5-LOW' AND o_orderkey % 11 = 0
    )
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key,
           CAST(sum(price_cents) AS BIGINT) AS sum_cents
    FROM v2 GROUP BY 1 ORDER BY 1
    """,
)
def object_store_read_path(spark, sf_dir):
    """Reference parity: the store-side manifest consultation mirrors
    Delta's LogStore read path / Iceberg's catalog-resolved
    current-metadata pointer; the reference overwrites S3 objects in
    place and readers list the bucket (glue/data_transform_s3.py), so
    its 'read path' IS the store — here the mirror is only a cache."""
    import json as _json
    import os as _os

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    store = mt.EtagObjectStore()
    commit = mt.ConditionalPutSnapshotCommit(store)
    table = _orders_merged_snapshot(spark, sf_dir, "storeread", commit=commit)

    mirror_path = _os.path.join(table, "_versions.json")
    _os.remove(mirror_path)  # the fresh-host premise
    if _os.path.exists(mirror_path):
        raise RuntimeError("mirror still present; the bootstrap is untested")

    cur = mt.read_snapshot(spark, table, commit=commit)

    # The resolution itself (driver-side) must have rebuilt the mirror
    # as a byte-equal cache of the store manifest.
    data, _etag = store.get(commit._key(table))
    if data is None:
        raise RuntimeError("no manifest in the object store")
    if mt._load_manifest(table) != _json.loads(data.decode()):
        raise RuntimeError("rebuilt mirror diverged from the store manifest")
    # Time travel resolves through the store too: v1 is the pre-merge
    # orders snapshot — its row count must match the source exactly.
    _os.remove(mirror_path)
    n_v1 = mt.read_snapshot(spark, table, 1, commit=commit).count()
    n_src = t(spark, sf_dir, "orders").count()
    if n_v1 != n_src:
        raise RuntimeError(f"v1 through the store read {n_v1} rows, source has {n_src}")

    return (
        cur.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
            F.sum("price_cents").cast("long").alias("sum_cents"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Duplicate-saturation invariance, IN-QUERY (round 11): the sfdup scale
# point lives in tools/make_empty_sf.py and its pinned gate, but the
# driver only replays sf0.01 — so these two queries embed the ×3
# saturation into the query itself (UNION ALL the table with itself
# twice) and assert the operator contracts at ANY scale the driver
# runs.  Because semantic_dedup collapses to one min-vector row per id
# and jaccard_self_join collapses (id, elem), the tripled input must
# produce EXACTLY the single-copy answer — so each oracle is the plain
# single-copy statement, and a hash match IS the invariance proof.
# --------------------------------------------------------------------------

@query(
    "semantic_dedup_dup_invariance",
    oracle="""
    WITH corpus AS (
      -- the engine side runs over embeddings ×3; min-per-id collapse
      -- makes that literally this single-copy corpus
      SELECT vec_id, min(CASE WHEN len(list_filter(embedding, x -> x IS NULL)) = 0 THEN CAST(embedding AS DOUBLE[]) END) AS v
      FROM embeddings GROUP BY vec_id
    ), nl AS (
      -- auto_nlist over the POST-COLLAPSE corpus: the tripled engine
      -- input collapses to these exact rows, so the auto cluster count
      -- is itself duplication-invariant (uncapped since r14, identical
      -- values at every corpus under ~65k)
      SELECT greatest(8, CAST(ceil(count(v) / 256.0) AS INT)) AS k
      FROM corpus
    ), seed AS (
      SELECT cid, c FROM (
        SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cid,
               v AS c
        FROM corpus)
      WHERE cid <= (SELECT k FROM nl)
    ), d0 AS (
      SELECT a.vec_id, a.v, s.cid,
             list_aggregate(list_transform(generate_series(1, len(a.v)),
               j -> (a.v[j] - s.c[j]) * (a.v[j] - s.c[j])), 'sum') AS d
      FROM corpus a CROSS JOIN seed s
    ), a0 AS (
      SELECT vec_id, cid,
             CASE WHEN list_dot_product(v, v) > 0
                  THEN list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                  ELSE v END AS nv
      FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM d0) WHERE rn = 1
    ), dropped AS (
      SELECT DISTINCT b.vec_id
      FROM a0 a JOIN a0 b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.nv, b.nv) >= 0.45
    )
    SELECT a0.cid AS cluster_id,
           count(*) AS n_vecs,
           CAST(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped
    FROM a0 LEFT JOIN dropped d ON a0.vec_id = d.vec_id
    GROUP BY a0.cid
    """,
)
def semantic_dedup_dup_invariance(spark, sf_dir):
    """SemDeDup over the corpus UNION ALL'd with itself twice must equal
    the single-copy audit bit-for-bit (the id-uniqueness contract)."""
    from cryptocurrency_data_pipeline_spark.operators.semdedup import semantic_dedup

    emb = t(spark, sf_dir, "embeddings")
    tripled = emb.unionByName(emb).unionByName(emb)
    # auto-nlist counts POST-collapse distinct complete ids, so the
    # tripled corpus resolves to the same cluster count as one copy —
    # the auto default is itself part of the invariance contract
    flags = semantic_dedup(tripled, tau=0.45)
    return flags.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.when(F.col("is_kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("is_kept"), 0).otherwise(1)).cast("long").alias("n_dropped"),
    )


@query(
    "jaccard_dup_invariance",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             string_split(regexp_replace(replace(lower(replace(trim(text), 'İ', 'I')), 'ς', 'σ'),
               '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' ') AS w
      FROM documents
    ), sh AS (
      -- set semantics per id: the engine's ×3 input collapses to this
      SELECT DISTINCT doc_id, g
      FROM base, unnest(list_transform(generate_series(1, len(w) - 2),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS u(g)
    ), sets AS (
      SELECT doc_id, list(g) AS s, count(*) AS sz FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.s, b.s)) AS inter,
             a.sz + b.sz - len(list_intersect(a.s, b.s)) AS union_sz
      FROM sets a JOIN sets b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(inter AS BIGINT) AS inter,
           CAST(union_sz AS BIGINT) AS union_sz,
           round(inter * 1.0 / union_sz, 6) AS jaccard
    FROM pairs WHERE 2 * inter >= union_sz
    """,
)
def jaccard_dup_invariance(spark, sf_dir):
    """Exact Jaccard pairs over documents UNION ALL'd with itself twice
    must equal the single-copy pairs (the DISTINCT-(id, elem) contract —
    violated, it emitted union_sz = −90 rows before round 11)."""
    from cryptocurrency_data_pipeline_spark.operators.setjoin import (
        jaccard_self_join,
    )
    from cryptocurrency_data_pipeline_spark.operators.text import (
        shingles,
        tokens,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    tripled = docs.unionByName(docs).unionByName(docs)
    tok = tripled.withColumn("__toks", tokens("text")).select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.array_distinct(shingles(toks=F.col("__toks")))
        ).alias("elem"),
    )
    pairs = jaccard_self_join(tok, num=1, den=2)
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "inter",
        "union_sz",
        "jaccard",
    )


# --------------------------------------------------------------------------
# Calendar/timestamp-extremes invariance, IN-QUERY (round 11): the sftime
# scale point lives in tools/make_time_sf.py and its pinned gate, but the
# driver only replays sf0.01 — so these two queries embed the extreme
# instants as timestamp LITERALS (both engines parse the identical list)
# and assert the time contracts at any scale the driver runs: exact
# floored epoch seconds (epoch_sec vs the double/truncation traps),
# hour/week bucketing at negative epochs, ISO weeks at year boundaries,
# the +10000 derived-window string form, and the Arrow int64-micros
# boundary under year-1/9999 rows through the grouped-map pandas path.
# --------------------------------------------------------------------------

_TIME_EXTREMES = [
    (0, "1969-12-31 23:59:59.5"),       # sub-second negative epoch
    (1, "1969-12-31 23:59:58.123456"),  # floor ≠ truncate by 1
    (2, "1970-01-01 00:00:00.5"),       # positive control
    (3, "1970-01-01 00:00:00"),         # epoch zero
    (4, "0001-01-01 00:00:01"),         # timestamp range min side
    (5, "9999-12-31 23:59:59.999999"),  # range max, double trap
    (6, "2021-01-01 12:00:00"),         # ISO week 53 of 2020
    (7, "2024-12-30 12:00:00"),         # ISO week 1 of 2025
    (8, "2000-02-29 12:00:00"),         # 400-year leap day
]


@query(
    "time_bucket_extremes_invariance",
    oracle=f"""
    WITH src(id, ts) AS (VALUES
      {",".join(f"({i}, TIMESTAMP '{s}')" for i, s in _TIME_EXTREMES)})
    SELECT id,
           {epoch_sec_sql('ts')} AS sec,
           CAST(floor({epoch_sec_sql('ts')} / 604800.0) AS BIGINT) AS week,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR,
                    '%Y-%m-%d %H:%M:%S') AS hour_end,
           CAST(weekofyear(ts) AS INT) AS iso_week,
           dayname(ts) AS day_name
    FROM src
    """,
)
def time_bucket_extremes_invariance(spark, sf_dir):
    """Bucketing/calendar contracts at the time extremes, from literals:
    floored epoch seconds (-1 for 23:59:59.5, exact 253402300799 at the
    year-9999 sub-second instant), week floor-div over negative seconds,
    hour buckets whose DERIVED end passes year 9999 (ISO "+" prefix
    stripped to the oracle's bare form), ISO weeks where ISO year ≠
    calendar year, and day names back to year 1."""
    vals = ", ".join(f"({i}, TIMESTAMP'{s}')" for i, s in _TIME_EXTREMES)
    src = spark.sql(f"SELECT * FROM VALUES {vals} AS t(id, ts)")
    hour = F.date_trunc("hour", F.col("ts"))
    return src.select(
        "id",
        epoch_sec("ts").alias("sec"),
        F.floor(epoch_sec("ts") / F.lit(604800)).cast("long").alias("week"),
        F.date_format(hour, "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        F.regexp_replace(
            F.date_format(
                hour + F.expr("INTERVAL 1 HOUR"), "yyyy-MM-dd HH:mm:ss"
            ),
            r"^\+",
            "",
        ).alias("hour_end"),
        F.weekofyear("ts").cast("int").alias("iso_week"),
        F.date_format("ts", "EEEE").alias("day_name"),
    )


@query(
    "ewma_time_extremes_invariance",
    oracle="""
    WITH src(user_id, ts, event_id, value) AS (VALUES
      (1, TIMESTAMP '0001-01-01 00:00:01', 10, 1.0),
      (1, TIMESTAMP '1969-12-31 23:59:59.5', 11, 2.0),
      (1, TIMESTAMP '1970-01-01 00:00:00', 12, 3.0),
      (1, TIMESTAMP '9999-12-31 23:59:59.999999', 13, 4.0),
      (2, TIMESTAMP '2024-03-01 00:00:00.000001', 20, 5.0),
      (2, TIMESTAMP '2024-03-01 00:00:00.000001', 21, 6.0)),
    ordered AS (
      -- CAST: a bare 1.0 VALUES literal is DECIMAL(2,1) in DuckDB and
      -- the fold would round every step to one decimal place
      SELECT user_id,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs
      FROM src GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vs) AS BIGINT) AS n_rows,
           round(list_reduce(vs, (acc, x) -> 0.25 * x + 0.75 * acc), 6) AS ewma
    FROM ordered
    """,
)
def ewma_time_extremes_invariance(spark, sf_dir):
    """The grouped-map pandas path under year-1/9999 rows: order columns
    cross the Arrow boundary as int64 micros, so the recursion sees the
    exact (ts, event_id) total order — including the identical-
    microsecond tie pair — instead of aborting on the datetime64[ns]
    range."""
    from cryptocurrency_data_pipeline_spark.operators.grouped import (
        ewma_last_by_key,
    )

    src = spark.sql(
        "SELECT * FROM VALUES "
        "(1, TIMESTAMP'0001-01-01 00:00:01', 10, 1.0d), "
        "(1, TIMESTAMP'1969-12-31 23:59:59.5', 11, 2.0d), "
        "(1, TIMESTAMP'1970-01-01 00:00:00', 12, 3.0d), "
        "(1, TIMESTAMP'9999-12-31 23:59:59.999999', 13, 4.0d), "
        "(2, TIMESTAMP'2024-03-01 00:00:00.000001', 20, 5.0d), "
        "(2, TIMESTAMP'2024-03-01 00:00:00.000001', 21, 6.0d) "
        "AS t(user_id, ts, event_id, value)"
    )
    out = ewma_last_by_key(
        src,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        value_col="value",
        alpha=0.25,
    )
    return out.select("user_id", "n_rows", F.round("ewma", 6).alias("ewma"))


# --------------------------------------------------------------------------
# Unicode/encoding-extremes invariance, IN-QUERY (round 12): the sfuni
# scale point lives in tools/make_uni_sf.py and its pinned gate
# (tests/test_query_uni_parity.py), but the driver only replays sf0.01 -
# so this query embeds the extreme strings as shared Python-built
# LITERALS (both engines receive byte-identical text) and asserts the
# cross-engine text contracts at any scale the driver runs: the
# two-point case fold (U+0130 / final sigma - text.fold_lower vs
# _fragments.fold_lower_sql), ASCII-WS_CLASS tokenization against
# NBSP/NEL/U+2028 joiners, code-point (never UTF-16/UTF-8 unit) length
# on astral text, BPE pre-split parity over folded text, and the
# normalized-fingerprint md5.
# --------------------------------------------------------------------------

_UNI_EXTREMES = [
    (9990, "\u0130stanbul \u039f\u0394\u039f\u03a3 \u03a3\u03af\u03c3\u03c5\u03c6\u03bf\u03c2 \u03c2 STRASSE \u1e9e"),
    (9991, "a\u00a0b\u0085c\u2028d e\u3000f"),
    (9992, "caf\u00e9 r\u00e9sum\u00e9"),
    (9993, "cafe\u0301 re\u0301sume\u0301"),
    (9994, "\U0001F600\U0001F9D1\U0001F3FD\u200d\U0001F4BB \u6f22\u5b57 \U0002000B x"),
    (9995, "\uff45\uff4d\uff41\uff49\uff4c\uff20\uff45\uff58.com \ufeffBOM"),
]


@query(
    "unicode_fold_invariance",
    oracle=f"""
    WITH uni(doc_id, text) AS (VALUES
      {",".join("(%d, '%s')" % (i, s) for i, s in _UNI_EXTREMES)})
    SELECT doc_id,
           length(text) AS n_chars,
           coalesce(len(list_filter(string_split_regex(replace(lower(replace(text, '\u0130', 'I')), '\u03c2', '\u03c3'), '[ \t\n\x0B\f\r]+'),
                                    t -> t <> '')), 0) AS n_tokens,
           len(regexp_extract_all(replace(lower(replace(text, '\u0130', 'I')), '\u03c2', '\u03c3'),
               '''(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]+'))
             AS n_bpe_tokens,
           md5(regexp_replace(replace(lower(replace(trim(text), '\u0130', 'I')), '\u03c2', '\u03c3'),
               '[ \t\n\x0B\f\r]+', ' ', 'g')) AS fp
    FROM uni
    """,
)
def unicode_fold_invariance(spark, sf_dir):
    """Text contracts over embedded unicode extremes - length counts
    CODE POINTS (astral chars are 1), tokens split on ASCII WS_CLASS
    only (NBSP/NEL/U+2028 are token chars), and lowercasing goes
    through the two-point fold, so U+0130 / final sigma hash and count
    identically on both engines (the sfuni sweep broke 9 oracles on
    exactly these inputs before the fold)."""
    from cryptocurrency_data_pipeline_spark.operators import text as textops

    df = spark.createDataFrame(_UNI_EXTREMES, "doc_id long, text string")
    return df.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(textops.tokens("text")).alias("n_tokens"),
        textops.bpe_token_count("text").alias("n_bpe_tokens"),
        textops.fingerprint("text").alias("fp"),
    )


# --------------------------------------------------------------------------
# Float/numeric-extremes invariance, IN-QUERY (round 12): the sfnum
# scale point lives in tools/make_num_sf.py and its pinned gate
# (tests/test_query_num_parity.py), but the driver only replays
# sf0.01 - so this query embeds the extreme doubles as shared literals
# (Python repr on the Spark side, CAST('...'  AS DOUBLE) string parse
# on the DuckDB side - both resolve to the identical IEEE bits) and
# asserts the cross-engine numeric contracts in every driver window:
# finite()/isfinite NULL-propagation, the cents() non-finite->NULL
# quantization guard, the guarded floor band (non-finite -> NULL band,
# the privacy-audit contract), total ordering with NULLS FIRST < finite
# < +inf < NaN, and value-grouping that merges NaN with NaN and -0.0
# with +0.0.  Two rows carry int64-extreme ids (snowflake scale) so id
# handling rides along.  No division anywhere: DuckDB's x/0.0 is NULL
# while IEEE says +/-inf - division semantics are asserted through the
# operators' own guards (cosine zero-norm, cents) instead.
# --------------------------------------------------------------------------

_NUM_EXTREME_VALS = [
    # (vid, value-as-repr-string); vid order is the tiebreak everywhere.
    (-9223372036854775808, "1.5"),
    (2, "inf"),
    (3, "-inf"),
    (4, "-0.0"),
    (5, "0.0"),
    (6, "nan"),
    (7, "nan"),
    (8, "5e-324"),
    (9, "2.2250738585072014e-308"),
    (10, "1048576.25"),
    (9223372036854775807, None),
]


@query(
    "numeric_extremes_invariance",
    oracle=f"""
    WITH nx(vid, value) AS (VALUES
      {",".join("(%d, %s)" % (i, "NULL" if s is None else "CAST('%s' AS DOUBLE)" % s) for i, s in _NUM_EXTREME_VALS)})
    SELECT vid,
           isfinite(value) AS is_finite,
           {cents_sql('value')} AS cents_val,
           CASE WHEN isfinite(value)
                THEN CAST(floor(value / 1000.0) AS BIGINT) END AS band,
           row_number() OVER (ORDER BY value NULLS FIRST, vid) AS rank_pos,
           count(*) OVER (PARTITION BY value) AS n_same_value
    FROM nx
    """,
)
def numeric_extremes_invariance(spark, sf_dir):
    """Numeric contracts over embedded extreme doubles: the finite()
    gate, cents() quantization, the guarded band, total sort order, and
    NaN/-0.0 grouping behave identically on both engines (the sfnum
    sweep broke 11 oracles in 5 classes on exactly these inputs before
    the r12 guards)."""
    rows = [(i, None if s is None else float(s)) for i, s in _NUM_EXTREME_VALS]
    df = spark.createDataFrame(rows, "vid long, value double")
    w_rank = Window.orderBy(F.asc_nulls_first("value"), F.asc("vid"))
    w_grp = Window.partitionBy("value")
    return df.select(
        "vid",
        finite("value").alias("is_finite"),
        cents("value").alias("cents_val"),
        F.when(finite("value"), F.floor(F.col("value") / F.lit(1000.0)).cast("long"))
        .alias("band"),
        F.row_number().over(w_rank).alias("rank_pos"),
        F.count(F.lit(1)).over(w_grp).alias("n_same_value"),
    )


# --------------------------------------------------------------------------
# Schema-drift invariance, IN-QUERY (round 13): the sfdrift scale point
# lives in tools/make_drift_sf.py and its pinned gate
# (tests/test_query_drift_parity.py), but the driver only replays
# sf0.01 — so this query builds a REAL drifted parquet directory per
# run (three writers: missing-column / full / reversed-column-order
# parts, under a fresh mkdtemp) and reads it back through the
# engine's drift-tolerant scan (sources/tables.py:read_drifted,
# mergeSchema).  The oracle carries the expected union-by-name
# semantics as VALUES — so every driver window re-asserts that the
# multi-file seam aligns columns BY NAME and NULL-fills pre-drift
# rows, without the oracle needing filesystem access.  The write is
# O(rows-embedded) and leaks one ~KB tmp dir per run (mkdtemp: safe
# under concurrent harnesses).
# --------------------------------------------------------------------------

@query(
    "schema_drift_invariance",
    oracle="""
    WITH merged(id, a, b) AS (VALUES
      (1, 10.0, NULL), (2, 20.5, NULL),
      (3, 30.0, 'x'),  (4, 40.0, 'y'),
      (5, 50.25, 'z')),
    agg AS (
      SELECT (b IS NULL) AS pre_drift,
             count(*) AS n_rows,
             round(sum(CAST(a AS DOUBLE)), 6) AS sum_a,
             CAST(min(id) AS BIGINT) AS min_id,
             CAST(max(id) AS BIGINT) AS max_id
      FROM merged GROUP BY 1)
    SELECT pre_drift, n_rows, sum_a, min_id, max_id FROM agg
    """,
)
def schema_drift_invariance(spark, sf_dir):
    """Multi-writer parquet drift seam, exercised end-to-end per window:
    writer 1 predates column ``b`` (its rows must surface b as NULL),
    writer 2 has the full schema, writer 3 writes columns in REVERSED
    order — one mergeSchema read must align all three by name, lose no
    rows, and aggregate identically to the oracle's expected union."""
    import os
    import shutil
    import tempfile

    # Deterministic pid-scoped dir, built ONCE per process: the driver
    # and bench replay each query many times per session, and a fresh
    # mkdtemp per execution both leaked /tmp unboundedly and billed
    # three parquet writes to every timed pass (ADVICE r13).  The
    # `_probe_ready` sentinel (underscore-prefixed: invisible to the
    # parquet reader) guards against reusing a half-built dir from a
    # killed run; pid scoping keeps concurrent harnesses collision-free.
    d = os.path.join(
        tempfile.gettempdir(), f"spark_graft_drift_probe_{os.getpid()}"
    )
    ready = os.path.join(d, "_probe_ready")
    if not os.path.exists(ready):
        shutil.rmtree(d, ignore_errors=True)
        spark.createDataFrame(
            [(1, 10.0), (2, 20.5)], "id long, a double"
        ).coalesce(1).write.mode("append").parquet(d)
        spark.createDataFrame(
            [(3, 30.0, "x"), (4, 40.0, "y")], "id long, a double, b string"
        ).coalesce(1).write.mode("append").parquet(d)
        spark.createDataFrame(
            [("z", 50.25, 5)], "b string, a double, id long"
        ).coalesce(1).write.mode("append").parquet(d)
        with open(ready, "w") as f:
            f.write("ok")

    from cryptocurrency_data_pipeline_spark.sources.tables import read_drifted

    merged = read_drifted(spark, d)
    return merged.groupBy(
        F.col("b").isNull().alias("pre_drift")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("a"), 6).alias("sum_a"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


# --------------------------------------------------------------------------
# Adversarial partition values, IN-QUERY (round 14 — the 13th axis the
# r12/r13 verdicts reserved): the engine's sinks partition by data-
# derived columns (dt=/hour= bad-record files, update_date silver,
# date-partitioned gold), and at corpus scale partition VALUES carry
# whatever the data carried — spaces, URI-reserved characters that
# must escape into the directory name (= / : % #), non-ASCII, and the
# Hive null/empty-string collapse.  This probe writes a partitioned
# table whose partition values cover that alphabet through the same
# partitionBy path the sinks use, reads it back through partition
# discovery, and asserts the round-trip per value.  Pinned semantics
# (both engines): empty string and NULL both land in
# __HIVE_DEFAULT_PARTITION__ and read back as NULL — the Hive-compat
# contract a 100 TB user WILL hit, asserted rather than assumed.
# (Not covered: values whose ESCAPED dirname exceeds the filesystem's
# 255-byte name limit — parquet task writes fail loudly there; the
# probe documents the boundary by staying under it with a 180-char
# value, escaped 1:1.)
# --------------------------------------------------------------------------

@query(
    "partition_value_roundtrip",
    oracle="""
    WITH expected(part, n_rows, sum_id) AS (VALUES
      ('plain',            1, 1),
      ('with space',       1, 2),
      ('eq=slash/colon:',  1, 3),
      ('pct%hash#amp&',    1, 4),
      ('day-один-日本語',    1, 5),
      (repeat('L', 180),   1, 6),
      (NULL,               2, 15))
    SELECT part, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(sum_id AS BIGINT) AS sum_id
    FROM expected
    """,
)
def partition_value_roundtrip(spark, sf_dir):
    """Hostile partition-value alphabet through the partitioned parquet
    sink and back through partition discovery; per-partition counting
    proves no value was lost, merged, or mangled by the escape."""
    import os
    import shutil
    import tempfile

    # build once per process (same sentinel discipline as the drift
    # probe: deterministic pid-scoped dir, rebuilt only if a previous
    # run died mid-write)
    d = os.path.join(
        tempfile.gettempdir(), f"spark_graft_partval_probe_{os.getpid()}"
    )
    ready = os.path.join(d, "_probe_ready")
    if not os.path.exists(ready):
        shutil.rmtree(d, ignore_errors=True)
        rows = [
            (1, "plain"),
            (2, "with space"),
            (3, "eq=slash/colon:"),
            (4, "pct%hash#amp&"),
            (5, "day-один-日本語"),
            (6, "L" * 180),
            (7, None),
            (8, ""),  # Hive collapse: lands with NULL, reads back NULL
        ]
        df = spark.createDataFrame(rows, "id long, part string")
        df.write.mode("overwrite").option("compression", "snappy").partitionBy(
            "part"
        ).parquet(d)
        with open(ready, "w") as f:
            f.write("ok")

    back = spark.read.parquet(d)
    return back.groupBy("part").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("id").cast("long").alias("sum_id"),
    )
