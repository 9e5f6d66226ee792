"""Structured Streaming surface over ``events`` (north-star M4).

Batch/stream parity is the test contract: the same windowed aggregation
runs as a real ``readStream`` (file source, availableNow trigger, memory
sink) and as a batch query; the driver's oracle checks the batch-equivalent
SQL. Session windows use the built-in ``session_window`` (batch mode here;
tests run the streaming variant with a watermark).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..io import epoch_long_to_ts_ntz, load_table, session_memo

EVENTS_RAW_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),  # INT64 TIMESTAMP(NANOS) read as long
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def _normalize_ts(df: DataFrame) -> DataFrame:
    # The streaming parquet reader's long value for INT64 TIMESTAMP(NANOS)
    # is version-dependent (PySpark 4.1 yields µs and ignores nanosAsLong;
    # earlier readers yield ns). Shared magnitude-based detection with the
    # batch seam — the two paths can never diverge again.
    return df.withColumn("ts", epoch_long_to_ts_ntz(F.col("ts")))


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source streaming read of the events table (schema pinned —
    streaming sources don't infer)."""
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        # file streaming source wants a directory; glob-filter to the events
        # table inside the sf dir
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return _normalize_ts(raw)


def _batch_events_count(spark: SparkSession, sf_dir: str) -> int:
    """Row count of the same file the stream reads — the drain-sanity
    denominator. Cached per (session, dir): the count never changes for a
    given testdata dir, and streaming queries run in bench loops."""
    return session_memo(spark, "_sg_events_count", sf_dir,
                        lambda: load_table(spark, sf_dir, "events").count())


try:
    from pyspark.sql.streaming import StreamingQueryListener as _SQL_Listener

    class _DrainCounter(_SQL_Listener):
        """Per-query-id numInputRows accumulator. Keyed by query id so
        concurrent streams (tests run several per session) don't mix;
        onQueryProgress fires once per microbatch, unbounded."""

        def __init__(self):
            self._rows: dict[str, int] = {}

        def onQueryStarted(self, event):  # noqa: N802 (listener API names)
            pass

        def onQueryProgress(self, event):  # noqa: N802
            p = event.progress
            self._rows[str(p.id)] = self._rows.get(str(p.id), 0) + int(p.numInputRows)

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

        def rows_for(self, qid: str) -> int:
            return self._rows.get(qid, 0)
except ImportError:  # pragma: no cover — very old pyspark
    _DrainCounter = None  # type: ignore[assignment,misc]


def _run_available_now(result: DataFrame, spark: SparkSession,
                       *, expected_input_rows: int | None = None) -> DataFrame:
    """Drain an availableNow streaming query into a complete-mode memory
    sink and return the materialized table. (The update-mode consumers —
    stateful totals, stream-stream join — manage their own sinks: their
    snapshot semantics differ per mode.)

    When ``expected_input_rows`` is given, assert the drained source row
    count matches it — a silent unit/row drop at the source (the r03
    regression class) fails loudly here instead of producing a
    wrong-but-plausible aggregate.
    """
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    # Row accounting via a StreamingQueryListener accumulating
    # numInputRows per progress EVENT — unlike summing q.recentProgress,
    # which is a BOUNDED buffer (numRecentProgressUpdates, default 100)
    # and silently undercounts past it, the listener sees every
    # microbatch no matter how many the source splits into.
    listener = _DrainCounter() if _DrainCounter is not None else None
    if listener is not None:
        try:
            spark.streams.addListener(listener)
        except Exception:
            listener = None  # listener API unavailable — skip the assert
    try:
        q = (
            result.writeStream.format("memory").queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if expected_input_rows is not None and listener is not None:
            # listener events arrive on a separate JVM->Python delivery
            # thread and can lag awaitTermination — poll until the count
            # settles, WHILE the listener is still registered (removing it
            # first would drop the very in-flight events the poll waits
            # for); the timeout only bites on a genuine mismatch
            deadline = time.monotonic() + 15.0
            drained = listener.rows_for(str(q.id))
            # 10 ms poll: progress events land a few ms after
            # awaitTermination, and a 100 ms step was charging every
            # drain 0.2-0.3 s of pure sleep (measured r15 — 2-3 polls
            # per run); the deadline only bites on a real mismatch
            while drained != expected_input_rows and time.monotonic() < deadline:
                time.sleep(0.01)
                drained = listener.rows_for(str(q.id))
            if drained != expected_input_rows:
                raise AssertionError(
                    f"streaming drain mismatch: sources delivered {drained} rows, "
                    f"batch read of the same file has {expected_input_rows}"
                )
    finally:
        if listener is not None:
            spark.streams.removeListener(listener)
    return spark.table(name)


def q_stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation executed as a REAL streaming
    query (readStream → window agg → availableNow → memory sink).

    Epoch-aligned 1h tumbling windows == date_trunc('hour') — the oracle's
    batch equivalence. Watermark bounds state at 2h; with availableNow over
    a static file it does not drop anything.
    """
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    out = _run_available_now(agg, spark,
                             expected_input_rows=_batch_events_count(spark, sf_dir))
    return out.select(
        F.date_format(F.col("w.start").cast("timestamp_ntz"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n_events", "total_value",
    )


Q_STREAM_TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1
"""


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in session_window (30-min gap) per user — batch mode, same
    operator Structured Streaming uses with state + watermark (streaming
    variant exercised in tests/test_streaming.py).

    session end = last event + gap, so the oracle reproduces it with the
    lag-gap island technique + max(ts) + INTERVAL.
    """
    ev = load_table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start").cast("timestamp_ntz"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("sw.end").cast("timestamp_ntz"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events", "total_value",
        )
    )


Q_SESSION_WINDOW_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1
              ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S')                      AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value
FROM sess GROUP BY user_id, session_seq
"""


def q_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour window, 1-hour slide, per event_type — as a REAL
    streaming query. Each event lands in exactly two epoch-aligned windows:
    [trunc(ts)-1h, +2h) and [trunc(ts), +2h) — which is how the batch
    oracle reproduces the assignment (unnest of the two starts)."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "3 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    out = _run_available_now(agg, spark,
                             expected_input_rows=_batch_events_count(spark, sf_dir))
    return out.select(
        F.date_format(F.col("w.start").cast("timestamp_ntz"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n_events", "total_value",
    )


Q_STREAM_SLIDING_SQL = """
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value
FROM (SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                     date_trunc('hour', ts)]) AS ws,
             event_type, value
      FROM events)
GROUP BY 1, 2
"""


STATEFUL_OUT_SCHEMA = (
    "user_id LONG, n_events LONG, total_value DOUBLE, n_purchases LONG"
)
STATEFUL_STATE_SCHEMA = "n LONG, total DOUBLE, purchases LONG"


def _stateful_update(key, pdf_iter, state):
    """applyInPandasWithState update fn: per-user running totals carried in
    GroupState across microbatches. Pure-Python per group, Arrow-batched —
    the custom-stateful-operator seam for logic window aggs can't express
    (here a multi-metric accumulator; in production e.g. CEP or per-entity
    model state)."""
    import pandas as pd

    n, total, purchases = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        purchases += int((pdf["event_type"] == "purchase").sum())
    state.update((n, total, purchases))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "total_value": [round(total, 2)],
        "n_purchases": [purchases],
    })


def q_stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (count, value total, purchase count) state updated per
    microbatch. With availableNow over the static table the final state
    equals the batch aggregation — the oracle's equivalence.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = read_events_stream(spark, sf_dir)
    out = (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            _stateful_update,
            outputStructType=STATEFUL_OUT_SCHEMA,
            stateStructType=STATEFUL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode may emit a row per microbatch per user; keep the final
    # (max n_events) state per user
    snap = spark.table(name)
    from pyspark.sql import Window as W
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        snap.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value", "n_purchases")
    )


Q_STREAM_STATEFUL_SQL = """
SELECT user_id,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
FROM events GROUP BY user_id
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication with watermarked state: ``dropDuplicates``
    on (event_id) keeps one row per id across microbatches, state evicted
    past the watermark — the exactly-once ingest pattern for at-least-once
    sources. Events are unique here, so dedup-then-aggregate equals the
    batch aggregate (the oracle); the dedup operator in the plan is the
    point.
    """
    ev = read_events_stream(spark, sf_dir)
    deduped = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    out = _run_available_now(agg, spark,
                             expected_input_rows=_batch_events_count(spark, sf_dir))
    return out.orderBy("event_type")


Q_STREAM_DEDUP_SQL = """
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM (SELECT DISTINCT ON (event_id) event_id, event_type, value FROM events)
GROUP BY event_type ORDER BY event_type
"""


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: signup events joined to the same user's
    purchase events within the following 2 hours — state kept on BOTH sides,
    bounded by the watermarks + the interval condition (the planner derives
    the state eviction from them). availableNow over the static table makes
    the append output equal the batch interval join (the oracle).
    """
    s = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "signup") \
        .select("user_id", F.col("ts").cast("timestamp").alias("s_ts"),
                F.col("event_id").alias("signup_id")) \
        .withWatermark("s_ts", "1 hour")
    p = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase") \
        .select(F.col("user_id").alias("p_user"), F.col("ts").cast("timestamp").alias("p_ts"),
                F.col("event_id").alias("purchase_id")) \
        .withWatermark("p_ts", "1 hour")
    joined = s.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 2 HOURS")),
    )
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "user_id", "signup_id", "purchase_id",
        F.date_format(F.col("s_ts").cast("timestamp_ntz"), "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
        F.date_format(F.col("p_ts").cast("timestamp_ntz"), "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


Q_STREAM_STREAM_JOIN_SQL = """
SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id,
       strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'signup') s
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = s.user_id
 AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 2 HOUR
"""


# Queries whose CONSTRUCTION executes an availableNow drain (building the
# DataFrame runs the stream); a post-hoc .explain of their return value
# would show only the memory-sink scan. stream_session_window is absent on
# purpose — it is the batch twin (pure load_table plan, explainable).
DRAIN_ON_BUILD_KEYS = frozenset({
    "stream_tumbling_hourly", "stream_sliding_window",
    "stream_stateful_totals", "stream_stream_join", "stream_dedup",
    "stream_dedup_gate",
})

DOCS_RAW_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

# Which documents play the "incoming" role in the streaming dedup gate:
# doc_id % 10 == 7 arrives as a stream, the rest is the static corpus.
GATE_MOD, GATE_REM = 10, 7


def q_stream_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-duplicate ADMISSION GATE — the incremental form of
    minhash-LSH dedup a training-data pipeline actually deploys: new
    documents arrive as a stream, are shingled/minhashed/banded with the
    SAME column expressions as the batch operator (dedup.minhash_bands),
    and stream-static-join against the persisted corpus band relation;
    band hits verify with exact Jaccard against the corpus shingles.
    Emits (new_doc_id, dup_of, jaccard) for incoming docs that near-dup an
    existing corpus doc — the rows an ingest pipeline would quarantine.

    Plan shape: stateless stream projections → stream-static equi-join on
    (band_idx, bk) → stateful dropDuplicates (pair-level, availableNow
    drains it in one batch) → stream-static verify join. The corpus side
    is the session-persisted shingle relation, so at scale this is the
    'LSH index as a table, stream probes it' architecture. Oracle: the
    identical pair set computed batch-side in DuckDB.
    """
    from .dedup import (JACCARD_THRESHOLD_PPM, _shingle_rel, _shingles,
                        exact_jaccard_ppm, jaccard_companions, minhash_bands)

    raw = (
        spark.readStream.schema(DOCS_RAW_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    inc = raw.filter((F.col("doc_id") % GATE_MOD) == GATE_REM) \
        .select("doc_id", _shingles(F.col("text")).alias("shingles")) \
        .filter(F.size("shingles") > 0)
    # carry the shingle array through the band explode: the verify step
    # can't join back to another streaming relation (that would be an
    # unbounded stream-stream join), so the stream side carries its own
    inc_bands = minhash_bands(inc, carry=["shingles"]).select(
        F.col("doc_id").alias("new_doc_id"),
        F.col("shingles").alias("sh_new"), "band_idx", "bk")

    corpus = _shingle_rel(spark, sf_dir) \
        .filter((F.col("doc_id") % GATE_MOD) != GATE_REM) \
        .filter(F.size("shingles") > 0)
    corp_bands = minhash_bands(corpus).select(
        F.col("doc_id").alias("dup_of"), "band_idx", "bk")

    cand = (
        inc_bands.join(corp_bands, ["band_idx", "bk"])
        .select("new_doc_id", "sh_new", "dup_of")
        .dropDuplicates(["new_doc_id", "dup_of"])
    )
    corp_sh = corpus.select(F.col("doc_id").alias("dup_of"),
                            F.col("shingles").alias("sh_old"))
    scored = (
        cand.join(corp_sh, "dup_of")
        .withColumn("jaccard_ppm",
                    exact_jaccard_ppm(F.col("sh_new"), F.col("sh_old")))
        .filter(F.col("jaccard_ppm") >= JACCARD_THRESHOLD_PPM)
        .select("new_doc_id", "dup_of",
                *jaccard_companions(F.col("sh_new"), F.col("sh_old")),
                "jaccard_ppm")
    )
    name = f"gate_{uuid.uuid4().hex[:8]}"
    q = (
        scored.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(name)


def _gate_sql() -> str:
    from .dedup import (_MINHASH_CTES, JACCARD_THRESHOLD_PPM,
                        jaccard_companions_sql, jaccard_ppm_sql)
    jac = jaccard_ppm_sql("sa", "sb")
    return f"""
WITH {_MINHASH_CTES}, gate AS (
  SELECT DISTINCT i.doc_id AS new_doc_id, c.doc_id AS dup_of
  FROM slim i JOIN slim c
    ON i.band_idx = c.band_idx AND i.bk = c.bk
  WHERE i.doc_id % {GATE_MOD} = {GATE_REM} AND c.doc_id % {GATE_MOD} <> {GATE_REM}
)
SELECT new_doc_id, dup_of, {jaccard_companions_sql('sa', 'sb')},
       {jac} AS jaccard_ppm
FROM gate
JOIN sh sa ON sa.doc_id = new_doc_id
JOIN sh sb ON sb.doc_id = dup_of
WHERE {jac} >= {JACCARD_THRESHOLD_PPM}
"""


Q_STREAM_DEDUP_GATE_SQL = _gate_sql()


# --- continuous top-k: CMS + bounded candidate ledger (r09) -----------------
TOPK_NSLICES = 4   # deterministic microbatch stand-in: slice = event_id % 4


def q_stream_topk_continuous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing "top talkers per day" — the batch twin of the streaming
    store's ``read_topk`` (streaming/sketch.py): candidates are the UNION
    of each microbatch-slice's exact per-day top-TOPK_CAND keys, scores
    are CMS estimates from the folded per-day sketch, and the report is
    the per-day top-3 by estimated total count (exact count + overcount
    ride along as the differential ground truth).

    Slices here are the deterministic ``event_id % TOPK_NSLICES`` so the
    oracle can rebuild the identical candidate ledger; the real
    microbatch form (one delta per Structured Streaming batch id, same
    algebra) is exercised against this construction in
    tests/test_streaming_sketch.py. The folded sketch is built directly
    from the corpus — cell-for-cell equal to the sum of per-slice
    sketches by CMS additivity, which that test also asserts.

    Scale: the sketch is |days|×d×w cells (config × calendar, not data);
    the candidate ledger is ≤ slices×days×TOPK_CAND rows and broadcast
    to probe; per-slice candidate selection is one keyed shuffle with a
    bounded row_number window. Raw keys never rank globally — only the
    candidate union does, and it is bounded by construction.
    """
    from pyspark.sql.window import Window as W

    from ..streaming.sketch import TOPK_CAND
    from .profiling import (CMS_GROUP_TOPK, _cms_bucket, _cms_rows,
                            cms_sketch_grouped)

    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
          .select((F.col("event_id") % TOPK_NSLICES).alias("slice"),
                  F.date_format(F.date_trunc("day", F.col("ts")),
                                "yyyy-MM-dd").alias("day"),
                  F.col("user_id").cast("long").alias("k"))
          # three consumers (sketch, slice candidates, exact counts) —
          # materialize the narrow projection once (scan-multiplicity rule)
          .localCheckpoint(eager=True))
    sketch = cms_sketch_grouped(ev.select("day", "k"), group="day")
    slice_cnt = ev.groupBy("slice", "day", "k").agg(
        F.count(F.lit(1)).alias("n"))
    cand = (slice_cnt.withColumn("rn", F.row_number().over(
        W.partitionBy("slice", "day").orderBy(F.desc("n"), F.asc("k"))))
        .filter(F.col("rn") <= TOPK_CAND)
        .select("day", "k").dropDuplicates(["day", "k"]))
    probe = (cand.select("day", "k", F.explode(_cms_rows()).alias("r"))
             .select("day", "k", F.col("r.d").alias("d"),
                     _cms_bucket(F.col("k"), F.col("r.a"),
                                 F.col("r.b")).alias("bucket")))
    est = (sketch.join(F.broadcast(probe), ["day", "d", "bucket"])
           .groupBy("day", "k").agg(F.min("c").alias("est_n")))
    exact = ev.groupBy("day", "k").agg(F.count(F.lit(1)).alias("exact_n"))
    ranked = (est.join(exact, ["day", "k"])
              .withColumn("rnk", F.row_number().over(
                  W.partitionBy("day").orderBy(F.desc("est_n"), F.asc("k")))))
    return (ranked.filter(F.col("rnk") <= CMS_GROUP_TOPK)
            .select("day",
                    F.col("k").alias("user_id"),
                    "exact_n",
                    F.col("est_n").cast("long").alias("est_n"),
                    (F.col("est_n") - F.col("exact_n")).cast("long")
                    .alias("overcount"),
                    F.col("rnk").cast("long").alias("rnk"))
            .orderBy("day", "rnk"))


def _topk_continuous_sql() -> str:
    from ..streaming.sketch import TOPK_CAND
    from .profiling import (CMS_A, CMS_B, CMS_D, CMS_GROUP_TOPK, CMS_P,
                            CMS_W)
    params = ", ".join(f"({i}, {CMS_A[i]}, {CMS_B[i]})" for i in range(CMS_D))
    return f"""
WITH params AS (
  SELECT * FROM (VALUES {params}) AS t(d, a, b)
), ev AS MATERIALIZED (
  SELECT event_id % {TOPK_NSLICES} AS slice,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         user_id AS k
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), sketch AS MATERIALIZED (
  SELECT day, d, ((a * k + b) % {CMS_P}) % {CMS_W} AS bucket, count(*) AS c
  FROM ev CROSS JOIN params GROUP BY 1, 2, 3
), slice_cnt AS (
  SELECT slice, day, k, count(*) AS n FROM ev GROUP BY 1, 2, 3
), cand AS (
  SELECT DISTINCT day, k FROM (
    SELECT slice, day, k,
           row_number() OVER (PARTITION BY slice, day
                              ORDER BY n DESC, k) AS rn
    FROM slice_cnt)
  WHERE rn <= {TOPK_CAND}
), probe AS (
  SELECT c.day, c.k, p.d, ((p.a * c.k + p.b) % {CMS_P}) % {CMS_W} AS bucket
  FROM cand c CROSS JOIN params p
), est AS (
  SELECT pr.day, pr.k, min(s.c) AS est_n
  FROM probe pr JOIN sketch s USING (day, d, bucket)
  GROUP BY 1, 2
), exact AS (
  SELECT day, k, count(*) AS exact_n FROM ev GROUP BY 1, 2
), ranked AS (
  SELECT e.day, e.k, x.exact_n, e.est_n,
         row_number() OVER (PARTITION BY e.day
                            ORDER BY e.est_n DESC, e.k) AS rnk
  FROM est e JOIN exact x ON x.day = e.day AND x.k = e.k
)
SELECT day, k AS user_id,
       CAST(exact_n AS BIGINT) AS exact_n,
       CAST(est_n AS BIGINT) AS est_n,
       CAST(est_n - exact_n AS BIGINT) AS overcount,
       CAST(rnk AS BIGINT) AS rnk
FROM ranked
WHERE rnk <= {CMS_GROUP_TOPK}
ORDER BY day, rnk
"""


Q_STREAM_TOPK_SQL = _topk_continuous_sql()


QUERIES = {
    "stream_tumbling_hourly": q_stream_tumbling_hourly,
    "stream_sliding_window": q_stream_sliding_window,
    "stream_session_window": q_session_window,
    "stream_stateful_totals": q_stream_stateful_totals,
    "stream_stream_join": q_stream_stream_join,
    "stream_dedup": q_stream_dedup,
    "stream_dedup_gate": q_stream_dedup_gate,
    "stream_topk_continuous": q_stream_topk_continuous,
}

ORACLE = {
    "stream_tumbling_hourly": Q_STREAM_TUMBLING_SQL,
    "stream_sliding_window": Q_STREAM_SLIDING_SQL,
    "stream_session_window": Q_SESSION_WINDOW_SQL,
    "stream_stateful_totals": Q_STREAM_STATEFUL_SQL,
    "stream_stream_join": Q_STREAM_STREAM_JOIN_SQL,
    "stream_dedup": Q_STREAM_DEDUP_SQL,
    "stream_dedup_gate": Q_STREAM_DEDUP_GATE_SQL,
    "stream_topk_continuous": Q_STREAM_TOPK_SQL,
}
