"""Battery entry that runs a real Structured Streaming pipeline.

The stream is driven with ``availableNow`` over a staged copy of the
events table and aggregated in complete mode — which must equal the
batch tumbling-window aggregation, so this streaming query gets a full
SQL oracle (same as events_tumbling_1h) rather than a rows-only check.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark import streaming as S
from implementation_of_an_etl_process_spark.sources.parquet import read_table
from implementation_of_an_etl_process_spark.queries.relational import (
    EVENTS_TUMBLING_SQL,
    normalize_event_ts,
)


def await_or_raise(q, timeout: int = 540) -> None:
    """awaitTermination returns False on timeout WITHOUT stopping the
    query — silently reading the memory sink then would hand the driver
    gate a partial table (and rmtree the staged source under a live
    query). Stop and raise loudly instead; every streaming entry funnels
    through here so the timeout policy lives in one place."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"streaming entry did not drain within {timeout}s "
            "(host contention? see BASELINE_NOTES.md)"
        )


def streaming_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stage the events table as a streaming file source (ts re-encoded
    # to micros: the streaming scan declares TimestampType and cannot
    # use the batch nanosAsLong fallback).
    stage = tempfile.mkdtemp(prefix="events_stream_")
    try:
        (
            normalize_event_ts(read_table(spark, sf_dir, "events"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
        q = (
            S.tumbling_counts(
                S.read_events_stream(spark, stage), exact_sums=True
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q)
        return (
            spark.table(name)
            .select(
                F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "event_type",
                "n_events",
                "total_value",
            )
            .orderBy("window_start", "event_type")
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def streaming_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (view->purchase attribution within
    1 hour), driven availableNow — with everything processed, the
    append-mode result must equal the batch range join, giving the
    stateful two-stream operator a full SQL oracle."""
    stage = tempfile.mkdtemp(prefix="events_attrib_")
    try:
        (
            normalize_event_ts(read_table(spark, sf_dir, "events"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        stream = S.read_events_stream(spark, stage)
        name = f"stream_attrib_{uuid.uuid4().hex[:8]}"
        q = (
            S.attribution_join(
                stream.filter(F.col("event_type") == "view"),
                stream.filter(F.col("event_type") == "purchase"),
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q)
        return (
            spark.table(name)
            .select(
                "user_id",
                "purchase_id",
                "view_id",
                F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
                    "purchase_ts"
                ),
                F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias(
                    "view_ts"
                ),
            )
            .orderBy("purchase_id", "view_id")
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


STREAMING_ATTRIBUTION_SQL = """
SELECT v.user_id,
       p.event_id AS purchase_id,
       v.event_id AS view_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL 1 HOUR
ORDER BY purchase_id, view_id
"""


def streaming_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) under the
    driver gate: after availableNow drains the source, each user's LAST
    update-mode emission is the final running total, which must equal
    the batch aggregate — value sums rounded to 4dp on both sides
    (python accumulates sequentially per batch; the oracle in one pass;
    identical up to summation order)."""
    from pyspark.sql import Window as W

    stage = tempfile.mkdtemp(prefix="events_totals_")
    try:
        (
            normalize_event_ts(read_table(spark, sf_dir, "events"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        name = f"stream_totals_{uuid.uuid4().hex[:8]}"
        q = (
            S.running_user_totals(S.read_events_stream(spark, stage))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q)
        w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
        return (
            spark.table(name)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "user_id",
                "n_events",
                F.round("total_value", 4).alias("total_value"),
            )
            .orderBy("user_id")
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


STREAMING_USER_TOTALS_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       ROUND(SUM(COALESCE(value, 0.0)), 4) AS total_value
FROM events GROUP BY user_id ORDER BY user_id
"""


def streaming_sliding_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h window / 15m slide): every event lands in
    exactly 4 overlapping epoch-aligned windows — the oracle rebuilds
    that expansion with a generated offset join."""
    stage = tempfile.mkdtemp(prefix="events_sliding_")
    try:
        (
            normalize_event_ts(read_table(spark, sf_dir, "events"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        name = f"stream_sliding_{uuid.uuid4().hex[:8]}"
        q = (
            S.sliding_counts(S.read_events_stream(spark, stage))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q)
        return (
            spark.table(name)
            .select(
                F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "event_type",
                "n_events",
            )
            .orderBy("window_start", "event_type")
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


STREAMING_SLIDING_SQL = """
WITH expanded AS (
  SELECT strftime(
           time_bucket(INTERVAL '15 minutes', ts)
             - i * INTERVAL '15 minutes',
           '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type
  FROM events, unnest([0, 1, 2, 3]) AS t(i)
)
SELECT window_start, event_type, COUNT(*) AS n_events
FROM expanded GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark under the driver gate: the source
    dir is staged with the events table TWICE (every event a perfect
    duplicate); after availableNow drains it, the deduped append-mode
    output must equal the original table exactly — full SQL oracle.
    State stays bounded by the watermark horizon at real scale."""
    stage = tempfile.mkdtemp(prefix="events_dedup_")
    try:
        ev = normalize_event_ts(
            read_table(spark, sf_dir, "events")
        ).coalesce(1)
        ev.write.mode("overwrite").parquet(stage)
        ev.write.mode("append").parquet(stage)
        name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
        q = (
            S.dedupe_stream(S.read_events_stream(spark, stage))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q)
        return (
            spark.table(name)
            .select("event_id", "user_id", "event_type", "value")
            .orderBy("event_id")
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


STREAMING_DEDUP_SQL = """
SELECT event_id, user_id, event_type, value
FROM events ORDER BY event_id
"""


def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based SESSION windows as a streaming aggregation (the one
    stateful window family the battery's streaming entries lacked),
    driven availableNow in complete mode so every session is emitted
    and the result equals batch sessionization — which gives the
    session-window operator a full SQL oracle: DuckDB reproduces the
    sessions with the lag/gap-flag/cumulative-sum islands technique.
    A new session starts when the gap since the previous event is
    >= 30 minutes (Spark merges an event iff it lands strictly inside
    prev_ts + gap); session_end = last event + gap."""
    stage = tempfile.mkdtemp(prefix="events_session_")
    try:
        (
            normalize_event_ts(read_table(spark, sf_dir, "events"))
            .filter(F.col("user_id") < 200)  # bounded output
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        name = f"stream_session_{uuid.uuid4().hex[:8]}"
        q = (
            S.session_windows(
                S.read_events_stream(spark, stage), exact_sums=True
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q)
        return (
            spark.table(name)
            .select(
                "user_id",
                F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
                    "session_start"
                ),
                F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias(
                    "session_end"
                ),
                "n_events",
                "total_value",
            )
            .orderBy("user_id", "session_start")
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


STREAMING_SESSION_SQL = """
WITH e AS (
  SELECT user_id, ts, value FROM events WHERE user_id < 200
), flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM e
), sess AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
         AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""




def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus ingestion with stateful dedup: the documents
    table is staged as 5 batch files (batch = ntile(5) over doc_id
    order — robust to 1-based or sparse ids, unlike floor(doc_id/bs);
    mtimes ascending) and consumed by a real file-source stream with
    ``maxFilesPerTrigger=1`` + ``availableNow``; ``foreachBatch``
    classifies each micro-batch against the PERSISTED dedup index and
    appends it in ONE fused step (`operators/dedup.py::ingest_batch` —
    the batch's md5/banding relations are derived once and shared
    between the probe and the append), then appends the batch to the
    corpus store — the steady-state crawl-ingest loop as an actual
    Structured Streaming pipeline.

    Driver-free data path: per-batch verdicts are APPENDED TO A PARQUET
    SINK inside ``foreachBatch`` (the production pattern — the verdict
    stream is itself a table) and the returned frame reads that sink;
    verdict rows never accumulate on the driver.

    Exact oracle: a doc's verdict depends only on the batches before
    its own (batch membership is a pure function of the doc_id order),
    so DuckDB recomputes all three tiers brute-force against
    earlier-batch docs using the same NTILE(5) assignment.
    """
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from implementation_of_an_etl_process_spark.operators import dedup as D

    docs = read_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="stream_ingest_")
    stage = os.path.join(root, "incoming")
    idx = os.path.join(root, "index")
    store = os.path.join(root, "corpus")
    sink = os.path.join(root, "verdicts")
    os.makedirs(stage)
    try:
        # one parquet FILE per batch, mtimes ascending so the file
        # source (oldest-first) replays them in batch order. The
        # single-partition ntile window is STAGING-ONLY code (slicing a
        # test table into arrival batches); production batches arrive
        # by time and never need it.
        batched = docs.withColumn(
            "_batch", F.ntile(5).over(Window.orderBy("doc_id")) - 1
        ).localCheckpoint(eager=True)
        t0 = 1_700_000_000
        for b in range(5):
            src_dir = os.path.join(root, f"tmp_{b}")
            (
                batched.filter(F.col("_batch") == b)
                .drop("_batch")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(src_dir)
            )
            fname = next(
                f for f in os.listdir(src_dir) if f.endswith(".parquet")
            )
            dst = os.path.join(stage, f"batch_{b}.parquet")
            shutil.move(os.path.join(src_dir, fname), dst)
            os.utime(dst, (t0 + b, t0 + b))
            shutil.rmtree(src_dir, ignore_errors=True)

        state = {"batches": 0}

        def handle(batch_df, batch_id):
            # pin the micro-batch rows once: classification, the index
            # append, and the corpus-store append each re-consume them
            batch_df = batch_df.localCheckpoint(eager=True)
            if state["batches"] == 0:
                batch_df.select(
                    "doc_id", F.lit("novel").alias("verdict")
                ).write.mode("append").parquet(sink)
                D.write_dedup_index(batch_df, idx, "doc_id", "text")
            else:
                # fused classify-and-append: ONE shared md5/banding
                # derivation for the probe and the index append.
                # Verdicts reach the SINK through the writer hook,
                # BEFORE the index append lands — foreachBatch is
                # at-least-once, and a replay after the append would
                # otherwise classify the batch against itself (every
                # row 'exact'). With this ordering a replay can only
                # duplicate identical verdict rows, never flip them.
                hist = spark.read.parquet(store)
                D.ingest_batch(
                    spark,
                    idx,
                    hist,
                    batch_df,
                    "doc_id",
                    "text",
                    verdict_writer=lambda v: v.write.mode("append").parquet(
                        sink
                    ),
                )
            batch_df.write.mode("append").parquet(store)
            state["batches"] += 1

        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
            .writeStream.foreachBatch(handle)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q)
        assert state["batches"] == 5, f"expected 5 micro-batches, got {state['batches']}"
        return read_verdict_sink(spark, sink)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def read_verdict_sink(spark: SparkSession, sink: str) -> DataFrame:
    """Consumer-side read of a verdict parquet sink, completing the
    at-least-once contract: ``foreachBatch`` replays may APPEND
    duplicate verdict rows, but the writer-hook ordering guarantees a
    replayed row is IDENTICAL to the original (the verdict frame is
    pinned before the index append — ``operators/dedup.py::
    ingest_batch`` and the kill-test in tests/test_incremental_dedup),
    so dedup-by-id restores exactly-once semantics downstream.  The
    sink's rows are pinned into Spark-managed local storage
    (localCheckpoint) because battery callers delete the temp sink
    before the frame is consumed; the sort stays lazy on top."""
    return (
        spark.read.parquet(sink)
        .select(F.col("doc_id").cast("long"), "verdict")
        .dropDuplicates(["doc_id"])
        .localCheckpoint(eager=True)
        .orderBy("doc_id")
    )


STREAMING_INCR_DEDUP_SQL = r"""
WITH d AS (
  SELECT doc_id, text, NTILE(5) OVER (ORDER BY doc_id) - 1 AS batch
  FROM documents
), ex AS (
  SELECT a.doc_id FROM d a
  WHERE EXISTS (
    SELECT 1 FROM d h
    WHERE h.batch < a.batch
      AND md5(lower(trim(h.text))) = md5(lower(trim(a.text)))
  )
), toks AS (
  SELECT doc_id, batch, regexp_split_to_array(trim(text), '\s+') AS ts
  FROM d
), sh AS (
  SELECT doc_id, batch,
         unnest(list_distinct(
           [ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
            FOR i IN range(1, len(ts) - 1)]
         )) AS shingle
  FROM toks WHERE len(ts) >= 3
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), nearp AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND b.batch < a.batch
  GROUP BY 1, 2
), near AS (
  SELECT DISTINCT id_a AS doc_id
  FROM nearp JOIN sizes s1 ON id_a = s1.doc_id
             JOIN sizes s2 ON id_b = s2.doc_id
  WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8
)
SELECT d.doc_id,
       CASE WHEN ex.doc_id IS NOT NULL THEN 'exact'
            WHEN nr.doc_id IS NOT NULL THEN 'near'
            ELSE 'novel' END AS verdict
FROM d
LEFT JOIN ex ON d.doc_id = ex.doc_id
LEFT JOIN near nr ON d.doc_id = nr.doc_id
ORDER BY d.doc_id
"""


def streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless streaming corpus filter: Gopher-style repetition gates
    applied INSIDE the micro-batch via `operators/pretrain.py::
    repetition_stats(mode="narrow")` — the exchange-free mode exists
    exactly for this context: pure Column/HOF expressions, so the
    stream needs no state store, no watermark, no shuffle, and runs in
    append mode end-to-end. Keeps docs with n_words >= 5,
    top_word_frac <= 0.10, dup_3gram_frac <= 0.2; the oracle applies
    the identical gates in batch SQL (same integer counts and double
    divisions as the green `repetition_stats_docs` mirror)."""
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        repetition_stats,
    )

    batch = read_table(spark, sf_dir, "documents")
    stage = tempfile.mkdtemp(prefix="docs_stream_")
    try:
        batch.select("doc_id", "text").coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(stage)
        )
        kept = repetition_stats(stream, mode="narrow").filter(
            (F.col("n_words") >= 5)
            & (F.col("top_word_frac") <= 0.10)
            & (F.col("dup_3gram_frac") <= 0.2)
        )
        name = f"stream_qgate_{uuid.uuid4().hex[:8]}"
        q = (
            kept.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q)
        return spark.table(name).orderBy("doc_id")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


STREAMING_QUALITY_GATE_SQL = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), tri AS (
  SELECT doc_id,
         GREATEST(len(w) - 2, 0) AS _n3,
         GREATEST(len(w) - 2, 0)
           - len(list_distinct(list_transform(
               generate_series(1, len(w) - 2),
               i -> array_to_string(w[i:i+2], ' ')))) AS _d3
  FROM base
), per_word AS (
  SELECT doc_id, word, COUNT(*) AS _c
  FROM (SELECT doc_id, unnest(w) AS word FROM base)
  GROUP BY 1, 2
), ranked AS (
  SELECT doc_id, _c,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY _c DESC, word ASC) AS _rn
  FROM per_word
), agg AS (
  SELECT doc_id, SUM(_c) AS n_words,
         MAX(CASE WHEN _rn = 1 THEN _c END) AS _top1,
         SUM(CASE WHEN _rn <= 2 THEN _c END) AS _top2
  FROM ranked GROUP BY doc_id
), stats AS (
  SELECT a.doc_id, CAST(n_words AS BIGINT) AS n_words,
         _top1 * 1.0 / n_words AS top_word_frac,
         _top2 * 1.0 / n_words AS top2_word_frac,
         CASE WHEN _n3 > 0 THEN _d3 * 1.0 / _n3 ELSE 0.0 END
           AS dup_3gram_frac
  FROM agg a JOIN tri t ON a.doc_id = t.doc_id
)
SELECT doc_id, n_words, top_word_frac, top2_word_frac, dup_3gram_frac
FROM stats
WHERE n_words >= 5 AND top_word_frac <= 0.10 AND dup_3gram_frac <= 0.2
ORDER BY doc_id
"""


QUERIES = {
    "streaming_dedup_events": streaming_dedup_events,
    "streaming_incremental_dedup": streaming_incremental_dedup,
    "streaming_session_windows": streaming_session_windows,
    "streaming_tumbling_1h": streaming_tumbling_1h,
    "streaming_attribution_join": streaming_attribution_join,
    "streaming_user_totals": streaming_user_totals,
    "streaming_sliding_15m": streaming_sliding_15m,
    "streaming_quality_gate": streaming_quality_gate,
}
ORACLES = {
    "streaming_dedup_events": STREAMING_DEDUP_SQL,
    "streaming_incremental_dedup": STREAMING_INCR_DEDUP_SQL,
    "streaming_session_windows": STREAMING_SESSION_SQL,
    "streaming_tumbling_1h": EVENTS_TUMBLING_SQL,
    "streaming_attribution_join": STREAMING_ATTRIBUTION_SQL,
    "streaming_user_totals": STREAMING_USER_TOTALS_SQL,
    "streaming_sliding_15m": STREAMING_SLIDING_SQL,
    "streaming_quality_gate": STREAMING_QUALITY_GATE_SQL,
}
