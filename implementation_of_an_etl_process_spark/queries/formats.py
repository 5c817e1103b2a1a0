"""Battery entries: non-parquet source formats (JSON lines, ORC, XML).

Each entry STAGES a table into the format under test with Spark's
writer, re-reads it with an explicit schema (no inference — SURVEY §1.3
discipline), and aggregates; the oracle is plain SQL over the original
parquet, so a round-trip corruption in either the writer or the reader
breaks the hash. Staging is Spark-side and partition-parallel — at
100 TB these are the same `spark.read.json/orc` scans with pushdown and
pruning, not a special path.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from implementation_of_an_etl_process_spark.sources.parquet import read_table

_WORKDIR = "/tmp/implementation_of_an_etl_process_formats"

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)


def _source_tag(sf_dir: str, table: str = "orders") -> str:
    """Cache key for a staged copy: path PLUS a content fingerprint
    (size + mtime of every part file) of the source parquet — of the
    TABLE the stage is derived from, so e.g. a documents-only
    regeneration invalidates documents-derived stages. The driver
    regenerates /root/testdata in place between rounds, so a
    path-only key would silently reuse a stage of the OLD data."""
    src = os.path.join(os.path.abspath(sf_dir), f"{table}.parquet")
    parts = [src] if os.path.isfile(src) else [
        os.path.join(src, f) for f in sorted(os.listdir(src))
    ]
    h = hashlib.md5(src.encode())
    for p in parts:
        st = os.stat(p)
        h.update(f"|{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:12]


def _evict_stale_stages(prefix: str, tag: str, *, min_age_s: int = 3600) -> None:
    """The content-fingerprint keys make stale reuse impossible but
    would accumulate one staged copy per testdata generation (the
    driver regenerates /root/testdata between rounds). Evict only
    SIBLING GENERATIONS of the stage being requested — same name
    prefix, different 12-hex tag — and only when older than
    ``min_age_s``, so a concurrent run against another sf_dir (whose
    stages share the workdir but carry different tags) is never
    deleted mid-read and unrelated stages are never touched."""
    import re
    import shutil
    import time

    if not os.path.isdir(_WORKDIR):
        return
    now = time.time()
    pat = re.compile(re.escape(prefix) + r"([0-9a-f]{12})\.")
    for d in os.listdir(_WORKDIR):
        m = pat.match(d)
        if not m or m.group(1) == tag:
            continue
        full = os.path.join(_WORKDIR, d)
        try:
            age = now - os.stat(full).st_mtime
        except OSError:
            continue
        if age > min_age_s:
            shutil.rmtree(full, ignore_errors=True)


def _tagged_path(sf_dir: str, name_fmt: str, table: str = "orders") -> str:
    """Stage path for the current testdata fingerprint of ``table``,
    with stale sibling generations evicted as a side effect."""
    tag = _source_tag(sf_dir, table)
    _evict_stale_stages(name_fmt.split("{tag}")[0], tag)
    return os.path.join(_WORKDIR, name_fmt.format(tag=tag))


def _stage(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    path = _tagged_path(sf_dir, f"orders_{{tag}}.{fmt}")
    # reuse only a COMPLETE prior stage (Spark writes _SUCCESS last); a
    # killed half-write is restaged via tmp-dir + atomic rename
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = path + ".tmp"
        (
            read_table(spark, sf_dir, "orders")
            .select(
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderpriority",
            )
            .write.mode("overwrite")
            .format(fmt)
            .save(tmp)
        )
        import shutil

        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
    return path


_AGG_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
"""


def _roundtrip_agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


def json_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> JSON lines -> explicit-schema read -> aggregate.
    Doubles survive the text round-trip because Spark prints them
    shortest-round-trip (reparses to the identical bit pattern)."""
    path = _stage(spark, sf_dir, "json")
    return _roundtrip_agg(spark.read.schema(ORDERS_SCHEMA).json(path))


def orc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> ORC -> read -> aggregate (columnar alt-format path:
    predicate pushdown and column pruning work the same as parquet)."""
    path = _stage(spark, sf_dir, "orc")
    return _roundtrip_agg(spark.read.schema(ORDERS_SCHEMA).orc(path))


def xml_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> XML (native Spark 4 XML source, rowTag records) ->
    explicit-schema read -> aggregate. Same text round-trip guarantees
    as JSON (shortest-repr doubles); the XML writer/reader are
    partition-parallel scans like every other file source."""
    path = _tagged_path(sf_dir, "orders_{tag}.xml")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = path + ".tmp"
        (
            read_table(spark, sf_dir, "orders")
            .select(
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderpriority",
            )
            .write.mode("overwrite")
            .option("rowTag", "order")
            .format("xml")
            .save(tmp)
        )
        import shutil

        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
    return _roundtrip_agg(
        spark.read.schema(ORDERS_SCHEMA)
        .option("rowTag", "order")
        .format("xml")
        .load(path)
    )


def nested_parquet_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct parquet with SCHEMA PRUNING: orders staged as
    ``struct<keys:struct<orderkey,custkey>, amounts:struct<total,
    priority>>``, then only TWO leaf fields are read back and
    aggregated. Catalyst's nested schema pruning pushes the leaf
    selection into the parquet ReadSchema, so at 100 TB the scan pays
    for 2 leaves, not the whole struct — asserted by the plan test in
    tests/test_sources.py. Oracle is flat SQL over the original
    parquet."""
    path = _tagged_path(sf_dir, "orders_nested_{tag}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = path + ".tmp"
        (
            read_table(spark, sf_dir, "orders")
            .select(
                F.struct(
                    F.col("o_orderkey").alias("orderkey"),
                    F.col("o_custkey").alias("custkey"),
                ).alias("keys"),
                F.struct(
                    F.col("o_totalprice").alias("total"),
                    F.col("o_orderpriority").alias("priority"),
                ).alias("amounts"),
            )
            .write.mode("overwrite")
            .parquet(tmp)
        )
        import shutil

        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
    nested = spark.read.parquet(path)
    return (
        nested.groupBy(F.col("amounts.priority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("amounts.total").cast("decimal(20,6)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("priority")
    )


NESTED_PRUNED_SQL = """
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
"""


def csv_permissive_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-tolerant CSV ingestion: a staged file where every
    13th-keyed row is deliberately malformed (non-numeric key, missing
    columns) is read back PERMISSIVE with an explicit schema — bad rows
    parse to NULLs instead of failing the scan, and the aggregate
    splits good/bad counts plus a decimal-exact sum over the rows that
    survived. The oracle predicts all three from the corruption rule.
    FAILFAST on clean data is the reference path (sources/csv.py); this
    covers the other ingestion mode a 100 TB crawl actually needs."""
    path = _tagged_path(sf_dir, "orders_corrupt_{tag}.csv")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = path + ".tmp"
        (
            read_table(spark, sf_dir, "orders")
            .select(
                # single unparseable field — no stray numeric token that
                # could accidentally parse as a valid price column
                F.when(
                    F.col("o_orderkey") % 13 == 0,
                    F.concat(F.lit("garbage_"), F.col("o_orderkey")),
                )
                .otherwise(
                    F.concat_ws(
                        ",",
                        F.col("o_orderkey"),
                        F.col("o_totalprice"),
                        F.col("o_orderpriority"),
                    )
                )
                .alias("value")
            )
            .write.mode("overwrite")
            .text(tmp)
        )
        import shutil

        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("price", T.DoubleType(), True),
            T.StructField("priority", T.StringType(), True),
        ]
    )
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(path)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("price").alias("n_good"),
        (F.count(F.lit(1)) - F.count("price")).alias("n_bad"),
        F.sum(F.col("price").cast("decimal(20,6)"))
        .cast("double")
        .alias("good_total"),
    )


CSV_PERMISSIVE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey % 13 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_good,
       CAST(SUM(CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bad,
       CAST(SUM(CASE WHEN o_orderkey % 13 <> 0
                     THEN CAST(o_totalprice AS DECIMAL(20,6)) END)
            AS DOUBLE) AS good_total
FROM orders
"""


def gzip_text_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed text ingestion — the web-crawl shape (WARC-style
    gzipped text): documents staged as GZIP text files via Spark's
    codec writer, read back transparently decompressed, re-parsed
    (key TAB payload), and aggregated; the oracle predicts every
    aggregate from the original table, so corruption anywhere in
    compress -> store -> decompress -> parse breaks the hash.

    Scale note: gzip is NOT splittable — one task per file. That is
    fine (and standard) for crawl corpora stored as many ~100 MB-1 GB
    .gz members; the staging write keeps Spark's natural partitioning
    so the read parallelism equals the file count. Use zstd/snappy
    parquet for the post-ingest hops."""
    path = _tagged_path(sf_dir, "docs_{tag}.txt.gz", table="documents")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = path + ".tmp"
        (
            read_table(spark, sf_dir, "documents")
            # NULL text can't round-trip through a line format
            # (concat_ws would silently drop the tab); scope the entry
            # to non-null rows on BOTH sides
            .filter(F.col("text").isNotNull())
            .select(
                F.concat_ws(
                    "\t",
                    F.col("doc_id").cast("string"),
                    F.regexp_replace("text", "[\\n\\t\\r]", " "),
                ).alias("value")
            )
            .write.mode("overwrite")
            .option("compression", "gzip")
            .text(tmp)
        )
        import shutil

        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
    lines = spark.read.text(path)
    parsed = lines.select(
        F.split_part("value", F.lit("\t"), F.lit(1)).cast("long").alias("k"),
        F.substring_index("value", "\t", -1).alias("payload"),
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("k").alias("key_sum"),
        F.sum(F.length("payload")).alias("payload_chars"),
    )


GZIP_TEXT_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS key_sum,
       CAST(SUM(length(regexp_replace(text, '[\\n\\t\\r]', ' ', 'g')))
            AS BIGINT) AS payload_chars
FROM documents
WHERE text IS NOT NULL
"""


def parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet generations in ONE directory —
    gen-1 files (even order keys) lack ``o_totalprice``, gen-2 files
    (odd keys) carry it — merged with ``mergeSchema=true``; gen-1 rows
    surface NULL for the added column. This is the standard
    append-only-table evolution path: at 100 TB the merged read costs
    one footer-schema union at planning time, and the scan itself still
    prunes columns per file (a file without the column reads nothing
    extra).
    """
    path = _tagged_path(sf_dir, "orders_{tag}.evolved")
    if not os.path.exists(os.path.join(path, "_DONE")):
        base = read_table(spark, sf_dir, "orders")
        tmp = path + ".tmp"
        gen1 = base.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_custkey", "o_orderstatus"
        )
        gen2 = base.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        gen1.write.mode("overwrite").parquet(tmp)
        gen2.write.mode("append").parquet(tmp)
        import shutil

        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        with open(os.path.join(path, "_DONE"), "w") as f:
            f.write("both generations written\n")
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "o_totalprice" in merged.columns  # the evolved column
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("o_totalprice").alias("n_with_price"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


SCHEMA_EVOLUTION_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS n_with_price,
       ROUND(SUM(CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice END), 2)
         AS sum_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


QUERIES = {
    "parquet_schema_evolution": parquet_schema_evolution,
    "gzip_text_ingest": gzip_text_ingest,
    "xml_source_roundtrip": xml_source_roundtrip,
    "csv_permissive_ingest": csv_permissive_ingest,
    "json_source_roundtrip": json_source_roundtrip,
    "orc_source_roundtrip": orc_source_roundtrip,
    "nested_parquet_pruned": nested_parquet_pruned,
}

ORACLES = {
    "parquet_schema_evolution": SCHEMA_EVOLUTION_SQL,
    "gzip_text_ingest": GZIP_TEXT_SQL,
    "xml_source_roundtrip": _AGG_SQL,
    "csv_permissive_ingest": CSV_PERMISSIVE_SQL,
    "json_source_roundtrip": _AGG_SQL,
    "orc_source_roundtrip": _AGG_SQL,
    "nested_parquet_pruned": NESTED_PRUNED_SQL,
}
