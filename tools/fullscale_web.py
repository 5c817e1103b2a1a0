#!/usr/bin/env python
"""Full-scale legs for the round-8 web-pipeline operators: wrap the
4M-doc Zipfian corpus (tools/fullscale_docs.py) into synthetic pages
in-plan, then measure

- ``html_main_text`` extraction throughput, with closed-form asserts
  (every page yields exactly one kept line of WORDS-3 words);
- ``canonicalize_url`` + URL-level dedup over 4 formatting variants
  per logical URL (expected distinct canonicals = n_docs / 4 exactly).

Usage: python tools/fullscale_web.py [n_docs] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
WORKDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fullscale_docs"


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        canonicalize_url,
        html_main_text,
    )
    from tools.fullscale_docs import WORDS, synth_corpus

    spark = get_spark("fullscale-web")
    path = os.path.join(WORKDIR, f"docs_{N_DOCS}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(WORKDIR, exist_ok=True)
        synth_corpus(spark, N_DOCS).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)
    n = docs.count()

    # --- HTML boilerplate removal ------------------------------------------
    words = F.split(F.trim(F.col("text")), r"\s+")
    page = F.concat(
        F.lit("<html><head><title>T</title><style>p {color:red}</style>"
              "<script>var x = 1; if (x < 2) { x++; }</script></head>"
              "<body><div>Home About Contact</div><h1>"),
        F.array_join(F.slice(words, 1, 3), " "),
        F.lit("</h1><p>"),
        F.array_join(F.slice(words, 4, F.size(words) - 3), " "),
        F.lit("</p><div>&copy; 2024 footer</div></body></html>"),
    )
    pages = docs.select("doc_id", page.alias("html"))
    t0 = time.monotonic()
    agg = (
        html_main_text(pages, "html")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_kept_lines").alias("kept"),
            F.sum("n_main_words").alias("w"),
        )
        .first()
    )
    t = time.monotonic() - t0
    assert agg["n"] == n and agg["kept"] == n
    assert agg["w"] == n * (WORDS - 3), agg
    print(f"html_main_text: {n} pages extracted in {t:.1f}s = "
          f"{n / t / 1e3:.0f}k pages/s (every page -> 1 kept line, "
          f"{WORDS - 3} words, closed-form exact)", flush=True)

    # --- URL canonicalization + dedup --------------------------------------
    grp = (F.col("doc_id") / 4).cast("long").cast("string")
    v = F.col("doc_id") % 4
    url = (
        F.when(v == 0, F.concat(F.lit("http://Example"), grp,
                                F.lit(".com/p"), grp, F.lit("?b=2&a=1")))
        .when(v == 1, F.concat(F.lit("HTTP://WWW.EXAMPLE"), grp,
                               F.lit(".COM:80/p"), grp,
                               F.lit("/?a=1&b=2#s")))
        .when(v == 2, F.concat(F.lit("http://example"), grp,
                               F.lit(".com:80/p"), grp,
                               F.lit("?utm_source=x&b=2&a=1")))
        .otherwise(F.concat(F.lit("http://www.example"), grp,
                            F.lit(".com/p"), grp,
                            F.lit("/?a=1&b=2&gclid=z#f")))
    )
    urls = docs.select("doc_id", url.alias("url"))
    t0 = time.monotonic()
    n_canon = (
        urls.select(canonicalize_url("url").alias("c")).distinct().count()
    )
    t = time.monotonic() - t0
    assert n_canon == (n + 3) // 4, n_canon
    print(f"canonicalize_url: {n} urls -> {n_canon} canonical groups "
          f"(exactly n/4) in {t:.1f}s = {n / t / 1e3:.0f}k urls/s",
          flush=True)


def winnow_leg(n_docs: int = None, workdir: str = None) -> None:
    """Winnowing at corpus scale: fingerprint every doc, build the
    df-capped inverted index, and check the LOCALITY guarantee against
    the corpus's planted duplicates — exact copies (id%100==50 copies
    id-2) share every fingerprint, near copies (id%100==99 = id-1 with
    the last word changed) share the long common prefix run, so BOTH
    planted families must surface as pairs."""
    import time as _t

    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators.text import (
        winnow_pairs,
    )
    from tools.fullscale_docs import synth_corpus

    n_docs = n_docs or N_DOCS
    workdir = workdir or WORKDIR
    spark = get_spark("fullscale-winnow")
    path = os.path.join(workdir, f"docs_{n_docs}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(workdir, exist_ok=True)
        synth_corpus(spark, n_docs).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)
    n = docs.count()

    t0 = _t.monotonic()
    pairs = winnow_pairs(docs, k=3, w=4, min_shared=2, max_df=50)
    from pyspark.sql import functions as FF

    agg = pairs.agg(
        FF.count(FF.lit(1)).alias("total"),
        FF.sum(
            FF.when(
                (FF.col("id_b") - FF.col("id_a") == 2)
                & (FF.col("id_b") % 100 == 50), 1
            ).otherwise(0)
        ).alias("exact_hits"),
        FF.sum(
            FF.when(
                (FF.col("id_b") - FF.col("id_a") == 1)
                & (FF.col("id_b") % 100 == 99), 1
            ).otherwise(0)
        ).alias("near_hits"),
    ).first()
    t = _t.monotonic() - t0
    n_exact = n // 100
    n_near = n // 100
    print(f"winnow_pairs: {agg['total']} pairs over {n} docs in {t:.1f}s; "
          f"planted exact {agg['exact_hits']}/{n_exact}, "
          f"planted near {agg['near_hits']}/{n_near} "
          f"(locality guarantee: both must be 100%)", flush=True)
    assert agg["exact_hits"] == n_exact, agg
    assert agg["near_hits"] == n_near, agg


if __name__ == "__main__":
    main()
    winnow_leg()
