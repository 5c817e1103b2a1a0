#!/usr/bin/env python
"""Full-scale span-level decontamination leg (r13): the surgical
pipeline — positional-index bulk phrase match with match offsets →
token spans → `excise_token_spans` — at 2M docs, against the same
persisted index the phrase legs use.

What the leg pins:

- the match-offset variant (`return_positions=True`) costs the same
  ONE pruned positions scan as the count-only bulk probe (the starts
  array is aggregated from rows the kernel already produced);
- excision touches ONLY the hit docs (the span relation is
  hit-sized): the rebuild joins spans to the corpus and rewrites the
  matched docs' token arrays — corpus rows with no spans pass through
  the left join untouched;
- conservation: tokens_removed + tokens_kept == corpus tokens, and
  every probe occurrence accounts for its span coverage.

Requires the positional index from tools/fullscale_textindex.py.

Usage: python tools/fullscale_spanexcise.py [n_docs] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
WORKDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fullscale_docs"


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators import (
        textindex as TI,
    )
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        excise_token_spans,
    )

    spark = get_spark("fullscale-spanexcise")
    idx = os.path.join(WORKDIR, f"txtidx_pos_{N_DOCS}")
    docs_path = os.path.join(WORKDIR, f"docs_{N_DOCS}.parquet")
    if not os.path.exists(os.path.join(idx, "meta.json")):
        raise SystemExit(
            f"positional index missing at {idx} — run "
            "tools/fullscale_textindex.py first"
        )
    docs = spark.read.parquet(docs_path)

    # 400 mid-rank content bigrams (the guarded contamination regime)
    phrases = []
    lo, hi = 800, 6000
    for i in range(400):
        a = lo + (i * 37) % (hi - lo)
        b = lo + (i * 101 + 13) % (hi - lo)
        phrases.append(f"w{a} w{b}")
    pdf = spark.createDataFrame(
        [(p,) for p in sorted(set(phrases))], "phrase string"
    )

    t0 = time.monotonic()
    hits = TI.multi_phrase_query_index_df(
        spark, idx, pdf, return_positions=True, max_term_df=0.05
    )
    spans = hits.select(
        "doc_id", F.explode("starts").alias("span_start")
    ).select(
        "doc_id", "span_start",
        (F.col("span_start") + F.lit(1)).alias("span_end"),
    )
    n_spans = spans.count()
    t_match = time.monotonic() - t0
    print(f"match offsets: {n_spans} spans in {t_match:.1f}s "
          f"(one pruned positions scan, {pdf.count()} probes)")

    t0 = time.monotonic()
    cleaned = excise_token_spans(docs, spans, one_based=False)
    agg = cleaned.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("n_removed_tokens") > 0, 1).otherwise(0)
        ).alias("touched"),
        F.sum("n_removed_tokens").alias("removed"),
    ).first()
    t_ex = time.monotonic() - t0
    print(
        f"excise: {agg['n_docs']} docs rebuilt in {t_ex:.1f}s — "
        f"{agg['touched']} docs touched, {agg['removed']} tokens removed"
    )

    # conservation: removed + kept == corpus tokens
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: t != "",
    )
    total = docs.agg(F.sum(F.size(toks))).first()[0]
    kept = cleaned.agg(
        F.sum(
            F.size(
                F.filter(
                    F.split(F.lower(F.trim(F.col("clean_text"))), r"\s+"),
                    lambda t: t != "",
                )
            )
        )
    ).first()[0]
    ok = int(total) == int(kept) + int(agg["removed"])
    print(
        f"conservation: corpus {total} tokens == kept {kept} + "
        f"removed {agg['removed']} -> {ok}"
    )
    assert ok


if __name__ == "__main__":
    main()
