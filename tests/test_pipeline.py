"""Training-pipeline operator semantics: packing offsets/straddles,
split determinism and disjointness, stratified sampling rates."""

from __future__ import annotations

from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators import pipeline as P
from tests.conftest import SF_SMOKE


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_pack_sequences_offsets_and_straddle(spark):
    df = _docs_df(
        spark,
        [
            (1, "en", "a b c"),          # 3 tokens -> offset 0, pack 0
            (2, "en", "d e f g"),        # 4 tokens -> offset 3, pack 0
            (3, "en", " ".join("x" * 1 for _ in range(10))),  # 10 -> offset 7, pack 1
            (4, "fr", "un deux"),        # fr shard packs independently
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in P.pack_sequences(
            df, "doc_id", "text", budget=4, partition_by="lang"
        ).collect()
    }
    assert out[1]["start_offset"] == 0 and out[1]["pack_id"] == 0
    assert out[2]["start_offset"] == 3 and out[2]["pack_id"] == 0
    # doc 3 STARTS at offset 7 -> chunk 1, even though it spans past it
    assert out[3]["start_offset"] == 7 and out[3]["pack_id"] == 1
    assert out[4]["start_offset"] == 0 and out[4]["pack_id"] == 0


def test_hash_split_deterministic_and_partitioning_invariant(spark):
    df = _docs_df(
        spark, [(i, "en", "t") for i in range(500)]
    )
    a = P.hash_split(df, "doc_id").select("doc_id", "split")
    b = P.hash_split(df.repartition(7), "doc_id").select("doc_id", "split")
    # identical assignment regardless of physical layout
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0
    counts = dict(
        a.groupBy("split").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    # 1% val / 1% test of 500 ids: small but non-degenerate buckets
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > 450


def test_stratified_sample_respects_rates(spark):
    rows = [(i, "en" if i % 2 else "de", "t") for i in range(1000)]
    df = _docs_df(spark, rows)
    out = P.stratified_sample(
        df, "doc_id", "lang", {"en": 0.25, "de": 1.0}
    )
    got = dict(
        out.groupBy("lang").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    assert got["de"] == 500  # rate 1.0 keeps everything
    assert 75 <= got["en"] <= 175  # ~125 expected at rate 0.25
    # unknown stratum drops by default
    assert (
        P.stratified_sample(df, "doc_id", "lang", {"fr": 1.0}).count() == 0
    )


def test_vocab_topk_counts(spark):
    df = _docs_df(
        spark,
        [(1, "en", "a a b"), (2, "en", "a c"), (3, "en", "b")],
    )
    rows = P.vocab_topk(df, "text", k=2).collect()
    assert [(r["token"], r["n_docs"], r["n_occurrences"]) for r in rows] == [
        ("a", 2, 3),
        ("b", 2, 2),
    ]


def test_materialize_mixture_matches_python_reference(spark):
    """Full-output cross-check of materialize_mixture against an
    independent pure-Python computation of the same integer contract:
    per-source alpha targets, basis-point repeat rates, md5-bucket
    fractional membership, 0-based epochs."""
    import hashlib

    rows = [
        # big source: 8 docs x 10 tokens; small source: 3 docs x 4.
        *[(i, "big", " ".join(f"w{i}x{j}" for j in range(10))) for i in range(8)],
        *[(100 + i, "small", " ".join(f"s{i}y{j}" for j in range(4))) for i in range(3)],
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    budget, alpha, pow_scale, buckets = 120, 0.7, 1_000, P.HASH_BUCKETS

    # -- python reference ------------------------------------------------
    n_tok = {doc_id: len(text.split()) for doc_id, _, text in rows}
    src_tokens: dict[str, int] = {}
    for doc_id, s, _ in rows:
        src_tokens[s] = src_tokens.get(s, 0) + n_tok[doc_id]
    pw = {s: round(n**alpha * pow_scale) for s, n in src_tokens.items()}
    tot_pw = sum(pw.values())
    expected = set()
    for doc_id, s, _ in rows:
        target = pw[s] * budget // tot_pw
        r = target * buckets // src_tokens[s]
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % buckets
        copies = r // buckets + (1 if b < r % buckets else 0)
        for epoch in range(copies):
            expected.add((doc_id, s, epoch, n_tok[doc_id]))
    assert expected, "degenerate test: nothing materialized"
    # the small source must actually be upweighted past 1 epoch for the
    # test to exercise the repeat path
    assert any(e[1] == "small" and e[2] >= 1 for e in expected)

    got = {
        (r["doc_id"], r["source"], r["epoch"], r["n_tokens"])
        for r in P.materialize_mixture(
            df, "source", "text",
            token_budget=budget, alpha=alpha, pow_scale=pow_scale,
        ).collect()
    }
    assert got == expected

    # determinism: a second run over a differently-partitioned input
    # materializes the identical copy list
    got2 = {
        (r["doc_id"], r["source"], r["epoch"], r["n_tokens"])
        for r in P.materialize_mixture(
            df.repartition(7), "source", "text",
            token_budget=budget, alpha=alpha, pow_scale=pow_scale,
        ).collect()
    }
    assert got2 == expected


# --- weighted sampling without replacement (A-ES) ---------------------------


def test_weighted_sample_matches_key_reference(spark):
    """The Spark top-k must equal recomputing the A-ES keys in python
    over the collected table (same md5-derived u, same ln(u)/w key,
    same (key DESC, id ASC) order)."""
    import hashlib
    import math

    from implementation_of_an_etl_process_spark.operators.pipeline import (
        weighted_sample,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = [
        r["doc_id"]
        for r in weighted_sample(docs, "doc_id", "n_chars", 25, seed="t7")
        .select("doc_id")
        .orderBy("doc_id")
        .collect()
    ]
    rows = docs.select("doc_id", "n_chars").collect()

    def key(r):
        h = int(
            hashlib.md5(f"t7:{r['doc_id']}".encode()).hexdigest()[:8], 16
        )
        u = (h + 1) / 2**32
        # the round-9 contract quantizes to int64 (AES_KEY_SCALE) so
        # both engines select by exact-integer comparison
        return round(math.log(u) / max(r["n_chars"], 1) * 10**12)

    want = sorted(
        [r["doc_id"] for r in sorted(rows, key=lambda r: (-key(r), r["doc_id"]))][:25]
    )
    assert got == want


def test_weighted_sample_per_group_matches_reference(spark):
    """Per-group A-ES: exactly k winners per group (fewer iff the
    group is smaller), equal to the python recomputation with the
    same quantized keys."""
    import hashlib
    import math

    from implementation_of_an_etl_process_spark.operators.pipeline import (
        weighted_sample_per_group,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = weighted_sample_per_group(
        docs, "doc_id", "n_chars", "lang", 5, seed="g3"
    )
    got = {
        (r["lang"], r["doc_id"])
        for r in out.select("lang", "doc_id").collect()
    }
    rows = docs.select("doc_id", "n_chars", "lang").collect()

    def key(r):
        h = int(
            hashlib.md5(f"g3:{r['doc_id']}".encode()).hexdigest()[:8], 16
        )
        u = (h + 1) / 2**32
        return round(math.log(u) / max(r["n_chars"], 1) * 10**12)

    want = set()
    langs = {r["lang"] for r in rows}
    for lang in langs:
        members = [r for r in rows if r["lang"] == lang]
        members.sort(key=lambda r: (-key(r), r["doc_id"]))
        want |= {(lang, r["doc_id"]) for r in members[:5]}
    assert got == want
    per = out.groupBy("lang").count().collect()
    assert all(r["count"] <= 5 for r in per)


def test_weighted_sample_weights_shift_inclusion(spark):
    """Statistical direction: with weight = n_chars, long documents
    must be overrepresented vs a uniform sample — the mean length of
    the weighted sample exceeds the corpus mean."""
    from implementation_of_an_etl_process_spark.operators.pipeline import (
        weighted_sample,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = (
        weighted_sample(docs, "doc_id", "n_chars", 100)
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert sample_mean > corpus_mean


def test_weighted_sample_k_edge_cases(spark):
    import pytest as _pytest

    from implementation_of_an_etl_process_spark.operators.pipeline import (
        weighted_sample,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n = docs.count()
    # k >= rows: everything sampled, no _aes_key in the output schema
    out = weighted_sample(docs, "doc_id", "n_chars", n + 50)
    assert out.count() == n
    assert "_aes_key" not in out.columns
    with _pytest.raises(ValueError):
        weighted_sample(docs, "doc_id", "n_chars", 0)


def test_weighted_sample_plan_is_takeordered(spark):
    """Scale contract: the sample is a TakeOrderedAndProject (per-
    partition k-heaps), never a full sort shuffle."""
    from implementation_of_an_etl_process_spark.operators.pipeline import (
        weighted_sample,
    )
    from implementation_of_an_etl_process_spark.plans import explain_str

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = explain_str(weighted_sample(docs, "doc_id", "n_chars", 10))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_weighted_sample_oracle_boundary_margin(spark):
    """The battery oracle recomputes ln(u)/w in DuckDB; engines may
    differ in the last ulp of ln. The gate is safe iff the key gap at
    the top-k boundary dwarfs that noise — assert a relative margin of
    >= 1e-9 (ulp noise is ~1e-16) on both gated datasets so a future
    testdata regeneration that collapses the boundary fails HERE, not
    in the driver's hash compare."""
    import hashlib
    import math

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "n_chars")
            .collect()
        )
        keys = sorted(
            (
                math.log(
                    (int(hashlib.md5(f"ws1:{r['doc_id']}".encode())
                         .hexdigest()[:8], 16) + 1) / 2**32
                )
                / max(r["n_chars"], 1)
                for r in rows
            ),
            reverse=True,
        )
        k = 100
        gap = keys[k - 1] - keys[k]
        assert gap > 1e-9 * abs(keys[k - 1]), (sf_dir, gap, keys[k - 1])


def test_weighted_sample_per_group_salted_is_exact(spark):
    """The salted two-stage path returns EXACTLY the unsalted result
    for several salt factors (including salts larger than any group),
    on every column — salting is a parallelism rewrite, not an
    approximation."""
    from implementation_of_an_etl_process_spark.operators.pipeline import (
        weighted_sample_per_group,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    base = sorted(
        (r["lang"], r["doc_id"], r["n_chars"])
        for r in weighted_sample_per_group(
            docs, "doc_id", "n_chars", "lang", 7, seed="g9"
        ).select("lang", "doc_id", "n_chars").collect()
    )
    for s in (2, 8, 64):
        salted = sorted(
            (r["lang"], r["doc_id"], r["n_chars"])
            for r in weighted_sample_per_group(
                docs, "doc_id", "n_chars", "lang", 7, seed="g9", salt=s
            ).select("lang", "doc_id", "n_chars").collect()
        )
        assert salted == base, f"salt={s} diverged"
    # salt=1 / None are the single-stage path
    assert sorted(
        (r["lang"], r["doc_id"], r["n_chars"])
        for r in weighted_sample_per_group(
            docs, "doc_id", "n_chars", "lang", 7, seed="g9", salt=1
        ).select("lang", "doc_id", "n_chars").collect()
    ) == base
