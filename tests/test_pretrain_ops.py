"""Edge-case properties of operators/pretrain.py beyond the oracle
battery (queries/pretrain.py pins full-corpus values at sf0.01)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators.pretrain import (
    chunk_documents,
    contamination_overlap,
    paragraph_dedup,
    pii_redact,
    repetition_stats,
    strip_urls,
    word_ngrams,
)


def test_word_ngrams_short_text_is_empty(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    out = df.select(word_ngrams("text", 3).alias("g")).first()
    assert out["g"] == []


def test_contamination_flags_planted_copy(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),  # verbatim
            (2, "iota kappa lambda mu nu xi omicron pi rho"),  # disjoint
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in contamination_overlap(cand, bench, n=3).collect()
    }
    assert rows[1]["overlap"] == 1.0 and rows[1]["contaminated"]
    assert rows[2]["n_hits"] == 0 and not rows[2]["contaminated"]


def test_repetition_stats_degenerate_doc(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "a b c d")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["top_word_frac"] == 1.0
    assert rows[1]["dup_3gram_frac"] == 0.5  # 2 trigrams, 1 distinct
    assert rows[2]["top_word_frac"] == 0.25
    assert rows[2]["dup_3gram_frac"] == 0.0


def test_pii_redact_counts_and_replaces(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.com ssn 123-45-6789 tel 555-123-4567 ip 10.0.0.1")],
        "doc_id long, text string",
    )
    r = pii_redact(df).first()
    assert (r["n_email"], r["n_ssn"], r["n_phone"], r["n_ipv4"]) == (1, 1, 1, 1)
    assert r["clean_text"] == "mail <EMAIL> ssn <SSN> tel <PHONE> ip <IPV4>"


def test_strip_urls_collapses_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "pre https://x.io/a?b=1 mid http://y.z post")],
        "doc_id long, text string",
    )
    r = strip_urls(df).first()
    assert r["n_urls"] == 2
    assert r["clean_text"] == "pre mid post"


def test_paragraph_dedup_keeps_first_occurrence(spark):
    # doc 1 owns both chunks; doc 2 repeats chunk "a b c" at pos 0.
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c x y z")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in paragraph_dedup(df, chunk_words=3).collect()
    }
    assert rows[1]["n_kept"] == 2 and rows[1]["kept_frac"] == 1.0
    assert rows[2]["n_kept"] == 1 and rows[2]["kept_frac"] == 0.5


def test_chunk_documents_windows_and_tail(spark):
    # 10 words, size 4, stride 3 -> starts at words 1,4,7,10:
    # full window, full window, full window, 1-word tail.
    words = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_size=4, stride=3).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [(r["chunk_id"], r["start_token"], r["n_chunk_tokens"]) for r in rows] == [
        (0, 1, 4),
        (1, 4, 4),
        (2, 7, 4),
        (3, 10, 1),
    ]
    # overlap: chunk 0 covers w1-w4, chunk 1 covers w4-w7 (w4 shared).
    import hashlib

    assert rows[0]["chunk_md5"] == hashlib.md5(b"w1 w2 w3 w4").hexdigest()
    assert rows[1]["chunk_md5"] == hashlib.md5(b"w4 w5 w6 w7").hexdigest()
    assert rows[3]["chunk_md5"] == hashlib.md5(b"w10").hexdigest()


def test_chunk_documents_single_short_doc_one_chunk(spark):
    df = spark.createDataFrame([(7, "a b")], "doc_id long, text string")
    rows = chunk_documents(df, chunk_size=16, stride=12).collect()
    assert len(rows) == 1
    assert (rows[0]["chunk_id"], rows[0]["start_token"], rows[0]["n_chunk_tokens"]) == (
        0,
        1,
        2,
    )


def test_chunk_documents_matches_python_reference(spark):
    """Window coverage law vs a pure-Python reference: every token of
    every doc lands in >=1 chunk, chunk k covers words
    [k*stride+1, k*stride+size], and the md5 is of the exact
    space-joined slice."""
    import hashlib
    import random

    rng = random.Random(6)
    rows = [
        (i, " ".join(f"t{rng.randrange(50)}" for _ in range(rng.randrange(1, 40))))
        for i in range(20)
    ]
    size, stride = 5, 3
    expected = set()
    for doc_id, text in rows:
        words = text.split(" ")
        for k in range((len(words) - 1) // stride + 1):
            toks = words[k * stride : k * stride + size]
            expected.add(
                (
                    doc_id,
                    k,
                    k * stride + 1,
                    len(toks),
                    hashlib.md5(" ".join(toks).encode()).hexdigest(),
                )
            )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        tuple(r)
        for r in chunk_documents(df, chunk_size=size, stride=stride).collect()
    }
    assert got == expected


def test_chunk_documents_plan_has_no_exchange(spark):
    """The chunker must stay a narrow map: codegen'd sequence/slice +
    posexplode, zero shuffles (scale contract in the docstring)."""
    from implementation_of_an_etl_process_spark.plans import explain_str

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = explain_str(chunk_documents(df, chunk_size=4, stride=3))
    assert "Exchange" not in plan, plan
    assert "Generate" in plan, plan  # the posexplode


def test_chunk_documents_rejects_token_dropping_stride(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=0, stride=1)


# --- duplicate-span (substring-level) dedup ---------------------------


def _py_dup_spans(texts: dict[int, str], k: int):
    """Pure-python reference: per doc, merged maximal spans covered by
    a k-token window occurring >=2 times corpus-wide (1-based incl)."""
    toks = {d: [t for t in t_.lower().strip().split() if t] for d, t_ in texts.items()}
    from collections import Counter

    wins = Counter()
    per_doc = {}
    for d, ts in toks.items():
        ws = [tuple(ts[i : i + k]) for i in range(len(ts) - k + 1)]
        per_doc[d] = ws
        wins.update(ws)
    spans = {}
    for d, ws in per_doc.items():
        ivs = [
            (i + 1, i + k) for i, w in enumerate(ws) if wins[w] >= 2
        ]
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        spans[d] = merged
    return toks, spans


_DUP_CORPUS = [
    # docs 1 and 2 share an 8-token run mid-text at different offsets
    (1, "a b c d e f g h i j k l m n o p"),
    (2, "x y e f g h i j k l z w q r s t"),
    # doc 3 repeats one 4-token phrase twice INSIDE itself (k=4 case)
    (3, "p q r s junk1 junk2 p q r s tail1 tail2"),
    # doc 4 is an exact copy of doc 1 (whole-doc span)
    (4, "a b c d e f g h i j k l m n o p"),
    # doc 5 is unique and shorter than k=8
    (5, "lone words only"),
]


@pytest.mark.parametrize("k", [4, 8])
def test_duplicate_spans_match_python_reference(spark, k):
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        duplicate_spans,
    )

    df = spark.createDataFrame(_DUP_CORPUS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(df, k=k).collect()
    }
    _, spans = _py_dup_spans(dict(_DUP_CORPUS), k)
    want = {(d, s, e) for d, ivs in spans.items() for s, e in ivs}
    assert got == want


def test_duplicate_spans_intra_doc_repeat_counts(spark):
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        duplicate_spans,
    )

    df = spark.createDataFrame(
        [(3, "p q r s junk1 junk2 p q r s tail1 tail2")],
        "doc_id long, text string",
    )
    got = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicate_spans(df, k=4).collect()
    )
    assert got == [(1, 4), (7, 10)]


def test_duplicate_span_stats_whole_doc_copy_is_full_fraction(spark):
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        duplicate_span_stats,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "u v w x y z q1 q2")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in duplicate_span_stats(df, k=8).collect()
    }
    assert rows[1]["dup_frac_q"] == 1_000_000
    assert rows[1]["dup_span_count"] == 1
    assert rows[2]["dup_token_count"] == 8
    assert rows[3]["dup_span_count"] == 0 and rows[3]["dup_frac_q"] == 0
    assert len(rows) == 3  # zero-span docs included


def test_remove_duplicate_spans_strict_removal(spark):
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "z1 a b c d e f g h z2"),
            (3, "all unique here nothing shared"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(df, k=8).collect()
    }
    # docs 1/2 share the 8-run "a b c d e f g h"
    assert rows[1]["clean_text"] == "i j"
    assert rows[1]["n_removed_tokens"] == 8
    assert rows[2]["clean_text"] == "z1 z2"
    assert rows[3]["clean_text"] == "all unique here nothing shared"
    assert rows[3]["n_removed_tokens"] == 0


def test_excise_token_spans_merges_overlapping_intervals(spark):
    """r14 (r13 advice): the rebuild merges overlapping/adjacent/
    duplicate spans into disjoint intervals BEFORE the keep-list
    filter — the dense case (one 2-token span per bigram, spans ≈ doc
    length) must excise identically to the naive interval union, and
    n_removed must count each token once however many spans cover it."""
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        excise_token_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
            (2, "k0 k1 k2 k3 k4"),
            (3, "u0 u1 u2"),
        ],
        "doc_id long, text string",
    )
    # doc 1: every bigram of tokens 1..6 spanned (overlap chain, out
    # of order, with a duplicate) + a separate adjacent pair 8-8,9-9
    spans = spark.createDataFrame(
        [(1, s, e) for s, e in
         [(3, 4), (1, 2), (2, 3), (4, 5), (5, 6), (3, 4), (8, 8), (9, 9)]]
        # doc 2: fully-covering overlaps
        + [(2, 0, 4), (2, 1, 3), (2, 2, 2)]
        # doc 3 gets no spans
        ,
        "doc_id long, span_start long, span_end long",
    )
    rows = {
        r["doc_id"]: r
        for r in excise_token_spans(docs, spans, one_based=False).collect()
    }
    assert rows[1]["clean_text"] == "t0 t7"
    assert rows[1]["n_removed_tokens"] == 8  # 1..6 and 8..9, each once
    assert rows[2]["clean_text"] == ""
    assert rows[2]["n_removed_tokens"] == 5
    assert rows[3]["clean_text"] == "u0 u1 u2"
    assert rows[3]["n_removed_tokens"] == 0


def test_remove_duplicate_spans_empty_and_whitespace_docs(spark):
    """Empty/whitespace-only docs tokenize to a 0-element array;
    sequence(1, 0) is the DESCENDING [1, 0] and element_at on the empty
    array used to throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT, killing the
    whole job (round-6 ADVICE medium).  They must instead pass through
    as clean_text='' with zero removed tokens."""
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(
        [
            (1, ""),
            (2, "   \t  "),
            (3, "a b c d e f g h i j"),
            (4, "z1 a b c d e f g h z2"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in remove_duplicate_spans(df, k=8).collect()
    }
    assert len(rows) == 4
    assert rows[1]["clean_text"] == "" and rows[1]["n_removed_tokens"] == 0
    assert rows[2]["clean_text"] == "" and rows[2]["n_removed_tokens"] == 0
    # the non-empty docs still dedup normally alongside the empties
    assert rows[3]["clean_text"] == "i j"
    assert rows[4]["clean_text"] == "z1 z2"


def test_duplicate_spans_rejects_bad_params(spark):
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        duplicate_spans,
    )

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        duplicate_spans(df, k=0)
    with pytest.raises(ValueError):
        duplicate_spans(df, min_count=1)


def test_repetition_stats_narrow_matches_shuffle(spark):
    """The zero-shuffle narrow mode must produce bit-identical rows to
    the shuffle mode, including lexicographic frequency tie-breaks."""
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        repetition_stats,
    )

    rows = [
        (1, "a a a b b c"),          # clear top1/top2
        (2, "x y x y"),               # tie on count -> lexicographic
        (3, "solo"),                  # single word, no 3-grams
        (4, "p q r p q r p q r"),    # repeated 3-grams
        (5, "z z z z z z z z"),      # one word dominating
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {
        r["doc_id"]: (
            r["n_words"], r["top_word_frac"], r["top2_word_frac"],
            r["dup_3gram_frac"],
        )
        for r in repetition_stats(df, mode="shuffle").collect()
    }
    b = {
        r["doc_id"]: (
            r["n_words"], r["top_word_frac"], r["top2_word_frac"],
            r["dup_3gram_frac"],
        )
        for r in repetition_stats(df, mode="narrow").collect()
    }
    assert a == b
    # spot-check the tie row: x and y both appear twice; top1 = 2/4
    assert b[2][1] == 0.5 and b[2][2] == 1.0
    # null-text and schema parity: both modes drop null docs and agree
    # on column types (narrow casts size() to long)
    nulls = spark.createDataFrame(
        [(1, "a b a"), (2, None)], "doc_id long, text string"
    )
    sh = repetition_stats(nulls, mode="shuffle")
    na = repetition_stats(nulls, mode="narrow")
    assert [r["doc_id"] for r in na.collect()] == [1]
    assert sh.schema == na.schema

    import pytest

    with pytest.raises(ValueError, match="unknown mode"):
        repetition_stats(df, mode="bogus")


def test_canonicalize_url_rules(spark):
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        canonicalize_url,
    )

    cases = [
        ("http://Example.com/Path?b=2&a=1", "http://example.com/Path?a=1&b=2"),
        ("HTTPS://WWW.Site.COM:443/x/", "https://site.com/x"),
        ("http://a.com:80/", "http://a.com/"),
        ("http://a.com", "http://a.com/"),
        ("http://a.com/p?utm_source=x&utm_medium=y", "http://a.com/p"),
        ("http://a.com/p?gclid=1&z=9&fbclid=2", "http://a.com/p?z=9"),
        # '?' INSIDE a fragment must not be parsed as a query
        ("http://a.com/p#frag?fake=1", "http://a.com/p"),
        # non-default port kept; https :80 kept (not the default)
        ("http://a.com:8080/p", "http://a.com:8080/p"),
        ("https://a.com:80/p", "https://a.com:80/p"),
        # unparseable: passes through with only the fragment dropped
        ("not a url#x", "not a url"),
    ]
    df = spark.createDataFrame(cases, "url string, expect string")
    bad = (
        df.withColumn(
            "got",
            canonicalize_url("url"),
        )
        .filter(F.col("got") != F.col("expect"))
        .collect()
    )
    assert not bad, [(r["url"], r["got"], r["expect"]) for r in bad]


def test_html_main_text_extraction(spark):
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        html_main_text,
    )

    html = (
        "<html><head><title>T</title><style>p {color: red}</style>"
        "<script>var x = 1; if (x < 2) { x++; }</script></head>"
        "<body><div>Home About Contact</div>"
        "<h1>Big Headline Here</h1>"
        "<p>this paragraph has clearly more than five words in it</p>"
        "<ul><li>one</li><li>two</li></ul>"
        "<p>a second &amp; final &lt;kept&gt; paragraph with many words"
        " too</p><div>&copy; 2024 footer</div></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = html_main_text(df).first()
    assert r["main_text"] == (
        "this paragraph has clearly more than five words in it\n"
        'a second & final <kept> paragraph with many words too'
    )
    assert r["n_kept_lines"] == 2
    assert r["n_main_words"] == 20
    # empty / tag-free inputs degrade sanely
    df2 = spark.createDataFrame(
        [(1, ""), (2, "no tags but still six plain words here")],
        "doc_id long, html string",
    )
    rows = {r["doc_id"]: r for r in html_main_text(df2).collect()}
    assert rows[1]["n_kept_lines"] == 0 and rows[1]["main_text"] == ""
    assert rows[2]["n_kept_lines"] == 1


def test_canonicalize_url_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u): the output grammar must
    be a fixed point, or chained pipelines would keep mutating URLs.
    Seeded random URLs over the full rule surface."""
    import random

    from implementation_of_an_etl_process_spark.operators.pretrain import (
        canonicalize_url,
    )

    rng = random.Random(88)
    urls = []
    for i in range(300):
        scheme = rng.choice(["http", "HTTP", "https", "HTTPS"])
        host = rng.choice(["www.", ""]) + f"Site{rng.randrange(40)}.example"
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/", f"/a{i}", f"/a{i}/b/", "/x%20y"])
        params = rng.sample(
            ["a=1", "b=2", "utm_source=t", "gclid=9", "z", "c=3&d"],
            rng.randrange(0, 4),
        )
        frag = rng.choice(["", "#f", "#f?fake=1"])
        q = ("?" + "&".join(params)) if params else ""
        urls.append((i, f"{scheme}://{host}{port}{path}{q}{frag}"))
    df = spark.createDataFrame(urls, "i long, url string")
    once = df.select("i", canonicalize_url("url").alias("c1"))
    twice = once.select(
        "i", "c1", canonicalize_url("c1").alias("c2")
    )
    bad = twice.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, [(r["c1"], r["c2"]) for r in bad[:5]]
