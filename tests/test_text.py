"""Text-analysis operator tests on crafted strings."""

from __future__ import annotations

from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.functions.text_exprs import (
    HASH_BASE,
    HASH_MOD,
    rolling_hash,
)
from implementation_of_an_etl_process_spark.operators import text as X


def _one(df):
    return df.collect()[0]


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, the World 42! ",)], ["text"])
    row = _one(
        df.select(
            X.token_count("text").alias("n"),
            X.bpe_ish_token_count("text").alias("b"),
        )
    )
    assert row.n == 4  # Hello, | the | World | 42!
    assert row.b == 6  # hello , the world 42 !


def test_quality_scores(spark):
    df = spark.createDataFrame([("the cat sat",)], ["doc_id dummy text".split()[2]])
    row = _one(X.quality_scores(df, "text"))
    assert row.n_chars == 11
    assert row.n_tokens == 3
    assert row.mean_token_len == 3.0  # (11 - 2 spaces) / 3
    assert abs(row.stopword_ratio - 1 / 3) < 1e-12  # 'the'
    assert row.punct_ratio == 0.0
    assert abs(row.alpha_ratio - 9 / 11) < 1e-12


def test_quality_scores_empty_ish(spark):
    df = spark.createDataFrame([("",), ("   ",)], ["text"])
    rows = X.quality_scores(df, "text").collect()
    for r in rows:
        assert r.punct_ratio == 0.0
        assert r.alpha_ratio == 0.0


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog",),       # en
            ("der hund und die katze",),    # de
            ("xyzzy plugh",),               # no markers -> und
            ("the der the",),               # en 2 vs de 1 -> en
        ],
        ["text"],
    )
    got = [r[0] for r in df.select(X.lang_id("text")).collect()]
    assert got == ["en", "de", "und", "en"]


def test_rolling_hash_reference_value(spark):
    """Pin the fold: h('ab') = (0*131+97)*131 + 98 mod 1e9+7 = 12805."""
    df = spark.createDataFrame([("ab",)], ["text"])
    assert _one(df.select(rolling_hash("text").alias("h"))).h == (97 * HASH_BASE + 98) % HASH_MOD


def test_rolling_hash_order_sensitive(spark):
    df = spark.createDataFrame([("ab cd",), ("cd ab",)], ["text"])
    hashes = [r[0] for r in df.select(rolling_hash("text")).collect()]
    assert hashes[0] != hashes[1]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "  Hello World "), (2, "hello world")], ["doc_id", "text"]
    )
    rows = X.fingerprint(df, "doc_id", "text").collect()
    assert rows[0].md5 == rows[1].md5  # trim+lower normalization
    assert rows[0].roll_hash != rows[1].roll_hash  # raw-content hash


def test_bigram_lm_score_matches_python_reference(spark):
    """Exact per-doc NLL against a pure-python add-one bigram LM over
    the same corpus (same quantization, same rounding)."""
    import math

    from implementation_of_an_etl_process_spark.operators.text import (
        SURPRISAL_SCALE,
        bigram_lm_score,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "a dog sat on a mat"),
        (4, "single"),
        (5, "  the   the the  "),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_nll_q"], r["avg_nll_q"])
        for r in bigram_lm_score(df).collect()
    }

    def toks(t):
        return [w for w in t.lower().strip().split() if w]

    pairs = {}
    per_doc = {}
    for doc_id, text in rows:
        ws = toks(text)
        bs = list(zip(ws, ws[1:]))
        per_doc[doc_id] = bs
        for bg in bs:
            pairs[bg] = pairs.get(bg, 0) + 1
    vocab = {w for bg in pairs for w in bg}
    v = len(vocab)
    ctx = {}
    for (w1, _), b in pairs.items():
        ctx[w1] = ctx.get(w1, 0) + b
    nll_q = {
        bg: round(math.log((ctx[bg[0]] + v) / (b + 1)) * SURPRISAL_SCALE)
        for bg, b in pairs.items()
    }
    for doc_id, bs in per_doc.items():
        if not bs:
            assert doc_id not in got  # <2 tokens -> no row
            continue
        sum_q = sum(nll_q[bg] for bg in bs)
        n = len(bs)
        avg = (1 if sum_q >= 0 else -1) * ((2 * abs(sum_q) + n) // (2 * n))
        assert got[doc_id] == (n, sum_q, avg), doc_id


def test_bigram_lm_min_count_prunes_model(spark):
    """min_count=2 (CCNet-style model bounding): hapax bigrams leave
    the MODEL; pairs scoring against the pruned model take the
    smoothed-unseen NLL ln(C(w1)+V) with C/V derived from the pruned
    table. min_count=1 must be bit-identical to the default path."""
    import math

    from implementation_of_an_etl_process_spark.operators.text import (
        SURPRISAL_SCALE,
        bigram_lm_score,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "a dog sat on a mat"),
        (4, "the cat sat again"),
        (5, "zz unique tail"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {
        r["doc_id"]: (r["n_bigrams"], r["sum_nll_q"], r["avg_nll_q"])
        for r in bigram_lm_score(df).collect()
    }
    same = {
        r["doc_id"]: (r["n_bigrams"], r["sum_nll_q"], r["avg_nll_q"])
        for r in bigram_lm_score(df, min_count=1).collect()
    }
    assert base == same  # default semantics untouched

    def toks(t):
        return [w for w in t.lower().strip().split() if w]

    pairs = {}
    per_doc = {}
    for doc_id, text in rows:
        ws = toks(text)
        bs = list(zip(ws, ws[1:]))
        per_doc[doc_id] = bs
        for bg in bs:
            pairs[bg] = pairs.get(bg, 0) + 1
    model = {bg: b for bg, b in pairs.items() if b >= 2}
    assert model and len(model) < len(pairs)  # pruning actually bites
    vocab = {w for bg in model for w in bg}
    v = len(vocab)
    ctx = {}
    for (w1, _), b in model.items():
        ctx[w1] = ctx.get(w1, 0) + b
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_nll_q"], r["avg_nll_q"])
        for r in bigram_lm_score(df, min_count=2).collect()
    }
    for doc_id, bs in per_doc.items():
        if not bs:
            continue
        q = []
        for bg in bs:
            if bg in model:
                q.append(
                    round(
                        math.log((ctx[bg[0]] + v) / (model[bg] + 1))
                        * SURPRISAL_SCALE
                    )
                )
            else:
                q.append(
                    round(
                        math.log(ctx.get(bg[0], 0) + v) * SURPRISAL_SCALE
                    )
                )
        sum_q, n = sum(q), len(q)
        avg = (1 if sum_q >= 0 else -1) * ((2 * abs(sum_q) + n) // (2 * n))
        assert got[doc_id] == (n, sum_q, avg), doc_id
    # pruned NLLs differ from the unpruned model's where hapax bigrams
    # were dropped (docs made only of repeated bigrams keep their rows)
    assert got != base


def test_bigram_lm_repetition_scores_low(spark):
    """The filter's point: a doc of one repeated bigram must score a
    LOWER average NLL than a doc of corpus-unique transitions."""
    from implementation_of_an_etl_process_spark.operators.text import (
        bigram_lm_score,
    )

    rows = [(1, "spam spam spam spam spam spam spam spam")] + [
        (i, f"w{i}a w{i}b w{i}c w{i}d") for i in range(2, 12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_nll_q"] for r in bigram_lm_score(df).collect()}
    assert got[1] < min(v for k, v in got.items() if k != 1)


def _py_winnow(words, k=3, w=4):
    import hashlib

    m = len(words) - k + 1
    if m < 1:
        return set()
    hs = [
        int(
            hashlib.md5(" ".join(words[i : i + k]).encode()).hexdigest()[:8],
            16,
        )
        for i in range(m)
    ]
    wl = min(w, m)
    sels = set()
    for j in range(max(m - w + 1, 1)):
        sub = hs[j : j + wl]
        mn = min(sub)
        pos_in = wl - sub[::-1].index(mn) - 1  # rightmost min
        sels.add((mn, j + pos_in + 1))  # 1-based absolute position
    return sels


def test_winnow_fingerprints_match_python_reference(spark):
    from implementation_of_an_etl_process_spark.operators.text import (
        winnow_fingerprints,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a b"),                      # < k tokens: no row
        (3, "x y z"),                    # exactly k tokens: one window
        (4, "w w w w w w"),              # identical grams: tie-breaking
        (5, "  padded   text with  odd   spacing here  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r["doc_id"], set()).add((r["fp_hash"], r["fp_pos"]))
    for doc_id, text in rows:
        want = _py_winnow(text.lower().split())
        if not want:
            assert doc_id not in got
        else:
            assert got[doc_id] == want, doc_id


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing guarantee: documents sharing a token run of
    length >= w + k - 1 (= 6 at k=3, w=4) share at least one
    fingerprint HASH — checked across 30 seeded pairs."""
    import random

    from implementation_of_an_etl_process_spark.operators.text import (
        winnow_fingerprints,
    )

    rng = random.Random(5)
    rows = []
    for p in range(30):
        shared = [f"s{p}_{i}" for i in range(6)]
        left = [f"l{p}_{i}" for i in range(rng.randrange(0, 8))]
        right = [f"r{p}_{i}" for i in range(rng.randrange(0, 8))]
        rows.append((2 * p, " ".join(left + shared + right)))
        rows.append((2 * p + 1, " ".join(
            [f"L{p}_{i}" for i in range(rng.randrange(0, 8))]
            + shared
            + [f"R{p}_{i}" for i in range(rng.randrange(0, 8))]
        )))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp: dict[int, set] = {}
    for r in winnow_fingerprints(df).collect():
        fp.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    for p in range(30):
        assert fp[2 * p] & fp[2 * p + 1], f"pair {p} shares no fingerprint"


def test_winnow_pairs_finds_overlap_and_caps_df(spark):
    from implementation_of_an_etl_process_spark.operators.text import (
        winnow_pairs,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "prefix words alpha beta gamma delta epsilon zeta eta theta"),
        (3, "totally different content with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_pairs(df, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # max_df=1 kills every shared fingerprint -> no pairs survive
    assert winnow_pairs(df, min_shared=1, max_df=1).count() == 0
