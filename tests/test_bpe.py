"""Distributed BPE tokenizer (operators/bpe.py) vs the pure-python
reference — trainer merge sequence, tie-breaks, encode replay, and
token conservation through the join-back plumbing. The battery entry
``bpe_tokenize_gate`` pins the full-corpus contract at sf0.01."""

from __future__ import annotations

import pytest

from implementation_of_an_etl_process_spark.operators.bpe import (
    END_OF_WORD,
    encode_bpe,
    py_encode_word,
    py_train_bpe,
    train_bpe,
    word_count_table,
)

_CLASSIC = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest widest widest"),
    (4, "low lowest"),
]


@pytest.fixture(scope="module")
def classic_df(spark):
    return spark.createDataFrame(_CLASSIC, "doc_id long, text string")


def test_train_matches_python_reference(spark, classic_df):
    merges = train_bpe(classic_df, n_merges=12)
    wc = {r["word"]: r["cnt"] for r in word_count_table(classic_df).collect()}
    assert merges == py_train_bpe(wc, 12)
    # the classic corpus learns the canonical first merges
    assert merges[:2] == [("e", "s"), ("es", "t")]


def test_train_early_stop_below_min_pair_count(spark):
    # every word unique, single occurrence -> no pair reaches count 2
    df = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id long, text string"
    )
    assert train_bpe(df, n_merges=5, min_pair_count=2) == []


def test_train_tie_break_is_lexicographic(spark):
    # four pairs all tie at count 2: (a,a), (a,</w>), (b,b), (b,</w>);
    # '<' sorts before any letter, so ('a','</w>') wins — pinned in
    # BOTH engines (the law is spark == python under ties)
    df = spark.createDataFrame(
        [(1, "aa aa bb bb")], "doc_id long, text string"
    )
    merges = train_bpe(df, n_merges=1)
    assert merges == [("a", END_OF_WORD)]
    wc = {"aa": 2, "bb": 2}
    assert merges == py_train_bpe(wc, 1)


def test_merge_pass_run_collapse_is_non_overlapping(spark):
    # "bbb" under merge (b,b): left-to-right gives [bb, b], never [b, bb]
    df = spark.createDataFrame([(1, "bbb bbb")], "doc_id long, text string")
    merges = [("b", "b")]
    out = encode_bpe(df, merges).first()
    assert out["bpe_tokens"] == ["bb", "b", END_OF_WORD] * 2
    assert py_encode_word("bbb", merges) == ["bb", "b", END_OF_WORD]


def test_encode_matches_python_reference_per_doc(spark, classic_df):
    merges = train_bpe(classic_df, n_merges=12)
    rows = {r["doc_id"]: r for r in encode_bpe(classic_df, merges).collect()}
    for doc_id, text in _CLASSIC:
        expect = [
            u for w in text.split() for u in py_encode_word(w, merges)
        ]
        assert rows[doc_id]["bpe_tokens"] == expect, doc_id
        assert rows[doc_id]["n_bpe_tokens"] == len(expect)
        assert rows[doc_id]["n_words"] == len(text.split())


def test_encode_empty_merges_is_chars_plus_marker(spark):
    df = spark.createDataFrame([(1, "ab x")], "doc_id long, text string")
    out = encode_bpe(df, []).first()
    assert out["bpe_tokens"] == ["a", "b", END_OF_WORD, "x", END_OF_WORD]


def test_param_validation(spark, classic_df):
    with pytest.raises(ValueError):
        train_bpe(classic_df, n_merges=0)
    with pytest.raises(ValueError):
        train_bpe(classic_df, n_merges=1, min_pair_count=0)


def _wc_df(spark, wc: dict[str, int]):
    rows = [(i, " ".join([w] * c)) for i, (w, c) in enumerate(wc.items())]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_batched_selection_matches_sequential_reference_seeded(spark):
    """Prefix-disjoint batch selection (batch_merges=32 default) must be
    BIT-IDENTICAL to the sequential m=1 reference.  Seeded random
    corpora over a tiny alphabet with counts drawn from {2,3,4} are
    maximally tie-heavy — the regime where a naive top-m batch diverges
    (a merge creates a new pair that ties an already-selected one)."""
    import random

    for seed in (11, 47):
        rng = random.Random(seed)
        words = {
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 5)))
            for _ in range(30)
        }
        wc = {w: rng.choice((2, 3, 4)) for w in words}
        got = train_bpe(_wc_df(spark, wc), n_merges=20)
        want = py_train_bpe(wc, 20)
        assert got == want, f"seed {seed}: {got} != {want}"


def test_batched_equals_batch1_on_classic(spark, classic_df):
    """batch_merges=1 (the classic one-argmax-per-job loop) and the
    default batched path must produce the identical merge list."""
    a = train_bpe(classic_df, n_merges=12, batch_merges=1)
    b = train_bpe(classic_df, n_merges=12, batch_merges=32)
    assert a == b


def test_batched_adversarial_overlap_tie(spark):
    """Hand-built conflict: ('a','b') and ('b','c') overlap on 'b' with
    EQUAL counts, and the runner-up disjoint pair ties the stopping
    pair — the trim + argmax-fallback path."""
    wc = {"ab": 5, "bc": 5, "de": 5, "fg": 4}
    got = train_bpe(_wc_df(spark, wc), n_merges=8)
    assert got == py_train_bpe(wc, 8)


def test_batched_self_pair_run_collapse_matches_sequential(spark):
    """Regression (ADVICE round 7, generalized): a SELF-pair merge
    (b,b) over long runs creates (bb,bb) with count bounded only by
    the selected pair's own count — a naive prefix-disjoint batch
    that keeps selecting past it diverges from sequential argmax.
    These corpora were found by fuzzing the pre-fix _select_batch
    (50k-trial fuzz of the fixed version: 0 divergences).  The fix
    ends the batch at any self-pair or concat-collision."""
    corpora = [
        {"aa": 3, "a": 4, "bbbbbb": 8, "babaaba": 3},
        {"bbaaaaaa": 9, "bb": 1, "a": 7, "aababb": 8},
        {"bbbbbbaa": 7, "bbabab": 1, "aaa": 2},
    ]
    for wc in corpora:
        for bm in (2, 32):
            got = train_bpe(_wc_df(spark, wc), n_merges=12, batch_merges=bm)
            want = py_train_bpe(wc, 12)
            assert got == want, f"{wc} bm={bm}: {got} != {want}"


def test_batched_concat_collision_matches_sequential(spark):
    """Concat aliasing: merge ('a','ab') produces symbol 'aab' while
    'aab'-adjacent contexts already exist via the ('aa','b') split
    path — created pairs alias onto existing keys.  The symbol-universe
    check must end the batch there and stay bit-identical to m=1."""
    wc = {"aab": 6, "aaba": 5, "baab": 5, "cc": 9, "dcc": 3}
    for bm in (2, 4, 32):
        got = train_bpe(_wc_df(spark, wc), n_merges=10, batch_merges=bm)
        want = py_train_bpe(wc, 10)
        assert got == want, f"bm={bm}: {got} != {want}"


def test_apply_mode_arrow_equals_column(spark, classic_df):
    """Both merge-application paths (per-merge Column folds vs one
    Arrow-batched replay per round) must learn the identical merge
    list — including on a self-pair/collision-heavy corpus where the
    batch ends early."""
    a = train_bpe(classic_df, n_merges=12, apply_mode="column")
    b = train_bpe(classic_df, n_merges=12, apply_mode="arrow")
    assert a == b
    wc = {"aa": 3, "a": 4, "bbbbbb": 8, "babaaba": 3}
    df = _wc_df(spark, wc)
    assert train_bpe(df, n_merges=10, apply_mode="arrow") == py_train_bpe(
        wc, 10
    )
    with pytest.raises(ValueError):
        train_bpe(classic_df, n_merges=2, apply_mode="nope")
