"""Trained quality classifier (`operators/qualityml.py`): deterministic
unit coverage — the seeded tree must recover the weak-label threshold
rule from synthetic rows, and the battery gate must return the pinned
floor on a corpus where the rule is learnable (ADVICE r5: the gate
hard-pins agreement_pct_floor=90 with no in-repo evidence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators.qualityml import (
    QUALITY_FEATURES,
    score_quality,
    train_quality_classifier,
    weak_quality_labels,
)

_STOPS = "the a an and of to in is".split()


def _prose(i: int, n: int) -> str:
    """n-token prose-like text: every other token a stopword."""
    toks = []
    for j in range(n):
        toks.append(_STOPS[(i + j) % len(_STOPS)] if j % 2 else f"w{i}x{j}")
    return " ".join(toks)


def _junk(i: int, n: int) -> str:
    """n-token stopword-free junk."""
    return " ".join(f"z{i}q{j}" for j in range(n))


def _corpus(spark, n_docs: int = 200):
    rows = []
    for i in range(n_docs):
        if i % 2 == 0:
            rows.append((i, _prose(i, 24 + i % 7)))  # label 1
        elif i % 4 == 1:
            rows.append((i, _junk(i, 30)))  # long but no stopwords -> 0
        else:
            rows.append((i, _prose(i, 8)))  # prose but short -> 0
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_weak_labels_are_the_threshold_rule(spark):
    labeled = weak_quality_labels(_corpus(spark), "text")
    assert set(QUALITY_FEATURES) <= set(labeled.columns)
    for r in labeled.collect():
        expect = int(r["stopword_ratio"] >= 0.08 and r["n_tokens"] >= 20)
        assert r["quality_label"] == expect, r


def test_tree_recovers_weak_label_rule(spark):
    """The weak labels ARE axis-aligned thresholds, so a depth-5 tree
    with 128 bins must reproduce them exactly on held-out rows drawn
    from the same generator (deterministic: seeded fit, seeded data)."""
    labeled = weak_quality_labels(_corpus(spark, 200), "text")
    train = labeled.filter(F.col("doc_id") % 3 != 0)
    heldout = labeled.filter(F.col("doc_id") % 3 == 0)
    model = train_quality_classifier(train)
    scored = score_quality(model, heldout)
    rows = scored.collect()
    assert len(rows) > 50
    mismatches = [
        r for r in rows if r["quality_pred"] != r["quality_label"]
    ]
    assert not mismatches, mismatches[:5]
    # intermediate ML columns are dropped, prediction is int
    assert not [c for c in scored.columns if c.startswith("_qm_")]
    assert dict(scored.dtypes)["quality_pred"] == "int"


def test_lr_algo_and_bad_algo(spark):
    import pytest

    labeled = weak_quality_labels(_corpus(spark, 80), "text")
    model = train_quality_classifier(labeled, algo="lr")
    scored = score_quality(model, labeled)
    agree = scored.filter(
        F.col("quality_pred") == F.col("quality_label")
    ).count()
    assert agree / scored.count() >= 0.9
    with pytest.raises(ValueError, match="algo"):
        train_quality_classifier(labeled, algo="svm")
    with pytest.raises(ValueError, match="text_col"):
        train_quality_classifier(labeled, hash_features=64)


def test_battery_gate_clears_pinned_floor(spark):
    """The battery entry itself at sf0.001: agreement must clear the
    pinned 90% floor so the gate emits the constant the oracle pins —
    in-repo evidence the oracle's hard-coded floor is realistic."""
    from implementation_of_an_etl_process_spark.queries.pipelineops import (
        quality_classifier_gate,
    )

    out = quality_classifier_gate(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 1
    r = out[0]
    assert r["agreement_pct_floor"] == 90
    assert 0 < r["n_pos_labels"] <= r["n_heldout"]
