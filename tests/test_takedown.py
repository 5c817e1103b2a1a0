"""Cross-index takedown (operators/takedown.py, r13 verdict item 8):
one doc-id set removed from the corpus parquet AND all three persisted
indexes in one call, each unit under its own marker, results identical
to stores that never held the docs, reruns idempotent."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators import similarity as S
from implementation_of_an_etl_process_spark.operators import textindex as TI
from implementation_of_an_etl_process_spark.operators.dedup import (
    incremental_dedup_indexed,
    write_dedup_index,
)
from implementation_of_an_etl_process_spark.operators.takedown import (
    takedown_docs,
)

DIM = 8


def _docs(spark, ids):
    rows = [
        (
            i,
            f"alpha{i} beta{i % 5} shared corpus words gamma{i} tail",
            [float((i * 7 + j * 3) % 11) + 1.0 for j in range(DIM)],
        )
        for i in ids
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<float>"
    )


def _build_all(spark, docs, root):
    corpus = os.path.join(root, "corpus")
    docs.write.mode("overwrite").parquet(corpus)
    text_idx = os.path.join(root, "tidx")
    TI.write_text_index(
        docs.select("doc_id", "text"), text_idx, n_buckets=8
    )
    dedup_idx = os.path.join(root, "didx")
    write_dedup_index(docs, dedup_idx, "doc_id", "text")
    ann_idx = os.path.join(root, "aidx")
    kw = dict(corpus_id="doc_id", corpus_vec="embedding")
    cents = S.train_ivf_centroids(docs, n_cells=4, n_train=64, **kw)
    books = S.train_pq_codebooks_distributed(
        docs, m=4, n_codes=8, dim=DIM, centroids=cents, **kw
    )
    S.write_ivfpq_index(docs, ann_idx, books, cents, **kw)
    return corpus, text_idx, dedup_idx, ann_idx


def test_takedown_removes_everywhere_and_is_idempotent(spark, tmp_path):
    docs = _docs(spark, range(30))
    corpus, tidx, didx, aidx = _build_all(spark, docs, str(tmp_path))
    gone = [3, 7]
    out = takedown_docs(
        spark, gone,
        corpus_path=corpus, text_index=tidx,
        dedup_index=didx, ann_index=aidx,
    )
    assert out["text_deleted"] == 2 and out["text_deleted_tokens"] > 0
    assert out["dedup_deleted"] == 2
    assert out["ann_deleted"] == 2
    assert out["corpus_deleted"] == 2

    # corpus: rows physically gone, everything else intact
    left = spark.read.parquet(corpus)
    assert left.count() == 28
    assert left.filter(F.col("doc_id").isin(gone)).count() == 0

    # text index: queries row-identical to an index that never held
    # the docs (stats were adjusted, not just tombstoned)
    ref_tidx = str(tmp_path / "tidx_ref")
    TI.write_text_index(
        docs.filter(~F.col("doc_id").isin(gone)).select("doc_id", "text"),
        ref_tidx, n_buckets=8,
    )
    got = [
        tuple(r)
        for r in TI.bm25_query_index(
            spark, tidx, ["shared", "alpha3", "gamma7"], k=30
        ).collect()
    ]
    want = [
        tuple(r)
        for r in TI.bm25_query_index(
            spark, ref_tidx, ["shared", "alpha3", "gamma7"], k=30
        ).collect()
    ]
    assert got == want
    assert not any(r[0] in gone for r in got)

    # dedup index: an exact copy of a taken-down doc is NOVEL now
    probe = spark.createDataFrame(
        [(100, docs.filter(F.col("doc_id") == 3).first()["text"])],
        "doc_id long, text string",
    )
    v = {
        r["doc_id"]: r["verdict"]
        for r in incremental_dedup_indexed(
            spark, didx, docs, probe, "doc_id", "text"
        ).collect()
    }
    assert v == {100: "novel"}

    # ANN index: the docs never appear in any top-k
    q = docs.filter(F.col("doc_id") < 5)
    hits = S.ivfpq_query_index(
        spark, aidx, q, left,
        query_id="doc_id", query_vec="embedding",
        corpus_id="doc_id", corpus_vec="embedding",
        k=5, n_probe=4, shortlist=30,
    ).collect()
    assert hits and not any(r.cid in gone for r in hits)

    # rerun: every unit no-ops (idempotent recovery contract)
    again = takedown_docs(
        spark, gone + [999],
        corpus_path=corpus, text_index=tidx,
        dedup_index=didx, ann_index=aidx,
    )
    assert again == {
        "text_deleted": 0, "text_deleted_tokens": 0,
        "dedup_deleted": 0, "ann_deleted": 0, "corpus_deleted": 0,
    }


def test_takedown_partial_targets_and_contract(spark, tmp_path):
    """Targets are optional (pass what you materialized); zero targets
    raise; a held corpus marker collides loudly; a DataFrame id set
    works (single-column inference included)."""
    docs = _docs(spark, range(10))
    corpus = str(tmp_path / "corpus")
    docs.write.parquet(corpus)
    with pytest.raises(ValueError, match="at least one target"):
        takedown_docs(spark, [1])
    ids_df = spark.createDataFrame([(2,), (4,)], "some_id long")
    out = takedown_docs(spark, ids_df, corpus_path=corpus)
    assert out["corpus_deleted"] == 2
    assert out["text_deleted"] is None and out["ann_deleted"] is None
    assert spark.read.parquet(corpus).count() == 8
    # collision: a concurrent takedown's marker makes the rewrite
    # refuse instead of racing the swap
    marker = os.path.join(
        str(tmp_path), "_pending_takedown." + os.path.basename(corpus)
    )
    open(marker, "w").close()
    with pytest.raises(ValueError, match="collision"):
        takedown_docs(spark, [5], corpus_path=corpus)
    os.remove(marker)
    # unknown-only id set: corpus untouched (no needless rewrite)
    assert takedown_docs(spark, [999], corpus_path=corpus) == {
        "text_deleted": None, "text_deleted_tokens": None,
        "dedup_deleted": None, "ann_deleted": None, "corpus_deleted": 0,
    }
    assert spark.read.parquet(corpus).count() == 8


def test_sequential_takedowns_fresh_reads_see_swapped_corpus(spark, tmp_path):
    """r14 regression (caught by the full-scale leg): the corpus
    swap-rewrite replaces every part file under an UNCHANGED path, and
    Spark's shared FileStatusCache has no TTL — without the operator's
    refreshByPath, a post-takedown read (or a second takedown whose
    victims are derived from a fresh read of the corpus) can serve the
    pre-swap listing and die with FILE_NOT_EXIST. Two sequential
    takedowns with an interleaved fresh read must both succeed and the
    final corpus must hold exactly the double-survivors."""
    docs = _docs(spark, range(40))
    corpus = os.path.join(str(tmp_path), "corpus")
    docs.write.parquet(corpus)

    first = takedown_docs(
        spark, [i for i in range(40) if i % 4 == 0], corpus_path=corpus
    )
    assert first["corpus_deleted"] == 10
    # fresh read AFTER the swap: victims for round two come from the
    # rewritten corpus itself — the exact shape that hit the stale
    # listing at full scale
    alive = spark.read.parquet(corpus)
    v2 = alive.filter(F.col("doc_id") % 4 == 1).select("doc_id")
    second = takedown_docs(spark, v2, corpus_path=corpus)
    assert second["corpus_deleted"] == 10
    left = sorted(
        r.doc_id for r in spark.read.parquet(corpus).select("doc_id").collect()
    )
    assert left == [i for i in range(40) if i % 4 in (2, 3)]


def test_verify_takedown_residuals_and_audit_trail(spark, tmp_path):
    """r14: the auditor's half of the flow. verify_takedown counts
    what each store still serves for the id set through the live
    (tombstone-filtered) views: before the takedown every store shows
    the full victim set; after it every residual is zero and clean is
    True. takedown_docs(audit_path=...) appends one JSON line per
    call — the rerun's line records zero removals (the idempotency
    evidence in the audit record itself)."""
    import json

    from implementation_of_an_etl_process_spark.operators.takedown import (
        verify_takedown,
    )

    docs = _docs(spark, range(30))
    corpus, text_idx, dedup_idx, ann_idx = _build_all(
        spark, docs, str(tmp_path)
    )
    victims = [i for i in range(30) if i % 3 == 0]
    targets = dict(
        corpus_path=corpus,
        text_index=text_idx,
        dedup_index=dedup_idx,
        ann_index=ann_idx,
    )

    before = verify_takedown(spark, victims, **targets)
    assert before["corpus_residual"] == len(victims)
    assert before["text_residual"] == len(victims)
    assert before["dedup_residual"] == len(victims)
    assert before["ann_residual"] == len(victims)
    assert before["clean"] is False

    audit = os.path.join(str(tmp_path), "takedown_audit.jsonl")
    led = takedown_docs(spark, victims, audit_path=audit, **targets)
    assert led["corpus_deleted"] == len(victims)

    after = verify_takedown(spark, victims, **targets)
    assert after == {
        "corpus_residual": 0,
        "text_residual": 0,
        "dedup_residual": 0,
        "ann_residual": 0,
        "clean": True,
    }
    # survivors still served (the probe measures the ids, not the store)
    alive = verify_takedown(spark, [1, 2], **targets)
    assert alive["corpus_residual"] == 2 and alive["clean"] is False

    takedown_docs(spark, victims, audit_path=audit, **targets)  # rerun
    lines = [json.loads(x) for x in open(audit).read().splitlines()]
    assert len(lines) == 2
    assert lines[0]["n_ids"] == len(victims)
    assert lines[0]["corpus_deleted"] == len(victims)
    assert lines[1]["corpus_deleted"] == 0  # idempotent rerun, recorded
    assert lines[0]["ids_crc32_sum"] == lines[1]["ids_crc32_sum"]
    assert all("ts" in x for x in lines)

    with pytest.raises(ValueError):
        verify_takedown(spark, victims)
