"""Deduplication operators for large-scale text/embedding corpora.

Five families, all expressed as distributed DataFrame plans (no driver
loops, no per-row Python):

- exact:     hash groupBy on the key columns (keep lowest id)
- fingerprint: md5/rolling-hash fingerprint equality
- n-gram Jaccard: exact set similarity via inverted-index self-join
- MinHash+LSH: shingle -> minhash signature -> banded bucket join ->
               exact-Jaccard verification of candidates
               (min-wise hashing per Broder, "On the resemblance and
               containment of documents", 1997; banding per
               Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3)
- SimHash:   64-bit signature, chunk-banded join, Hamming verification
               (random-projection hashing per Charikar, "Similarity
               estimation techniques from rounding algorithms", 2002)
- embedding cosine: quantized int cosine (see functions.vectors)

Scale notes: the inverted-index join shuffles on the shingle — frequent
shingles are the skew risk, so ``max_shingle_df`` drops shingles whose
document frequency exceeds a cutoff (a shingle shared by thousands of
docs contributes candidate pairs quadratically while carrying almost no
discriminative signal). MinHash banding caps candidate generation at
O(collisions), the 100 TB-safe path; exact Jaccard re-verifies, so
precision is unaffected by banding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.functions.text_exprs import (
    tokens,
    word_shingles,
)
from implementation_of_an_etl_process_spark.functions.vectors import (
    int_cosine,
    int_dot,
    quantize_vec,
)
from implementation_of_an_etl_process_spark.plans import spread

# ---------------------------------------------------------------------------
# Exact / fingerprint dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, keys: list[str], id_col: str, *, keep_keys: bool = True
) -> DataFrame:
    """One row per distinct key tuple: representative (min id) + count.

    ``keep_keys=False`` groups by a 128-bit FINGERPRINT of the key
    tuple instead of the raw keys and returns only (rep_id, n_dups) —
    the shuffle then carries 16 bytes per group instead of the full
    key payload (guide §2.3: shuffle keys/metadata, not payloads; a
    text-keyed dedup at corpus scale otherwise ships every distinct
    document through the exchange).

    The fingerprint is a struct of two xxhash64 values over the TYPED
    key columns under different seed prefixes. Typed hashing makes it
    collision-free exactly where groupBy is: arrays/structs hash
    element-wise (the former ``cast('string')`` render merged
    ['a, b'] with ['a','b']), and float -0.0/NaN normalize the same
    way UnsafeRow grouping does. Preconditions/limits: MAP-typed keys
    are rejected (Spark forbids hashing maps — use ``keep_keys=True``);
    xxhash64 is NOT cryptographic, so adversarially-constructed
    collisions are conceivable — inputs that need that guarantee
    should group on the raw keys (``keep_keys=True``). Random-collision
    odds are the same 2^-128 birthday regime as the previous md5."""
    if keep_keys:
        return df.groupBy(*keys).agg(
            F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n_dups")
        )
    for k, t in df.select(*keys).dtypes:
        if t.startswith("map<"):
            raise ValueError(
                f"key column {k!r} is MAP-typed: Spark cannot hash maps "
                "— use keep_keys=True (raw-key grouping) instead"
            )
    # interleave an explicit null marker per key: Spark's hash
    # expressions SKIP null inputs (the hash passes through unchanged),
    # so without markers (null, x) and (x, null) would collide — the
    # marker booleans occupy a fixed mix step per column, making null
    # placement part of the fingerprint exactly as it is part of the
    # groupBy key
    cols: list = []
    for k in keys:
        cols += [F.isnull(F.col(k)), F.col(k)]
    fp = F.struct(
        F.xxhash64(F.lit(0), *cols).alias("h0"),
        F.xxhash64(F.lit(1), *cols).alias("h1"),
    )
    return (
        df.select(fp.alias("_fp"), F.col(id_col))
        .groupBy("_fp")
        .agg(
            F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n_dups")
        )
        .select("rep_id", "n_dups")
    )


def drop_exact_duplicates(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per key tuple. Deterministic, unlike
    ``dropDuplicates`` (which keeps an arbitrary row per key)."""
    reps = exact_dedup_groups(df, keys, id_col, keep_keys=False).select(
        F.col("rep_id").alias(id_col)
    )
    return df.join(reps, id_col, "left_semi")


def _local_ids(spark, ids, col: str):
    from implementation_of_an_etl_process_spark.plans import local_rows_df

    return local_rows_df(spark, [(int(i),) for i in ids], f"{col} long")


def fingerprint_md5(df: DataFrame, text_col: str, *, normalize: bool = True) -> Column:
    c = F.col(text_col)
    if normalize:
        c = F.lower(F.trim(c))
    return F.md5(c)


# ---------------------------------------------------------------------------
# Shingle machinery shared by Jaccard / MinHash
# ---------------------------------------------------------------------------


def _shingle_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    max_shingle_df: int | None,
) -> DataFrame:
    """(id, shingle) pairs, distinct per document."""
    sh = spread(df).select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(tokens(text_col), k)).alias("shingle"),
    )
    if max_shingle_df is not None:
        # Drop stop-shingles: quadratic candidate blowup, no signal.
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    return sh


def _verify_pairs_exact(sh: DataFrame, cand: DataFrame | None, threshold: float) -> DataFrame:
    """Exact Jaccard over a shingle table, optionally restricted to
    candidate pairs. Jaccard = |A∩B| / (|A|+|B|-|A∩B|) — all-int inputs,
    so the double division is engine-exact.

    With candidates, intersections are computed by joining each pair to
    its two shingle sets — cost O(|candidates| * doc_len), independent
    of corpus size (the point of LSH). Without, the full inverted-index
    self-join (the exact/brute path)."""
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    if cand is None:
        a = sh.select(F.col("_id").alias("id_a"), "shingle")
        b = sh.select(F.col("_id").alias("id_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("_inter"))
        )
    else:
        a_sh = cand.join(
            sh.select(F.col("_id").alias("id_a"), "shingle"), "id_a"
        )
        inter = a_sh.join(
            sh.select(F.col("_id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        ).groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("_inter"))
    return (
        inter.join(sizes.withColumnRenamed("_n", "_na"), inter.id_a == sizes._id)
        .drop("_id")
        .join(
            sizes.withColumnRenamed("_n", "_nb").withColumnRenamed("_id", "_idb"),
            F.col("id_b") == F.col("_idb"),
        )
        .drop("_idb")
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def banding_sensitive_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    lo: float = 0.07,
    hi: float = 0.9,
) -> DataFrame:
    """True pairs whose exact Jaccard falls in (lo, hi) — the window
    where the battery's exactness gates are probabilistically exposed:
    below-but-near-threshold pairs say nothing (verify excludes them
    exactly), but a true pair at s just above the 0.8 threshold is
    missed by 32x8 banding with probability (1-s^4)^8 (1.5e-2 at
    s=0.80, 1.9e-4 at s=0.90). The gates are stable because the
    shipped corpus has NO pair in this window (lowest above-threshold
    pair sits at J=0.90); ``tests/test_dedup.py`` asserts that with
    this function so a regenerated corpus that breaks the assumption
    fails loudly instead of making the LSH entries intermittently
    flaky. Brute-force — test-scale use only.
    """
    sh = _shingle_table(df, id_col, text_col, k, None)
    return _verify_pairs_exact(sh, None, lo).filter(F.col("jaccard") < hi)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact near-dup pairs by word-k-gram Jaccard (inverted-index join).

    Exact but O(sum of squared shingle document-frequencies) — the
    baseline/oracle path. Use :func:`minhash_lsh_pairs` at scale.
    """
    sh = _shingle_table(df, id_col, text_col, k, max_shingle_df)
    return _verify_pairs_exact(sh, None, threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    sh: DataFrame, *, n_hashes: int = 64, include_size: bool = False
) -> DataFrame:
    """(_id, h0..h{n-1}[, _n]) minhash signature via n parallel
    min-aggregates — the single definition of the hash family
    (xxhash64 seeded by (i, shingle)): independent enough for LSH,
    entirely JVM-side, partial-aggregatable (each min combines
    map-side, so the shuffle carries one row per doc).

    ``include_size=True`` adds the doc's shingle-set size ``_n`` to the
    SAME aggregate — callers that need sizes downstream (the LSH verify
    stage) get them without a second pass over the shingle table.
    """
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    if include_size:
        aggs.append(F.count(F.lit(1)).alias("_n"))
    return sh.groupBy("_id").agg(*aggs)


def _banded(sig: DataFrame, bands: int, rows: int) -> DataFrame:
    """Explode a signature frame into (_id, _n, band, bucket) rows —
    the single definition of the banding hash, shared by the symmetric
    (:func:`minhash_lsh_pairs`) and asymmetric
    (:func:`incremental_dedup`) paths so they can never diverge."""
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias(
                    "bucket"
                ),
            )
            for b in range(bands)
        ]
    )
    return sig.select("_id", "_n", F.explode(band_cols).alias("bb")).select(
        "_id",
        "_n",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )


def _jaccard_from_candidates(
    cand: DataFrame, sh: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verify over (id_a, id_b, _na, _nb) candidates and a
    (_id, shingle) table (sizes already ride on the candidate row)."""
    a_sh = cand.join(sh.select(F.col("_id").alias("id_a"), "shingle"), "id_a")
    inter = (
        a_sh.join(
            sh.select(F.col("_id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b", "_na", "_nb")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _exact_copy_members(
    df: DataFrame, id_col: str, text_col: str, *, with_shingle_flag: int | None = None
) -> DataFrame:
    """(_mid, _m[, _hs]) rows: member id, raw-text md5 group key, and
    (optionally, when ``with_shingle_flag=k``) whether the text yields
    at least one k-shingle. Raw (un-normalized) md5 so group members
    are guaranteed byte-identical — identical shingle sets, identical
    Jaccard against every other document. The single definition of the
    exact-copy group key shared by the symmetric and incremental
    hot-bucket guards."""
    cols = [F.col(id_col).alias("_mid"), F.md5(F.col(text_col)).alias("_m")]
    if with_shingle_flag is not None:
        # n tokens yield n-k+1 k-shingles, so ">= 1 shingle" is exactly
        # "token count >= k" — a size() on the split array, WITHOUT
        # materializing the shingle strings (the concat-per-shingle
        # build was most of the guard pass's CPU).
        cols.append(
            (F.size(tokens(text_col)) >= with_shingle_flag).alias("_hs")
        )
    return spread(df).select(*cols)


def _dup_member_map(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    with_shingle_flag: int | None = None,
    materialize: str = "checkpoint",
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """(_m, _mid, _rep[, _ghs]) rows for documents in MULTI-member
    byte-identical text groups only — the corpus-proportional state of
    the hot-bucket guard. Singleton groups (the overwhelming majority
    of any corpus) never appear here: their docs pass through the LSH
    pipeline and the pair expansion untouched (left-join miss =
    identity), so the guard costs one md5 aggregate plus joins sized by
    the number of exact-duplicate docs, NOT by the corpus. The
    materialized map is small by the same argument, so AQE plans the
    downstream joins as broadcasts at runtime.

    ``materialize``: ``"checkpoint"`` runs an eager job now (callers
    that must pin the map before mutating shared state — the
    incremental/ingest paths); ``"persist"`` marks it MEMORY_AND_DISK
    and lets the CALLER's first action fill the cache — no separate
    job, the map computes inside the pipeline it guards (the symmetric
    path's choice; ~0.6s of fixed job overhead saved at sf0.1);
    ``"none"`` returns the bare lazy plan (the persistence-free caller
    contract)."""
    from pyspark.sql import Window

    members = _exact_copy_members(
        df, id_col, text_col, with_shingle_flag=with_shingle_flag
    )
    # ONE corpus scan + ONE shuffle: group size and representative as
    # window aggregates over the md5 key, then keep multi-member rows.
    # (The previous groupBy + join-back shape scanned the corpus twice
    # and paid a second join exchange — same output, strictly more
    # stages at every scale.)
    w = Window.partitionBy("_m")
    cols = ["_m", "_mid", "_rep"] + (
        ["_ghs"] if with_shingle_flag is not None else []
    )
    dup = (
        members.withColumn("_gs", F.count(F.lit(1)).over(w))
        .withColumn("_rep", F.min("_mid").over(w))
        .filter(F.col("_gs") >= 2)
    )
    if with_shingle_flag is not None:
        # group-constant (texts are byte-identical): the row's own flag
        # is the group's flag
        dup = dup.withColumn("_ghs", F.col("_hs"))
    dup = dup.select(*cols)
    if materialize == "none":
        return dup
    if materialize == "persist":
        from pyspark.storagelevel import StorageLevel

        dup = dup.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_registry is not None:
            cache_registry.append(dup)
        return dup
    return dup.localCheckpoint(eager=True)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
    persist_shingles: bool = True,
    cache_registry: list[DataFrame] | None = None,
    collapse_exact: bool = True,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified by exact Jaccard.

    With b bands of r=n_hashes/b rows, detection probability at
    similarity s is 1-(1-s^r)^b. The 32x8 default: ≈0.985 at exactly
    s=0.8 and ≈1-1e-11 at s=0.99 (real near-dups) — candidates are
    re-verified exactly, so precision is exact and recall at realistic
    near-dup similarity indistinguishable from brute force; raise to
    64x16 (≈0.9998 at 0.8) or 128/32 when borderline-pair recall
    matters more than the signature-width cost.

    Verify-stage scoping (the 100 TB lever): candidates name only a
    small fraction of the corpus (sum of banding collisions), so by
    default the verify stage RE-SHINGLES just the candidate documents
    (semi-join on the materialized candidate ids) instead of persisting
    the full corpus-sized shingle table for the signature/verify
    diamond — measured 546s -> 279s at 4M docs / 152M shingles, where
    the full-table MEMORY_AND_DISK persist dominated the runtime.
    The classic diamond (persist the full shingle table) remains for
    (a) ``max_shingle_df`` (the stop-shingle df filter needs global
    statistics the subset can't reproduce), (b) ``cache_registry``
    callers, whose contract is a fully lazy plan: they receive the
    persisted handle and unpersist after materializing the result,
    (c) ``persist_shingles=False``, whose contract is a fully lazy,
    persistence-free plan (the scoped path requires an eager candidate
    materialization), and (d) LATENCY-gated inputs (leaf scans proven
    < 64 MB): there the full shingle table is small by construction,
    so the scoped path's extra machinery — an eager candidate
    checkpoint job, a distinct-ids exchange, a semi-join, and a second
    shingle pass — is pure fixed overhead (guide §1.2/§2.4; r15
    measured jobs/run 17 -> 14, stages 25 -> 18, tasks 510 -> 390 and
    wall 2.99 -> 1.88s at sf0.1 from this fold alone). At scale the
    gate fails open and the scoped path keeps the corpus-sized table
    unpersisted.

    Hot-bucket guard (``collapse_exact``, default on): a corpus with n
    byte-identical copies of one document puts all n in the same
    (band, bucket) in EVERY band — the candidate self-join goes
    quadratic (bands * n^2 rows before ``distinct``), and real crawls
    hit exactly this (mirror farms, boilerplate pages). The guard
    collapses each raw-md5 text group to its min-id representative
    BEFORE shingling, runs the full LSH pipeline on representatives
    only, then expands: intra-group member pairs are emitted directly
    with jaccard = 1.0 (byte-identical texts; only for groups whose
    text yields >= 1 k-shingle, matching the brute-force oracle which
    never pairs shingle-less docs), and each representative pair
    expands to all cross-group member pairs carrying the
    representatives' exact jaccard (members are byte-identical to
    their representative, so the value is exact, not approximate).
    Semantics are therefore EXACTLY brute force; cost for the
    degenerate corpus drops from O(bands * n^2) candidate rows +
    shingle-verify to one md5 groupBy plus an equi-join whose output
    is the (irreducible) pair list itself. Collapse is skipped when
    ``max_shingle_df`` is set (global shingle document frequencies
    must be counted over the full corpus, not representatives).
    """
    from implementation_of_an_etl_process_spark.plans import (
        latency_mode,
        small_leaf_input,
    )

    rows = n_hashes // bands
    collapse = collapse_exact and max_shingle_df is None and threshold <= 1.0
    # Latency mode (small PROVEN input + the eager-materialization
    # contract): the guard's extra joins cost ~8 AQE shuffle-stage
    # sub-jobs of pure scheduling at toy scale (measured 27 vs 12 jobs,
    # 3.1s vs 1.9s at sf0.1) — run the internal materializations with
    # AQE off and pin the EXPANDED result before returning. Fails open:
    # big or un-introspectable inputs keep AQE (skew splitting in the
    # banding join, runtime broadcast promotion).
    latency = (
        persist_shingles
        and cache_registry is None
        and small_leaf_input(df)
    )
    dup_members = None
    if collapse:
        # persist (not eager checkpoint): the map's cache fills inside
        # the candidate job's anti-join — the guard costs a subplan of
        # the pipeline, not a separate up-front job. Cached because the
        # pair expansion reads it 3x after `out` is pinned; the
        # persistence-free caller contract (persist_shingles=False)
        # gets the bare lazy plan and accepts the recomputes.
        dup_members = _dup_member_map(
            df,
            id_col,
            text_col,
            with_shingle_flag=k,
            materialize="none" if not persist_shingles else "persist",
            cache_registry=cache_registry,
        )
        # drop the NON-representative duplicate docs; everything else
        # (singletons + one rep per dup group) flows through unchanged
        non_reps = dup_members.filter(F.col("_mid") != F.col("_rep")).select(
            F.col("_mid").alias(id_col)
        )
        df = df.join(non_reps, id_col, "left_anti")
    with latency_mode(df.sparkSession, latency):
        classic_diamond = (
            max_shingle_df is not None
            or cache_registry is not None
            or not persist_shingles
            # latency-gated (provably small) input: the full shingle
            # table is bounded, so the diamond persist is safe and the
            # scoped path's candidate checkpoint + distinct + semi-join
            # + re-shingle are pure stage overhead (see docstring (d))
            or latency
        )
        sh = _shingle_table(df, id_col, text_col, k, max_shingle_df)
        if classic_diamond and persist_shingles:
            # the shingle table feeds BOTH the signature and the verify
            # stage (diamond plan) — persist so it's computed once; spills
            # to disk under pressure, LRU-evicted when unused
            from pyspark.storagelevel import StorageLevel

            sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
            if cache_registry is not None:
                cache_registry.append(sh)
        # one aggregate produces the signature AND the doc shingle-set size:
        # the size rides along through banding into the verify arithmetic,
        # replacing two joins against a separately-aggregated sizes table
        # (measured ~2s of stage overhead at sf0.1, and at scale it removes
        # one full pass over the shingle table)
        sig = minhash_signature(sh, n_hashes=n_hashes, include_size=True)
        banded = _banded(sig, bands, rows)
        left = banded.select(
            F.col("_id").alias("id_a"), F.col("_n").alias("_na"), "band", "bucket"
        )
        right = banded.select(
            F.col("_id").alias("id_b"), F.col("_n").alias("_nb"), "band", "bucket"
        )
        cand = (
            left.join(right, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "_na", "_nb")
            .distinct()
        )
        if not classic_diamond:
            # Materialize the (small) candidate set once, then re-shingle
            # ONLY the documents it names — the corpus-sized shingle table
            # is never stored. localCheckpoint output is auto-cleaned when
            # the frame is GC'd.
            cand = cand.localCheckpoint(eager=True)
            need = (
                cand.select(F.col("id_a").alias(id_col))
                .union(cand.select(F.col("id_b").alias(id_col)))
                .distinct()
            )
            verify_sh = _shingle_table(
                df.join(need, id_col, "left_semi"), id_col, text_col, k, None
            )
            from pyspark.storagelevel import StorageLevel

            verify_sh = verify_sh.persist(StorageLevel.MEMORY_AND_DISK)
        else:
            verify_sh = sh
        out = _jaccard_from_candidates(cand, verify_sh, threshold)
        if persist_shingles and cache_registry is None:
            if not (latency and collapse):
                out = out.localCheckpoint(eager=True)
                verify_sh.unpersist()
            # latency+collapse: the post-expansion checkpoint below
            # subsumes this one — don't materialize the pair table twice
        if collapse:
            # expand representative pairs back to member pairs (left-join
            # miss = singleton = identity), and emit the intra-group
            # (byte-identical, jaccard exactly 1.0) pairs directly — both
            # joins are against the small dup-group map
            ea = dup_members.select(
                F.col("_rep").alias("id_a"), F.col("_mid").alias("_ma")
            )
            eb = dup_members.select(
                F.col("_rep").alias("id_b"), F.col("_mid").alias("_mb")
            )
            cross = (
                out.join(ea, "id_a", "left")
                .join(eb, "id_b", "left")
                .select(
                    F.least(
                        F.coalesce(F.col("_ma"), F.col("id_a")),
                        F.coalesce(F.col("_mb"), F.col("id_b")),
                    ).alias("id_a"),
                    F.greatest(
                        F.coalesce(F.col("_ma"), F.col("id_a")),
                        F.coalesce(F.col("_mb"), F.col("id_b")),
                    ).alias("id_b"),
                    "jaccard",
                )
            )
            intra = (
                dup_members.filter(F.col("_ghs"))
                .select("_m", F.col("_mid").alias("id_a"))
                .join(dup_members.select("_m", F.col("_mid").alias("id_b")), "_m")
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b", F.lit(1.0).alias("jaccard"))
            )
            out = cross.unionByName(intra)
        if latency and collapse:
            if persist_shingles and cache_registry is None:
                _vsh_release = verify_sh
            else:
                _vsh_release = None
            # pin the expanded pair list while AQE is still off (the
            # expansion joins are exactly the sub-job-heavy part —
            # latency_mode's contract: materialize INSIDE the block)
            # and release the guard map — bounded-cache hygiene
            out = out.localCheckpoint(eager=True)
            if _vsh_release is not None:
                _vsh_release.unpersist()
            dup_members.unpersist()
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 64
_SIMHASH_CHUNKS = 4  # pigeonhole banding: hamming<=3 -> >=1 equal 16-bit chunk


def portable_hash64(col: Column) -> Column:
    """64-bit hash other engines can reproduce: the first 16 hex chars
    of md5, assembled from two 32-bit halves (8 hex chars each fit a
    long exactly; shift+or is pure bit arithmetic, ANSI-safe).

    DuckDB equivalent, bit-for-bit::

        ('0x'||substr(md5(x),1,8))::UBIGINT -- high half
        ('0x'||substr(md5(x),9,8))::UBIGINT -- low half

    md5 costs ~2x xxhash64 per value — pay it when cross-engine
    verification matters; flip to ``hash_fn="xxhash64"`` in pure-Spark
    production runs.
    """
    hx = F.md5(col)
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def simhash_signature(
    df: DataFrame, id_col: str, text_col: str, *, hash_fn: str = "md5"
) -> DataFrame:
    """(id, simhash) — 64-bit SimHash over whitespace tokens.

    Per token hash h, bit j contributes +1 if set else -1; the signature
    bit j is 1 iff the per-document sum is positive. Expressed as 64
    conditional-sum aggregates (one shuffle, partial-aggregated).

    ``hash_fn="md5"`` (default) uses :func:`portable_hash64` so results
    are verifiable against a DuckDB oracle; ``"xxhash64"`` is the faster
    JVM-only hash for production."""
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    token_hash = (
        portable_hash64(F.col("tok"))
        if hash_fn == "md5"
        else F.xxhash64("tok")
    )
    tok = spread(df).select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(text_col)).alias("tok"),
    ).withColumn("h", token_hash)
    bit_sums = tok.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{j}")
            for j in range(_SIMHASH_BITS)
        ]
    )
    sig = F.lit(0).cast("long")
    for j in range(_SIMHASH_BITS):
        sig = sig + F.when(
            F.col(f"b{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
    return bit_sums.select("_id", sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Banding: split the 64-bit signature into 4 16-bit chunks; any pair
    within Hamming<=3 must agree on >=1 chunk (pigeonhole), so the join
    on (chunk_idx, chunk_value) finds all such pairs; bit_count(XOR)
    verifies exactly."""
    sig = simhash_signature(df, id_col, text_col, hash_fn=hash_fn)
    return hamming_banded_pairs(
        sig, "_id", "simhash", max_hamming=max_hamming
    )


# "auto" collapse threshold: an identical-signature group of n rows
# contributes ~4n² candidate rows per band before distinct; below this
# the guard's extra group/expand joins cost more than they save (the
# measured crossover sits well above it — 64² = 4096 candidates/group
# is noise, 20k² is an 84.7s -> 9.6s disaster).
_COLLAPSE_AUTO_THRESHOLD = 64


def hamming_banded_pairs(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    *,
    max_hamming: int = 3,
    collapse_exact: bool | str = True,
) -> DataFrame:
    """All pairs of rows whose 64-bit signatures are within
    ``max_hamming`` — the banded join any 64-bit fingerprint family
    (SimHash text, aHash images, …) shares.

    Banding: split the signature into 4 16-bit chunks; any pair within
    Hamming<=3 must agree on >=1 chunk (pigeonhole), so the join on
    (chunk_idx, chunk_value) finds all such pairs without an all-pairs
    product; bit_count(XOR) verifies exactly. Output:
    (id_a, id_b, hamming) with id_a < id_b.

    Hot-bucket guard (``collapse_exact``, default on — the same
    degenerate case the MinHash farm guard handles): n rows with the
    IDENTICAL signature (blank/near-black images, boilerplate text)
    collide in every chunk of every band, so the raw candidate join
    materializes 4n^2 rows before distinct. The guard groups identical
    signatures first (one map-side-combined shuffle on the narrow
    (id, sig) relation), runs banding over DISTINCT signatures only,
    then expands representatives back to members — intra-group pairs
    (hamming 0) are emitted directly and cross-group pairs via two
    joins against the group map; everything materialized is
    output-sized. Remaining skew honesty: near-identical-but-unequal
    signatures sharing one hot chunk value still fan out in that
    chunk's bucket — bounded by 4 chunk tables of 2^16 buckets, and
    exact duplicates (the unbounded case) no longer contribute.

    The guard costs ~2x on ALL-DISTINCT signature sets (committed
    round-8 A/B: 7.4s -> 14.1s on the 500k-image leg), so callers that
    know their signatures are unique should pass ``False`` — and
    callers that DON'T know can pass ``"auto"``: one map-side-combined
    max-multiplicity probe over the narrow (sig) projection decides at
    plan-build time (an eager action — feed an already-materialized
    ``sig`` such as a localCheckpoint when the signature lineage is
    expensive, e.g. image decode, or the probe re-executes it). The
    signal is the LARGEST identical-signature group, not mere duplicate
    existence: candidate blowup is Σ nᵢ² per band, so 46k thin pairs in
    a 500k corpus are harmless (round-9 A/B: guard-off 1.6s, guard-on
    ~7.5s there) while one 20k-identical farm is fatal (round-8 A/B:
    84.7s -> 9.6s). ``auto`` collapses iff max multiplicity >=
    _COLLAPSE_AUTO_THRESHOLD. Note a payload-level exact dedup upstream
    does NOT imply distinct signatures — distinct payloads can hash
    identically — which is why the probe looks at the signatures
    themselves."""
    if max_hamming >= _SIMHASH_CHUNKS:
        raise ValueError(
            f"banding supports max_hamming < {_SIMHASH_CHUNKS}"
        )
    if collapse_exact == "auto":
        probe = (
            sig.groupBy(sig_col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.max("_n").alias("mx"))
            .first()
        )
        collapse_exact = (probe["mx"] or 0) >= _COLLAPSE_AUTO_THRESHOLD
    elif not isinstance(collapse_exact, bool):
        raise ValueError(
            f"collapse_exact must be True, False, or 'auto': "
            f"{collapse_exact!r}"
        )
    if collapse_exact:
        members = sig.select(
            F.col(id_col).alias("_mid"), F.col(sig_col).alias("_msig")
        )
        groups = members.groupBy("_msig").agg(
            F.min("_mid").alias("_rep"), F.count(F.lit(1)).alias("_n")
        )
        reps = groups.select(
            F.col("_rep").alias(id_col), F.col("_msig").alias(sig_col)
        )
        core = hamming_banded_pairs(
            reps, id_col, sig_col,
            max_hamming=max_hamming, collapse_exact=False,
        )
        gmap = members.join(groups, "_msig")
        ea = gmap.select(F.col("_rep").alias("id_a"), F.col("_mid").alias("_ma"))
        eb = gmap.select(F.col("_rep").alias("id_b"), F.col("_mid").alias("_mb"))
        cross = (
            core.join(ea, "id_a")
            .join(eb, "id_b")
            .select(
                F.least("_ma", "_mb").alias("id_a"),
                F.greatest("_ma", "_mb").alias("id_b"),
                "hamming",
            )
        )
        intra = (
            gmap.filter(F.col("_n") > 1)
            .select("_msig", F.col("_mid").alias("id_a"))
            .join(gmap.select("_msig", F.col("_mid").alias("id_b")), "_msig")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.lit(0).alias("hamming"))
        )
        return cross.unionByName(intra)
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftright(F.col(sig_col), 16 * c)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("chunk_val"),
            )
            for c in range(_SIMHASH_CHUNKS)
        ]
    )
    banded = sig.select(
        F.col(id_col).alias("_hid"),
        F.col(sig_col).alias("_hsig"),
        F.explode(chunks).alias("cc"),
    ).select("_hid", "_hsig", F.col("cc.chunk_idx"), F.col("cc.chunk_val"))
    left = banded.select(
        F.col("_hid").alias("id_a"), F.col("_hsig").alias("sig_a"),
        "chunk_idx", "chunk_val",
    )
    right = banded.select(
        F.col("_hid").alias("id_b"), F.col("_hsig").alias("sig_b"),
        "chunk_idx", "chunk_val",
    )
    return (
        left.join(right, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def plane_signs(set_idx: int, plane_idx: int, dim: int) -> list[int]:
    """Deterministic ±1 hyperplane components, generated driver-side
    (md5 of "set:plane:component") and embedded as literals — the SAME
    matrix is reproducible in any engine (the DuckDB oracle embeds
    these very numbers), and task retries can't perturb it."""
    import hashlib

    return [
        1
        if hashlib.md5(f"{set_idx}:{plane_idx}:{i}".encode()).digest()[0] & 1
        else -1
        for i in range(dim)
    ]


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
    n_planes: int | None = None,
    n_plane_sets: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Pairs with quantized-int cosine >= threshold.

    ``n_planes=None``: exact all-pairs (self cross join) — O(n^2), the
    verification path for small corpora ONLY. With ``n_planes=p``:
    random-hyperplane LSH (sign pattern of p ±1-projections; Charikar
    2002) — only same-bucket pairs are compared, then re-verified with
    the exact cosine, so precision is exact and recall is the collision
    probability: a pair at cosine s shares a bucket with probability
    (1 - acos(s)/pi)^p per plane set. ``n_plane_sets=L`` unions L
    independent sets (miss probability to the L-th power) — the
    banded-LSH recall lever, same as MinHash bands.

    The scale path: candidates are (id, id) pairs from a bucket
    equi-join (shuffle on bucket), vectors re-joined only for the
    candidate set — no cross join anywhere in the plan. ``dim`` avoids
    a driver metadata read when the caller knows the width.
    """
    from implementation_of_an_etl_process_spark.functions.vectors import (
        int_norm2,
    )

    # hoist the squared norm: computed once per vector here, instead of
    # twice per PAIR inside the cosine (O(n) vs O(n^2) norm work)
    q = spread(df).select(
        F.col(id_col).alias("_id"),
        quantize_vec(vec_col).alias("_q"),
    ).withColumn("_n2", int_norm2(F.col("_q")).cast("double"))
    cosine = F.round(
        int_dot(F.col("qa"), F.col("qb")).cast("double")
        / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))),
        6,
    )
    if n_planes:
        if dim is None:
            # bounded driver read: one row of metadata, not data
            dim = q.select(F.size("_q").alias("d")).first()["d"]

        def bucket_col(set_idx: int) -> Column:
            b = F.lit(0)
            for p in range(n_planes):
                signs = F.array(
                    *[F.lit(s) for s in plane_signs(set_idx, p, dim)]
                )
                proj = F.aggregate(
                    F.zip_with(
                        F.col("_q"), signs, lambda x, s: x * s.cast("long")
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
                b = b + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
            return b

        banded = q.select(
            "_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(l).alias("s"), bucket_col(l).alias("bkt")
                        )
                        for l in range(n_plane_sets)
                    ]
                )
            ).alias("sb"),
        ).select("_id", F.col("sb.s").alias("s"), F.col("sb.bkt").alias("bkt"))
        cand = (
            banded.alias("a")
            .join(banded.alias("b"), ["s", "bkt"])
            .select(
                F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .distinct()
        )
        joined = cand.join(
            q.select(
                F.col("_id").alias("id_a"), F.col("_q").alias("qa"),
                F.col("_n2").alias("na2"),
            ),
            "id_a",
        ).join(
            q.select(
                F.col("_id").alias("id_b"), F.col("_q").alias("qb"),
                F.col("_n2").alias("nb2"),
            ),
            "id_b",
        )
    else:
        a = q.select(
            F.col("_id").alias("id_a"), F.col("_q").alias("qa"),
            F.col("_n2").alias("na2"),
        )
        b = q.select(
            F.col("_id").alias("id_b"), F.col("_q").alias("qb"),
            F.col("_n2").alias("nb2"),
        )
        joined = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    # same arithmetic as functions.vectors.int_cosine, with the norms
    # hoisted out of the pair loop
    return (
        joined.withColumn("cosine", cosine)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: pairs -> connected components -> keep representative
# ---------------------------------------------------------------------------


def cluster_pairs(pairs: DataFrame, *, max_iterations: int = 20) -> DataFrame:
    """Connected components over near-dup pairs via min-label
    propagation: every vertex repeatedly adopts the smallest id
    reachable in one hop until fixpoint (converges in O(diameter)
    rounds; near-dup clusters are shallow, so a handful).

    Returns (``_id``, ``cluster``) where cluster = min id of the
    component. The per-round work is two joins + an aggregate — all
    distributed; the driver only orchestrates rounds and checks the
    convergence counter (control plane, not data plane).
    ``localCheckpoint`` cuts lineage so plans stay flat across rounds.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("id_b").alias("src"), F.col("id_a").alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("_id"))
        .distinct()
        .withColumn("cluster", F.col("_id"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels._id)
            .groupBy("src")
            .agg(F.min("cluster").alias("nbr_cluster"))
        )
        new_labels = (
            labels.join(neighbor_min, labels._id == neighbor_min.src, "left")
            .select(
                "_id",
                F.least(
                    F.col("cluster"), F.coalesce("nbr_cluster", F.col("cluster"))
                ).alias("cluster"),
                (
                    F.coalesce("nbr_cluster", F.col("cluster"))
                    < F.col("cluster")
                ).alias("_changed"),
            )
        )
        new_labels = new_labels.localCheckpoint()
        if new_labels.filter(F.col("_changed")).limit(1).count() == 0:
            labels = new_labels.drop("_changed")
            break
        labels = new_labels.drop("_changed")
    edges.unpersist()
    return labels


def drop_near_duplicates(
    df: DataFrame, id_col: str, pairs: DataFrame
) -> DataFrame:
    """Keep one representative (min id) per near-dup cluster.

    Greedy pair-dropping under-deletes on transitive chains (a~b, b~c
    but a!~c would keep a and c); clustering deletes every non-minimum
    member of each connected component."""
    clusters = cluster_pairs(pairs)
    losers = clusters.filter(F.col("_id") != F.col("cluster")).select(
        F.col("_id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def drop_near_duplicates_keep_best(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    order_cols: list,
) -> DataFrame:
    """Keep the BEST member per near-dup cluster — the production
    survivor policy (keep the longest copy, the highest quality score,
    the earliest crawl) rather than :func:`drop_near_duplicates`'s
    arbitrary min-id representative.

    ``order_cols``: ordering Columns ranking cluster members best-first
    (e.g. ``[F.col("n_chars").desc()]``); ties always break on
    ascending id so the survivor set is deterministic. Documents in no
    cluster survive untouched. The per-cluster argmax is a
    rank-then-filter window, which Catalyst rewrites with a map-side
    WindowGroupLimit below the exchange (tests/test_plans.py) — at
    100 TB the shuffle carries one candidate row per (map task,
    cluster), not the cluster bodies."""
    from pyspark.sql import Window

    # collision-safe internal names: the caller's frame may legally
    # carry a 'cluster' or '_rn' column (cluster_pairs output is a
    # public relation), and an ambiguous-column AnalysisException here
    # would be this function's fault, not the caller's
    ccol, rcol = "__kb_cluster", "__kb_rn"
    while ccol in df.columns or rcol in df.columns:
        ccol, rcol = ccol + "_", rcol + "_"
    clusters = (
        cluster_pairs(pairs)
        .withColumnRenamed("_id", id_col)
        .withColumnRenamed("cluster", ccol)
    )
    member = df.join(clusters, id_col, "inner")
    w = Window.partitionBy(ccol).orderBy(*order_cols, F.col(id_col).asc())
    best = (
        member.withColumn(rcol, F.row_number().over(w))
        .filter(F.col(rcol) == 1)
        .select(*df.columns)
    )
    unclustered = df.join(clusters.select(id_col), id_col, "left_anti")
    return unclustered.unionByName(best)


def _exact_tier(
    new: DataFrame, id_col: str, text_col: str, hist_md5: DataFrame
) -> DataFrame:
    """New-side ids whose normalized md5 appears in ``hist_md5`` (a
    one-column 'm' relation) — shared by the inline and indexed paths."""
    new_md5 = new.select(
        F.col(id_col).alias("_id"), fingerprint_md5(new, text_col).alias("m")
    )
    return (
        new_md5.join(hist_md5, "m", "left_semi")
        .select("_id")
        .withColumn("_ex", F.lit(1))
    )


def _ns_keyed(df: DataFrame, ns: int, id_col: str, text_col: str) -> DataFrame:
    """(_k = struct(_ns, _oid), text) — ids namespaced by corpus side so
    overlapping id values between history and batch never merge."""
    return df.select(
        F.struct(F.lit(ns).alias("_ns"), F.col(id_col).alias("_oid")).alias(
            "_k"
        ),
        F.col(text_col),
    )


def _scoped_near_ids(
    cand: DataFrame, keyed_union: DataFrame, text_col: str, k: int, threshold: float
) -> DataFrame:
    """Candidate-scoped verify over namespaced keys: re-shingle ONLY the
    matched documents, exact-Jaccard them, and return the distinct
    new-side original ids that pass — shared by both incremental
    paths so the verify semantics cannot diverge."""
    from pyspark.storagelevel import StorageLevel

    need = (
        cand.select(F.col("id_a").alias("_k"))
        .union(cand.select(F.col("id_b").alias("_k")))
        .distinct()
    )
    verify_sh = _shingle_table(
        keyed_union.join(need, "_k", "left_semi"), "_k", text_col, k, None
    ).persist(StorageLevel.MEMORY_AND_DISK)
    near = (
        _jaccard_from_candidates(cand, verify_sh, threshold)
        .select(F.col("id_a._oid").alias("_id"))
        .distinct()
        .withColumn("_nr", F.lit(1))
        .localCheckpoint(eager=True)
    )
    verify_sh.unpersist()
    return near


def _verdicts(
    new: DataFrame, id_col: str, exact_ids: DataFrame, near_ids: DataFrame
) -> DataFrame:
    """exact > near > novel, one row per new doc."""
    return (
        new.select(F.col(id_col).alias("_id"))
        .join(exact_ids, "_id", "left")
        .join(near_ids, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.when(F.col("_ex") == 1, F.lit("exact"))
            .when(F.col("_nr") == 1, F.lit("near"))
            .otherwise(F.lit("novel"))
            .alias("verdict"),
        )
    )


def _collapse_new_side(
    new: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Hot-bucket guard for the incremental paths: drop the batch's
    non-representative byte-identical copies (verdicts are a pure
    function of text, so one classification per distinct text
    suffices). Returns (collapsed_new, dup_members) — dup_members is
    the small multi-member-group map from :func:`_dup_member_map`."""
    dup_members = _dup_member_map(new, id_col, text_col)
    non_reps = dup_members.filter(F.col("_mid") != F.col("_rep")).select(
        F.col("_mid").alias(id_col)
    )
    return new.join(non_reps, id_col, "left_anti"), dup_members


def _expand_verdicts(
    verdicts: DataFrame, dup_members: DataFrame, id_col: str
) -> DataFrame:
    """Give each dropped duplicate its representative's verdict
    (inverse of :func:`_collapse_new_side`); representatives and
    singletons are already present in ``verdicts``."""
    extra = (
        verdicts.withColumnRenamed(id_col, "_rep")
        .join(
            dup_members.filter(F.col("_mid") != F.col("_rep")).select(
                "_mid", "_rep"
            ),
            "_rep",
        )
        .select(F.col("_mid").alias(id_col), "verdict")
    )
    return verdicts.unionByName(extra)


def incremental_dedup(
    hist: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    collapse_exact: bool = True,
) -> DataFrame:
    """Classify each NEW document against a HISTORICAL corpus — the
    crawl-ingestion production shape (reference scope ends at batch
    joins, `ETL.java:1`; this is north-star scope).

    Verdict per new doc: ``exact`` (normalized-md5 match in history),
    else ``near`` (LSH banding candidate against history, verified at
    exact shingle-Jaccard >= threshold), else ``novel``.

    Scale shape: history is touched ONLY through (a) a semi-join on its
    fingerprint column, (b) the banding equi-join on (band, bucket),
    and (c) a candidate-scoped re-shingle (semi-join on the matched
    ids, same design as :func:`minhash_lsh_pairs`) — each ingest batch
    costs O(batch + matched candidates) beyond the one signature pass,
    never a full verify-stage history materialization. At 100 TB the
    md5 and signature relations are the persisted "dedup index"
    maintained across batches; here they derive inline. The
    banding-vs-brute-force equivalence argument is the same as
    :func:`minhash_lsh_pairs` (at J >= 0.99 real dups the 32x8 miss
    probability is ~1e-11; an exact copy collides in every band
    deterministically).

    The two frames may use overlapping id values (independently
    numbered corpora): ids are namespaced internally with the side tag,
    so a history doc and a new doc sharing an id never merge.

    ``collapse_exact`` (default on): byte-identical batch documents are
    classified once via their min-id representative and the verdict
    broadcast back to the group — a batch of n mirror copies costs one
    classification instead of n banding probes (and avoids the
    batch-side hot-bucket blowup; see :func:`minhash_lsh_pairs`). The
    history side cannot go quadratic here: the banding join is
    batch x history only, so n identical history docs cost O(n)
    candidate rows per colliding batch representative, not O(n^2).
    """
    rows = n_hashes // bands
    dup_members = None
    if collapse_exact:
        new, dup_members = _collapse_new_side(new, id_col, text_col)
    hist_md5 = hist.select(fingerprint_md5(hist, text_col).alias("m")).distinct()
    exact_ids = _exact_tier(new, id_col, text_col, hist_md5)
    # near tier: one signature pass over the side-namespaced union
    keyed = _ns_keyed(hist, 0, id_col, text_col).unionByName(
        _ns_keyed(new, 1, id_col, text_col)
    )
    sh = _shingle_table(keyed, "_k", text_col, k, None)
    banded = _banded(
        minhash_signature(sh, n_hashes=n_hashes, include_size=True), bands, rows
    )
    left = banded.filter(F.col("_id._ns") == 1).select(
        F.col("_id").alias("id_a"), F.col("_n").alias("_na"), "band", "bucket"
    )
    right = banded.filter(F.col("_id._ns") == 0).select(
        F.col("_id").alias("id_b"), F.col("_n").alias("_nb"), "band", "bucket"
    )
    cand = (
        left.join(right, ["band", "bucket"])
        .select("id_a", "id_b", "_na", "_nb")
        .distinct()
        .localCheckpoint(eager=True)
    )
    near_ids = _scoped_near_ids(cand, keyed, text_col, k, threshold)
    out = _verdicts(new, id_col, exact_ids, near_ids)
    if collapse_exact:
        out = _expand_verdicts(out, dup_members, id_col)
    return out


# ---------------------------------------------------------------------------
# Persisted dedup index (incremental ingestion across batches)
# ---------------------------------------------------------------------------


def write_dedup_index(
    docs: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    mode: str = "overwrite",
) -> None:
    """Materialize the dedup index :func:`incremental_dedup`'s docstring
    promises: two parquet relations derived from the corpus —

    - ``md5``: distinct normalized-text fingerprints (the exact tier);
    - ``bands``: (id, _n, band, bucket) banding rows (the near tier),
      written partitioned by ``band`` so a batch's banding join prunes
      to the partitions it actually probes.

    ``mode="append"`` adds a new batch's rows to an existing index (the
    steady-state ingest loop: classify, then append the batch). A meta
    sidecar pins (k, n_hashes, bands); classification refuses an index
    built with different parameters, since bucket hashes would silently
    never collide.

    Torn-append guard: an append spans two parquet relations (md5,
    bands), so a crash between them would leave a batch in the exact
    tier but not the near tier. A ``_pending_append`` marker is written
    before the first relation write and removed after the last; both
    later appends and classification reads refuse an index whose marker
    is still present (repair path: rebuild with ``mode="overwrite"``,
    which clears the marker).

    Layout versioning (BREAKING, deliberate): round-11 moved the md5
    relation from distinct fingerprints (v1) to id-keyed rows (v2) so
    merge-on-read deletes can resolve per-document takedowns. Readers
    hard-reject v1 indexes with an instructive error — there is no
    silent dual-layout read path, because a v1 index cannot honor a
    delete (no ids to tombstone) and probing it while pretending
    deletes work would be a correctness lie. Migration is a one-shot
    rebuild: ``write_dedup_index(corpus, path, ..., mode="overwrite")``
    over the same corpus (one tokenize+minhash pass — the same cost as
    the original v1 build; no state beyond the corpus is needed).
    """
    import json
    import os

    rows = n_hashes // bands
    sh = _shingle_table(docs, id_col, text_col, k, None)
    sig = minhash_signature(sh, n_hashes=n_hashes, include_size=True)
    banded = _banded(sig, bands, rows)
    meta = {
        "v": 2,  # v2: md5 relation is ID-KEYED (enables MoR deletes)
        "k": k,
        "n_hashes": n_hashes,
        "bands": bands,
        "id_col": id_col,
    }
    if mode == "append":
        pending_path = _begin_index_append(path, meta)
    else:
        meta_path = os.path.join(path, "meta.json")
        pending_path = os.path.join(path, "_pending_append")
        # meta FIRST: a crash mid-build then leaves meta-without-data,
        # which fails loudly at read time; the reverse ordering would
        # leave data-without-meta, letting a mismatched append slip
        # through the append-time guard.
        os.makedirs(path, exist_ok=True)
        # a fresh overwrite repairs any earlier torn append
        if os.path.exists(pending_path):
            os.remove(pending_path)
        dels = os.path.join(path, "_deletes")
        if os.path.exists(dels):
            # a rebuild has no tombstones (stale ones would filter
            # freshly-written rows — the text index's caught bug class)
            import shutil

            shutil.rmtree(dels)
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        pending_path = None
    # md5 relation keyed by id (v2): a doc's exact-tier evidence is
    # individually removable; the probe's semi-join on m makes the
    # per-doc (vs distinct) layout semantically identical
    docs.select(
        F.col(id_col), fingerprint_md5(docs, text_col).alias("m")
    ).write.mode(mode).parquet(os.path.join(path, "md5"))
    banded.withColumnRenamed("_id", id_col).withColumnRenamed(
        "_n", "n_shingles"
    ).write.mode(mode).partitionBy("band").parquet(os.path.join(path, "bands"))
    if pending_path is not None:
        os.remove(pending_path)


def _load_meta(index_path: str) -> dict:
    """Load the index's meta sidecar, refusing a never-built or
    half-built index with the instructive rebuild message (shared by
    every reader/appender so the error is identical everywhere)."""
    import json
    import os

    meta_path = os.path.join(index_path, "meta.json")
    # Refusing an index without a meta sidecar closes the crashed-
    # initial-build hole: a later append can never "repair" a
    # partial index with its own (possibly different) parameters.
    if not os.path.exists(meta_path):
        raise ValueError(
            f"no meta.json at {index_path}: index incomplete or never "
            "built — rebuild with mode='overwrite' before appending"
        )
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("v") != 2:
        raise ValueError(
            f"dedup index at {index_path} uses the v1 layout (distinct "
            "md5, not id-keyed) — rebuild with mode='overwrite' to "
            "enable per-document deletes"
        )
    return meta


def _begin_index_append(path: str, meta: dict) -> str:
    """Torn-append + parameter guards shared by :func:`write_dedup_index`
    (append mode) and :func:`ingest_batch`: refuse a torn or
    parameter-mismatched index, then drop the ``_pending_append`` marker
    that the caller removes after BOTH relations have landed. Returns
    the marker path."""
    import os

    _check_no_pending_append(path)
    existing = _load_meta(path)
    if existing != meta:
        raise ValueError(
            f"index at {path} was built with {existing}, got {meta}"
        )
    return _acquire_dedup_marker(path)


def _acquire_dedup_marker(index_path: str) -> str:
    """O_EXCL writer-marker acquisition — the same contract as
    textindex._acquire_marker and the IVF-PQ marker (advice r11: the
    check-then-open here was non-atomic, so two concurrent writers
    could both pass ``_check_no_pending_append`` and interleave
    commits). The loser fails loudly; returns the marker path."""
    import os

    pending = os.path.join(index_path, "_pending_append")
    try:
        fd = os.open(pending, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise ValueError(
            f"dedup index write collision at {index_path}: another "
            "writer holds the _pending_append marker (or a previous "
            "write crashed torn) — the index has one writer at a time; "
            "if no writer is running, rebuild with mode='overwrite'"
        ) from None
    with os.fdopen(fd, "w") as f:
        f.write("append in progress\n")
    return pending


def _dedup_tombstones(spark, index_path: str, meta: dict):
    """The `_deletes` relation (ids removed by merge-on-read delete),
    or None. Probes anti-join it out of BOTH index relations."""
    import os

    dels = os.path.join(index_path, "_deletes")
    if not os.path.exists(dels):
        return None
    return spark.read.parquet(dels).select(meta["id_col"])


def _index_md5(spark, index_path: str, meta: dict) -> DataFrame:
    """The exact-tier fingerprint relation as the probes consume it:
    id-keyed rows, tombstones dropped, projected to the one-column 'm'
    shape `_exact_tier` expects (the semi-join makes per-doc vs
    distinct layouts equivalent)."""
    import os

    rel = spark.read.parquet(os.path.join(index_path, "md5"))
    dead = _dedup_tombstones(spark, index_path, meta)
    if dead is not None:
        rel = rel.join(F.broadcast(dead), meta["id_col"], "left_anti")
    return rel.select("m")


def _index_bands(spark, index_path: str, meta: dict) -> DataFrame:
    """The near-tier banding relation, tombstones dropped."""
    import os

    rel = spark.read.parquet(os.path.join(index_path, "bands"))
    dead = _dedup_tombstones(spark, index_path, meta)
    if dead is not None:
        rel = rel.join(F.broadcast(dead), meta["id_col"], "left_anti")
    return rel


def delete_from_dedup_index(spark, index_path: str, doc_ids) -> dict:
    """Merge-on-read DELETE for the dedup history index (takedown/GDPR
    lifecycle, completing the persisted-index trilogy): append the ids
    to a ``_deletes`` tombstone relation under the writer marker.
    Classification immediately behaves as if the docs were never
    indexed — their fingerprints stop matching the exact tier and
    their banding rows stop generating candidates; compaction later
    drops the rows physically. Unknown/already-deleted ids are no-ops.

    Semantics note for :func:`ingest_batch` histories: that path
    indexes one REPRESENTATIVE per distinct batch text, so deleting a
    representative removes the whole text group's evidence — per-copy
    takedown granularity requires per-copy index rows
    (:func:`write_dedup_index` appends write one md5 row per doc).
    Returns {"deleted": n}."""
    import os

    meta = _load_meta(index_path)
    _check_no_pending_append(index_path)
    id_col = meta["id_col"]
    pending = _acquire_dedup_marker(index_path)
    try:
        ids_df = (
            doc_ids
            if isinstance(doc_ids, DataFrame)
            else _local_ids(spark, doc_ids, id_col)
        ).select(F.col(id_col).cast("long")).distinct()
        dels = os.path.join(index_path, "_deletes")
        if os.path.exists(dels):
            ids_df = ids_df.join(
                spark.read.parquet(dels), id_col, "left_anti"
            )
        present = ids_df.join(
            spark.read.parquet(os.path.join(index_path, "md5")).select(
                id_col
            ),
            id_col,
            "left_semi",
        )
        n = present.count()
        if n:
            present.write.mode("append").parquet(dels)
        return {"deleted": n}
    finally:
        os.remove(pending)


def compact_dedup_index(spark, index_path: str) -> dict:
    """Apply tombstones physically and restore ~one file per band
    partition (appends fragment both relations). Each relation swaps
    via two renames with rollback; the marker is released only when
    both directories are intact — the round-11 swap discipline."""
    import os
    import shutil

    meta = _load_meta(index_path)
    _check_no_pending_append(index_path)
    id_col = meta["id_col"]
    pending = _acquire_dedup_marker(index_path)
    md5_dir = os.path.join(index_path, "md5")
    bands_dir = os.path.join(index_path, "bands")
    dels = os.path.join(index_path, "_deletes")
    try:

        def nfiles(d):
            return sum(
                1
                for root, _, files in os.walk(d)
                for f in files
                if f.endswith(".parquet")
            )

        before = nfiles(md5_dir) + nfiles(bands_dir)
        dead = (
            spark.read.parquet(dels).select(id_col)
            if os.path.exists(dels)
            else None
        )

        def rewrite(src, writer):
            rel = spark.read.parquet(src)
            if dead is not None:
                rel = rel.join(F.broadcast(dead), id_col, "left_anti")
            tmp = src + ".compact"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            writer(rel, tmp)
            aside = src + ".old"
            if os.path.exists(aside):
                shutil.rmtree(aside)
            os.rename(src, aside)
            try:
                os.rename(tmp, src)
            except BaseException:
                os.rename(aside, src)  # roll the first rename back
                raise
            shutil.rmtree(aside)

        rewrite(md5_dir, lambda rel, tmp: rel.coalesce(8).write.parquet(tmp))
        rewrite(
            bands_dir,
            lambda rel, tmp: rel.repartition(F.col("band"))
            .write.partitionBy("band")
            .parquet(tmp),
        )
        if dead is not None:
            shutil.rmtree(dels)
        return {
            "files_before": before,
            "files_after": nfiles(md5_dir) + nfiles(bands_dir),
        }
    finally:
        if os.path.isdir(md5_dir) and os.path.isdir(bands_dir):
            os.remove(pending)


def _check_no_pending_append(index_path: str) -> None:
    """Refuse an index whose last append never completed — the md5 and
    bands relations may disagree on which batches they contain."""
    import os

    if os.path.exists(os.path.join(index_path, "_pending_append")):
        raise ValueError(
            f"index at {index_path} has a torn append (_pending_append "
            "marker present): a previous append crashed between the md5 "
            "and bands writes — rebuild with mode='overwrite'"
        )


def incremental_dedup_indexed(
    spark,
    index_path: str,
    hist: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    collapse_exact: bool = True,
) -> DataFrame:
    """:func:`incremental_dedup` against a PERSISTED index: the exact
    tier semi-joins the stored md5 relation and the near tier joins the
    batch's banding rows against the stored (band, bucket) relation —
    history text is touched only for the candidate rows the banding
    matched (id-pushdown point reads). Same verdict semantics as the
    inline path (property-tested equal).

    Parameters (k, n_hashes, bands) come from the index's meta sidecar.
    ``hist`` supplies the candidate text lookups; at scale that read is
    pruned to matched ids by parquet predicate pushdown.
    """
    import os

    _check_no_pending_append(index_path)
    meta = _load_meta(index_path)
    k, n_hashes, bands = meta["k"], meta["n_hashes"], meta["bands"]
    rows = n_hashes // bands
    dup_members = None
    if collapse_exact:
        # hot-bucket guard: classify one representative per distinct
        # batch text (see incremental_dedup's docstring)
        new, dup_members = _collapse_new_side(new, id_col, text_col)
    # exact tier against the stored fingerprints
    hist_md5 = _index_md5(spark, index_path, meta)
    exact_ids = _exact_tier(new, id_col, text_col, hist_md5)
    # near tier: batch banding vs stored banding — both sides namespaced
    # (same discipline as the inline path) so an id value present in
    # both corpora never merges shingle sets in the verify stage
    keyed_new = _ns_keyed(new, 1, id_col, text_col)
    sh_new = _shingle_table(keyed_new, "_k", text_col, k, None)
    banded_new = _banded(
        minhash_signature(sh_new, n_hashes=n_hashes, include_size=True),
        bands,
        rows,
    )
    stored = _index_bands(spark, index_path, meta)
    left = banded_new.select(
        F.col("_id").alias("id_a"), F.col("_n").alias("_na"), "band", "bucket"
    )
    right = stored.select(
        F.struct(
            F.lit(0).alias("_ns"), F.col(meta["id_col"]).alias("_oid")
        ).alias("id_b"),
        F.col("n_shingles").alias("_nb"),
        "band",
        "bucket",
    )
    cand = (
        left.join(right, ["band", "bucket"])
        .select("id_a", "id_b", "_na", "_nb")
        .distinct()
        .localCheckpoint(eager=True)
    )
    keyed_union = keyed_new.unionByName(_ns_keyed(hist, 0, id_col, text_col))
    near_ids = _scoped_near_ids(cand, keyed_union, text_col, k, threshold)
    out = _verdicts(new, id_col, exact_ids, near_ids)
    if collapse_exact:
        out = _expand_verdicts(out, dup_members, id_col)
    return out


def ingest_batch(
    spark,
    index_path: str,
    hist: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    verdict_writer=None,
) -> DataFrame:
    """One steady-state ingest step — classify ``new`` against the
    persisted index AND append it, deriving the batch's fingerprints
    and banding rows ONCE and sharing them between the probe and the
    append (the two-call loop :func:`incremental_dedup_indexed` +
    :func:`write_dedup_index` re-shingles and re-minhashes the batch a
    second time for the append; at 100 TB the signature pass is the
    dominant per-batch cost, so halving it matters).

    Returns the verdict frame, MATERIALIZED before the append lands so
    the batch can never classify against itself. Verdict semantics are
    identical to the two-call loop (tested equal per batch).

    ``verdict_writer`` (optional, ``Callable[[DataFrame], None]``) is
    invoked on the pinned verdict frame BEFORE the index append begins.
    Callers running under an at-least-once replay contract (Structured
    Streaming ``foreachBatch``) MUST persist verdicts through this hook
    rather than after the call returns: a crash between the append and
    a caller-side sink write would replay the batch against an index
    that already contains it, turning every verdict into 'exact'. With
    the hook, the crash window degrades to duplicate verdict ROWS in
    the sink (classification re-runs against a pre-append index, so the
    duplicate rows carry the SAME verdicts — dedup by id downstream),
    never to wrong verdicts. The residual torn state — crash between
    the two index-relation writes — is caught by the ``_pending_append``
    marker, which makes the next call refuse the index outright.

    Index contents after the append differ from the two-call loop in
    one deliberate way: banding rows are written for one REPRESENTATIVE
    per distinct batch text (the hot-bucket collapse the probe already
    performs), not per copy. Probe-equivalent: a byte-identical copy
    has the identical signature, so any future batch row that would
    collide with a copy collides with its representative in every band,
    and the verify-stage Jaccard against either text is the same number
    (the exact tier is md5-distinct in both layouts). A mirror-farm
    history therefore costs O(1) index rows per distinct text instead
    of O(copies) — smaller index AND fewer future candidates.
    """
    import os

    _check_no_pending_append(index_path)
    meta = _load_meta(index_path)
    if meta["id_col"] != id_col:
        raise ValueError(
            f"index at {index_path} was built on id_col="
            f"{meta['id_col']!r}, got {id_col!r}"
        )
    k, n_hashes, bands = meta["k"], meta["n_hashes"], meta["bands"]
    rows = n_hashes // bands
    # hot-bucket guard (see incremental_dedup): classify one
    # representative per distinct batch text, expand verdicts after
    new, dup_members = _collapse_new_side(new, id_col, text_col)
    # --- derive the batch's index relations ONCE ----------------------
    new_md5 = (
        new.select(
            F.col(id_col).alias("_id"),
            fingerprint_md5(new, text_col).alias("m"),
        )
        .localCheckpoint(eager=True)
    )
    keyed_new = _ns_keyed(new, 1, id_col, text_col)
    sh_new = _shingle_table(keyed_new, "_k", text_col, k, None)
    banded_new = _banded(
        minhash_signature(sh_new, n_hashes=n_hashes, include_size=True),
        bands,
        rows,
    ).localCheckpoint(eager=True)
    # --- probe (same joins as incremental_dedup_indexed) --------------
    hist_md5 = _index_md5(spark, index_path, meta)
    exact_ids = (
        new_md5.join(hist_md5, "m", "left_semi")
        .select("_id")
        .withColumn("_ex", F.lit(1))
    )
    stored = _index_bands(spark, index_path, meta)
    left = banded_new.select(
        F.col("_id").alias("id_a"), F.col("_n").alias("_na"), "band", "bucket"
    )
    right = stored.select(
        F.struct(
            F.lit(0).alias("_ns"), F.col(id_col).alias("_oid")
        ).alias("id_b"),
        F.col("n_shingles").alias("_nb"),
        "band",
        "bucket",
    )
    cand = (
        left.join(right, ["band", "bucket"])
        .select("id_a", "id_b", "_na", "_nb")
        .distinct()
        .localCheckpoint(eager=True)
    )
    keyed_union = keyed_new.unionByName(_ns_keyed(hist, 0, id_col, text_col))
    near_ids = _scoped_near_ids(cand, keyed_union, text_col, k, threshold)
    out = _expand_verdicts(
        _verdicts(new, id_col, exact_ids, near_ids), dup_members, id_col
    ).localCheckpoint(eager=True)  # pin verdicts BEFORE the append lands
    # Durable-sink hook: under at-least-once replay, verdicts must be
    # OUTSIDE the process before the index mutates (see docstring).
    if verdict_writer is not None:
        verdict_writer(out)
    # --- append the SAME derived relations -----------------------------
    pending_path = _begin_index_append(index_path, meta)
    # v2 layout: id-keyed fingerprints (one row per indexed
    # representative) so merge-on-read deletes can target them
    new_md5.select(
        F.col("_id").alias(id_col), "m"
    ).write.mode("append").parquet(os.path.join(index_path, "md5"))
    banded_new.select(
        F.col("_id._oid").alias(id_col),
        F.col("_n").alias("n_shingles"),
        "band",
        "bucket",
    ).write.mode("append").partitionBy("band").parquet(
        os.path.join(index_path, "bands")
    )
    os.remove(pending_path)
    return out


def dedup_index_stats(index_path: str) -> dict:
    """Read-only operational snapshot of the persisted dedup index
    (completing the stats trilogy with `text_index_stats` and
    `ivfpq_index_stats`): pure filesystem metadata, no Spark session.
    The torn-state marker is reported, not raised."""
    import os

    meta = _load_meta(index_path)

    def _nparquet(d: str) -> int:
        return sum(
            1
            for _root, _dirs, files in os.walk(d)
            for f in files
            if f.endswith(".parquet")
        )

    md5_dir = os.path.join(index_path, "md5")
    bands_dir = os.path.join(index_path, "bands")
    dels = os.path.join(index_path, "_deletes")
    n_bands = int(meta["bands"])
    files_bands = _nparquet(bands_dir) if os.path.exists(bands_dir) else 0
    return {
        "k": int(meta["k"]),
        "n_hashes": int(meta["n_hashes"]),
        "bands": n_bands,
        "files_md5": _nparquet(md5_dir) if os.path.exists(md5_dir) else 0,
        "files_bands": files_bands,
        "files_per_band": files_bands / max(n_bands, 1),
        "has_tombstones": os.path.exists(dels),
        "files_tombstones": _nparquet(dels) if os.path.exists(dels) else 0,
        "pending_append": os.path.exists(
            os.path.join(index_path, "_pending_append")
        ),
    }


def maybe_compact_dedup_index(
    spark, index_path: str, *, max_files_per_band: float = 4.0
) -> dict | None:
    """Threshold-driven compaction for the dedup ingest loop (the
    trilogy's third `maybe_compact_*`): compact when the mean banding
    files per band partition exceed the threshold or tombstones exist;
    otherwise a cheap filesystem no-op."""
    stats = dedup_index_stats(index_path)
    if stats["files_per_band"] <= max_files_per_band and not stats[
        "has_tombstones"
    ]:
        return None
    return compact_dedup_index(spark, index_path)
