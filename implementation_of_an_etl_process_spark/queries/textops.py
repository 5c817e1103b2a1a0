"""Battery entries: text analysis + deduplication over ``documents``.

Oracle-parity notes (verified primitive-by-primitive against DuckDB):
- rolling hash: identical fold (list_reduce with prepended 0 seed)
- regex counts: Java and RE2 agree on the ASCII-class patterns used
- sha256/md5: byte-identical hex
- Jaccard: int intersection/union -> double division, engine-exact
- MinHash LSH: oracle is the *exact* brute-force Jaccard SQL. The
  operator's 8 bands x 4 rows give per-pair miss probability
  (1-s^4)^8: ~1.5e-2 at exactly s=0.8, but the corpus has NO pair in
  (0.07, 0.8) and its lowest above-threshold pair sits at J=0.90
  (miss 1.9e-4; every other true pair is >=0.95, miss <=7e-7), so
  LSH-then-verify equals brute force with probability >0.9996 per run
  — and the verify stage makes precision exact regardless.
- SimHash: md5-derived portable 64-bit token hash; the oracle rebuilds
  signatures bit-for-bit and brute-force-verifies Hamming distance
  (banding is pigeonhole-exact at hamming<=3, so sets are identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators import dedup as D
from implementation_of_an_etl_process_spark.sources.parquet import read_table
from implementation_of_an_etl_process_spark.operators import text as X
from implementation_of_an_etl_process_spark.functions.text_exprs import (
    HASH_BASE,
    HASH_MOD,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from implementation_of_an_etl_process_spark.plans import spread

    # documents ships as one small file = one scan partition; expression-
    # heavy text ops (langid runs 20 token-filters per row) serialize
    # without the spread (measured 15.1s -> sub-second at sf0.1)
    return spread(read_table(spark, sf_dir, "documents"))


# --- exact dedup -----------------------------------------------------------


def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from implementation_of_an_etl_process_spark.plans import ordered_emit

    # post-aggregate terminal sort: see plans.shape.ordered_emit
    return ordered_emit(
        D.exact_dedup_groups(
            _docs(spark, sf_dir), ["text"], "doc_id", keep_keys=False
        ),
        "rep_id",
    )


DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS rep_id, COUNT(*) AS n_dups
FROM documents GROUP BY text ORDER BY rep_id
"""


# --- fingerprints ----------------------------------------------------------


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.fingerprint(_docs(spark, sf_dir), "doc_id", "text").orderBy("doc_id")


TEXT_FINGERPRINT_SQL = f"""
SELECT doc_id,
       md5(lower(trim(text))) AS md5,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      [CAST(unicode(c) AS BIGINT) FOR c IN string_split(text, '')]),
         (acc, x) -> (acc * {HASH_BASE} + x) % {HASH_MOD}) AS roll_hash
FROM documents ORDER BY doc_id
"""


# --- token counting --------------------------------------------------------


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        X.token_count("text").alias("n_tokens"),
        X.bpe_ish_token_count("text").alias("n_bpe_tokens"),
    ).orderBy("doc_id")


TEXT_TOKEN_COUNT_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS INTEGER)
         AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""


# --- quality scoring -------------------------------------------------------


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return X.quality_scores(docs, "text").select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "mean_token_len",
        "stopword_ratio",
        "punct_ratio",
        "alpha_ratio",
    ).orderBy("doc_id")


_STOPS = ", ".join(f"'{s}'" for s in X.EN_STOPWORDS[0].split())

TEXT_QUALITY_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS INTEGER) AS n_chars,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS INTEGER) AS n_punct,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS INTEGER) AS n_alpha
  FROM documents
)
SELECT doc_id, n_chars,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CASE WHEN len(toks) > 0
            THEN CAST(n_chars - (len(toks) - 1) AS DOUBLE) / len(toks)
            ELSE 0.0 END AS mean_token_len,
       CASE WHEN len(toks) > 0
            THEN CAST(len(list_filter(toks, x -> x IN ({_STOPS}))) AS DOUBLE) / len(toks)
            ELSE 0.0 END AS stopword_ratio,
       CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
       CASE WHEN n_chars > 0 THEN CAST(n_alpha AS DOUBLE) / n_chars ELSE 0.0 END AS alpha_ratio
FROM t ORDER BY doc_id
"""


# --- language id -----------------------------------------------------------


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id", "lang", X.lang_id("text").alias("lang_pred")
    ).orderBy("doc_id")


def _langid_sql() -> str:
    counts = []
    for lang, markers in X.LANG_MARKERS.items():
        in_list = ", ".join(f"'{m}'" for m in markers)
        counts.append(
            f"len(list_filter(toks, x -> x IN ({in_list}))) AS c_{lang}"
        )
    langs = list(X.LANG_MARKERS)
    greatest = ", ".join(f"c_{lang}" for lang in langs)
    # First language (in fixed order) reaching the max wins — mirrors the
    # strict-> update loop in operators.text.lang_id.
    case = " ".join(
        f"WHEN c_{lang} = m THEN '{lang}'" for lang in langs
    )
    return rf"""
WITH t AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
), c AS (
  SELECT doc_id, lang, {", ".join(counts)} FROM t
), m AS (
  SELECT *, GREATEST({greatest}) AS m FROM c
)
SELECT doc_id, lang,
       CASE WHEN m = 0 THEN 'und' {case} ELSE 'und' END AS lang_pred
FROM m ORDER BY doc_id
"""


TEXT_LANGID_SQL = _langid_sql()


# --- near-dup: exact n-gram Jaccard + MinHash LSH --------------------------

_JACCARD_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           [ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] FOR i IN range(1, len(ts) - 1)]
         )) AS shingle
  FROM toks WHERE len(ts) >= 3
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
FROM pairs
JOIN sizes s1 ON id_a = s1.doc_id
JOIN sizes s2 ON id_b = s2.doc_id
WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8
ORDER BY id_a, id_b
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        _docs(spark, sf_dir), "doc_id", "text", k=3, threshold=0.8
    ).orderBy("id_a", "id_b")


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        _docs(spark, sf_dir), "doc_id", "text", k=3, threshold=0.8
    ).orderBy("id_a", "id_b")


def dedup_hot_bucket_farm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mirror-farm degenerate case under the exact oracle: the
    documents table plus 200 byte-identical copies of its first text
    (ids 1_000_000+i). Every copy lands in the same (band, bucket) in
    every band — without the exact-copy collapse guard
    (operators/dedup.py::minhash_lsh_pairs) the candidate join is
    bands * 200^2 rows; with it, the intra-group pairs are enumerated
    directly and the representatives go through normal LSH. The DuckDB
    oracle builds the identical farm and brute-forces Jaccard, so both
    the intra-group (jaccard = 1.0) emission and the cross-group
    expansion are value-gated."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    seed = docs.orderBy("doc_id").limit(1).select("text")
    farm = (
        spark.range(200)
        .crossJoin(F.broadcast(seed))
        .select((F.col("id") + 1_000_000).alias("doc_id"), "text")
    )
    corpus = docs.unionByName(farm)
    return D.minhash_lsh_pairs(
        corpus, "doc_id", "text", k=3, threshold=0.8
    ).orderBy("id_a", "id_b")


_FARM_PRELUDE = """WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT 1000000 + i AS doc_id,
         (SELECT text FROM documents ORDER BY doc_id LIMIT 1) AS text
  FROM range(200) t(i)
),"""

HOT_BUCKET_FARM_SQL = _JACCARD_ORACLE.replace("FROM documents", "FROM corpus").replace(
    "WITH", _FARM_PRELUDE, 1
)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully oracle-checked: signatures use the md5-derived portable
    64-bit token hash, and the DuckDB oracle rebuilds the signature
    bit-for-bit (64 conditional sums -> BIT string) then verifies ALL
    pairs by Hamming distance — the banding on the Spark side is exact
    for hamming<=3 (pigeonhole), so the two result sets are identical,
    not probabilistically close."""
    return D.simhash_pairs(
        _docs(spark, sf_dir), "doc_id", "text", max_hamming=3
    ).orderBy("id_a", "id_b")


def _simhash_sql(max_hamming: int = 3) -> str:
    # mirror operators.dedup.simhash_signature: token hash = first 16
    # md5 hex chars as two 32-bit halves; bit j of the hash read from
    # the matching half (assembly-free — UBIGINT << 63 overflows).
    bit_sums = ",\n         ".join(
        f"SUM(CASE WHEN (({'lo' if j < 32 else 'hi'} >> {j % 32}) & 1) = 1 "
        f"THEN 1 ELSE -1 END) AS b{j}"
        for j in range(64)
    )
    # BIT-string signature (bit order is irrelevant to Hamming distance
    # as long as both sides of the xor agree)
    bit_str = " || ".join(
        f"(CASE WHEN b{j} > 0 THEN '1' ELSE '0' END)" for j in range(63, -1, -1)
    )
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
), h AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::UBIGINT AS hi,
         ('0x' || substr(md5(tok), 9, 8))::UBIGINT AS lo
  FROM tok
), bsum AS (
  SELECT doc_id,
         {bit_sums}
  FROM h GROUP BY doc_id
), sig AS (
  SELECT doc_id, ({bit_str})::BIT AS sig FROM bsum
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
ORDER BY id_a, id_b
"""


SIMHASH_SQL = _simhash_sql()


# --- near-dup clustering: pairs -> connected components --------------------


def dedup_cluster_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over MinHash-LSH near-dup pairs: every
    clustered doc labeled with its component's minimum doc_id. Drives
    the ITERATIVE operator (distributed min-label propagation,
    operators.dedup.cluster_pairs) through the driver gate — the oracle
    recomputes components independently via a recursive transitive-
    closure CTE over brute-force Jaccard pairs."""
    pairs = D.minhash_lsh_pairs(
        _docs(spark, sf_dir), "doc_id", "text", k=3, threshold=0.8
    )
    return (
        D.cluster_pairs(pairs)
        .select(F.col("_id").alias("doc_id"), "cluster")
        .orderBy("doc_id")
    )


DEDUP_CLUSTER_SQL = """
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           [ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] FOR i IN range(1, len(ts) - 1)]
         )) AS shingle
  FROM toks WHERE len(ts) >= 3
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes s1 ON id_a = s1.doc_id JOIN sizes s2 ON id_b = s2.doc_id
  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.8
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
)
SELECT node AS doc_id, MIN(r) AS cluster FROM reach GROUP BY node
ORDER BY doc_id
"""


def dedup_cluster_star_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same near-dup components as ``dedup_cluster_docs``, computed
    by the round-complexity-robust algorithm instead: alternating
    large-star/small-star contraction (Kiveris et al. SoCC 2014,
    `operators/graph.py::connected_components_star`) — O(log² n) rounds
    on ANY component shape where min-label propagation pays O(diameter).
    Same oracle, same labels: the two distributed algorithms and the
    recursive-CTE transitive closure must all agree."""
    from implementation_of_an_etl_process_spark.operators.graph import (
        connected_components_star,
    )

    pairs = D.minhash_lsh_pairs(
        _docs(spark, sf_dir), "doc_id", "text", k=3, threshold=0.8
    )
    return (
        connected_components_star(
            pairs, src_col="id_a", dst_col="id_b"
        )
        .select(F.col("_id").alias("doc_id"), "cluster")
        .orderBy("doc_id")
    )


def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup REMOVAL: pairs -> connected components ->
    keep one representative (min doc_id) per cluster, return the
    surviving corpus ids. The oracle anti-joins the recursive-CTE
    component labels — both engines must agree on exactly which
    documents remain."""
    docs = _docs(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    return (
        D.drop_near_duplicates(docs, "doc_id", pairs)
        .select("doc_id")
        .orderBy("doc_id")
    )


_DEDUP_SURVIVORS_SQL = DEDUP_CLUSTER_SQL.replace(
    """SELECT node AS doc_id, MIN(r) AS cluster FROM reach GROUP BY node
ORDER BY doc_id
""",
    """SELECT doc_id FROM documents
WHERE doc_id NOT IN (
  SELECT node FROM (
    SELECT node, MIN(r) AS cluster FROM reach GROUP BY node
  ) WHERE node <> cluster
)
ORDER BY doc_id
""",
)


def dedup_keep_best_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup removal with the PRODUCTION survivor policy: per
    cluster keep the LONGEST member (max n_chars, ties on min doc_id)
    instead of the arbitrary min-id representative — "keep the best
    copy" is what a real curation pipeline ships. Same pairs ->
    components machinery as ``dedup_survivors``; the oracle recomputes
    components via the recursive transitive-closure CTE and picks the
    same argmax per cluster."""
    docs = _docs(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    return (
        D.drop_near_duplicates_keep_best(
            docs.select("doc_id", "n_chars"),
            "doc_id",
            pairs,
            [F.col("n_chars").desc()],
        )
        .select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
        .orderBy("doc_id")
    )


DEDUP_KEEP_BEST_SQL = DEDUP_CLUSTER_SQL.replace(
    """SELECT node AS doc_id, MIN(r) AS cluster FROM reach GROUP BY node
ORDER BY doc_id
""",
    """, labels AS (
  SELECT node, MIN(r) AS cluster FROM reach GROUP BY node
), best AS (
  SELECT node FROM (
    SELECT l.node,
           ROW_NUMBER() OVER (
             PARTITION BY l.cluster
             ORDER BY d.n_chars DESC, l.node ASC
           ) AS rn
    FROM labels l JOIN documents d ON d.doc_id = l.node
  ) WHERE rn = 1
)
SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM labels)
   OR d.doc_id IN (SELECT node FROM best)
ORDER BY d.doc_id
""",
)


# --- multimodal plumbing (binary column stats) -----------------------------


def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents' text bytes treated as an opaque binary payload:
    byte length + sha256 — the metadata/checksum stage of a media
    pipeline, with an exact SQL oracle."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("sha256"),
    ).orderBy("doc_id")


MULTIMODAL_STATS_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256
FROM documents ORDER BY doc_id
"""


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the full mapInPandas media pipeline (attach typed meta ->
    Arrow-batched per-payload decode -> feature rows, payload dropped
    before any shuffle) under the driver gate. The codec is the
    documented deterministic FAKE (no image libs in this container) —
    pure byte arithmetic the oracle reproduces: the plumbing (schema,
    batching, null handling, checksums) is what's being verified; a
    real deployment swaps one function body for PIL."""
    from implementation_of_an_etl_process_spark.operators import multimodal as M

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )
    media = M.attach_media_meta(docs, "doc_id", "blob", "image")
    return M.extract_image_features(media, fake_decode=True).orderBy("media_id")


MULTIMODAL_FEATURES_SQL = """
WITH m AS (
  SELECT doc_id,
         ('0x' || rpad(substr(hex(encode(text)), 1, 16), 16, '0'))::UBIGINT AS h,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         sha256(text) AS checksum
  FROM documents
)
SELECT doc_id AS media_id,
       CAST(64 + (h % 1024) AS INTEGER) AS width,
       CAST(64 + ((h >> 10) % 1024) AS INTEGER) AS height,
       n_bytes, checksum
FROM m ORDER BY media_id
"""


def multimodal_frame_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (one row per 1 KiB offset, exploded
    executor-side) — the row-explosion shape of keyframe extraction."""
    from implementation_of_an_etl_process_spark.operators import multimodal as M

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )
    media = M.attach_media_meta(docs, "doc_id", "blob", "video")
    return M.sample_frames(media, every_n_bytes=1024).orderBy(
        "media_id", "frame_offset"
    )


MULTIMODAL_FRAMES_SQL = """
SELECT doc_id AS media_id,
       CAST(unnest(range(0, octet_length(encode(text)), 1024)) AS BIGINT)
         AS frame_offset
FROM documents
ORDER BY media_id, frame_offset
"""



def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multi-frame video-container parsing under the driver gate:
    deterministic PVM payloads (the PPM-style multi-frame container
    `operators/multimodal.py::decode_pvm_header` documents — header +
    n_frames concatenated RGB rasters, printable-ASCII fill so UTF-8
    encode is byte-identity) are built in-plan, then
    ``extract_video_frames`` parses the header and seeks DIRECTLY to
    every 2nd frame's byte offset, decoding only the sampled rasters
    (numpy mean) — the keyframe-extraction access pattern: cost scales
    with frames sampled, not video length. The oracle reconstructs
    every sampled frame's features with integer arithmetic (a constant
    raster's mean is exactly its fill byte)."""
    from implementation_of_an_etl_process_spark.operators import multimodal as M

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 400).select(
        "doc_id",
        (2 + F.col("doc_id") % 5).cast("int").alias("nf"),
        (4 + F.col("doc_id") % 8).cast("int").alias("w"),
        (4 + (F.col("doc_id") / 8).cast("long") % 8).cast("int").alias("h"),
    )
    payloads = d.select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit("PV\n"),
                F.col("nf").cast("string"),
                F.lit(" "),
                F.col("w").cast("string"),
                F.lit(" "),
                F.col("h").cast("string"),
                F.lit("\n255\n"),
                F.expr(
                    "aggregate(sequence(0, nf - 1), CAST('' AS STRING), "
                    "(acc, f) -> concat(acc, repeat(char("
                    "32 + pmod(doc_id * 3 + f * 7, 95)), w * h * 3)))"
                ),
            ),
            "UTF-8",
        ).alias("blob"),
    )
    media = M.attach_media_meta(payloads, "doc_id", "blob", "video")
    return M.extract_video_frames(media, every_n=2).orderBy(
        "media_id", "frame_idx"
    )


MULTIMODAL_VIDEO_SQL = """
WITH d AS (
  SELECT doc_id,
         2 + doc_id % 5 AS nf,
         4 + doc_id % 8 AS w,
         4 + (doc_id // 8) % 8 AS h
  FROM documents WHERE doc_id < 400
), fr AS (
  SELECT doc_id, nf, w, h, unnest(range(0, nf, 2)) AS f FROM d
)
SELECT doc_id AS media_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(32 + (doc_id * 3 + f * 7) % 95 AS DOUBLE) AS mean_pixel,
       CAST(nf AS INTEGER) AS n_frames
FROM fr
ORDER BY media_id, frame_idx
"""


def multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decoding under the driver gate: deterministic binary
    PPM (P6) payloads are built in-plan (dimensions and a constant
    pixel byte derived from doc_id, printable-ASCII so UTF-8 encode is
    byte-identity), then ``extract_ppm_features`` actually PARSES the
    header and takes the numpy mean of the raster — no fake codec. The
    oracle reconstructs the identical payload bytes with the same
    string arithmetic and predicts every feature independently
    (mean_pixel == the constant fill, exactly)."""
    from implementation_of_an_etl_process_spark.operators import multimodal as M

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 500).select(
        "doc_id",
        (8 + F.col("doc_id") % 16).cast("int").alias("w"),
        (8 + (F.col("doc_id") / 16).cast("long") % 16).cast("int").alias("h"),
        (32 + F.col("doc_id") % 95).cast("int").alias("c"),
    )
    payloads = d.select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit("P6\n"),
                F.col("w").cast("string"),
                F.lit(" "),
                F.col("h").cast("string"),
                F.lit("\n255\n"),
                F.expr("repeat(char(c), w * h * 3)"),
            ),
            "UTF-8",
        ).alias("blob"),
    )
    media = M.attach_media_meta(payloads, "doc_id", "blob", "image")
    return M.extract_ppm_features(media).orderBy("media_id")


MULTIMODAL_PPM_SQL = """
WITH d AS (
  SELECT doc_id,
         8 + doc_id % 16 AS w,
         8 + (doc_id // 16) % 16 AS h,
         32 + doc_id % 95 AS c
  FROM documents WHERE doc_id < 500
), p AS (
  SELECT doc_id, w, h, c,
         'P6' || chr(10) || w || ' ' || h || chr(10) || '255'
           || chr(10) || repeat(chr(CAST(c AS INTEGER)),
                                CAST(w * h * 3 AS INTEGER)) AS s
  FROM d
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(c AS DOUBLE) AS mean_pixel,
       CAST(octet_length(encode(s)) AS BIGINT) AS n_bytes,
       sha256(s) AS checksum  -- ASCII-only payload: VARCHAR bytes == blob
FROM p ORDER BY media_id
"""


def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decoding under the driver gate: each doc
    gets a deterministic RGB gradient raster (value = 32 + (x*7 + y*13
    + c) % 95, identical across channels), PNG-ENCODED executor-side
    with the per-row filter cycling through all five spec filters
    (y % 5), then ``extract_png_features`` parses the chunks, checks
    CRCs, inflates, reverses the filters, and emits the decoded
    dimensions, exact pixel sum, and raster sha256. The oracle predicts
    the DECODED raster independently from the generation rule — the
    zlib bytes never need to be oracle-portable, but any corruption in
    either the encoder or the decoder (a single wrong filter
    reconstruction included) changes the hash."""
    from implementation_of_an_etl_process_spark.operators import multimodal as M

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        "doc_id",
        (8 + F.col("doc_id") % 16).cast("int").alias("w"),
        (8 + (F.col("doc_id") / 16).cast("long") % 12).cast("int").alias("h"),
        (F.col("doc_id") % 95).cast("int").alias("c"),
    )

    def make_png(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for did, w, h, c in zip(
                pdf["doc_id"], pdf["w"], pdf["h"], pdf["c"]
            ):
                x = np.arange(int(w))
                y = np.arange(int(h))
                v = (
                    32 + (x[None, :] * 7 + y[:, None] * 13 + int(c)) % 95
                ).astype(np.uint8)
                raster = np.repeat(v[:, :, None], 3, axis=2)
                ids.append(did)
                blobs.append(
                    M.encode_png(raster, row_filter=lambda yy: yy % 5)
                )
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    payloads = d.mapInPandas(make_png, "doc_id long, blob binary")
    media = M.attach_media_meta(payloads, "doc_id", "blob", "image")
    return M.extract_png_features(media).orderBy("media_id")


MULTIMODAL_PNG_SQL = """
WITH d AS (
  SELECT doc_id,
         8 + doc_id % 16 AS w,
         8 + (doc_id // 16) % 12 AS h,
         doc_id % 95 AS c
  FROM documents WHERE doc_id < 200
), px AS (
  SELECT doc_id, w, h, c,
         unnest(range(0, CAST(w * h * 3 AS BIGINT))) AS i
  FROM d
), v AS (
  SELECT doc_id, w, h, i,
         32 + (((i % (w * 3)) // 3) * 7 + (i // (w * 3)) * 13 + c) % 95 AS val
  FROM px
), agg AS (
  SELECT doc_id, w, h,
         SUM(val) AS pixel_sum,
         string_agg(chr(CAST(val AS INTEGER)), '' ORDER BY i) AS raster
  FROM v GROUP BY doc_id, w, h
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       2 AS color_type,
       CAST(pixel_sum AS BIGINT) AS pixel_sum,
       sha256(raster) AS raster_sha256  -- printable-ASCII raster: VARCHAR bytes == raster bytes
FROM agg ORDER BY media_id
"""


def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-image decoding under the driver gate: each doc gets a
    grayscale raster of 8x8-constant blocks with EVEN values
    (v = 32 + 2 * ((doc_id*7 + bx*13 + by*29) % 48)), JPEG-ENCODED
    executor-side (baseline sequential: float DCT, quantization,
    canonical Huffman, byte stuffing), then ``extract_jpeg_features``
    walks the markers, entropy-decodes, dequantizes, and runs the IDCT.
    The oracle predicts the DECODED raster independently: with the
    default Q00=16 table, a constant even-valued block is a fixed
    point of the lossy roundtrip (all ACs quantize to zero; the DC
    code is exact for even values — odd values sit on the quantizer's
    half-code boundary, which is why the rule emits even ones), so
    decoded == generated, byte for byte, through a REAL lossy codec.
    Any defect in either side (a Huffman length, a stuffing byte, a
    DC prediction reset, the IDCT scale) changes pixel_sum or the
    sha256."""
    from implementation_of_an_etl_process_spark.operators import multimodal as M

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        "doc_id",
        (8 * (1 + F.col("doc_id") % 3)).cast("int").alias("w"),
        (8 * (1 + (F.col("doc_id") / 3).cast("long") % 3)).cast("int").alias("h"),
    )

    def make_jpeg(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for did, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                did, w, h = int(did), int(w), int(h)
                bx = np.arange(w // 8)
                by = np.arange(h // 8)
                v = (
                    32 + 2 * ((did * 7 + bx[None, :] * 13 + by[:, None] * 29) % 48)
                ).astype(np.uint8)
                raster = np.kron(v, np.ones((8, 8), np.uint8))
                ids.append(did)
                blobs.append(M.encode_jpeg(raster))
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    payloads = d.mapInPandas(make_jpeg, "doc_id long, blob binary")
    media = M.attach_media_meta(payloads, "doc_id", "blob", "image")
    return M.extract_jpeg_features(media).orderBy("media_id")


MULTIMODAL_JPEG_SQL = """
WITH d AS (
  SELECT doc_id,
         8 * (1 + doc_id % 3) AS w,
         8 * (1 + (doc_id // 3) % 3) AS h
  FROM documents WHERE doc_id < 200
), px AS (
  SELECT doc_id, w, h,
         unnest(range(0, CAST(w * h AS BIGINT))) AS i
  FROM d
), v AS (
  SELECT doc_id, w, h, i,
         32 + 2 * ((doc_id * 7 + ((i % w) // 8) * 13
                    + ((i // w) // 8) * 29) % 48) AS val
  FROM px
), agg AS (
  SELECT doc_id, w, h,
         SUM(val) AS pixel_sum,
         string_agg(chr(CAST(val AS INTEGER)), '' ORDER BY i) AS raster
  FROM v GROUP BY doc_id, w, h
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       1 AS n_components,
       CAST(pixel_sum AS BIGINT) AS pixel_sum,
       sha256(raster) AS raster_sha256  -- values <= 126: VARCHAR bytes == raster bytes
FROM agg ORDER BY media_id
"""


def _ppm_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic P6 payloads for the resize entries: gray RGB
    (r=g=b), v = 32 + (x*7 + y*13 + doc_id % 95) % 95 — the PNG
    entry's rule over a PPM container, every byte printable ASCII so
    DuckDB's string sha256 equals the raw-byte sha256."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        "doc_id",
        (8 + F.col("doc_id") % 16).cast("int").alias("w"),
        (8 + (F.col("doc_id") / 16).cast("long") % 12).cast("int").alias("h"),
        (F.col("doc_id") % 95).cast("int").alias("c"),
    )

    def make_ppm(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for did, w, h, c in zip(
                pdf["doc_id"], pdf["w"], pdf["h"], pdf["c"]
            ):
                w, h = int(w), int(h)
                x = np.arange(w)
                y = np.arange(h)
                v = (32 + (x[None, :] * 7 + y[:, None] * 13 + int(c)) % 95
                     ).astype(np.uint8)
                raster = np.repeat(v[:, :, None], 3, axis=2)
                ids.append(did)
                blobs.append(
                    b"P6\n%d %d\n255\n" % (w, h) + raster.tobytes()
                )
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    return d.mapInPandas(make_ppm, "doc_id long, blob binary")


def multimodal_resize_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE as a pipeline stage under the driver gate:
    deterministic P6 payloads -> ``resize_ppm_media`` (nearest-neighbor
    with the exact half-pixel integer mapping src = ((2*i+1)*src_dim)
    // (2*dst_dim), mixing up- AND down-scaling across docs) -> the
    SAME ``extract_ppm_features`` stage any media relation feeds —
    proving resize composes as a real media->media operator. The
    oracle recomputes every output pixel from the generation rule plus
    the identical integer mapping (no floats anywhere), then the full
    resized P6 payload bytes for the sha256."""
    from implementation_of_an_etl_process_spark.operators import multimodal as M

    payloads = _ppm_payloads(spark, sf_dir)
    media = M.attach_media_meta(payloads, "doc_id", "blob", "image")
    # per-entry fixed target: 13 x 9 (smaller than some sources, larger
    # than others -> both directions of the mapping exercised)
    resized = M.resize_ppm_media(media, out_w=13, out_h=9, method="nearest")
    return M.extract_ppm_features(resized).orderBy("media_id")


MULTIMODAL_RESIZE_SQL = """
WITH d AS (
  SELECT doc_id,
         8 + doc_id % 16 AS w,
         8 + (doc_id // 16) % 12 AS h,
         doc_id % 95 AS c
  FROM documents WHERE doc_id < 200
), px AS (
  SELECT doc_id, w, h, c,
         unnest(range(0, CAST(13 * 9 * 3 AS BIGINT))) AS i
  FROM d
), v AS (
  SELECT doc_id, i,
         32 + ((((2 * ((i % 39) // 3) + 1) * w) // 26) * 7
               + (((2 * (i // 39) + 1) * h) // 18) * 13 + c) % 95 AS val
  FROM px
), agg AS (
  SELECT doc_id,
         SUM(val) AS pixel_sum,
         string_agg(chr(CAST(val AS INTEGER)), '' ORDER BY i) AS raster
  FROM v GROUP BY doc_id
)
SELECT doc_id AS media_id,
       13 AS width,
       9 AS height,
       CAST(pixel_sum AS DOUBLE) / (13 * 9 * 3) AS mean_pixel,
       CAST(12 + length(raster) AS BIGINT) AS n_bytes,  -- 'P6\\n13 9\\n255\\n'
       sha256('P6' || chr(10) || '13 9' || chr(10) || '255' || chr(10)
              || raster) AS checksum
FROM agg ORDER BY media_id
"""


def multimodal_resize_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-mean (anti-aliased) 2x2 downscale under the driver gate:
    the same P6 payloads but EVEN dims, ``resize_ppm_media`` with
    method="box" — output pixel = half-up integer mean of its 2x2
    source block, (2*sum + 4) // 8 in exact integers — then the
    shared feature stage. The oracle replays the identical integer
    averaging per output pixel."""
    from implementation_of_an_etl_process_spark.operators import multimodal as M

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        "doc_id",
        (8 + 2 * (F.col("doc_id") % 8)).cast("int").alias("w"),
        (8 + 2 * ((F.col("doc_id") / 8).cast("long") % 6)).cast("int").alias("h"),
        (F.col("doc_id") % 95).cast("int").alias("c"),
    )

    def make_ppm(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for did, w, h, c in zip(
                pdf["doc_id"], pdf["w"], pdf["h"], pdf["c"]
            ):
                w, h = int(w), int(h)
                x = np.arange(w)
                y = np.arange(h)
                v = (32 + (x[None, :] * 7 + y[:, None] * 13 + int(c)) % 95
                     ).astype(np.uint8)
                raster = np.repeat(v[:, :, None], 3, axis=2)
                ids.append(did)
                blobs.append(
                    b"P6\n%d %d\n255\n" % (w, h) + raster.tobytes()
                )
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    payloads = d.mapInPandas(make_ppm, "doc_id long, blob binary")
    media = M.attach_media_meta(payloads, "doc_id", "blob", "image")
    resized = M.resize_ppm_media(media, method="box", factors=(2, 2))
    return M.extract_ppm_features(resized).orderBy("media_id")


MULTIMODAL_RESIZE_BOX_SQL = """
WITH d AS (
  SELECT doc_id,
         8 + 2 * (doc_id % 8) AS w,
         8 + 2 * ((doc_id // 8) % 6) AS h,
         doc_id % 95 AS c
  FROM documents WHERE doc_id < 200
), px AS (
  SELECT doc_id, w, h, c,
         unnest(range(0, CAST((w // 2) * (h // 2) * 3 AS BIGINT))) AS i
  FROM d
), v AS (
  SELECT doc_id, w, h, i,
         -- output (ox, oy) averages source (2ox..2ox+1, 2oy..2oy+1):
         -- val(sx, sy) = 32 + (sx*7 + sy*13 + c) % 95
         (2 * (
            (32 + ((2 * ((i % ((w // 2) * 3)) // 3) + 0) * 7
                   + (2 * (i // ((w // 2) * 3)) + 0) * 13 + c) % 95)
          + (32 + ((2 * ((i % ((w // 2) * 3)) // 3) + 1) * 7
                   + (2 * (i // ((w // 2) * 3)) + 0) * 13 + c) % 95)
          + (32 + ((2 * ((i % ((w // 2) * 3)) // 3) + 0) * 7
                   + (2 * (i // ((w // 2) * 3)) + 1) * 13 + c) % 95)
          + (32 + ((2 * ((i % ((w // 2) * 3)) // 3) + 1) * 7
                   + (2 * (i // ((w // 2) * 3)) + 1) * 13 + c) % 95)
         ) + 4) // 8 AS val
  FROM px
), agg AS (
  SELECT doc_id, w // 2 AS ow, h // 2 AS oh,
         SUM(val) AS pixel_sum,
         string_agg(chr(CAST(val AS INTEGER)), '' ORDER BY i) AS raster
  FROM v GROUP BY doc_id, w, h
)
SELECT doc_id AS media_id,
       CAST(ow AS INTEGER) AS width,
       CAST(oh AS INTEGER) AS height,
       CAST(pixel_sum AS DOUBLE) / (ow * oh * 3) AS mean_pixel,
       CAST(length('P6' || chr(10) || ow || ' ' || oh || chr(10) || '255'
                   || chr(10)) + length(raster) AS BIGINT) AS n_bytes,
       sha256('P6' || chr(10) || ow || ' ' || oh || chr(10) || '255'
              || chr(10) || raster) AS checksum
FROM agg ORDER BY media_id
"""


def multimodal_jpeg420_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4:2:0 SUBSAMPLED color JPEG under the driver gate — the layout
    virtually every camera/web JPEG uses. Each doc gets an RGB raster
    with r=g=b=v, v constant per 8x8 block and EVEN
    (v = 32 + 2 * ((doc_id*7 + bx*13 + by*29) % 48)); encoded
    executor-side with ``sampling="4:2:0"`` (box-mean chroma
    downsample, MCU-interleaved scan: four luma data units then Cb,
    Cr per MCU), then ``extract_jpeg_features`` decodes the
    interleaved stream, upsamples chroma, and converts back to RGB.
    The oracle predicts the decoded raster in closed form: gray RGB
    has Cb = Cr = 128 EXACTLY (the JFIF forward coefficients sum to
    0.5 / 1.0 exactly), so every chroma coefficient is zero at any
    subsampling, and even per-block-constant luma is a Q00=16 fixed
    point — decoded == generated byte-for-byte through a REAL lossy
    4:2:0 codec. Distinct per-block values mean any defect in the
    T.81 MCU data-unit order, a per-component DC prediction chain,
    the replication upsample, or the non-multiple-of-16 crop (w, h
    run over 8..32) changes pixel_sum or the sha256."""
    from implementation_of_an_etl_process_spark.operators import multimodal as M

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        "doc_id",
        (8 * (1 + F.col("doc_id") % 4)).cast("int").alias("w"),
        (8 * (1 + (F.col("doc_id") / 4).cast("long") % 4)).cast("int").alias("h"),
    )

    def make_jpeg(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for did, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                did, w, h = int(did), int(w), int(h)
                bx = np.arange(w // 8)
                by = np.arange(h // 8)
                v = (
                    32 + 2 * ((did * 7 + bx[None, :] * 13 + by[:, None] * 29) % 48)
                ).astype(np.uint8)
                lum = np.kron(v, np.ones((8, 8), np.uint8))
                rgb = np.repeat(lum[:, :, None], 3, axis=2)
                ids.append(did)
                blobs.append(M.encode_jpeg(rgb, sampling="4:2:0"))
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    payloads = d.mapInPandas(make_jpeg, "doc_id long, blob binary")
    media = M.attach_media_meta(payloads, "doc_id", "blob", "image")
    return M.extract_jpeg_features(media).orderBy("media_id")


MULTIMODAL_JPEG420_SQL = """
WITH d AS (
  SELECT doc_id,
         8 * (1 + doc_id % 4) AS w,
         8 * (1 + (doc_id // 4) % 4) AS h
  FROM documents WHERE doc_id < 200
), px AS (
  SELECT doc_id, w, h,
         unnest(range(0, CAST(w * h * 3 AS BIGINT))) AS i
  FROM d
), v AS (
  SELECT doc_id, w, h, i,
         32 + 2 * ((doc_id * 7 + (((i % (w * 3)) // 3) // 8) * 13
                    + ((i // (w * 3)) // 8) * 29) % 48) AS val
  FROM px
), agg AS (
  SELECT doc_id, w, h,
         SUM(val) AS pixel_sum,
         string_agg(chr(CAST(val AS INTEGER)), '' ORDER BY i) AS raster
  FROM v GROUP BY doc_id, w, h
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       3 AS n_components,
       CAST(pixel_sum AS BIGINT) AS pixel_sum,
       sha256(raster) AS raster_sha256  -- values <= 126: VARCHAR bytes == raster bytes
FROM agg ORDER BY media_id
"""


def multimodal_jpeg_prog_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE JPEG (SOF2) under the driver gate — the multi-scan
    layout web-optimized JPEGs use. Same fixed-point construction as
    `multimodal_jpeg420_decode` (gray RGB, even per-8x8-block-constant
    luma, distinct rule constants) but encoded with
    ``encode_jpeg_progressive`` at 4:2:0: the default libjpeg-style
    progression script (DC successive approximation Al=1->0, luma AC
    bands at Al=2 refined down, chroma at Al=1, EOB-run coding, the
    T.81 G.1.2.3 AC correction-bit algorithm) and decoded by the
    SOF2 multi-scan path in ``decode_jpeg``. All scans together
    reconstruct the exact quantized coefficients, so decoded ==
    generated byte-for-byte; the oracle predicts the raster in closed
    form. Any defect in scan ordering, a refinement bit, EOB-run
    state, or the band bookkeeping changes pixel_sum or the sha256."""
    from implementation_of_an_etl_process_spark.operators import multimodal as M

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        "doc_id",
        (8 * (1 + F.col("doc_id") % 4)).cast("int").alias("w"),
        (8 * (1 + (F.col("doc_id") / 5).cast("long") % 4)).cast("int").alias("h"),
    )

    def make_jpeg(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for did, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                did, w, h = int(did), int(w), int(h)
                bx = np.arange(w // 8)
                by = np.arange(h // 8)
                v = (
                    34 + 2 * ((did * 11 + bx[None, :] * 17 + by[:, None] * 23) % 47)
                ).astype(np.uint8)
                lum = np.kron(v, np.ones((8, 8), np.uint8))
                rgb = np.repeat(lum[:, :, None], 3, axis=2)
                ids.append(did)
                blobs.append(
                    M.encode_jpeg_progressive(rgb, sampling="4:2:0")
                )
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    payloads = d.mapInPandas(make_jpeg, "doc_id long, blob binary")
    media = M.attach_media_meta(payloads, "doc_id", "blob", "image")
    return M.extract_jpeg_features(media).orderBy("media_id")


MULTIMODAL_JPEG_PROG_SQL = """
WITH d AS (
  SELECT doc_id,
         8 * (1 + doc_id % 4) AS w,
         8 * (1 + (doc_id // 5) % 4) AS h
  FROM documents WHERE doc_id < 200
), px AS (
  SELECT doc_id, w, h,
         unnest(range(0, CAST(w * h * 3 AS BIGINT))) AS i
  FROM d
), v AS (
  SELECT doc_id, w, h, i,
         34 + 2 * ((doc_id * 11 + (((i % (w * 3)) // 3) // 8) * 17
                    + ((i // (w * 3)) // 8) * 23) % 47) AS val
  FROM px
), agg AS (
  SELECT doc_id, w, h,
         SUM(val) AS pixel_sum,
         string_agg(chr(CAST(val AS INTEGER)), '' ORDER BY i) AS raster
  FROM v GROUP BY doc_id, w, h
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       3 AS n_components,
       CAST(pixel_sum AS BIGINT) AS pixel_sum,
       sha256(raster) AS raster_sha256  -- values <= 126: VARCHAR bytes == raster bytes
FROM agg ORDER BY media_id
"""


def multimodal_exif_orient_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orientation-corrected decode under the driver gate — cameras
    store rotated pixels plus an Exif Orientation tag, so ingestion
    must parse APP1 and apply the display transform. Each doc gets the
    gray-RGB even-block fixed-point raster, 4:2:0-encoded with
    ``exif_orientation = 1 + doc_id % 8`` (alternating TIFF byte
    orders), then ``extract_jpeg_oriented_features`` parses the tag,
    decodes (exact fixed point), applies the transform, and emits the
    UPRIGHT raster's features. The oracle replays the standard
    (ox, oy) -> (sx, sy) index table for all 8 orientations (dims swap
    for 5-8) over the generation rule — the sha256 catches any wrong
    flip/transpose, while pixel_sum is transform-invariant by design
    (a deliberate negative control: it pins decode, sha pins
    orientation)."""
    from implementation_of_an_etl_process_spark.operators import multimodal as M

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        "doc_id",
        (8 * (1 + F.col("doc_id") % 3)).cast("int").alias("w"),
        (8 * (1 + (F.col("doc_id") / 3).cast("long") % 3)).cast("int").alias("h"),
    )

    def make_jpeg(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for did, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                did, w, h = int(did), int(w), int(h)
                bx = np.arange(w // 8)
                by = np.arange(h // 8)
                v = (
                    32 + 2 * ((did * 5 + bx[None, :] * 19 + by[:, None] * 31) % 48)
                ).astype(np.uint8)
                lum = np.kron(v, np.ones((8, 8), np.uint8))
                rgb = np.repeat(lum[:, :, None], 3, axis=2)
                ids.append(did)
                blobs.append(
                    M.encode_jpeg(
                        rgb,
                        sampling="4:2:0",
                        exif_orientation=1 + did % 8,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    payloads = d.mapInPandas(make_jpeg, "doc_id long, blob binary")
    media = M.attach_media_meta(payloads, "doc_id", "blob", "image")
    return M.extract_jpeg_oriented_features(media).orderBy("media_id")


MULTIMODAL_EXIF_SQL = """
WITH d AS (
  SELECT doc_id,
         8 * (1 + doc_id % 3) AS w,
         8 * (1 + (doc_id // 3) % 3) AS h,
         1 + doc_id % 8 AS o
  FROM documents WHERE doc_id < 200
), dims AS (
  SELECT doc_id, w, h, o,
         CASE WHEN o >= 5 THEN h ELSE w END AS ow,
         CASE WHEN o >= 5 THEN w ELSE h END AS oh
  FROM d
), px AS (
  SELECT doc_id, w, h, o, ow, oh,
         unnest(range(0, CAST(ow * oh * 3 AS BIGINT))) AS i
  FROM dims
), src AS (
  SELECT doc_id, w, h, o, ow, oh, i,
         (i % (ow * 3)) // 3 AS ox,
         i // (ow * 3) AS oy
  FROM px
), mapped AS (
  SELECT doc_id, o, ow, oh, i,
         CASE o
           WHEN 1 THEN ox WHEN 2 THEN w - 1 - ox
           WHEN 3 THEN w - 1 - ox WHEN 4 THEN ox
           WHEN 5 THEN oy WHEN 6 THEN oy
           WHEN 7 THEN w - 1 - oy WHEN 8 THEN w - 1 - oy
         END AS sx,
         CASE o
           WHEN 1 THEN oy WHEN 2 THEN oy
           WHEN 3 THEN h - 1 - oy WHEN 4 THEN h - 1 - oy
           WHEN 5 THEN ox WHEN 6 THEN h - 1 - ox
           WHEN 7 THEN h - 1 - ox WHEN 8 THEN ox
         END AS sy
  FROM src
), v AS (
  SELECT doc_id, o, ow, oh, i,
         32 + 2 * ((doc_id * 5 + (sx // 8) * 19 + (sy // 8) * 31) % 48) AS val
  FROM mapped
), agg AS (
  SELECT doc_id, o, ow, oh,
         SUM(val) AS pixel_sum,
         string_agg(chr(CAST(val AS INTEGER)), '' ORDER BY i) AS raster
  FROM v GROUP BY doc_id, o, ow, oh
)
SELECT doc_id AS media_id,
       CAST(o AS INTEGER) AS orientation,
       CAST(ow AS INTEGER) AS width,
       CAST(oh AS INTEGER) AS height,
       3 AS n_components,
       CAST(pixel_sum AS BIGINT) AS pixel_sum,
       sha256(raster) AS raster_sha256  -- values <= 126: VARCHAR bytes == raster bytes
FROM agg ORDER BY media_id
"""


def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decoding under the driver gate: each doc gets a
    deterministic PCM-16 mono waveform (sample[i] = ((i*k + c) % 191)
    - 95 with k, c, n derived from doc_id), WAV-encoded executor-side
    (RIFF container, canonical 44-byte header), then
    ``extract_wav_features`` walks the chunks and emits channel count,
    rate, sample count/duration, exact sample sum, and peak amplitude.
    The oracle recomputes every feature from the generation rule over
    a generated series — pure integer arithmetic, exact in both
    engines."""
    from implementation_of_an_etl_process_spark.operators import multimodal as M

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        "doc_id",
        (400 + F.col("doc_id") % 200).cast("int").alias("n"),
        (3 + F.col("doc_id") % 7).cast("int").alias("k"),
        (F.col("doc_id") % 97).cast("int").alias("c"),
    )

    def make_wav(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for did, n, k, c in zip(
                pdf["doc_id"], pdf["n"], pdf["k"], pdf["c"]
            ):
                i = np.arange(int(n), dtype=np.int64)
                s = ((i * int(k) + int(c)) % 191 - 95).astype(np.int16)
                ids.append(did)
                blobs.append(M.encode_wav(s, sample_rate=8000))
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    payloads = d.mapInPandas(make_wav, "doc_id long, blob binary")
    media = M.attach_media_meta(payloads, "doc_id", "blob", "audio")
    return M.extract_wav_features(media).orderBy("media_id")


def multimodal_wav_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio sample-rate conversion under the driver gate — the audio
    twin of the resize entries. The wav entry's deterministic PCM-16
    mono waveforms (8 kHz) run through ``resample_wav_media`` to 3 kHz
    (a non-divisible 8:3 ratio, so every output sample interpolates)
    with exact-integer linear interpolation on +32768-biased values
    (floor and truncating division agree on non-negative operands —
    the cross-engine portability rule), then the SAME
    ``extract_wav_features`` stage. The oracle replays the identical
    position/interpolation arithmetic per output sample."""
    from implementation_of_an_etl_process_spark.operators import multimodal as M

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        "doc_id",
        (400 + F.col("doc_id") % 200).cast("int").alias("n"),
        (3 + F.col("doc_id") % 7).cast("int").alias("k"),
        (F.col("doc_id") % 97).cast("int").alias("c"),
    )

    def make_wav(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for did, n, k, c in zip(
                pdf["doc_id"], pdf["n"], pdf["k"], pdf["c"]
            ):
                i = np.arange(int(n), dtype=np.int64)
                s = ((i * int(k) + int(c)) % 191 - 95).astype(np.int16)
                ids.append(did)
                blobs.append(M.encode_wav(s, sample_rate=8000))
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    payloads = d.mapInPandas(make_wav, "doc_id long, blob binary")
    media = M.attach_media_meta(payloads, "doc_id", "blob", "audio")
    resampled = M.resample_wav_media(media, 3000, method="linear")
    return M.extract_wav_features(resampled).orderBy("media_id")


MULTIMODAL_WAV_RESAMPLE_SQL = """
WITH d AS (
  SELECT doc_id,
         400 + doc_id % 200 AS n,
         3 + doc_id % 7 AS k,
         doc_id % 97 AS c
  FROM documents WHERE doc_id < 200
), o AS (
  SELECT doc_id, n, k, c,
         unnest(range(0, CAST(n * 3000 // 8000 AS BIGINT))) AS i
  FROM d
), pos AS (
  SELECT doc_id, n, k, c, i,
         (i * 8000) // 3000 AS s0,
         (i * 8000) % 3000 AS r
  FROM o
), v AS (
  SELECT doc_id, n, i,
         -- x(j) = ((j*k + c) % 191) - 95, biased +32768 so the
         -- half-up division is over non-negative integers
         (((((s0 * k + c) % 191) - 95 + 32768) * (3000 - r)
           + ((((CASE WHEN s0 + 1 > n - 1 THEN n - 1 ELSE s0 + 1 END)
                * k + c) % 191) - 95 + 32768) * r
           + 1500) // 3000) - 32768 AS val
  FROM pos
)
SELECT doc_id AS media_id,
       1 AS n_channels,
       3000 AS sample_rate,
       CAST(n * 3000 // 8000 AS BIGINT) AS n_samples,
       CAST((n * 3000 // 8000) * 1000 // 3000 AS BIGINT) AS duration_ms,
       CAST(SUM(val) AS BIGINT) AS sample_sum,
       CAST(MAX(ABS(val)) AS INTEGER) AS peak_abs
FROM v GROUP BY doc_id, n ORDER BY media_id
"""


MULTIMODAL_WAV_SQL = """
WITH d AS (
  SELECT doc_id,
         400 + doc_id % 200 AS n,
         3 + doc_id % 7 AS k,
         doc_id % 97 AS c
  FROM documents WHERE doc_id < 200
), s AS (
  SELECT doc_id, n,
         ((unnest(range(0, CAST(n AS BIGINT))) * k + c) % 191) - 95 AS v
  FROM d
)
SELECT doc_id AS media_id,
       1 AS n_channels,
       8000 AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
       CAST(SUM(v) AS BIGINT) AS sample_sum,
       CAST(MAX(ABS(v)) AS INTEGER) AS peak_abs
FROM s GROUP BY doc_id, n ORDER BY media_id
"""




def incremental_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (batch-vs-history) dedup: the oldest 80% of the
    corpus is 'history', the newest 20% is the incoming batch; each new
    doc is classified exact / near / novel against history only
    (`operators/dedup.py::incremental_dedup`). The oracle recomputes
    the same three tiers brute-force (md5 semi-join + cross-split
    shingle-Jaccard)."""
    docs = _docs(spark, sf_dir)
    cut = int(docs.count() * 0.8)
    return D.incremental_dedup(
        docs.filter(F.col("doc_id") < cut),
        docs.filter(F.col("doc_id") >= cut),
        "doc_id",
        "text",
    ).orderBy("doc_id")


def incremental_dedup_indexed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same classification as `incremental_dedup_docs` but through the
    PERSISTED dedup index (`write_dedup_index` -> md5 + band-partitioned
    parquet relations, `incremental_dedup_indexed` probe): the
    steady-state ingest loop where history is never re-derived per
    batch. Same oracle — verdicts must be identical to the inline path.
    """
    import os
    import shutil
    import tempfile

    docs = _docs(spark, sf_dir)
    cut = int(docs.count() * 0.8)
    hist = docs.filter(F.col("doc_id") < cut)
    new = docs.filter(F.col("doc_id") >= cut)
    # private per-call dir: a fixed shared path would race a concurrent
    # run (rmtree under its live scan) — same rule as the streaming
    # entries' mkdtemp staging
    idx = tempfile.mkdtemp(prefix="dedupidx_")
    try:
        D.write_dedup_index(hist, idx, "doc_id", "text")
        out = D.incremental_dedup_indexed(
            spark, idx, hist, new, "doc_id", "text"
        ).orderBy("doc_id")
        # materialize before the index directory disappears
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return out.orderBy("doc_id")


def incremental_dedup_delete_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE for the persisted dedup index under the
    driver gate (takedown/GDPR — completing the trilogy with the text
    and ANN indexes): index the history, tombstone every history doc
    with doc_id % 5 == 0 (`delete_from_dedup_index`), then classify
    the batch. Verdicts must equal a history that never contained the
    deleted docs — their exact copies and near-dups in the batch
    re-classify as novel (unless other surviving history matches).
    The oracle recomputes both tiers over the SURVIVING history only;
    a second delete of the same ids plus an unknown id is pinned as a
    no-op bit."""
    import shutil
    import tempfile

    docs = _docs(spark, sf_dir)
    cut = int(docs.count() * 0.8)
    hist = docs.filter(F.col("doc_id") < cut)
    new = docs.filter(F.col("doc_id") >= cut)
    victims = hist.filter(F.pmod(F.col("doc_id"), F.lit(5)) == 0).select(
        "doc_id"
    )
    idx = tempfile.mkdtemp(prefix="dedupidx_del_")
    try:
        D.write_dedup_index(hist, idx, "doc_id", "text")
        n_victims = victims.count()
        stats = D.delete_from_dedup_index(spark, idx, victims)
        again = D.delete_from_dedup_index(
            spark, idx, victims.withColumn("doc_id", F.col("doc_id"))
        )
        redelete_noop = int(
            stats["deleted"] == n_victims and again["deleted"] == 0
        )
        out = (
            D.incremental_dedup_indexed(
                spark, idx, hist, new, "doc_id", "text"
            )
            .withColumn("redelete_noop", F.lit(redelete_noop).cast("int"))
            .orderBy("doc_id")
        )
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return out.orderBy("doc_id")


INCREMENTAL_DEDUP_SQL = r"""
WITH split AS (
  SELECT CAST(floor(0.8 * COUNT(*)) AS BIGINT) AS cut FROM documents
), hist AS (
  SELECT d.* FROM documents d, split WHERE d.doc_id < cut
), newb AS (
  SELECT d.* FROM documents d, split WHERE d.doc_id >= cut
), ex AS (
  SELECT doc_id FROM newb
  WHERE md5(lower(trim(text))) IN
        (SELECT md5(lower(trim(text))) FROM hist)
), toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
  FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           [ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
            FOR i IN range(1, len(ts) - 1)]
         )) AS shingle
  FROM toks WHERE len(ts) >= 3
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), nearp AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle, split
  WHERE a.doc_id >= cut AND b.doc_id < cut
  GROUP BY 1, 2
), near AS (
  SELECT DISTINCT id_a AS doc_id
  FROM nearp JOIN sizes s1 ON id_a = s1.doc_id
             JOIN sizes s2 ON id_b = s2.doc_id
  WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8
)
SELECT n.doc_id,
       CASE WHEN ex.doc_id IS NOT NULL THEN 'exact'
            WHEN nr.doc_id IS NOT NULL THEN 'near'
            ELSE 'novel' END AS verdict
FROM newb n
LEFT JOIN ex ON n.doc_id = ex.doc_id
LEFT JOIN near nr ON n.doc_id = nr.doc_id
ORDER BY n.doc_id
"""


# the delete-entry oracle: the SAME two-tier recomputation over the
# SURVIVING history only (doc_id % 5 <> 0), plus the pinned no-op bit
INCREMENTAL_DEDUP_DELETE_SQL = (
    INCREMENTAL_DEDUP_SQL.replace(
        "SELECT d.* FROM documents d, split WHERE d.doc_id < cut",
        "SELECT d.* FROM documents d, split "
        "WHERE d.doc_id < cut AND d.doc_id % 5 <> 0",
    )
    .replace(
        "WHERE a.doc_id >= cut AND b.doc_id < cut",
        "WHERE a.doc_id >= cut AND b.doc_id < cut AND b.doc_id % 5 <> 0",
    )
    .replace(
        "ELSE 'novel' END AS verdict",
        "ELSE 'novel' END AS verdict,\n       1 AS redelete_noop",
    )
)


def image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup pairs, end to end for REAL:
    deterministic 16x16 P6 payloads are built in-plan (pixel value
    varies by position, printable-ASCII so UTF-8 encode is
    byte-identity; every 10th image is a near-copy of its predecessor
    with the first 4 pixels nudged), `operators/multimodal.py::
    ahash_ppm` actually parses the raster and computes the
    integer-exact 8x8 average hash in Arrow batches, and
    `operators/dedup.py::hamming_banded_pairs` finds all pairs within
    Hamming<=3 via the pigeonhole chunk join — never an all-pairs
    product. The oracle predicts every pixel, every threshold bit
    (cross-multiplied integer compare, no floats), the signed-int64
    hash fold, and brute-forces the pairs."""
    from implementation_of_an_etl_process_spark.operators import (
        multimodal as M,
    )
    from implementation_of_an_etl_process_spark.operators.dedup import (
        hamming_banded_pairs,
    )

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 400).select("doc_id")
    cp = F.col("doc_id") % 10 == 9
    base = F.col("doc_id") - F.when(cp, 1).otherwise(0)

    def v(p):
        raw = F.pmod(base * 31 + p, F.lit(95))
        nudged = F.pmod(
            raw + F.when(cp & (p < 4), 1).otherwise(0), F.lit(95)
        )
        return (nudged + 32).cast("int")

    raster = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(255)),
            lambda p: F.repeat(F.char(v(p)), 3),
        ),
        "",
    )
    payloads = d.select(
        "doc_id",
        F.encode(
            F.concat(F.lit("P6\n16 16\n255\n"), raster), "UTF-8"
        ).alias("blob"),
    )
    media = M.attach_media_meta(payloads, "doc_id", "blob", "image")
    sig = M.ahash_ppm(media)
    return hamming_banded_pairs(
        sig, "media_id", "ahash", max_hamming=3
    ).orderBy("id_a", "id_b")


IMAGE_AHASH_SQL = """
WITH d AS (
  SELECT doc_id,
         doc_id - (CASE WHEN doc_id % 10 = 9 THEN 1 ELSE 0 END) AS base,
         (doc_id % 10 = 9) AS cp
  FROM documents WHERE doc_id < 400
), px AS (
  SELECT doc_id,
         ((((base * 31 + p) % 95) + 95) % 95
          + CASE WHEN cp AND p < 4 THEN 1 ELSE 0 END) % 95 + 32 AS v,
         ((p // 16) // 2) * 8 + (p % 16) // 2 AS cell
  FROM d, range(0, 256) t(p)
), cells AS (
  SELECT doc_id, cell, SUM(v) AS cs FROM px GROUP BY doc_id, cell
), tot AS (
  SELECT doc_id, SUM(cs) AS ts FROM cells GROUP BY doc_id
), hashes AS (
  -- CAST to BIGINT: DuckDB SUM yields HUGEINT, whose 128-bit xor /
  -- bit_count diverges from two's-complement int64 (an all-ones xor
  -- even wraps bit_count's result negative)
  SELECT doc_id,
         CAST(SUM(CASE WHEN cs * 64 > ts THEN
               CASE WHEN cell = 63 THEN -9223372036854775808
                    ELSE (1::BIGINT << CAST(cell AS INTEGER)) END
             ELSE 0 END) AS BIGINT) AS ahash
  FROM cells JOIN tot USING (doc_id) GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming
FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
ORDER BY id_a, id_b
"""


def audio_energy_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs, end to end for REAL: the wav entry's
    deterministic PCM-16 waveforms (every 10th track a 4-sample-nudged
    near-copy of its predecessor) are RIFF-encoded executor-side,
    `operators/multimodal.py::energy_hash_wav` walks the container and
    computes the integer-exact 64-window energy fingerprint, and the
    shared `hamming_banded_pairs` finds all pairs within Hamming<=3.
    The oracle regenerates every sample, every window sum (window =
    i*64//n, the operator's rule), every threshold bit, the signed
    BIGINT fold, and brute-forces the pairs."""
    from implementation_of_an_etl_process_spark.operators import (
        multimodal as M,
    )
    from implementation_of_an_etl_process_spark.operators.dedup import (
        hamming_banded_pairs,
    )

    cp = F.col("doc_id") % 10 == 9
    base = F.col("doc_id") - F.when(cp, 1).otherwise(0)
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        "doc_id",
        (400 + base % 200).cast("int").alias("n"),
        (3 + base % 7).cast("int").alias("k"),
        (base % 97).cast("int").alias("c"),
        cp.alias("cp"),
    )

    def make_wav(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for did, n, k, c, is_cp in zip(
                pdf["doc_id"], pdf["n"], pdf["k"], pdf["c"], pdf["cp"]
            ):
                i = np.arange(int(n), dtype=np.int64)
                s = ((i * int(k) + int(c)) % 191 - 95).astype(np.int16)
                if is_cp:
                    s[:4] += 1
                ids.append(did)
                blobs.append(M.encode_wav(s, sample_rate=8000))
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    payloads = d.mapInPandas(make_wav, "doc_id long, blob binary")
    media = M.attach_media_meta(payloads, "doc_id", "blob", "audio")
    sig = M.energy_hash_wav(media)
    return hamming_banded_pairs(
        sig, "media_id", "ehash", max_hamming=3
    ).orderBy("id_a", "id_b")


AUDIO_ENERGY_HASH_SQL = """
WITH d AS (
  SELECT doc_id,
         doc_id - (CASE WHEN doc_id % 10 = 9 THEN 1 ELSE 0 END) AS base,
         (doc_id % 10 = 9) AS cp
  FROM documents WHERE doc_id < 200
), p AS (
  SELECT doc_id,
         400 + base % 200 AS n, 3 + base % 7 AS k, base % 97 AS c, cp
  FROM d
), s AS (
  SELECT doc_id, n, k, c, cp,
         unnest(range(0, CAST(n AS BIGINT))) AS i
  FROM p
), e AS (
  SELECT doc_id, n,
         ABS((i * k + c) % 191 - 95
             + CASE WHEN cp AND i < 4 THEN 1 ELSE 0 END) AS ev,
         (i * 64) // n AS w
  FROM s
), wins AS (
  SELECT doc_id, n, w, SUM(ev) AS ew, COUNT(*) AS nw
  FROM e GROUP BY doc_id, n, w
), tot AS (
  SELECT doc_id, SUM(ew) AS te FROM wins GROUP BY doc_id
), hashes AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN ew * n > te * nw THEN
               CASE WHEN w = 63 THEN -9223372036854775808
                    ELSE (1::BIGINT << CAST(w AS INTEGER)) END
             ELSE 0 END) AS BIGINT) AS ehash
  FROM wins JOIN tot USING (doc_id) GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.ehash, b.ehash)) AS INTEGER) AS hamming
FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ehash, b.ehash)) <= 3
ORDER BY id_a, id_b
"""


def url_canonicalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization for web-corpus dedup prep
    (`operators/pretrain.py::canonicalize_url`): four formatting
    variants per logical URL (case, www, default port, tracking
    params, unsorted query, trailing slash, fragment) are built
    in-plan; canonicalization must collapse each group of 4 to ONE
    form. Output: per-doc canonical plus the group's distinct-canonical
    count (always 1 — the collapse property is value-gated, not just
    eyeballed)."""
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        canonicalize_url,
    )

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 400).select(
        "doc_id",
        (F.col("doc_id") / 4).cast("long").alias("grp"),
        (F.col("doc_id") % 4).alias("v"),
    )
    b = F.col("grp").cast("string")
    url = (
        F.when(F.col("v") == 0,
               F.concat(F.lit("http://Example"), b, F.lit(".com/path"), b,
                        F.lit("?b=2&a=1")))
        .when(F.col("v") == 1,
              F.concat(F.lit("HTTP://WWW.EXAMPLE"), b, F.lit(".COM:80/path"),
                       b, F.lit("/?a=1&b=2#sec1")))
        .when(F.col("v") == 2,
              F.concat(F.lit("http://example"), b,
                       F.lit(".com:80/path"), b,
                       F.lit("?utm_source=x&b=2&a=1")))
        .otherwise(
            F.concat(F.lit("http://www.example"), b, F.lit(".com/path"), b,
                     F.lit("/?a=1&b=2&gclid=zz#frag")))
    )
    out = d.select("doc_id", "grp", url.alias("url")).withColumn(
        "canonical", canonicalize_url("url")
    )
    grp_check = out.groupBy("grp").agg(
        F.countDistinct("canonical").alias("n_canon")
    )
    return (
        out.join(grp_check, "grp")
        .select("doc_id", "canonical", "n_canon")
        .orderBy("doc_id")
    )


URL_CANONICALIZE_SQL = """
WITH d AS (
  SELECT doc_id, doc_id // 4 AS grp
  FROM documents WHERE doc_id < 400
), c AS (
  SELECT doc_id, grp,
         'http://example' || grp || '.com/path' || grp || '?a=1&b=2'
           AS canonical
  FROM d
), g AS (
  SELECT grp, COUNT(DISTINCT canonical) AS n_canon FROM c GROUP BY grp
)
SELECT doc_id, canonical, CAST(n_canon AS BIGINT) AS n_canon
FROM c JOIN g USING (grp)
ORDER BY doc_id
"""


def _wrap_page() -> F.Column:
    """Deterministic synthetic page around a doc's ``text`` column:
    title + style + script (with a '<' inside the script body), a nav
    div, a 3-word headline, the body paragraph (words 4..), and an
    entity-bearing footer — shared by html_extract_docs and the
    composed web_pipeline_stats so the two entries stay in lockstep."""
    words = F.split(F.trim(F.col("text")), r"\s+")
    head3 = F.array_join(F.slice(words, 1, 3), " ")
    body = F.array_join(F.slice(words, 4, F.size(words) - 3), " ")
    return F.concat(
        F.lit("<html><head><title>T</title><style>p {color: red}</style>"
              "<script>var x = 1; if (x < 2) { x++; }</script></head>"
              "<body><div>Home About Contact</div><h1>"),
        head3,
        F.lit("</h1><p>"),
        body,
        F.lit("</p><div>&copy; 2024 footer</div></body></html>"),
    )


def html_extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl->text boilerplate removal under the driver gate
    (`operators/pretrain.py::html_main_text`): each doc's text is
    wrapped in-plan into a realistic page (title, style+script blocks,
    nav div, a short headline from its first 3 words, the body
    paragraph, an entity-bearing footer); extraction must drop every
    boilerplate line and recover EXACTLY the body paragraph. The
    oracle predicts the output analytically from the generation rule
    (body = words 4.. of the original text)."""
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        html_main_text,
    )

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 400)
    return (
        html_main_text(
            d.select("doc_id", _wrap_page().alias("html")), "html"
        )
        .select("doc_id", "main_text", "n_kept_lines", "n_main_words")
        .orderBy("doc_id")
    )


HTML_EXTRACT_SQL = r"""
WITH d AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\s+') AS w
  FROM documents WHERE doc_id < 400
)
SELECT doc_id,
       array_to_string(w[4:], ' ') AS main_text,
       1 AS n_kept_lines,
       CAST(len(w) - 3 AS INTEGER) AS n_main_words
FROM d ORDER BY doc_id
"""


def web_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed web-curation flow in ONE lazy plan: synthetic pages
    (the html_extract_docs template) + the url_canonicalize_docs URL
    variants -> HTML boilerplate removal -> URL canonicalization ->
    URL-level dedup (min-doc_id survivor per canonical URL) -> quality
    gate (>= 10 main words) -> corpus stats. A regression in ANY stage
    or in how they compose breaks the hash. Everything is one narrow
    plan over the page build plus one group-by-canonical shuffle; the
    oracle recomposes the chain analytically (survivors are exactly
    the doc_id % 4 == 0 rows, main words = total words - 3)."""
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        canonicalize_url,
        html_main_text,
    )

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 400).select(
        "doc_id", "text",
        (F.col("doc_id") / 4).cast("long").alias("grp"),
        (F.col("doc_id") % 4).alias("v"),
    )
    b = F.col("grp").cast("string")
    url = (
        F.when(F.col("v") == 0,
               F.concat(F.lit("http://Example"), b, F.lit(".com/path"), b,
                        F.lit("?b=2&a=1")))
        .when(F.col("v") == 1,
              F.concat(F.lit("HTTP://WWW.EXAMPLE"), b, F.lit(".COM:80/path"),
                       b, F.lit("/?a=1&b=2#sec1")))
        .when(F.col("v") == 2,
              F.concat(F.lit("http://example"), b,
                       F.lit(".com:80/path"), b,
                       F.lit("?utm_source=x&b=2&a=1")))
        .otherwise(
            F.concat(F.lit("http://www.example"), b, F.lit(".com/path"), b,
                     F.lit("/?a=1&b=2&gclid=zz#frag")))
    )
    pages = d.select(
        "doc_id", _wrap_page().alias("html"), url.alias("url")
    )
    extracted = html_main_text(pages, "html").withColumn(
        "canonical", canonicalize_url("url")
    )
    survivors = (
        extracted.groupBy("canonical")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("n_main_words", "doc_id").alias("n_main_words"),
        )
    )
    passed = survivors.filter(F.col("n_main_words") >= 10)
    return passed.agg(
        F.count(F.lit(1)).alias("n_pages_kept"),
        F.sum("n_main_words").alias("total_main_words"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


WEB_PIPELINE_SQL = r"""
WITH d AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) - 3 AS n_main_words
  FROM documents
  WHERE doc_id < 400 AND doc_id % 4 = 0
)
SELECT CAST(COUNT(*) FILTER (n_main_words >= 10) AS BIGINT) AS n_pages_kept,
       CAST(SUM(n_main_words) FILTER (n_main_words >= 10) AS BIGINT)
         AS total_main_words,
       CAST(MIN(doc_id) FILTER (n_main_words >= 10) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) FILTER (n_main_words >= 10) AS BIGINT) AS max_doc_id
FROM d
"""


def winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) partial-overlap detection under the driver
    gate (`operators/text.py::winnow_pairs`, Schleimer et al. SIGMOD
    2003): word-3-gram hashes, window-4 rightmost-min selection,
    df-capped inverted index, pairs sharing >= 2 fingerprints. Unlike
    MinHash this is a LOCAL algorithm: any shared token run of
    >= w + k - 1 = 6 words is guaranteed a shared fingerprint. The
    oracle re-runs the whole algorithm in SQL (same md5 gram hash,
    same window argmin tie rule)."""
    from implementation_of_an_etl_process_spark.operators.text import (
        winnow_pairs,
    )

    return winnow_pairs(
        _docs(spark, sf_dir), k=3, w=4, min_shared=2, max_df=50
    ).orderBy("id_a", "id_b")


WINNOW_PAIRS_SQL = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     t -> t <> '') AS ws
  FROM documents
), g AS (
  SELECT doc_id, len(ws) - 2 AS m,
         list_transform(range(1, len(ws) - 1), i ->
           CAST(('0x' || substr(md5(array_to_string(ws[i:i+2], ' ')),
                 1, 8))::UBIGINT AS BIGINT)) AS hs
  FROM d WHERE len(ws) >= 3
), sel AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(m - 3, 1) + 1),
           j -> list_min(hs[j:j + least(4, m) - 1])))) AS fp_hash
  FROM g
), postings AS (
  SELECT DISTINCT doc_id, fp_hash FROM sel
), df_ok AS (
  SELECT fp_hash FROM postings GROUP BY fp_hash HAVING COUNT(*) <= 50
), p AS (
  SELECT doc_id, fp_hash FROM postings JOIN df_ok USING (fp_hash)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM p a JOIN p b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
GROUP BY id_a, id_b
HAVING COUNT(*) >= 2
ORDER BY id_a, id_b
"""


QUERIES = {
    "dedup_exact_documents": dedup_exact_documents,
    "incremental_dedup_docs": incremental_dedup_docs,
    "incremental_dedup_indexed_docs": incremental_dedup_indexed_docs,
    "incremental_dedup_delete_docs": incremental_dedup_delete_docs,
    "multimodal_video_frames": multimodal_video_frames,
    "multimodal_ppm_decode": multimodal_ppm_decode,
    "image_ahash_dedup": image_ahash_dedup,
    "audio_energy_hash_dedup": audio_energy_hash_dedup,
    "url_canonicalize_docs": url_canonicalize_docs,
    "html_extract_docs": html_extract_docs,
    "web_pipeline_stats": web_pipeline_stats,
    "winnow_overlap_pairs": winnow_overlap_pairs,
    "multimodal_png_decode": multimodal_png_decode,
    "multimodal_jpeg_decode": multimodal_jpeg_decode,
    "multimodal_jpeg420_decode": multimodal_jpeg420_decode,
    "multimodal_jpeg_prog_decode": multimodal_jpeg_prog_decode,
    "multimodal_resize_ppm": multimodal_resize_ppm,
    "multimodal_resize_box": multimodal_resize_box,
    "multimodal_exif_orient_decode": multimodal_exif_orient_decode,
    "multimodal_wav_decode": multimodal_wav_decode,
    "multimodal_wav_resample": multimodal_wav_resample,
    "text_fingerprint": text_fingerprint,
    "text_token_count": text_token_count,
    "text_quality": text_quality,
    "text_langid": text_langid,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_hot_bucket_farm": dedup_hot_bucket_farm,
    "dedup_simhash": dedup_simhash,
    "dedup_cluster_docs": dedup_cluster_docs,
    "dedup_cluster_star_docs": dedup_cluster_star_docs,
    "dedup_survivors": dedup_survivors,
    "dedup_keep_best_docs": dedup_keep_best_docs,
    "multimodal_binary_stats": multimodal_binary_stats,
    "multimodal_image_features": multimodal_image_features,
    "multimodal_frame_offsets": multimodal_frame_offsets,
}

ORACLES = {
    "dedup_exact_documents": DEDUP_EXACT_SQL,
    "incremental_dedup_docs": INCREMENTAL_DEDUP_SQL,
    "incremental_dedup_indexed_docs": INCREMENTAL_DEDUP_SQL,
    "incremental_dedup_delete_docs": INCREMENTAL_DEDUP_DELETE_SQL,
    "multimodal_video_frames": MULTIMODAL_VIDEO_SQL,
    "multimodal_ppm_decode": MULTIMODAL_PPM_SQL,
    "image_ahash_dedup": IMAGE_AHASH_SQL,
    "audio_energy_hash_dedup": AUDIO_ENERGY_HASH_SQL,
    "url_canonicalize_docs": URL_CANONICALIZE_SQL,
    "html_extract_docs": HTML_EXTRACT_SQL,
    "web_pipeline_stats": WEB_PIPELINE_SQL,
    "winnow_overlap_pairs": WINNOW_PAIRS_SQL,
    "multimodal_png_decode": MULTIMODAL_PNG_SQL,
    "multimodal_jpeg_decode": MULTIMODAL_JPEG_SQL,
    "multimodal_jpeg420_decode": MULTIMODAL_JPEG420_SQL,
    "multimodal_jpeg_prog_decode": MULTIMODAL_JPEG_PROG_SQL,
    "multimodal_resize_ppm": MULTIMODAL_RESIZE_SQL,
    "multimodal_resize_box": MULTIMODAL_RESIZE_BOX_SQL,
    "multimodal_exif_orient_decode": MULTIMODAL_EXIF_SQL,
    "multimodal_wav_decode": MULTIMODAL_WAV_SQL,
    "multimodal_wav_resample": MULTIMODAL_WAV_RESAMPLE_SQL,
    "text_fingerprint": TEXT_FINGERPRINT_SQL,
    "text_token_count": TEXT_TOKEN_COUNT_SQL,
    "text_quality": TEXT_QUALITY_SQL,
    "text_langid": TEXT_LANGID_SQL,
    "dedup_ngram_jaccard": _JACCARD_ORACLE,
    "dedup_minhash_lsh": _JACCARD_ORACLE,
    "dedup_hot_bucket_farm": HOT_BUCKET_FARM_SQL,
    "dedup_simhash": SIMHASH_SQL,
    "dedup_cluster_docs": DEDUP_CLUSTER_SQL,
    "dedup_keep_best_docs": DEDUP_KEEP_BEST_SQL,
    "dedup_cluster_star_docs": DEDUP_CLUSTER_SQL,
    "dedup_survivors": _DEDUP_SURVIVORS_SQL,
    "multimodal_binary_stats": MULTIMODAL_STATS_SQL,
    "multimodal_image_features": MULTIMODAL_FEATURES_SQL,
    "multimodal_frame_offsets": MULTIMODAL_FRAMES_SQL,
}
