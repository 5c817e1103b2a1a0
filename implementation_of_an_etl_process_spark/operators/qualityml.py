"""Trained quality classifier — model-based corpus filtering.

The heuristic quality signals (:func:`operators.text.quality_scores`)
are the standard first pass over a pretraining corpus; production
pipelines then train a lightweight classifier on weak labels derived
from those heuristics (or from a curated seed set) and filter by model
score — the fastText-style quality filter described in the GPT-3 / CCNet
data papers. This module provides that stage Spark-first:

- :func:`weak_quality_labels` — deterministic heuristic labels (pure
  Column expressions, no shuffle);
- :func:`train_quality_classifier` — a seeded Spark ML pipeline
  (VectorAssembler [+ optional hashed token term frequencies] into a
  DecisionTree or LogisticRegression). Training is distributed (ML
  tree learning aggregates split statistics via treeAggregate;
  LBFGS gradients likewise) — no feature row ever reaches the driver;
- :func:`score_quality` — model inference as a narrow map over the
  feature columns (JVM-side; the only exchange in a score-then-filter
  plan is whatever the caller adds downstream).

Scale notes (100 TB): feature computation is shuffle-free Column
arithmetic; training reads a SAMPLE by contract (callers pass a
bounded train split — weak labels make train data cheap, so a few
million rows is plenty for 6 numeric features); inference is
embarrassingly parallel. The model object itself is a few KB
broadcast, never a bottleneck.

Reference scope: the reference engine (ETL.java) has no ML surface;
this is part of the mandated training-data-pipeline extension
(SURVEY.md north star), not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators.text import quality_scores

#: engineered features the classifier consumes (appended by
#: :func:`operators.text.quality_scores`)
QUALITY_FEATURES = [
    "n_chars",
    "n_tokens",
    "mean_token_len",
    "stopword_ratio",
    "punct_ratio",
    "alpha_ratio",
]


def weak_quality_labels(
    df: DataFrame,
    text_col: str,
    *,
    min_stopword_ratio: float = 0.08,
    min_tokens: int = 20,
) -> DataFrame:
    """Append the engineered feature columns plus an integer
    ``quality_label`` from a deterministic heuristic screen: a document
    is "high quality" when it reads like running prose (stopword ratio
    at least ``min_stopword_ratio``) and is long enough to carry signal
    (at least ``min_tokens`` whitespace tokens). Pure Columns — the
    label is a reproducible function of the text, which is what makes
    it usable as weak supervision AND as an engine-independent oracle.
    """
    scored = quality_scores(df, text_col)
    return scored.withColumn(
        "quality_label",
        (
            (F.col("stopword_ratio") >= min_stopword_ratio)
            & (F.col("n_tokens") >= min_tokens)
        ).cast("int"),
    )


def train_quality_classifier(
    train: DataFrame,
    label_col: str = "quality_label",
    *,
    algo: str = "tree",
    hash_features: int = 0,
    text_col: str | None = None,
    seed: int = 7,
    max_depth: int = 5,
    max_bins: int = 128,
):
    """Fit the quality model on a frame that already carries the
    :data:`QUALITY_FEATURES` columns and ``label_col`` (use
    :func:`weak_quality_labels`). Returns a fitted
    ``pyspark.ml.PipelineModel``.

    ``algo='tree'`` (default) learns axis-aligned thresholds — the
    right inductive bias when the weak labels ARE threshold rules;
    ``max_bins`` is raised from Spark's default 32 so the learned
    split lands tight against the label boundary.  ``algo='lr'`` is
    the fastText-shaped choice, and with ``hash_features > 0`` (and
    ``text_col``) the feature vector additionally carries hashed
    token term frequencies (RegexTokenizer → HashingTF), giving the
    model lexical signal beyond the engineered ratios.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import (
        DecisionTreeClassifier,
        LogisticRegression,
    )
    from pyspark.ml.feature import HashingTF, RegexTokenizer, VectorAssembler

    stages = []
    feature_cols = list(QUALITY_FEATURES)
    if hash_features:
        if not text_col:
            raise ValueError("hash_features requires text_col")
        stages.append(
            RegexTokenizer(
                inputCol=text_col,
                outputCol="_qm_tokens",
                pattern=r"\s+",
                toLowercase=True,
            )
        )
        stages.append(
            HashingTF(
                inputCol="_qm_tokens",
                outputCol="_qm_tf",
                numFeatures=hash_features,
            )
        )
        feature_cols.append("_qm_tf")
    stages.append(
        VectorAssembler(inputCols=feature_cols, outputCol="_qm_features")
    )
    if algo == "tree":
        clf = DecisionTreeClassifier(
            featuresCol="_qm_features",
            labelCol=label_col,
            predictionCol="quality_pred",
            rawPredictionCol="_qm_raw",
            probabilityCol="_qm_prob",
            maxDepth=max_depth,
            maxBins=max_bins,
            seed=seed,
        )
    elif algo == "lr":
        clf = LogisticRegression(
            featuresCol="_qm_features",
            labelCol=label_col,
            predictionCol="quality_pred",
            rawPredictionCol="_qm_raw",
            probabilityCol="_qm_prob",
            maxIter=50,
            regParam=1e-4,
        )
    else:
        raise ValueError(f"unknown algo {algo!r} (want 'tree' or 'lr')")
    stages.append(clf)
    return Pipeline(stages=stages).fit(train)


def score_quality(model, df: DataFrame) -> DataFrame:
    """Apply a fitted quality model to a frame carrying the
    :data:`QUALITY_FEATURES` columns (and the text/token columns when
    the model was trained with ``hash_features``); returns the input
    plus an integer ``quality_pred``, intermediate ML columns dropped.
    """
    out = model.transform(df)
    drop = [c for c in out.columns if c.startswith("_qm_")]
    return out.drop(*drop).withColumn(
        "quality_pred", F.col("quality_pred").cast("int")
    )
