"""Guards on the derived partsupp (queries/tpch.py::_partsupp): the
modular fanout must stay injective per part — if the testdata's
supplier count ever changes to a value where the i*37 stride collides
mod N, two of a part's four suppliers would silently merge and every
partsupp-based entry would drift from its oracle in a hard-to-read way.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.queries.tpch import (
    _PS_FANOUT,
    _partsupp,
)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_partsupp_fanout_is_injective(spark, sf_dir):
    ps = _partsupp(spark, sf_dir)
    n_parts = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    stats = ps.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("ps_partkey", "ps_suppkey").alias("pairs"),
        F.min("ps_availqty").alias("min_avail"),
        F.min("ps_supplycost").alias("min_cost"),
    ).first()
    assert stats["rows"] == n_parts * _PS_FANOUT
    assert stats["pairs"] == stats["rows"], "supplier fanout collided"
    assert stats["min_avail"] >= 1
    assert stats["min_cost"] >= 0.0
    # every ps_suppkey must be a real supplier key (0-based contiguous)
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("k")
    )
    orphans = ps.join(
        supp, ps.ps_suppkey == F.col("k"), "left_anti"
    ).count()
    assert orphans == 0
