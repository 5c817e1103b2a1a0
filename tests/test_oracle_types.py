"""Driver-safety tripwire for oracle SQL output types.

Round-5 driver finding: DuckDB widens SUM(BIGINT) to HUGEINT (int128),
and the driver's value-hash canonicalizes HUGEINT differently than
Spark's int64 — rows+schema matched but hashes diverged on exactly the
three oracles with a bare SUM. ``tools/verify_local.py`` cannot catch
this (``fetchall()`` converts HUGEINT to Python int), so this test
binds every oracle against DuckDB (binding only — no execution, no
Spark) and fails if any output column is HUGEINT or DECIMAL.

Keep every aggregate in oracle SQL wrapped in ``CAST(... AS BIGINT)``
(or DOUBLE where the Spark side is double).
"""

from __future__ import annotations

import os

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

BANNED = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def oracle_connection():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def test_no_hugeint_or_decimal_in_any_oracle(oracle_connection):
    from __spark_entry__ import oracle_sql

    offenders = []
    for name, sql in oracle_sql().items():
        rel = oracle_connection.sql(sql)  # binds (types), does not run
        for col, typ in zip(rel.columns, [str(x) for x in rel.types]):
            if typ in BANNED or typ.startswith("DECIMAL"):
                offenders.append((name, col, typ))
    assert not offenders, (
        "oracle output columns with driver-unsafe types (cast them to "
        f"BIGINT/DOUBLE in the oracle SQL): {offenders}"
    )
