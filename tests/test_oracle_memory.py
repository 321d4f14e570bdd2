"""Gate-robustness pins for the gram-exploding DuckDB oracles
(quality.py: CHUNK_DEDUP_SQL, LINE_DEDUP_SQL, REPEATED_SUBSTR_SQL).

The r6 independent review observed all three OOM DuckDB-side while a 12 g
Spark JVM from a preceding pytest session was still resident, then pass on
a clean re-run — i.e. the driver's gate could flake under system memory
pressure.  The hardening: slice-based chunking (no per-position unnest +
no ORDER BY string_agg in chunk_dedup) and AS MATERIALIZED on CTEs that
are referenced twice (DuckDB inlines plain CTEs, doubling the unnest).

These tests reproduce the review's "Done" criterion: the three oracles
must pass at sf0.01 under an EXPLICIT 8 GB DuckDB memory_limit — with
spill disabled (temp_directory='') so the cap is a hard in-memory bound —
while this pytest session's Spark JVM holds its 12 g heap.  A much
tighter 256 MB cap is pinned too: the oracles' intrinsic footprint must
stay far below anything a pressured gate box could plausibly deny.
"""

from __future__ import annotations

import duckdb
import pytest

from readability_spark.ops.quality import (
    CHUNK_DEDUP_SQL,
    LINE_DEDUP_SQL,
    REPEATED_SUBSTR_SQL,
)

SF = "/root/testdata/sf0.01"

ORACLES = {
    "chunk_dedup": CHUNK_DEDUP_SQL,
    "line_dedup": LINE_DEDUP_SQL,
    "repeated_substr": REPEATED_SUBSTR_SQL,
}


def _capped_run(sql: str, limit: str):
    con = duckdb.connect()
    try:
        con.execute(f"SET memory_limit='{limit}'")
        con.execute("SET temp_directory=''")     # no spill: hard cap
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
        return con.execute(sql).fetchall()
    finally:
        con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_survives_8gb_cap_with_resident_jvm(spark, name):
    # the spark fixture IS the resident 12 g JVM; touch it so the session
    # is live (not lazily uninitialized) while DuckDB runs capped
    assert spark.range(1).count() == 1
    rows = _capped_run(ORACLES[name], "8GB")
    assert len(rows) == 500


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_intrinsic_footprint_under_256mb(spark, name):
    # far below any plausible pressure threshold: the position/chunk
    # explode at gate scale must not need memory in the first place
    rows = _capped_run(ORACLES[name], "256MB")
    assert len(rows) == 500
