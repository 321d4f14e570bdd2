"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the same sf, compare row count,
column names, and order-insensitive values.

Driver-strict: both sides go through pandas (Spark .toPandas(), DuckDB
.df()) and canonicalize the way the driver does — sort columns by name,
sort_values over all columns — so dtype artifacts the driver would hash
differently (DuckDB HUGEINT→float64 vs Spark int64, unsortable list cells)
fail HERE first.  Cells compare at full precision (repr of the Python
scalar), so a last-ulp float difference or an int-vs-float dtype drift is a
FAIL, never masked by %.9g rounding.

Host-pressure discipline (r7): on this shared-tenancy VM, a co-tenant
spike can make even 16 KB allocations fail ("bad allocation") and stretch
a 0.1 s DuckDB query to 35 s — observed killing DIFFERENT oracles on
different runs (r6 review: chunk/line/repeated; r7: ann_ivf_sampled +
line_dedup) while the box itself reported >120 GB free and a DuckDB-only
sweep of all 64 oracles peaked at ~0 MB buffer usage.  The oracle SQL is
not the problem; exposure time is.  Mitigations here: the connection is
capped (8 GB, 8 threads, spill enabled) so DuckDB prefers eviction over
fresh page-touches, and an OutOfMemoryException gets ONE retry on a fresh
capped connection — a genuine memory bug fails twice, a pressure flake
passes the retry and is logged as such.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def norm_cell(v):
    """Full-precision canonical string for one cell.

    numpy scalars unwrap via .item() so widths collapse (int32 5 == int64 5)
    but numeric *class* survives (repr 5 != repr 5.0) — the same distinction
    the driver's value hash makes after pandas conversion.
    """
    if v is None:
        return "None"
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    item = getattr(v, "item", None)
    if callable(item) and not isinstance(v, (str, bytes)):
        try:
            v = v.item()
        except (ValueError, TypeError):
            pass
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(pdf):
    """The driver's canonical form: columns sorted by name, rows sorted by
    all columns (this is where an array<...> column crashes — deliberately
    reproduced, since it crashes the driver's gate too)."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def norm_frame(pdf):
    pdf = canon(pdf)
    cols = list(pdf.columns)
    rows = [tuple(norm_cell(v) for v in row)
            for row in pdf.itertuples(index=False, name=None)]
    return cols, rows


def duck_connect(sf_dir):
    """A capped, spill-enabled connection: small cross-section under
    host memory pressure (see module docstring)."""
    import tempfile

    import duckdb

    con = duckdb.connect()
    con.sql("SET memory_limit='8GB'")
    con.sql("SET threads=8")
    con.sql(f"SET temp_directory='{tempfile.mkdtemp(prefix='duckspill_')}'")
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir}/{t}.parquet'")
    return con


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (SparkSession.builder.master("local[8]")
             .appName("oracle-check")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duck_connect(sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd filter must not produce a green "0 failures" run that
        # validated nothing
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        spark.stop()
        sys.exit(2)
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            # rows-only entries still must survive driver canonicalization
            try:
                norm_frame(spdf)
            except Exception as e:
                print(f"FAIL {name}: uncanonicalizable output "
                      f"{type(e).__name__}: {e}")
                failures += 1
                continue
            print(f"ROWS-ONLY {name}: {len(spdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.sql(oracles[name]).df()
        except duckdb.OutOfMemoryException:
            # pressure flake, not a wrong answer: retry once on a fresh
            # capped connection; a genuine memory bug fails both times
            try:
                con = duck_connect(sf_dir)
                dpdf = con.sql(oracles[name]).df()
                print(f"NOTE {name}: duckdb OOM'd once under host "
                      f"pressure; passed on fresh-connection retry")
            except Exception as e:
                print(f"FAIL {name}: duckdb error (after one retry) "
                      f"{type(e).__name__}: {e}")
                failures += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        try:
            sc, sr = norm_frame(spdf)
            dc, dr = norm_frame(dpdf)
        except Exception as e:
            print(f"FAIL {name}: uncanonicalizable output "
                  f"{type(e).__name__}: {e}")
            failures += 1
            continue
        status = []
        if sc != dc:
            status.append(f"cols {sc} != {dc}")
        if len(sr) != len(dr):
            status.append(f"rows {len(sr)} != {len(dr)}")
        elif sr != dr and not status:
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b:
                    status.append(f"first value diff at sorted row {i}: "
                                  f"{a} != {b}")
                    break
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures += 1
        else:
            print(f"OK   {name}: {len(sr)} rows match "
                  f"({time.time()-t0:.1f}s)")
    print(f"\n{failures} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
