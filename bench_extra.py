"""Round-8 optimization harness (NOT the driver bench — bench.py is frozen).

Two modes:

  python bench_extra.py plans <outdir> [names...]
      Capture .explain("formatted") for every bench query (or the given
      subset) into <outdir>/<name>.txt.  No timing; safe on a busy host.

  python bench_extra.py time <reps> [names...]
      Per-query isolated timing with the EXACT forcing expression bench.py
      uses (bit_xor(xxhash64(struct(*)))), reps times each, one JSON line
      per query: {"name": ..., "secs": [...], "min": ...}.  Run on a quiet
      host; compare mins across runs (guide §1: measure first, re-measure
      after each change).

Timing matches bench.py's methodology (same session configs, same forcing,
clearCache between queries) so numbers are comparable to BENCH_rN per-query
seconds, but these runs never touch BENCH/bench_history.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build():
    from readability_spark.pipeline import build_session
    spark = build_session(
        "readability-bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    mode = sys.argv[1]
    import __spark_entry__ as entrymod
    from bench import OPS_QUERIES
    qs = entrymod.queries()
    from pyspark.sql import functions as F

    spark = build()

    if mode == "plans":
        outdir = sys.argv[2]
        names = sys.argv[3:] or OPS_QUERIES
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
            print(name, "ok", flush=True)
        return

    if mode == "time":
        reps = int(sys.argv[2])
        names = sys.argv[3:] or OPS_QUERIES
        out_path = os.environ.get("QBENCH_OUT")
        out_f = open(out_path, "a") if out_path else None

        def force(df) -> None:
            (df.select(F.xxhash64(F.struct("*")).alias("h"))
             .agg(F.expr("bit_xor(h)")).first())

        # one warm pass over a cheap query to spin up the JVM stages
        force(qs["dedup_exact"](spark, SF_DIR))
        spark.catalog.clearCache()
        for name in names:
            spark.sparkContext.setJobDescription(f"qbench:{name}")
            secs = []
            for _ in range(reps):
                t0 = time.time()
                force(qs[name](spark, SF_DIR))
                secs.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
            line = json.dumps({"name": name, "secs": secs,
                               "min": min(secs)})
            print(line, flush=True)
            if out_f:
                out_f.write(line + "\n")
                out_f.flush()
        return

    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
