"""One-off A/B: Arrow batch size for the extraction UDF (r5 VERDICT #2).

DEFAULT_ARROW_BATCH=64 was tuned before the r5 core speedup moved the
compute/transfer balance.  This interleaves batch sizes round-robin in ONE
JVM (spark.sql.execution.arrow.maxRecordsPerBatch is a runtime conf) over
the deterministic bench corpus, normalizing each variant by the batch=64
run of the SAME round, so host noise cancels pairwise.  The python-worker
socket buffer stays at the shipped 2 MB (spark.buffer.size is
JVM-static): the candidate change is batch size alone — a batch larger
than the buffer loses the feed/compute overlap by construction, which is
exactly what the measurement should price.

Usage: python tools/arrow_batch_ab.py [rounds]   (default 4)
Appends one JSON line per run to BENCH/arrow_ab_history.jsonl.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCHES = [64, 128, 256]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import bench
    spark = bench.build(32)
    n_turns = bench.ensure_bench_data(spark)
    bench.warm_workers(spark)

    results: dict[int, list[float]] = {b: [] for b in BATCHES}
    for r in range(rounds):
        # rotate the within-round order: a fixed order couples each variant
        # to a fixed position in the host's noise cycle (observed: the
        # first slot after a previous round's heavy run reads slower)
        order = BATCHES[r % len(BATCHES):] + BATCHES[:r % len(BATCHES)]
        for b in order:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", str(b))
            dt, n = bench.run_extract(spark)
            results[b].append(dt)
            print(f"round {r} batch {b}: {dt:.2f}s "
                  f"({n / dt:.0f} turns/s)", flush=True)
    from statistics import median

    # per-round ratios vs the same-round batch-64 run
    rel = {b: [results[64][r] / results[b][r] for r in range(rounds)]
           for b in BATCHES}
    out = {
        "t": int(time.time()), "n_turns": n_turns, "rounds": rounds,
        "walls_sec": {str(b): [round(x, 3) for x in results[b]]
                      for b in BATCHES},
        "speedup_vs_64_per_round": {
            str(b): [round(x, 3) for x in rel[b]] for b in BATCHES},
        "median_speedup_vs_64": {
            str(b): round(median(rel[b]), 3) for b in BATCHES},
    }
    hist = os.path.join(REPO, "BENCH", "arrow_ab_history.jsonl")
    with open(hist, "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
