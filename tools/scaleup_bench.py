"""One-off ~10× scale-up probe (r7): the missing EMPIRICAL leg for the
"no hidden quadratic" claim.

The 100× scale arguments rest on plan shapes (hash-only shuffles, bounded
buckets, broadcast dims); all recorded timings are sf0.1 / 29,797 turns.
This harness runs the flagship extraction and the dedup/LSH/IVF family on
the standard corpus AND a deterministic ~10× corpus in the SAME window,
interleaved per query (1×, 10× back-to-back, mp-control brackets), and
reports wall(10×)/wall(1×) per query.  Linear-ish growth (ratio ≲ 10 —
fixed overheads amortize, so well under 10 is expected for small queries;
far OVER 10 would expose a super-linear term) is the evidence.

10× inputs (cached under BENCH/data, deterministic, public-shape only):
- transcripts_bench10x: ten seed-variants of the bench transcript table
  (seeds 42..51, conv_ids remapped per seed) — 269,481 turns (~9.0×; seed
  variants draw their own Zipf conversation lengths).
- sf1x/documents.parquet: 50,000 docs over the SAME 31-word vocabulary,
  length/lang/source distributions matched to /root/testdata/sf0.1, with
  a planted near-dup every 20th doc (constant dup RATE, bounded clique
  size — the honest scaling shape: dedup work grows linearly when dup
  structure is proportional, which is what real corpora look like).
- sf1x/embeddings.parquet: 20,000 unit vectors, 64-dim, 10 Gaussian
  clusters (matching sf0.1's label structure).

Usage: python tools/scaleup_bench.py          # IDLE BOX ONLY (~10-20 min)
Appends one JSON line per run to BENCH/scaleup_history.jsonl and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"
BIG_SF = os.path.join(REPO, "BENCH", "data", "sf1x")
BASE_TRANSCRIPTS = os.path.join(REPO, "BENCH", "data", "transcripts_bench")
BIG_TRANSCRIPTS = os.path.join(REPO, "BENCH", "data", "transcripts_bench10x")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = 50_000
N_VECS = 20_000
SEEDS = list(range(42, 52))

# the dedup/LSH/IVF family the r6 verdict asked to probe, plus the
# gram-heavy quality pair (the other plausible quadratic hideout).
# semdedup runs in its PRODUCTION form (semdedup_scaled, k = √n — the flat
# quantizer's balance point, Θ(n^1.5) total): the probe's first run measured
# the fixed-k gate form at 48.7× for ~9× data — the (n/k)² per-cell
# quadratic — recorded in scaleup_history.jsonl as the contrast row.  The
# scaled form is the one query NOT expected to be ≲ linear; its bound is
# 9.04^1.5 ≈ 27×, and the measured ~15.6× (exponent ≈ 1.25) sits under it.
FAMILY = [
    "dedup_minhash", "dedup_lsh_pairs", "dedup_near", "dedup_clusters",
    "dedup_embedding", "ann_ivf_topk", "semdedup_scaled",
    "line_dedup", "repeated_substr",
    # r8 (VERDICT r7 #5): the curation/LM arc — the most expensive bench
    # queries had plan locks but no measured 10x leg; the broadcast/Bloom/
    # count-table designs predict ~linear, prove it.  Also covers the r8
    # optimization wave (zip-explode grams, conv md5-ints, no inferred
    # generate filters) at ~10x the gate corpus.
    "decontaminate", "decontaminate_bloom", "lm_score", "dsir_select",
    "bpe_merges", "bpe_encode", "curation_funnel", "search_topk",
    "dedup_simhash",
]


def _params_fresh(path: str, params: str) -> bool:
    marker = os.path.join(path, "_PARAMS")
    return (os.path.exists(marker) and open(marker).read() == params)


def _mark(path: str, params: str) -> None:
    with open(os.path.join(path, "_PARAMS"), "w") as f:
        f.write(params)


def build_docs() -> None:
    """Synthesize the 10× documents + embeddings tables (numpy-seeded,
    byte-deterministic)."""
    params = f"n_docs={N_DOCS} n_vecs={N_VECS} seed=7 v1"
    if _params_fresh(BIG_SF, params):
        return
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(BIG_SF, exist_ok=True)
    # the SAME vocabulary as the reference corpus — pulled from the data,
    # not hard-coded, so a driver-side regeneration can't drift us
    vocab = [r[0] for r in duckdb.sql(
        f"SELECT DISTINCT t FROM ("
        f"  SELECT unnest(string_split(lower(text), ' ')) AS t"
        f"  FROM '{BASE_SF}/documents.parquet')"
        f" WHERE t <> '' ORDER BY t"
    ).fetchall()]
    rng = np.random.default_rng(7)
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
    texts, lang_col, src_col = [], [], []
    for i in range(N_DOCS):
        if i % 20 == 19 and texts:
            # planted near-dup of the previous doc: one token replaced —
            # constant rate, clique size 2 (proportional dup structure)
            toks = texts[-1].split(" ")
            toks[int(rng.integers(0, len(toks)))] = str(
                vocab[int(rng.integers(0, len(vocab)))])
            texts.append(" ".join(toks))
        else:
            n = int(rng.integers(8, 101))
            texts.append(" ".join(
                vocab[j] for j in rng.integers(0, len(vocab), n)))
        lang_col.append(str(rng.choice(langs, p=lang_p)))
        src_col.append(f"src{int(rng.integers(0, 20))}")
    tbl = pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang_col, pa.string()),
        "source": pa.array(src_col, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(BIG_SF, "documents.parquet"),
                   row_group_size=5000)

    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, N_VECS)
    vecs = centers[labels] + 0.35 * rng.standard_normal((N_VECS, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    etbl = pa.table({
        "vec_id": pa.array(range(N_VECS), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype(np.float32)],
            pa.list_(pa.float32())),
        "label": pa.array(labels.astype("int32"), pa.int32()),
    })
    pq.write_table(etbl, os.path.join(BIG_SF, "embeddings.parquet"),
                   row_group_size=5000)
    _mark(BIG_SF, params)


def build_transcripts10x(spark) -> int:
    """Ten seed-variants of the bench transcript table, conv_ids remapped
    per seed; returns the row count."""
    from pyspark.sql import functions as F

    from readability_spark.transcripts import generate_transcripts

    params = f"seeds={SEEDS} n_convs=1200 fixtures=True"
    if not _params_fresh(BIG_TRANSCRIPTS, params):
        for s in SEEDS:
            df = generate_transcripts(spark, n_convs=1200, seed=s)
            (df.withColumn(
                "conv_id", F.concat(F.lit(f"s{s}_"), F.col("conv_id")))
             .repartition(32).write
             .mode("overwrite" if s == SEEDS[0] else "append")
             .parquet(BIG_TRANSCRIPTS))
        _mark(BIG_TRANSCRIPTS, params)
    return spark.read.parquet(BIG_TRANSCRIPTS).count()


def run_extract(spark, path: str) -> float:
    from pyspark.sql import functions as F

    from readability_spark.pipeline import n_buckets_for, run_extraction

    df = spark.read.parquet(path)
    t0 = time.time()
    out = run_extraction(df, num_buckets=n_buckets_for(spark))
    out.agg(F.count("page_type"), F.sum("char_yield")).collect()
    return time.time() - t0


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from bench import build, ensure_bench_data, warm_workers
    from tools.scaling_bench import mp_control

    spark = build(CPUS)
    n_base = ensure_bench_data(spark)
    build_docs()
    n_big = build_transcripts10x(spark)
    warm_workers(spark)

    from readability_spark.ops.similarity import semdedup_scaled

    qs = dict(entrymod.queries())
    qs["semdedup_scaled"] = semdedup_scaled

    def force(df) -> None:
        (df.select(F.xxhash64(F.struct("*")).alias("h"))
         .agg(F.expr("bit_xor(h)")).first())

    ctl_open, _ = mp_control(CPUS)
    result: dict = {"metric": "10x-vs-1x wall ratio per query",
                    "unit": "ratio", "queries": {},
                    "extra": {"cpus": CPUS, "n_turns_1x": n_base,
                              "n_turns_10x": n_big,
                              "n_docs_10x": N_DOCS, "n_vecs_10x": N_VECS,
                              "control_open_docs_per_sec": round(ctl_open, 1)}}
    walls: dict = {}
    for name in FAMILY:
        t0 = time.time()
        force(qs[name](spark, BASE_SF))
        w1 = time.time() - t0
        spark.catalog.clearCache()
        t0 = time.time()
        force(qs[name](spark, BIG_SF))
        w10 = time.time() - t0
        spark.catalog.clearCache()
        walls[name] = {"sec_1x": round(w1, 3), "sec_10x": round(w10, 3)}
        result["queries"][name] = round(w10 / w1, 2)

    w1 = run_extract(spark, BASE_TRANSCRIPTS)
    w10 = run_extract(spark, BIG_TRANSCRIPTS)
    walls["extract_throughput"] = {"sec_1x": round(w1, 3),
                                   "sec_10x": round(w10, 3),
                                   "tps_1x": round(n_base / w1, 1),
                                   "tps_10x": round(n_big / w10, 1)}
    result["queries"]["extract_throughput"] = round(w10 / w1, 2)
    result["extra"]["walls"] = walls
    spark.stop()
    ctl_close, _ = mp_control(CPUS)
    result["extra"]["control_close_docs_per_sec"] = round(ctl_close, 1)
    result["value"] = result["queries"]["extract_throughput"]

    hist = os.path.join(REPO, "BENCH", "scaleup_history.jsonl")
    with open(hist, "a") as f:
        f.write(json.dumps({"t": int(time.time()), **result}) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
