"""Interleaved A/B micro-bench for candidate expression rewrites (r8).

Each experiment times variant pairs over sf0.1 documents/embeddings with
the bench forcing expression, alternating A,B,A,B,... so a host spike hits
both sides.  Reports per-variant min and the pairwise ratio.  Rough tool:
look for >=1.3x effects only.

Usage: python tools/expr_ab.py <experiment> [reps=3]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

WS = " \\\\t\\\\n\\\\r\\\\f\\\\x0b"

TOK_FILTER = (f"filter(split(lower(trim(text)), '[{WS}]+'), x -> x <> '')")
TOK_REMOVE = (f"array_remove(split(lower(trim(text)), '[{WS}]+'), '')")


def build():
    from readability_spark.pipeline import build_session
    spark = build_session(
        "expr-ab", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def force(df):
    from pyspark.sql import functions as F
    return (df.select(F.xxhash64(F.struct("*")).alias("h"))
            .agg(F.expr("bit_xor(h)")).first()[0])


def ab(spark, variants, reps):
    from statistics import median
    times = {k: [] for k in variants}
    hashes = {}
    # warm both once; the order-independent bit_xor row hash doubles as an
    # exact result-equality check between variants
    for k, fn in variants.items():
        hashes[k] = force(fn())
    for _ in range(reps):
        for k, fn in variants.items():
            t0 = time.time()
            force(fn())
            times[k].append(time.time() - t0)
    for k, ts in times.items():
        print(f"{k:12s} min={min(ts):7.3f} med={median(ts):7.3f} "
              f"hash={hashes[k]} all={[round(t, 2) for t in ts]}")
    vals = set(hashes.values())
    print("RESULTS " + ("IDENTICAL" if len(vals) == 1 else
                        f"DIFFER: {hashes}"))
    return times


def exp_tokens(spark, reps):
    """filter-HOF vs array_remove tokenization (sum of all token lengths)."""
    from pyspark.sql import functions as F

    def mk(tok):
        def f():
            return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
                    .select("doc_id", F.explode(F.expr(tok)).alias("t"))
                    .groupBy("doc_id").agg(F.sum(F.length("t")).alias("s")))
        return f
    return ab(spark, {"filter": mk(TOK_FILTER),
                      "remove": mk(TOK_REMOVE)}, reps)


def exp_md5int(spark, reps):
    """instr-chain vs conv() md5-prefix integer over exploded shingles."""
    from pyspark.sql import functions as F
    from readability_spark.ops.common import md5_prefix_int_expr
    chain = md5_prefix_int_expr("t")
    conv = "cast(conv(substr(md5(t), 1, 8), 16, 10) as bigint)"

    def mk(x):
        def f():
            return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
                    .select("doc_id",
                            F.explode(F.expr(TOK_REMOVE)).alias("t"))
                    .select("doc_id", F.expr(x).alias("x"))
                    .groupBy("doc_id").agg(F.min("x").alias("m")))
        return f
    return ab(spark, {"instr": mk(chain), "conv": mk(conv)}, reps)


def exp_grams(spark, reps):
    """transform+array_join+slice vs arrays_zip+explode+concat_ws 3-grams."""
    from pyspark.sql import functions as F
    toks = TOK_REMOVE

    def old():
        return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
                .select("doc_id", F.expr(toks).alias("toks"))
                .withColumn("n_tokens", F.size("toks"))
                .withColumn("grams", F.expr(
                    "transform(if(n_tokens >= 3, "
                    "sequence(1, n_tokens - 3 + 1), array()), "
                    "i -> array_join(slice(toks, i, 3), ' '))"))
                .select("doc_id", F.explode("grams").alias("gram"))
                .groupBy("doc_id").agg(F.count("*").alias("n"),
                                       F.sum(F.length("gram")).alias("s")))

    def zipped():
        return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
                .select("doc_id", F.expr(toks).alias("toks"))
                .select("doc_id", F.explode(F.expr(
                    "arrays_zip(toks, slice(toks, 2, size(toks)), "
                    "slice(toks, 3, size(toks)))")).alias("z"))
                .filter(F.expr("z.`2` is not null"))
                .select("doc_id", F.expr(
                    "concat_ws(' ', z.toks, z.`1`, z.`2`)").alias("gram"))
                .groupBy("doc_id").agg(F.count("*").alias("n"),
                                       F.sum(F.length("gram")).alias("s")))
    return ab(spark, {"transform": old, "zip": zipped}, reps)


def exp_cosine(spark, reps):
    """HOF aggregate/zip_with cosine vs explicit 64-term chain, over the
    all-pairs (2000 x 5 queries) join."""
    from pyspark.sql import functions as F
    from readability_spark.ops.similarity import (EMB_DIM, _DOT, _NORM,
                                                  _dot_chain_sql)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("a"))
    c = emb.select(F.col("vec_id").alias("nid"),
                   F.col("embedding").alias("b"))

    def hof():
        j = c.crossJoin(F.broadcast(q))
        return j.withColumn(
            "cos", F.expr(_DOT) / (F.expr(_NORM.format(c="a")) *
                                   F.expr(_NORM.format(c="b")))) \
            .select("qid", "nid", "cos")

    dot = _dot_chain_sql("a", "b", EMB_DIM).replace("[", "[").replace(
        "]", "]")

    def chain_idx(x, y):
        return " + ".join(
            f"(CAST({x}[{i}] AS DOUBLE) * CAST({y}[{i}] AS DOUBLE))"
            for i in range(EMB_DIM))

    def chain():
        j = c.crossJoin(F.broadcast(q))
        cos = (f"(({chain_idx('a', 'b')}) / "
               f"(sqrt({chain_idx('a', 'a')}) * "
               f"sqrt({chain_idx('b', 'b')})))")
        return j.withColumn("cos", F.expr(cos)).select("qid", "nid", "cos")

    def hofnorm():
        # norms computed ONCE per vector (same sqrt-of-fold value), only
        # the dot stays per-pair
        qn = q.withColumn("na", F.expr(_NORM.format(c="a")))
        cn = c.withColumn("nb", F.expr(_NORM.format(c="b")))
        j = cn.crossJoin(F.broadcast(qn))
        return (j.withColumn("cos", F.expr(_DOT) / (F.col("na") * F.col("nb")))
                .select("qid", "nid", "cos"))

    def chainnorm():
        # explicit chain for the per-pair dot, precomputed norms
        qn = q.withColumn("na", F.expr(
            f"sqrt({chain_idx('a', 'a')})"))
        cn = c.withColumn("nb", F.expr(
            f"sqrt({chain_idx('b', 'b')})"))
        j = cn.crossJoin(F.broadcast(qn))
        cos = f"(({chain_idx('a', 'b')}) / (na * nb))"
        return (j.withColumn("cos", F.expr(cos))
                .select("qid", "nid", "cos"))
    def twolayer():
        # bandor trick: pre-cast every coordinate into its own double
        # column (layer 1), then the 64-term multiply-add chain over those
        # locals (layer 2) — small per-expression codegen units
        qn = q.select(
            "qid",
            F.expr(f"sqrt({chain_idx('a', 'a')})").alias("na"),
            *[F.expr(f"CAST(a[{i}] AS DOUBLE)").alias(f"qa{i}")
              for i in range(EMB_DIM)])
        cn = c.select(
            "nid",
            F.expr(f"sqrt({chain_idx('b', 'b')})").alias("nb"),
            *[F.expr(f"CAST(b[{i}] AS DOUBLE)").alias(f"cb{i}")
              for i in range(EMB_DIM)])
        j = cn.crossJoin(F.broadcast(qn))
        dot = " + ".join(f"(qa{i} * cb{i})" for i in range(EMB_DIM))
        return (j.withColumn("cos", F.expr(f"({dot}) / (na * nb)"))
                .select("qid", "nid", "cos"))
    return ab(spark, {"hofnorm": hofnorm, "twolayer": twolayer}, reps)


def exp_simhash(spark, reps):
    """instr/substr per-bit simhash sums vs conv()-based bit arithmetic."""
    from pyspark.sql import functions as F

    def old():
        toks = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
                .select("doc_id", F.explode(F.expr(TOK_REMOVE)).alias("tok"))
                .withColumn("h", F.md5("tok")))
        aggs = [F.expr(
            f"sum(case when instr('89abcdef', substr(h, {j + 1}, 1)) > 0 "
            f"then 1 else -1 end)").alias(f"s{j}") for j in range(32)]
        sums = toks.groupBy("doc_id").agg(*aggs)
        sig = " + ".join(
            f"(case when s{j} > 0 then cast({1 << j} as bigint) else 0 end)"
            for j in range(32))
        return sums.select("doc_id", F.expr(sig).alias("simhash"))

    def conv():
        toks = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
                .select("doc_id", F.explode(F.expr(TOK_REMOVE)).alias("tok"))
                .withColumn("v1", F.expr(
                    "cast(conv(substr(md5(tok), 1, 8), 16, 10) as bigint)"))
                .withColumn("v2", F.expr(
                    "cast(conv(substr(md5(tok), 9, 8), 16, 10) as bigint)"))
                .withColumn("v3", F.expr(
                    "cast(conv(substr(md5(tok), 17, 8), 16, 10) as bigint)"))
                .withColumn("v4", F.expr(
                    "cast(conv(substr(md5(tok), 25, 8), 16, 10) as bigint)")))
        # digit j (1-based j+1) high bit == bit (31 - 4*(j%8)) of v(j//8+1)
        aggs = [F.expr(
            f"sum(shiftright(v{j // 8 + 1}, {31 - 4 * (j % 8)}) & 1)")
            .alias(f"b{j}") for j in range(32)]
        aggs.append(F.count("*").alias("n"))
        sums = toks.groupBy("doc_id").agg(*aggs)
        sig = " + ".join(
            f"(case when 2 * b{j} > n then cast({1 << j} as bigint) "
            f"else 0 end)" for j in range(32))
        return sums.select("doc_id", F.expr(sig).alias("simhash"))
    return ab(spark, {"instr": old, "conv": conv}, reps)


def main():
    exp = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build()
    fn = {"tokens": exp_tokens, "md5int": exp_md5int, "grams": exp_grams,
          "cosine": exp_cosine, "simhash": exp_simhash}[exp]
    fn(spark, reps)


if __name__ == "__main__":
    main()
