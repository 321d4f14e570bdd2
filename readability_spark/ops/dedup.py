"""Deduplication operators over the ``documents`` table.

Four dedup families a large-scale training-data pipeline needs, each as a
Spark DataFrame job plus an exact DuckDB oracle:

- exact: md5 grouping (one shuffle on the 16-byte digest, not the payload);
- SimHash: 32-bit signature from per-token md5 bits — near-dup buckets are
  signature-equality groups;
- MinHash + LSH: k=8 md5-derived minhashes, banded 4×2 — band-key equality
  joins find candidate pairs without the quadratic self-join;
- n-gram Jaccard: 3-token shingles, distinct-shingle self-join — the exact
  verifier LSH candidates would be fed into at scale.

Scale notes: exact/simhash shuffle only (id, digest/signature) pairs.
Jaccard's self-join is quadratic by nature and exists as the *verifier*
stage — at 100 TB you run it only on the LSH candidate pairs, never the
full corpus (the oracle query caps doc_id for the same reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import SQL_TOKENS, md5_prefix_int_expr, table, tokens_col

# --- exact -------------------------------------------------------------------

def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by md5(text): representative + multiplicity."""
    return (
        table(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count("*").alias("n_dupes"))
        .orderBy("keep_doc_id")
    )


EXACT_DEDUP_SQL = """
SELECT md5(text) AS content_hash,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_dupes
FROM documents
GROUP BY 1
ORDER BY keep_doc_id
"""

# --- simhash -------------------------------------------------------------------

_N_BITS = 32


def _simhash_sums():
    """One signed sum per bit position; bit j of a token's hash is md5 hex
    digit j's high bit (digit in 8..f).  Identical expression both engines."""
    aggs = []
    for j in range(_N_BITS):
        aggs.append(F.expr(
            f"sum(case when instr('89abcdef', substr(h, {j + 1}, 1)) > 0 "
            f"then 1 else -1 end)").alias(f"s{j}"))
    return aggs


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
        .withColumn("h", F.md5("tok"))
    )
    sums = toks.groupBy("doc_id").agg(*_simhash_sums())
    sig = " + ".join(
        f"(case when s{j} > 0 then cast({1 << j} as bigint) else 0 end)"
        for j in range(_N_BITS))
    return (
        sums.select("doc_id", F.expr(sig).alias("simhash"))
        .orderBy("doc_id")
    )


def _simhash_sql() -> str:
    sums = ",\n       ".join(
        f"sum(case when instr('89abcdef', substr(h, {j + 1}, 1)) > 0 "
        f"then 1 else -1 end) AS s{j}"
        for j in range(_N_BITS))
    sig = " + ".join(
        f"(case when s{j} > 0 then cast({1 << j} as bigint) else 0 end)"
        for j in range(_N_BITS))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({SQL_TOKENS.format(col='text')}) AS tok
  FROM documents
), h AS (
  SELECT doc_id, md5(tok) AS h FROM toks
), s AS (
  SELECT doc_id,
       {sums}
  FROM h GROUP BY doc_id
)
SELECT doc_id, {sig} AS simhash
FROM s ORDER BY doc_id
"""


SIMHASH_SQL = _simhash_sql()

# --- minhash + LSH -------------------------------------------------------------

# fixed affine hash family (seeded once, embedded in both dialects)
_MH_PRIME = 2038074743
_MH_PARAMS = [
    (1103515245, 12345), (214013, 2531011), (134775813, 1),
    (22695477, 1), (69069, 362437), (1664525, 1013904223),
    (48271, 11), (16807, 7),
]
N_MINHASH = len(_MH_PARAMS)
LSH_BANDS = 4  # 2 minhashes per band


def _shingle_expr() -> str:
    """3-token shingles of the token array — GENUINELY empty when < 3
    tokens.  The guard lives in the expression itself: sequence(0, -1)
    would DESCEND ([0, -1]) and fabricate phantom shingles from NULL /
    negative indexing, so callers must not rely on pre-filters alone."""
    return ("case when size(toks) >= 3 then "
            "transform(sequence(0, size(toks) - 3), "
            "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) "
            "else array() end")


def _exploded_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle, x) — NOT deduplicated: min() is duplicate-
    insensitive, so skipping the distinct saves a full shuffle of the
    shingle table (partial mins combine map-side instead)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", tokens_col("text").alias("toks"))
        .filter(F.expr("size(toks) >= 3"))
        .select("doc_id", F.explode(F.expr(_shingle_expr())).alias("shingle"))
        .withColumn("x", F.expr(md5_prefix_int_expr("shingle")))
    )


def _minhash_aggs():
    return [
        F.min(F.expr(f"(({a} * x + {b}) % {_MH_PRIME} + {_MH_PRIME}) "
                     f"% {_MH_PRIME}")).alias(f"mh{i}")
        for i, (a, b) in enumerate(_MH_PARAMS)
    ]


def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, mh0..mh7) — unordered; internal building block."""
    return (_exploded_shingles(spark, sf_dir)
            .groupBy("doc_id").agg(*_minhash_aggs()))


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _signatures(spark, sf_dir).orderBy("doc_id")


def _minhash_sql() -> str:
    mins = ",\n       ".join(
        f"min((({a} * x + {b}) % {_MH_PRIME} + {_MH_PRIME}) % {_MH_PRIME})"
        f" AS mh{i}"
        for i, (a, b) in enumerate(_MH_PARAMS))
    return f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKENS.format(col='text')} AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(1, len(toks) - 2)) AS i
    FROM t WHERE len(toks) >= 3
  )
), x AS (
  SELECT doc_id, {md5_prefix_int_expr('shingle')} AS x FROM sh
)
SELECT doc_id,
       {mins}
FROM x GROUP BY doc_id ORDER BY doc_id
"""


MINHASH_SQL = _minhash_sql()


# skew guard: a band-bucket of B docs yields B²/2 pairs — a degenerate
# bucket (boilerplate/empty-ish docs sharing a signature) would explode the
# candidate set.  Buckets above the cap are dropped, the standard move in
# production minhash dedup; the oracle applies the identical cap.
LSH_BUCKET_CAP = 1000


def _band_pairs(sig: DataFrame) -> DataFrame:
    """sig(doc_id, mh0..mh7) → distinct candidate (doc_a < doc_b) pairs.

    ONE lineage: explode the 4-element band array (not a 4-way unionAll),
    groupBy the tiny (band, mh_a, mh_b) key, and generate the i<j pairs
    inside each bucket with array lambdas — no self-join, so the upstream
    minhash aggregation is computed exactly once (a band-table self-join
    recomputes it per side, since ReuseExchange can't match a broadcast
    build against a shuffle read)."""
    band_arr = F.array(*[
        F.struct(F.lit(band).alias("band"),
                 F.col(f"mh{2 * band}").alias("k1"),
                 F.col(f"mh{2 * band + 1}").alias("k2"))
        for band in range(LSH_BANDS)])
    bands = (sig.select("doc_id", F.explode(band_arr).alias("bk"))
             .select("doc_id", "bk.band", "bk.k1", "bk.k2"))
    buckets = (
        bands.groupBy("band", "k1", "k2")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= LSH_BUCKET_CAP))
    )
    pair_expr = (
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), "
        "y -> struct(x AS doc_a, y AS doc_b))))")
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-bucket grouping: docs sharing any full band are candidate
    near-dups.  See _band_pairs for the single-lineage plan shape."""
    return (_band_pairs(_signatures(spark, sf_dir))
            .orderBy("doc_a", "doc_b"))


def _lsh_sql() -> str:
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {band} AS band, mh{2 * band} AS k1, "
        f"mh{2 * band + 1} AS k2 FROM sig"
        for band in range(LSH_BANDS))
    return f"""
WITH sig AS ({MINHASH_SQL.replace('ORDER BY doc_id', '')}),
bands AS ({band_rows}),
bsz AS (
  SELECT band, k1, k2 FROM bands GROUP BY 1, 2, 3
  HAVING count(*) BETWEEN 2 AND {LSH_BUCKET_CAP}
)
SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
FROM bands l
JOIN bands r ON l.band = r.band AND l.k1 = r.k1 AND l.k2 = r.k2
JOIN bsz u ON u.band = l.band AND u.k1 = l.k1 AND u.k2 = l.k2
WHERE l.doc_id < r.doc_id
ORDER BY doc_a, doc_b
"""


LSH_PAIRS_SQL = _lsh_sql()

# --- n-gram jaccard -------------------------------------------------------------

JACCARD_MAX_DOC = 300       # verifier-stage cap (see module docstring)
JACCARD_THRESHOLD = 0.2


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < JACCARD_MAX_DOC)
    sh = (
        docs.select("doc_id", tokens_col("text").alias("toks"))
        .filter(F.expr("size(toks) >= 3"))
        .select("doc_id", F.explode(F.expr(_shingle_expr())).alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        sh.alias("a").join(sh.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jaccard", F.round(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "inter", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


NGRAM_JACCARD_SQL = f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKENS.format(col='text')} AS toks
  FROM documents WHERE doc_id < {JACCARD_MAX_DOC}
), sh AS (
  SELECT DISTINCT doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(1, len(toks) - 2)) AS i
    FROM t WHERE len(toks) >= 3
  )
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter,
       round(inter / (sa.n + sb.n - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(inter / (sa.n + sb.n - inter), 6) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""

# --- composed near-dedup: LSH candidates → exact Jaccard verify -----------------

NEAR_DUP_THRESHOLD = 0.5
_NEAR_DEDUP_CACHE: list = []   # most recent persisted signature table


def near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-duplicate detection over the FULL corpus: banded-LSH
    candidate pairs, then exact 3-gram Jaccard computed on those pairs only.

    This is the operator the module docstring promises for 100 TB: no
    doc_id cap — the quadratic work is confined to colliding LSH buckets.

    Plan shape: ONE shingle explode feeds ONE aggregation producing the
    per-doc signature AND its distinct-shingle set (collect_set), persisted
    so the three consumers (pair generation, a-side join, b-side join) read
    the cache instead of re-exploding the corpus — this is the table a real
    pipeline would checkpoint.  Pair intersections are computed in-memory
    per pair via array_intersect on doc_id-keyed joins; shingles themselves
    never shuffle again.
    """
    from pyspark import StorageLevel

    # DataFrame persistence is lazily consumed by the returned plan, so it
    # can't be unpersisted here; bound the leak to ONE resident table by
    # evicting the previous call's cache (at real scale this table is a
    # checkpointed artifact, not a session cache)
    while _NEAR_DEDUP_CACHE:
        _NEAR_DEDUP_CACHE.pop().unpersist()
    tbl = (
        _exploded_shingles(spark, sf_dir)
        .groupBy("doc_id")
        .agg(*_minhash_aggs(), F.collect_set("shingle").alias("ss"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _NEAR_DEDUP_CACHE.append(tbl)
    pairs = _band_pairs(tbl)
    a = tbl.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("sa"))
    b = tbl.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("long")
    jac = F.round(
        inter / (F.size("sa") + F.size("sb") - inter).cast("double"), 6)
    return (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .select("doc_a", "doc_b", inter.alias("inter"),
                jac.alias("jaccard"), (jac >= NEAR_DUP_THRESHOLD)
                .alias("is_dup"))
        # band-colliding pairs with zero shared shingles are possible in
        # principle; the oracle's inner shingle-join drops them — mirror it
        .filter(F.col("inter") >= 1)
        .orderBy("doc_a", "doc_b")
    )


def _near_dedup_sql() -> str:
    mins = ",\n       ".join(
        f"min((({a} * x + {b}) % {_MH_PRIME} + {_MH_PRIME}) % {_MH_PRIME})"
        f" AS mh{i}"
        for i, (a, b) in enumerate(_MH_PARAMS))
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {band} AS band, mh{2 * band} AS k1, "
        f"mh{2 * band + 1} AS k2 FROM sig"
        for band in range(LSH_BANDS))
    return f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKENS.format(col='text')} AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(1, len(toks) - 2)) AS i
    FROM t WHERE len(toks) >= 3
  )
), x AS (
  SELECT doc_id, {md5_prefix_int_expr('shingle')} AS x FROM sh
), sig AS (
  SELECT doc_id,
       {mins}
  FROM x GROUP BY doc_id
), bands AS ({band_rows}),
bsz AS (
  SELECT band, k1, k2 FROM bands GROUP BY 1, 2, 3
  HAVING count(*) BETWEEN 2 AND {LSH_BUCKET_CAP}
),
pairs AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l
  JOIN bands r ON l.band = r.band AND l.k1 = r.k1 AND l.k2 = r.k2
  JOIN bsz u ON u.band = l.band AND u.k1 = l.k1 AND u.k2 = l.k2
  WHERE l.doc_id < r.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS inter
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter,
       round(i.inter / (sa.n + sb.n - i.inter), 6) AS jaccard,
       round(i.inter / (sa.n + sb.n - i.inter), 6) >= {NEAR_DUP_THRESHOLD}
         AS is_dup
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
ORDER BY doc_a, doc_b
"""


NEAR_DEDUP_SQL = _near_dedup_sql()
