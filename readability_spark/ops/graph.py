"""Iterative link-graph analytics: fixed-point PageRank.

Beyond-reference tier (SURVEY.md §2.13): the reference (mizchi/readability)
extracts per-page links (src/nav/readableAria.ts link harvesting); the
corpus-level consumer of those links is a link graph, and the canonical
computation over it is PageRank — the one iterative-dataflow shape the
operator inventory lacked (connected components exist in dedup_clusters;
this adds damped random-walk mass propagation).

The documents corpus is token soup with no hyperlinks, so the edge set is
synthesized deterministically from doc_id arithmetic (same device as
curation.py's PII augmentation): node d emits ``1 + d % 3`` out-links,
``dst_k = (d*31 + (k+1)*17) % N`` for ``k = 0..d%3``, self-loops removed,
then DISTINCT for engine-independence of the edge multiset.  Both engines
build the identical graph from the identical table, so the oracle is exact
while the join/aggregate machinery does real work.

Cross-engine exactness is the design constraint — floating-point PageRank
sums are order-dependent, so ranks are held in FIXED-POINT integer
arithmetic (scale 10^12):

    init      = SCALE div N
    contrib_e = rank(src) div outdeg(src)          (per edge; integer div)
    rank'(v)  = (15*init) div 100
                + (85 * sum(contrib_e into v)) div 100

Integer sums are associative/commutative regardless of partitioning or
DuckDB's aggregation order, so the two engines agree bit-for-bit after any
number of iterations.  All values are non-negative, so Spark's ``div``
(floor for non-negatives) and DuckDB's ``//`` agree.  Dangling nodes (a
node whose only edge was a removed self-loop) simply leak their mass —
identical semantics both sides, documented rather than redistributed.

Scale notes (100 TB / 10^10 nodes):
- The per-iteration shape is the canonical distributed PageRank: join
  ranks⋈edges on src (one shuffle), groupBy dst (partial aggregation
  map-side first — contributions combine before the exchange), left join
  back to the node list.  Nothing is ever collected; the driver holds only
  the scalar N.
- The weighted edge list (edges ⋈ outdeg) is materialized ONCE via
  localCheckpoint and reused by every iteration — on a cluster this is a
  durable checkpoint, and you would bucket it by src so the per-iteration
  ranks⋈edges join co-locates without re-shuffling the (static, large)
  edge side.
- Ranks are localCheckpointed each iteration to truncate lineage — the
  classic iterative-dataflow requirement (without it the plan doubles per
  iteration and the optimizer re-derives the whole history).
- Fixed-point BIGINT ranks also halve the shuffle width vs DOUBLE + avoid
  any need for Kahan-style compensation at 10^10-edge aggregation fan-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import table

PR_SCALE = 10**12      # fixed-point scale: rank mass starts at SCALE total
PR_ITERS = 5           # gate iteration count (fixed => closed-form oracle)
_PR_EDGE = "({src} * 31 + ({k} + 1) * 17) % {n}"


def link_pagerank(spark: SparkSession, sf_dir: str,
                  iters: int = PR_ITERS) -> DataFrame:
    """Fixed-point damped PageRank over the synthesized doc link graph.

    Returns (doc_id, pagerank) for every document, pagerank a BIGINT at
    scale 10^12, ordered by (pagerank DESC, doc_id) for gate determinism.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id")
    # Driver-side scalar only (like the LSH sign computation at plan
    # build): N parameterizes literals; no row data leaves the executors.
    n = docs.count()
    if n == 0:
        return spark.createDataFrame([], "doc_id bigint, pagerank bigint")
    init = PR_SCALE // n
    base = (15 * init) // 100

    edges = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(F.expr("sequence(CAST(0 AS BIGINT), doc_id % 3)"))
            .alias("k"))
        .select("src", F.expr(
            _PR_EDGE.format(src="src", k="k", n=n)).alias("dst"))
        .filter("dst <> src")
        .distinct())
    w = (edges
         .join(edges.groupBy("src").agg(
             F.count("*").cast("long").alias("outdeg")), "src")
         # static across iterations: materialized once (on first use),
         # reused 5x.  r8: lazy — the consumer action persists it inside
         # its own job; a separate barrier job bought nothing
         .localCheckpoint(eager=False))

    ranks = docs.select(
        F.col("doc_id").alias("node"),
        F.lit(init).cast("long").alias("pr"))
    for _ in range(iters):
        sums = (ranks.join(w, ranks["node"] == w["src"])
                .select(w["dst"], F.expr("pr div outdeg").alias("c"))
                .groupBy("dst").agg(F.sum("c").alias("s")))
        ranks = (docs.join(sums, docs["doc_id"] == sums["dst"], "left")
                 .select(
                     F.col("doc_id").alias("node"),
                     F.expr(f"CAST({base} + (85 * coalesce(s, "
                            f"CAST(0 AS BIGINT))) div 100 AS BIGINT)")
                     .alias("pr"))
                 # truncate lineage: iteration i+1 builds on a
                 # checkpoint-marked iteration i, not a recursive plan.
                 # r8: lazy — all five iterations materialize inside the
                 # final consumer action's job chain (each level persists
                 # and truncates as it computes), dropping five per-
                 # iteration barrier jobs; A/B 1.36 -> 1.29 s, identical
                 .localCheckpoint(eager=False))
    return (ranks
            .select(F.col("node").alias("doc_id"),
                    F.col("pr").alias("pagerank"))
            .orderBy(F.desc("pagerank"), "doc_id"))


def _pagerank_sql(iters: int = PR_ITERS) -> str:
    """DuckDB oracle: the identical graph + identical fixed-point updates,
    unrolled to ``iters`` CTEs (one per iteration — same closed form, no
    reliance on recursive-CTE aggregation support)."""
    n = "(SELECT count(*) FROM documents)"
    init = f"({PR_SCALE} // {n})"
    base = f"((15 * {init}) // 100)"
    dst = _PR_EDGE.format(src="src", k="k", n=n)
    parts = [f"""nodes AS (SELECT doc_id AS node FROM documents),
e0 AS (
  SELECT doc_id AS src,
         unnest(generate_series(0, doc_id % 3)) AS k
  FROM documents
),
edges AS (
  SELECT DISTINCT src, {dst} AS dst
  FROM e0 WHERE {dst} <> src
),
w AS (
  SELECT e.src, e.dst, o.outdeg
  FROM edges e
  JOIN (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
        FROM edges GROUP BY src) o USING (src)
),
r0 AS (SELECT node, CAST({init} AS BIGINT) AS pr FROM nodes)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
r{i} AS (
  SELECT nodes.node,
         CAST({base} + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS pr
  FROM nodes LEFT JOIN (
    SELECT w.dst AS node, sum(r{i - 1}.pr // w.outdeg) AS s
    FROM r{i - 1} JOIN w ON r{i - 1}.node = w.src
    GROUP BY w.dst
  ) s ON nodes.node = s.node
)""")
    return ("WITH " + "".join(parts) + f"""
SELECT node AS doc_id, pr AS pagerank
FROM r{iters}
ORDER BY pagerank DESC, doc_id
""")


LINK_PAGERANK_SQL = _pagerank_sql()
