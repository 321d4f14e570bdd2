"""Relational mirrors of the reference's operators + extraction queries with
exact SQL oracles.

The extraction engine itself is UDF-shaped, so to give the correctness gate
full SQL oracles we wrap ``documents.text`` in deterministically constructed
HTML *inside the query* and predict the extractor's output in closed form
(possible because the classify cascade and stringify are deterministic
functions of text length / link counts — see readability_core.classify).

The remaining queries are the Spark mappings SURVEY.md §2 assigns to the
reference's non-UDF ops: per-group top-k (top-5 candidates →
extract.ts:432-442), grouped score propagation with level dividers
(extract.ts:365-378), first-match coalesce reductions (metadata,
extract.ts:488-616), regex class weighting (extract.ts:294-318), anti-join
resume (north rule lineage), and sessionization (gap-based windows —
detect/document.ts's stack fold relational analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import table

# --- extraction with closed-form SQL oracle ----------------------------------

_ARTICLE_WRAP = (
    "concat('<html lang=\"en\"><head><title>Doc ', doc_id, "
    "'</title></head><body><article><p>', text, "
    "'</p></article></body></html>')"
)


def extract_articles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap each document as a single-<article> page and extract.

    Closed form: single <article> → semantic shortcut candidate
    (extract.ts:329-336); link density 0 → classify rule 5 fires at
    text ≥ 140 (extract.ts:701); the gate passes at the same bound; the
    extracted text of one <p> is the trimmed, whitespace-collapsed text.
    """
    from ..udfs import extract_udf

    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.expr(_ARTICLE_WRAP).alias("html"))
        .withColumn("x", extract_udf(F.col("html")))
        .select(
            "doc_id",
            F.col("x.page_type").alias("page_type"),
            F.col("x.title").alias("title"),
            F.col("x.extracted_text").alias("extracted_text"),
            F.col("x.char_yield").alias("char_yield"),
            F.col("x.n_links").alias("n_links"),
        )
        .orderBy("doc_id")
    )


EXTRACT_ARTICLES_SQL = r"""
WITH n AS (
  SELECT doc_id,
         regexp_replace(trim(text), '\s{2,}', ' ', 'g') AS norm
  FROM documents
)
SELECT doc_id,
       CASE WHEN length(norm) >= 140 THEN 'article' ELSE 'other' END
         AS page_type,
       'Doc ' || doc_id AS title,
       CASE WHEN length(norm) >= 140 THEN norm ELSE '' END AS extracted_text,
       CASE WHEN length(norm) >= 140 THEN length(norm) ELSE 0 END
         AS char_yield,
       0 AS n_links
FROM n ORDER BY doc_id
"""

_LINK_BLOCK = "<a href=\"/x\">some link text here</a>"
_N_LINKS = 40
_LINK_CHARS = len("some link text here") * _N_LINKS      # 760


def extract_linkfarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap each document in a <main> with 40 appended links and extract.

    Closed form: single <main> → semantic candidate; innertext length is
    L + 760 (link texts concatenate with no separator); link density
    760/(L+760); the cascade yields ARTICLE iff density ≤ 0.5 ⇔ L ≥ 760
    (classify rules 1/2/5 all gate on density; rule 4 can't fire since body
    text ≥ 760 > 1.5·500).
    """
    from ..udfs import extract_udf

    docs = table(spark, sf_dir, "documents")
    wrap = (
        "concat('<html><body><main><p>', text, '</p>', "
        f"repeat('{_LINK_BLOCK}', {_N_LINKS}), '</main></body></html>')"
    )
    return (
        docs.select("doc_id", F.expr(wrap).alias("html"))
        .withColumn("x", extract_udf(F.col("html")))
        .select("doc_id",
                F.col("x.page_type").alias("page_type"),
                F.col("x.n_links").alias("n_links"))
        .orderBy("doc_id")
    )


EXTRACT_LINKFARMS_SQL = rf"""
WITH n AS (
  SELECT doc_id,
         length(regexp_replace(trim(text), '\s{{2,}}', ' ', 'g')) AS L
  FROM documents
)
SELECT doc_id,
       CASE WHEN L >= {_LINK_CHARS} THEN 'article' ELSE 'other' END
         AS page_type,
       {_N_LINKS} AS n_links
FROM n ORDER BY doc_id
"""


def extract_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata reductions: og:site_name / html lang / title coalesce
    (extract.ts:488-589) — inputs reconstructed exactly by the oracle."""
    from ..udfs import extract_udf

    docs = table(spark, sf_dir, "documents")
    wrap = (
        "concat('<html lang=\"', lang, '\"><head><title>T', doc_id, "
        "'</title><meta property=\"og:site_name\" content=\"', source, "
        "'\"></head><body><p>', text, '</p></body></html>')"
    )
    return (
        docs.select("doc_id", F.expr(wrap).alias("html"))
        .withColumn("x", extract_udf(F.col("html")))
        .select("doc_id",
                F.col("x.title").alias("title"),
                F.col("x.lang").alias("lang"),
                F.col("x.site_name").alias("site_name"))
        .orderBy("doc_id")
    )


EXTRACT_METADATA_SQL = """
SELECT doc_id,
       'T' || doc_id AS title,
       lang,
       source AS site_name
FROM documents ORDER BY doc_id
"""

def extract_aria(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARIA snapshot of the single-<article> wrap (UDF with include_aria).

    Closed form: buildAriaTree(body) → article with one generic child named
    by the <p> text when 0 < len < 100 (getAccessibleName's p/div branch,
    aria.ts:120-125), else article alone; the snapshot renders to
    '- article\\n[  - generic "text"\\n]'.
    """
    from ..udfs import make_extract_udf

    udf = make_extract_udf(include_aria=True)
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.expr(_ARTICLE_WRAP).alias("html"))
        .withColumn("x", udf(F.col("html")))
        .select("doc_id",
                F.col("x.aria_node_count").alias("aria_node_count"),
                F.col("x.aria_tree").alias("aria_tree"))
        .orderBy("doc_id")
    )


EXTRACT_ARIA_SQL = r"""
WITH n AS (
  SELECT doc_id,
         regexp_replace(trim(text), '\s{2,}', ' ', 'g') AS norm
  FROM documents
)
SELECT doc_id,
       CASE WHEN length(norm) > 0 AND length(norm) < 100 THEN 2 ELSE 1 END
         AS aria_node_count,
       CASE WHEN length(norm) > 0 AND length(norm) < 100
            THEN '- article' || chr(10) || '  - generic "' || norm || '"' || chr(10)
            ELSE '- article' || chr(10) END AS aria_tree
FROM n ORDER BY doc_id
"""


def extract_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Improved classifier + snapshot possibility score on an
    <article><h2>…</h2><p>…</p></article> wrap.

    Closed form: candidate text length L' = len('Doc ')+len(id)+L (heading
    and paragraph text concatenate with no separator); both classifiers land
    on ARTICLE iff L' ≥ 140; the possibility score is the additive cascade
    0.2 (semantic) + {0.3|−0.1|0} (text) + 0.2 (zero link density) + 0.1
    (one heading) clamped to [0,1] (classify.ts:406-513).
    """
    from ..udfs import extract_udf

    docs = table(spark, sf_dir, "documents")
    wrap = (
        "concat('<html><head><title>T</title></head><body><article><h2>Doc ',"
        " doc_id, '</h2><p>', text, '</p></article></body></html>')"
    )
    return (
        docs.select("doc_id", F.expr(wrap).alias("html"))
        .withColumn("x", extract_udf(F.col("html")))
        .select("doc_id",
                F.col("x.page_type").alias("page_type"),
                F.col("x.page_type_v2").alias("page_type_v2"),
                F.round(F.col("x.article_possibility"), 6)
                .alias("possibility"))
        .orderBy("doc_id")
    )


EXTRACT_CLASSIFY_SQL = r"""
WITH n AS (
  SELECT doc_id,
         4 + length(CAST(doc_id AS VARCHAR))
           + length(regexp_replace(trim(text), '\s{2,}', ' ', 'g')) AS L
  FROM documents
)
SELECT doc_id,
       CASE WHEN L >= 140 THEN 'article' ELSE 'other' END AS page_type,
       CASE WHEN L >= 140 THEN 'article' ELSE 'other' END AS page_type_v2,
       CASE WHEN L < 140 THEN 0.0
            ELSE round(least(1.0, greatest(0.0,
                 CAST(0.2 AS DOUBLE)
                 + (CASE WHEN L >= 500 THEN CAST(0.3 AS DOUBLE)
                         WHEN L < 250 THEN CAST(-0.1 AS DOUBLE)
                         ELSE CAST(0.0 AS DOUBLE) END)
                 + CAST(0.2 AS DOUBLE) + CAST(0.1 AS DOUBLE))), 6)
       END AS possibility
FROM n ORDER BY doc_id
"""

# URL-prior classification (classify.ts:28-57) as a pure column expression
_URL_SYNTH = (
    "CASE CAST(doc_id % 4 AS INT) "
    "WHEN 0 THEN 'https://ex.com/articles/item' "
    "WHEN 1 THEN 'https://ex.com/about' "
    "WHEN 2 THEN concat('https://ex.com/p/post-', doc_id) "
    "ELSE concat('https://ex.com/', source) END"
)

_URL_RULE = """
CASE WHEN u LIKE '%/articles/%' THEN 'article'
     WHEN regexp_{match}(u, '/[^/]+/[^/]+/[^/]+$') THEN 'article'
     WHEN regexp_{match}(tail, '^[0-9]+$') THEN 'article'
     WHEN regexp_{match}(tail, '^[a-zA-Z0-9-_]+$')
          AND regexp_{match}(tail, '[0-9]')
          AND length(tail) >= 5 THEN 'article'
     ELSE 'other' END
"""


def url_page_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """getExpectedPageTypeByUrl over synthesized URLs — regex cascade,
    whole-stage codegen, no UDF."""
    docs = table(spark, sf_dir, "documents")
    rule = _URL_RULE.format(match="like")    # Spark: regexp_like
    return (
        docs.select(
            "doc_id", F.expr(_URL_SYNTH).alias("u"))
        .withColumn("tail", F.expr(
            "regexp_extract(regexp_extract(u, '[^/]*$', 0), '^[^.]*', 0)"))
        .select("doc_id", "u", F.expr(rule).alias("url_page_type"))
        .orderBy("doc_id")
    )


URL_PAGE_TYPE_SQL = f"""
WITH s AS (
  SELECT doc_id, {_URL_SYNTH} AS u FROM documents
), t AS (
  SELECT doc_id, u,
         regexp_extract(regexp_extract(u, '[^/]*$', 0), '^[^.]*', 0) AS tail
  FROM s
)
SELECT doc_id, u, {_URL_RULE.format(match="matches")} AS url_page_type
FROM t ORDER BY doc_id
"""


def detect_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-structure detection (structure_udf) on a synthesized page whose
    header nav has K = doc_id % 5 + 1 items.

    Closed form: the in-header nav classifies global iff K ≥ 3 (no utility
    keywords — navigation.ts:143-150), else local; one header, one nav,
    one h2 section; main/footer present, no sidebar.
    """
    from ..udfs import structure_udf

    docs = table(spark, sf_dir, "documents")
    wrap = (
        "concat('<html><body><header><nav><ul>', "
        "repeat('<li><a href=\"/x\">Item</a></li>', "
        "       cast(doc_id % 5 + 1 as int)), "
        "'</ul></nav></header>"
        "<main><h2>Sec</h2><p>', text, '</p></main>"
        "<footer>f</footer></body></html>')"
    )
    return (
        docs.select("doc_id", F.expr(wrap).alias("html"))
        .withColumn("x", structure_udf(F.col("html")))
        .select("doc_id",
                F.col("x.n_headers").alias("n_headers"),
                F.col("x.n_navs").alias("n_navs"),
                F.col("x.main_nav_type").alias("main_nav_type"),
                F.col("x.n_nav_items").alias("n_nav_items"),
                F.col("x.has_main_content").alias("has_main_content"),
                F.col("x.has_footer").alias("has_footer"),
                F.col("x.n_sections").alias("n_sections"))
        .orderBy("doc_id")
    )


DETECT_STRUCTURE_SQL = """
SELECT doc_id,
       1 AS n_headers,
       1 AS n_navs,
       CASE WHEN CAST(doc_id % 5 + 1 AS INT) >= 3
            THEN 'global' ELSE 'local' END AS main_nav_type,
       CAST(doc_id % 5 + 1 AS INT) AS n_nav_items,
       TRUE AS has_main_content,
       TRUE AS has_footer,
       1 AS n_sections
FROM documents ORDER BY doc_id
"""


def link_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-hierarchy categorization (parent/sibling/child/external) on a
    synthesized page at https://ex.com/{source}/{doc_id}/page.

    Closed form by construction: '/{source}' → parent, '#top' → parent,
    K = doc_id%3+1 absolute '/…/page/deep' links → child, one '/…/sib' →
    sibling, one other-origin link → external.
    """
    from ..udfs import hierarchy_udf

    docs = table(spark, sf_dir, "documents")
    url = "concat('https://ex.com/', source, '/', doc_id, '/page')"
    html = (
        "concat('<html><body>"
        "<a href=\"/', source, '\">up</a>', "
        "repeat(concat('<a href=\"/', source, '/', doc_id, "
        "'/page/deep\">c</a>'), cast(doc_id % 3 + 1 as int)), "
        "'<a href=\"#top\">t</a>"
        "<a href=\"https://other.org/x\">e</a>"
        "<a href=\"/', source, '/', doc_id, '/sib\">s</a>"
        "</body></html>')"
    )
    return (
        docs.select("doc_id", F.expr(html).alias("html"),
                    F.expr(url).alias("url"))
        .withColumn("x", hierarchy_udf(F.col("html"), F.col("url")))
        .select("doc_id",
                F.col("x.n_parent").alias("n_parent"),
                F.col("x.n_sibling").alias("n_sibling"),
                F.col("x.n_child").alias("n_child"),
                F.col("x.n_external").alias("n_external"))
        .orderBy("doc_id")
    )


LINK_HIERARCHY_SQL = """
SELECT doc_id,
       2 AS n_parent,
       1 AS n_sibling,
       CAST(doc_id % 3 + 1 AS INT) AS n_child,
       1 AS n_external
FROM documents ORDER BY doc_id
"""


def node_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-table (serializer adjacency encoding) stats per document.

    Closed form for the single-<article> wrap: html(0) → head(1) →
    title(2) → text(3) and body(1) → article(2) → p(3) → text(4) —
    8 nodes / depth 4 when the text is non-empty, 7 / 3 otherwise.
    """
    from ..udfs import explode_nodes

    docs = table(spark, sf_dir, "documents")
    turns = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.expr(_ARTICLE_WRAP).alias("text"))
    nodes = explode_nodes(turns)
    return (
        nodes.groupBy("conv_id")
        .agg(F.count("*").alias("n_nodes"),
             F.max("depth").alias("max_depth"),
             F.sum(F.when(F.col("kind") == "element", 1).otherwise(0))
             .alias("n_elements"))
        .withColumn("doc_id", F.col("conv_id").cast("bigint"))
        .select("doc_id", "n_nodes", "max_depth", "n_elements")
        .orderBy("doc_id")
    )


NODE_TABLE_SQL = """
SELECT doc_id,
       CASE WHEN length(trim(text)) > 0 THEN 8 ELSE 7 END AS n_nodes,
       CASE WHEN length(trim(text)) > 0 THEN 4 ELSE 3 END AS max_depth,
       6 AS n_elements
FROM documents ORDER BY doc_id
"""


# --- per-group top-k (window) --------------------------------------------------

def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 lineitems per order by extendedprice — the row_number window
    that implements the reference's top-5 candidate selection."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber"))
    return (
        li.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("l_orderkey", "rank", "l_linenumber",
                F.col("l_extendedprice").alias("price"))
        .orderBy("l_orderkey", "rank")
    )


TOPK_SQL = """
WITH r AS (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC,
                                     l_linenumber ASC) AS rank
  FROM lineitem
)
SELECT l_orderkey, rank, l_linenumber, l_extendedprice AS price
FROM r WHERE rank <= 3 ORDER BY l_orderkey, rank
"""

# --- grouped score propagation --------------------------------------------------

def score_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor score propagation as a relational job: each lineitem's
    revenue flows to its 3 "ancestors" (order ÷1, customer ÷2, nation ÷6 —
    the reference's level dividers, extract.ts:374) and is hash-aggregated
    per ancestor.  Joins: orders is mid-size (shuffle), customer→nation is
    small (broadcast)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_extendedprice") *
                       (1 - F.col("l_discount"))).alias("rev"))
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .join(F.broadcast(c), o.o_custkey == c.c_custkey))
    # one pass: explode each joined row into its 3 (ancestor, level) pairs
    # instead of a 3-way union that re-runs the join per level.  Per-row
    # floor to integer cents BEFORE aggregation: integer sums are
    # associative, so the result is bit-identical regardless of partial-
    # aggregation order.
    exploded = j.select(F.explode(F.array(
        F.struct(F.lit("order").alias("ancestor_kind"),
                 F.col("o_orderkey").cast("long").alias("ancestor_id"),
                 F.floor(F.col("rev") * 100 / 1).cast("long")
                 .alias("contrib_cents")),
        F.struct(F.lit("customer").alias("ancestor_kind"),
                 F.col("o_custkey").cast("long").alias("ancestor_id"),
                 F.floor(F.col("rev") * 100 / 2).cast("long")
                 .alias("contrib_cents")),
        F.struct(F.lit("nation").alias("ancestor_kind"),
                 F.col("c_nationkey").cast("long").alias("ancestor_id"),
                 F.floor(F.col("rev") * 100 / 6).cast("long")
                 .alias("contrib_cents")),
    )).alias("x")).select("x.*")
    return (
        exploded.groupBy("ancestor_kind", "ancestor_id")
        .agg(F.sum("contrib_cents").alias("score_cents"))
        .orderBy("ancestor_kind", "ancestor_id")
    )


SCORE_PROPAGATION_SQL = """
WITH j AS (
  SELECT o.o_orderkey, o.o_custkey, c.c_nationkey,
         l.l_extendedprice * (1 - l.l_discount) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
), u AS (
  SELECT 'order' AS ancestor_kind, CAST(o_orderkey AS BIGINT) AS ancestor_id,
         CAST(floor(rev * 100 / 1) AS BIGINT) AS contrib_cents FROM j
  UNION ALL
  SELECT 'customer', CAST(o_custkey AS BIGINT),
         CAST(floor(rev * 100 / 2) AS BIGINT) FROM j
  UNION ALL
  SELECT 'nation', CAST(c_nationkey AS BIGINT),
         CAST(floor(rev * 100 / 6) AS BIGINT) FROM j
)
SELECT ancestor_kind, ancestor_id,
       CAST(sum(contrib_cents) AS BIGINT) AS score_cents
FROM u GROUP BY 1, 2 ORDER BY ancestor_kind, ancestor_id
"""

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: grouped sums/avgs/counts over
    lineitem with all money math floored to integer cents per row (exact
    across engines regardless of aggregation order)."""
    li = table(spark, sf_dir, "lineitem")
    cents = (F.floor(F.col("l_extendedprice") * 100)).cast("long")
    disc_cents = (F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
    ).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.sum(cents).alias("sum_base_cents"),
            F.sum(disc_cents).alias("sum_disc_cents"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_base_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: filtered revenue aggregate — predicate pushdown to
    the scan, one map-side partial aggregation, integer cents."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_discount") >= 0.05)
                  & (F.col("l_discount") <= 0.07)
                  & (F.col("l_quantity") < 24))
        .agg(F.sum(
            F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100)
            .cast("long")).alias("revenue_cents"),
            F.count("*").alias("n_items"))
    )


REVENUE_FORECAST_SQL = """
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       count(*) AS n_items
FROM lineitem
WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-flavored: join orders→customer (broadcast), revenue per
    customer, top 20 by revenue with deterministic tiebreak."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(F.sum("cents").alias("revenue_cents"),
             F.count("*").alias("n_orders"))
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


TOP_CUSTOMERS_SQL = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment,
       CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
ORDER BY revenue_cents DESC, c.c_custkey ASC
LIMIT 20
"""


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — grouping sets, a category the
    reference lacks entirely (SURVEY.md §2.13), expressed Spark-native.
    NULL grouping keys are coalesced to 'ALL' so the DuckDB comparison is
    unambiguous."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
             .alias("cents"),
             F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "cents", "n")
        .orderBy("rf", "ls")
    )


SALES_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS rf,
       coalesce(l_linestatus, 'ALL') AS ls,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS cents,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY rf, ls
"""


# --- first-match coalesce (metadata-style reduction) -----------------------------

def first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by reduction — the relational form of the reference's
    priority-coalesce metadata scans."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.min_by(F.struct("ts", "event_id", "event_type"), "event_id")
             .alias("first"))
        .select("user_id",
                F.col("first.event_type").alias("first_event_type"),
                F.col("first.event_id").alias("first_event_id"))
        .orderBy("user_id")
    )


FIRST_EVENT_SQL = """
SELECT user_id,
       min_by(event_type, event_id) AS first_event_type,
       min(event_id) AS first_event_id
FROM events GROUP BY user_id ORDER BY user_id
"""

# --- regex class weighting --------------------------------------------------------

_POS_RE = "article|body|content|entry|main|page|post|text|blog|story"
_NEG_RE = "banner|comment|contact|footer|media|promo|related|share|sidebar|sponsor|shopping|tags|widget"


def class_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±25 regex weighting (getClassWeight, extract.ts:294-318) applied to
    document text as a columnar expression."""
    docs = table(spark, sf_dir, "documents")
    w = (
        F.when(F.expr(f"lower(text) rlike '{_NEG_RE}'"), -25).otherwise(0)
        + F.when(F.expr(f"lower(text) rlike '{_POS_RE}'"), 25).otherwise(0)
    )
    return (
        docs.select("doc_id", w.alias("class_weight"))
        .orderBy("doc_id")
    )


CLASS_WEIGHT_SQL = f"""
SELECT doc_id,
       (CASE WHEN regexp_matches(lower(text), '{_NEG_RE}') THEN -25 ELSE 0 END)
     + (CASE WHEN regexp_matches(lower(text), '{_POS_RE}') THEN 25 ELSE 0 END)
       AS class_weight
FROM documents ORDER BY doc_id
"""

# --- anti-join (resume) -------------------------------------------------------------

# Every user eventually has every event type in the synthetic data, so the
# anti-join is windowed (errors in the first 3 days) to produce a non-empty,
# sf-stable result — 34 users at sf0.01.
ERR_WINDOW_END = "2024-01-04 00:00:00"


def users_without_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the lineage-resume primitive (re-run only buckets
    without an ok row): users with no error event in the opening window."""
    ev = table(spark, sf_dir, "events")
    errs = ev.filter(
        (F.col("event_type") == "error")
        & (F.col("ts") < F.lit(ERR_WINDOW_END).cast("timestamp"))
    ).select("user_id").distinct()
    return (
        ev.select("user_id").distinct()
        .join(errs, "user_id", "left_anti")
        .orderBy("user_id")
    )


USERS_WITHOUT_ERRORS_SQL = f"""
SELECT DISTINCT user_id FROM events
WHERE user_id NOT IN (
  SELECT user_id FROM events
  WHERE event_type = 'error' AND ts < TIMESTAMP '{ERR_WINDOW_END}')
ORDER BY user_id
"""

# --- sessionization (gap-based windows) ------------------------------------------

SESSION_GAP_MIN = 30


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via lag + running sum — the window-function
    analogue of the reference's stack-based section fold
    (detect/document.ts:91-141)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_timestamp("ts") -
           F.unix_timestamp(F.lag("ts").over(w)))
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0))
    sess = marked.withColumn(
        "session_no", F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
    # invariant 3: per-row integer cents BEFORE the sum — float addition is
    # non-associative and Spark's partial-agg order differs from DuckDB's
    return (
        sess.groupBy("user_id", "session_no")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.floor(F.col("value") * 100).cast("long"))
             .alias("session_value_cents"))
        .orderBy("user_id", "session_no")
    )


SESSIONIZE_SQL = f"""
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM g
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
         AS session_value_cents
FROM s GROUP BY 1, 2 ORDER BY user_id, session_no
"""


# --- as-of join (event → most recent prior error, per user) -------------------


def asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — the canonical custom operator Spark's built-in joins
    don't express directly: for every event, attach the user's most recent
    error event at-or-before its timestamp (the trades↔quotes shape, here
    events↔their own error subset).

    Spark-first implementation is the distributed UNION trick, not a range
    join: tag quote rows (deduped to one per (user, ts) by max event_id —
    also what makes equal-timestamp ties deterministic in BOTH engines),
    union them with the event rows, and run ONE window pass per user
    ordered by (ts, is_event) — quotes sort before events at the same
    timestamp, so the as-of is inclusive — carrying the last non-null
    quote id/time forward.  One shuffle on user_id, a sort that spills,
    zero row multiplication; a naive range join is O(events × errors)
    per user.  Among same-(ts,is_event) peers the carried value is
    order-invariant (event rows contribute only NULLs to the carry).

    Elapsed time is exact integer microseconds (Spark timestampdiff
    MICROSECOND ≡ DuckDB date_diff microsecond — at the finest stored
    granularity, boundary-crossing counts ARE the exact difference, and
    the NTZ timestamps never round-trip through a session timezone).

    Oracle: DuckDB's NATIVE ``ASOF LEFT JOIN`` — an independent
    implementation of the same semantics, not a SQL transliteration of
    this plan, which makes the cross-check meaningful.
    """
    ev = table(spark, sf_dir, "events")
    quotes = (ev.filter(F.col("event_type") == "error")
              .groupBy("user_id", "ts")
              .agg(F.max("event_id").alias("qid")))
    tagged_e = ev.select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("long").alias("qid"),
        F.lit(1).alias("is_event"))
    tagged_q = quotes.select(
        "user_id", "ts",
        F.lit(None).cast("long").alias("event_id"),
        "qid", F.lit(0).alias("is_event"))
    w = (Window.partitionBy("user_id").orderBy("ts", "is_event")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = (tagged_e.unionByName(tagged_q)
         .withColumn("last_error_event_id",
                     F.last("qid", ignorenulls=True).over(w))
         .withColumn("last_error_ts",
                     F.last(F.when(F.col("qid").isNotNull(), F.col("ts")),
                            ignorenulls=True).over(w)))
    return (
        u.filter(F.col("is_event") == 1)
        .select(
            "event_id", "user_id", "last_error_event_id",
            F.expr("timestampdiff(MICROSECOND, last_error_ts, ts)")
            .alias("us_since_error"))
        .orderBy("event_id")
    )


ASOF_LAST_ERROR_SQL = """
WITH q AS (
  SELECT user_id, ts, max(event_id) AS qid
  FROM events WHERE event_type = 'error' GROUP BY 1, 2
)
SELECT e.event_id, e.user_id,
       q.qid AS last_error_event_id,
       date_diff('microsecond', q.ts, e.ts) AS us_since_error
FROM events e
ASOF LEFT JOIN q ON e.user_id = q.user_id AND e.ts >= q.ts
ORDER BY e.event_id
"""


# --- range join (temporal proximity, no equi key) -----------------------------

RANGE_WINDOW_DAYS = 1


def range_join_nearby_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join — the second canonical operator Spark's equi-join engine
    lacks: for every order, how many OTHER orders were placed within
    ±RANGE_WINDOW_DAYS of it.  There is no equality key at all; a naive
    formulation is an O(n²) theta join.

    Spark-first shape is the standard interval-bucketing reduction: bucket
    time at the window granularity (days), explode the PROBE side to its
    bucket plus the two adjacent ones, keep the BUILD side at one bucket
    per row, equi-join on the bucket, then refine with the residual range
    predicate.  The theta join becomes a hash join whose per-bucket work
    is (orders/day)² — bounded by data density, not corpus size — and the
    probe-side explode factor is (window/bucket + 2), here 3.  With
    day-granular dates and a ±1-day window the bucket join is exact, but
    the residual predicate is kept: it is what makes the pattern correct
    for any window/bucket ratio (and it costs nothing after the join).
    Left join restores zero-neighbor orders.

    Oracle: DuckDB BETWEEN self-join (its IEJoin evaluates the interval
    predicate natively — again an independent implementation, not a
    transliteration).
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    probe = o.select(
        F.col("o_orderkey").alias("a_key"),
        F.col("o_orderdate").alias("a_date"),
        F.explode(F.array(
            F.date_sub("o_orderdate", RANGE_WINDOW_DAYS),
            F.col("o_orderdate"),
            F.date_add("o_orderdate", RANGE_WINDOW_DAYS))).alias("bucket"))
    build = o.select(
        F.col("o_orderkey").alias("b_key"),
        F.col("o_orderdate").alias("b_date"),
        F.col("o_orderdate").alias("bucket"))
    pairs = (
        probe.join(build, "bucket")
        .filter(
            (F.col("a_key") != F.col("b_key"))
            & (F.abs(F.datediff("a_date", "b_date")) <= RANGE_WINDOW_DAYS))
        .groupBy("a_key").agg(F.count("*").alias("n"))
    )
    return (
        o.join(pairs, o["o_orderkey"] == pairs["a_key"], "left")
        .select(
            "o_orderkey",
            F.coalesce("n", F.lit(0)).alias("n_nearby"))
        .orderBy("o_orderkey")
    )


RANGE_JOIN_SQL = f"""
SELECT a.o_orderkey, CAST(count(b.o_orderkey) AS BIGINT) AS n_nearby
FROM orders a LEFT JOIN orders b
  ON b.o_orderkey <> a.o_orderkey
 AND b.o_orderdate BETWEEN a.o_orderdate - INTERVAL {RANGE_WINDOW_DAYS} DAY
                       AND a.o_orderdate + INTERVAL {RANGE_WINDOW_DAYS} DAY
GROUP BY 1 ORDER BY 1
"""


# --- hypertable rollup (multi-granularity time buckets, one pass) -------------


def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: event counts and
    value sums at hour / day / week granularity in ONE aggregation pass.

    Spark-first shape: each event explodes to its (granularity,
    bucket_start) memberships, then a single groupBy aggregates all
    levels together — one shuffle regardless of level count, with
    map-side partial aggregation collapsing the per-level rows before the
    exchange (the same explode-to-level trick score_propagation uses).
    A UNION-of-three-aggregates formulation would scan and shuffle the
    fact table once per level; at 10^12 rows the single-pass form is the
    one a continuous-aggregate maintenance job can incrementally refresh
    per bucket.

    Money is per-row integer cents before summation (the repo-wide
    cross-engine rule); week truncation uses date_trunc('week') — Monday
    in both engines (ISO).
    """
    ev = table(spark, sf_dir, "events")
    levels = F.array(*[
        F.struct(F.lit(g).alias("granularity"),
                 F.date_trunc(g, F.col("ts")).alias("bucket_start"))
        for g in ("hour", "day", "week")])
    return (
        ev.select(
            F.explode(levels).alias("l"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"))
        .groupBy(F.col("l.granularity").alias("granularity"),
                 F.col("l.bucket_start").alias("bucket_start"))
        .agg(F.count("*").alias("n_events"),
             F.sum("cents").alias("value_cents"))
        .orderBy("granularity", "bucket_start")
    )


HYPERTABLE_ROLLUP_SQL = """
WITH l AS (
  SELECT granularity,
         CASE granularity
           WHEN 'hour' THEN date_trunc('hour', ts)
           WHEN 'day'  THEN date_trunc('day', ts)
           ELSE             date_trunc('week', ts)
         END AS bucket_start,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events, (VALUES ('hour'), ('day'), ('week')) AS g(granularity)
)
SELECT granularity, bucket_start,
       count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS value_cents
FROM l GROUP BY 1, 2 ORDER BY granularity, bucket_start
"""
