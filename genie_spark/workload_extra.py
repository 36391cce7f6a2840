"""Additional §2-coverage queries: feature-type classification (J5),
completeness ratios (A4), release-diff checks (A6), set operations
(§2.7), and the scalar-function battery (§2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genie_spark.operators.aggregations import completeness_ratio
from genie_spark.operators.sets import except_distinct
from genie_spark.operators.intervals import interval_join


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# J5: exon/intron/intergenic classification — bedtools intersect + diff
# replacement (genie_registry/bed.py:131-247).  Points classified
# against two interval sets ("exon" ⊂ "gene"): in-exon → exon; in-gene
# but not exon → intron; neither → intergenic.
# ---------------------------------------------------------------------------

_GENE_IV = """
  SELECT p_partkey % 7 AS grp,
         (p_partkey * 37) % 50000 AS gstart,
         (p_partkey * 37) % 50000 + p_size * 20 AS gend
  FROM part
"""
# exons: the first 40% of each gene interval
_EXON_IV = """
  SELECT grp, gstart AS estart, gstart + CAST((gend - gstart) * 2 AS BIGINT) / 5 AS eend
  FROM ({})
""".format(_GENE_IV)

_PT = """
  SELECT l_orderkey, l_linenumber, l_partkey % 7 AS grp,
         (l_orderkey * 13 + l_linenumber * 997) % 50000 AS pos
  FROM lineitem
"""


def j5_feature_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way region classification — the reference's bedtools
    intersect/diff pipeline as ONE binned interval join + one groupBy.

    (l_orderkey, l_linenumber) is not unique in the synthetic data, so
    each point gets a surrogate uid; exons are the leading 40% of each
    gene interval, so a single join against genes carries both the
    gene-hit and (pos ≤ eend) exon-hit facts — half the shuffles of the
    two-semi-join formulation."""
    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 7).alias("grp"),
        ((F.col("l_orderkey") * 13 + F.col("l_linenumber") * 997) % 50000).alias("pos"),
    ).withColumn("__uid", F.monotonically_increasing_id())
    p = _t(spark, sf_dir, "part")
    genes = p.select(
        (F.col("p_partkey") % 7).alias("grp"),
        ((F.col("p_partkey") * 37) % 50000).alias("gstart"),
        (((F.col("p_partkey") * 37) % 50000) + F.col("p_size") * 20).alias("gend"),
    ).withColumn(
        "eend",
        (F.col("gstart") + ((F.col("gend") - F.col("gstart")) * 2).cast("long") / F.lit(5)).cast("long"),
    )
    hits = interval_join(pts, genes, ["grp"], "pos", "gstart", "gend", bin_size=1000)
    marks = hits.groupBy("__uid").agg(
        F.max(F.col("pos") <= F.col("eend")).alias("__exon")
    )
    out = pts.join(marks, "__uid", "left").withColumn(
        "feature_type",
        F.when(F.col("__exon"), "exon")
        .when(F.col("__exon").isNotNull(), "intron")
        .otherwise("intergenic"),
    )
    return out.select("l_orderkey", "l_linenumber", "pos", "feature_type")


J5_SQL = f"""
WITH pt AS ({_PT}), genes AS ({_GENE_IV}), exons AS ({_EXON_IV})
SELECT l_orderkey, l_linenumber, pos,
  CASE WHEN EXISTS (SELECT 1 FROM exons e WHERE e.grp = pt.grp AND pt.pos BETWEEN e.estart AND e.eend)
       THEN 'exon'
       WHEN EXISTS (SELECT 1 FROM genes g WHERE g.grp = pt.grp AND pt.pos BETWEEN g.gstart AND g.gend)
       THEN 'intron'
       ELSE 'intergenic' END AS feature_type
FROM pt
"""


def a4_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-completeness ratios (A4, dashboard_table_updater.py:16-50):
    per source, fraction of informative values per column, long form.
    'unknown'/'und' play the reference's "Not Collected" sentinels."""
    docs = _t(spark, sf_dir, "documents")
    return completeness_ratio(
        docs, "source", ["lang", "text"], missing_sentinels=["unknown", "und"]
    )


A4_SQL = """
WITH wide AS (
  SELECT source,
         avg(CASE WHEN lang IS NOT NULL AND lang != 'unknown' AND lang != 'und' THEN 1.0 ELSE 0.0 END) AS lang,
         avg(CASE WHEN text IS NOT NULL AND text != 'unknown' AND text != 'und' THEN 1.0 ELSE 0.0 END) AS text
  FROM documents GROUP BY source
)
SELECT source, 'lang' AS column, lang AS completeness FROM wide
UNION ALL
SELECT source, 'text' AS column, text AS completeness FROM wide
"""


def a6_release_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-over-release count decrease check (A6,
    dashboard_table_updater.py:633-672): counts per category in an
    "old" vs "new" release (orders before/after a date), full-outer
    joined; negative deltas are the flags."""
    orders = _t(spark, sf_dir, "orders")
    old = (
        orders.where(F.col("o_orderdate") < "1997-01-01")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_old"))
    )
    new = (
        orders.where(F.col("o_orderdate") < "1996-01-01")  # shrunk release
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    return (
        old.join(new, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            (F.coalesce("n_new", F.lit(0)) - F.coalesce("n_old", F.lit(0))).alias("delta"),
            (F.coalesce("n_new", F.lit(0)) < F.coalesce("n_old", F.lit(0))).alias("decreased"),
        )
    )


A6_SQL = """
WITH old AS (
  SELECT o_orderpriority, count(*) AS n_old FROM orders
  WHERE o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1
), new AS (
  SELECT o_orderpriority, count(*) AS n_new FROM orders
  WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY 1
)
SELECT coalesce(old.o_orderpriority, new.o_orderpriority) AS o_orderpriority,
       coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new,
       coalesce(n_new, 0) - coalesce(n_old, 0) AS delta,
       coalesce(n_new, 0) < coalesce(n_old, 0) AS decreased
FROM old FULL OUTER JOIN new ON old.o_orderpriority = new.o_orderpriority
"""


def set_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op (§2.7 — the unix `diff` classifying intron vs
    intergenic): parts shipped in Jan-1995 but never in Feb-1995."""
    li = _t(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1995)
    jan = li.where(F.month("l_shipdate") == 1).select("l_partkey")
    feb = li.where(F.month("l_shipdate") == 2).select("l_partkey")
    return except_distinct(jan, feb)


SET_EXCEPT_SQL = """
SELECT DISTINCT l_partkey FROM lineitem
WHERE year(l_shipdate) = 1995 AND month(l_shipdate) = 1
EXCEPT
SELECT DISTINCT l_partkey FROM lineitem
WHERE year(l_shipdate) = 1995 AND month(l_shipdate) = 2
"""


def scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 scalar-function battery over customer: case-normalization,
    trim/replace, split/substring, concat keys, regex match, sentinel-
    aware numeric coercion, conditional — one row per customer."""
    from genie_spark.functions.scalars import (
        concat_key,
        standardize_for_compare,
        to_number_or_null,
    )

    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.initcap(F.lower("c_mktsegment")).alias("segment_title"),
        standardize_for_compare(F.col("c_name")).alias("name_std"),
        F.split(F.col("c_name"), "#")[0].alias("name_prefix"),
        F.substring(F.col("c_name"), 1, 8).alias("name_8"),
        concat_key(["c_custkey", "c_nationkey"]).alias("unique_key"),
        F.col("c_name").rlike("^Customer#[0-9]+$").alias("name_matches"),
        F.length("c_name").alias("name_len"),
        to_number_or_null(F.col("c_name"), "double").alias("name_as_number"),
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
        F.floor(F.col("c_acctbal") / 365.25).cast("long").alias("bal_years"),
    )


SCALAR_SQL = r"""
SELECT c_custkey,
       upper(c_name) AS name_upper,
       -- initcap: first letter of each word upper, rest lower
       list_aggregate(list_transform(string_split(lower(c_mktsegment), ' '),
         x -> upper(x[1]) || x[2:]), 'string_agg', ' ') AS segment_title,
       lower(replace(c_name, '_', '-')) AS name_std,
       string_split(c_name, '#')[1] AS name_prefix,
       substr(c_name, 1, 8) AS name_8,
       CAST(c_custkey AS VARCHAR) || ' ' || CAST(c_nationkey AS VARCHAR) AS unique_key,
       regexp_full_match(c_name, 'Customer#[0-9]+') AS name_matches,
       length(c_name) AS name_len,
       TRY_CAST(c_name AS DOUBLE) AS name_as_number,
       CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS balance_band,
       CAST(floor(c_acctbal / 365.25) AS BIGINT) AS bal_years
FROM customer
"""


def s15_apply_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized MERGE (S15, genie/load.py:129-171): new batch
    replaces matching keys, appends the rest."""
    from genie_spark.operators.upsert import apply_upsert

    orders = _t(spark, sf_dir, "orders")
    existing = orders.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("price_cents")
    )
    new = orders.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_custkey",
        (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long") + 1).alias("price_cents"),
    )
    return apply_upsert(new, existing, keys=["o_orderkey"])


S15_SQL = """
WITH existing AS (
  SELECT o_orderkey, o_custkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM orders WHERE o_orderkey % 2 = 0
), new AS (
  SELECT o_orderkey, o_custkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 1 AS price_cents
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT * FROM new
UNION ALL
SELECT e.* FROM existing e WHERE e.o_orderkey NOT IN (SELECT o_orderkey FROM new)
"""


EXTRA_QUERIES: dict = {
    "j5_feature_type": j5_feature_type,
    "a4_completeness": a4_completeness,
    "a6_release_diff": a6_release_diff,
    "set_except_distinct": set_except_distinct,
    "scalar_battery": scalar_battery,
    "s15_apply_upsert": s15_apply_upsert,
}

EXTRA_ORACLES: dict = {
    "j5_feature_type": J5_SQL,
    "a4_completeness": A4_SQL,
    "a6_release_diff": A6_SQL,
    "set_except_distinct": SET_EXCEPT_SQL,
    "scalar_battery": SCALAR_SQL,
    "s15_apply_upsert": S15_SQL,
}
