"""Additional §2-coverage queries: feature-type classification (J5),
completeness ratios (A4), release-diff checks (A6), set operations
(§2.7), and the scalar-function battery (§2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genie_spark.operators.aggregations import completeness_ratio
from genie_spark.operators.sets import except_distinct


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Runtime-settable: the driver's own session lacks the builder conf
    # from genie_spark.session (events.parquet is TIMESTAMP(NANOS)).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    intersect/diff pipeline as a broadcast bin-index lookup.

    r15 optimization (guide §2.4 remove shuffles outright): the
    classification needs only per-point EXISTS facts (any overlapping
    gene; any overlapping exon prefix), never the hit rows — the
    previous inner interval_join materialized every (point, gene)
    overlap (~tens of hits per point at sf0.1), aggregated them, and
    joined the marks back: two point-scale exchanges plus a point×hit
    probe stream.  Instead the (dimension-sized) gene table is rolled
    up into one interval ARRAY per (grp, bin) and broadcast; each
    point classifies ITSELF with two short-circuiting ``exists``
    scans over its bin's array — zero point-scale exchange, no
    aggregate, no join-back (measured 5.0 s → 0.93 s at sf0.1,
    row-multiset identical via exceptAll both ways).  Exons are the
    leading 40% of each gene interval, so one array carries both
    facts.  A point whose (grp, bin) has no genes gets a NULL array:
    ``exists`` yields NULL, both WHEN branches fall through, and the
    row lands on 'intergenic' — exactly the old left-join-miss path.
    At 100 TB the gene side stays annotation-sized (the j3 broadcast
    posture); the point side is never shuffled at all."""
    bin_size = 1000
    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 7).alias("grp"),
        ((F.col("l_orderkey") * 13 + F.col("l_linenumber") * 997) % 50000).alias("pos"),
    )
    p = _t(spark, sf_dir, "part")
    genes = p.select(
        (F.col("p_partkey") % 7).alias("grp"),
        ((F.col("p_partkey") * 37) % 50000).alias("gstart"),
        (((F.col("p_partkey") * 37) % 50000) + F.col("p_size") * 20).alias("gend"),
    ).withColumn(
        "eend",
        (F.col("gstart") + ((F.col("gend") - F.col("gstart")) * 2).cast("long") / F.lit(5)).cast("long"),
    )
    gene_bins = (
        genes.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    (F.col("gstart") / bin_size).cast("long"),
                    (F.col("gend") / bin_size).cast("long"),
                )
            ),
        )
        .groupBy("grp", "__bin")
        .agg(F.collect_list(F.struct("gstart", "gend", "eend")).alias("__ivs"))
    )
    pos = F.col("pos")
    out = (
        pts.withColumn("__bin", (pos / bin_size).cast("long"))
        .join(F.broadcast(gene_bins), ["grp", "__bin"], "left")
        .withColumn(
            "__exon",
            F.exists(
                "__ivs",
                lambda i: (pos >= i["gstart"])
                & (pos <= i["gend"])
                & (pos <= i["eend"]),
            ),
        )
        .withColumn(
            "__gene",
            F.exists(
                "__ivs", lambda i: (pos >= i["gstart"]) & (pos <= i["gend"])
            ),
        )
        .withColumn(
            "feature_type",
            F.when(F.col("__exon"), "exon")
            .when(F.col("__gene"), "intron")
            .otherwise("intergenic"),
        )
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


def a15_case_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-list grouping (A15, genie/create_case_lists.py:18-41):
    members per group as a sorted, de-duplicated, '\\t'-joined string —
    the cBioPortal case-list body.  array_join(array_sort(collect_set))
    keeps the text deterministic under any row order."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source", "lang")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set(F.col("doc_id").cast("string"))), "\t"
            ).alias("case_list_ids"),
            F.countDistinct("doc_id").alias("n_cases"),
        )
    )


A15_SQL = """
SELECT source, lang,
       string_agg(DISTINCT CAST(doc_id AS VARCHAR), CHR(9) ORDER BY CAST(doc_id AS VARCHAR)) AS case_list_ids,
       count(DISTINCT doc_id) AS n_cases
FROM documents GROUP BY source, lang
"""


def a14_distinct_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique-symbol template (A14, database_to_staging.py:1432-1442):
    distinct union of keys across two 'center files'."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    from genie_spark.operators.sets import union_all

    return union_all(
        li.where(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("k")),
        li.where(F.col("l_quantity") > 45).select(F.col("l_partkey").alias("k")),
        o.where(F.col("o_orderkey") < 100).select(F.col("o_custkey").alias("k")),
    ).distinct()


A14_SQL = """
SELECT DISTINCT k FROM (
  SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'
  UNION ALL SELECT l_partkey FROM lineitem WHERE l_quantity > 45
  UNION ALL SELECT o_custkey FROM orders WHERE o_orderkey < 100
)
"""


def a16_filtered_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Failed-annotation counts (A16, R/dashboard_template_functions.R:
    25-41): filter to the failure class, count per group pair."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") == "error")
        .groupBy("event_type", (F.col("user_id") % 10).alias("user_bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


A16_SQL = """
SELECT event_type, user_id % 10 AS user_bucket, count(*) AS n
FROM events WHERE event_type = 'error' GROUP BY 1, 2
"""


def p7_contains_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-predicate drop (P7, genie/consortium_to_public.py:27-37
    common_variant filter): rows whose flag column does NOT contain the
    marker survive; null flags survive too (pandas str.contains NA
    semantics)."""
    from genie_spark.release.filters import common_variant_filter

    docs = _t(spark, sf_dir, "documents")
    flagged = docs.withColumn(
        "FILTER",
        F.when(F.col("doc_id") % 7 == 0, F.lit("common_variant;clustered"))
        .when(F.col("doc_id") % 7 == 1, F.lit("PASS"))
        .otherwise(F.lit(None).cast("string")),
    )
    return common_variant_filter(flagged).select("doc_id", "FILTER")


P7_SQL = """
WITH flagged AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN 'common_variant;clustered'
              WHEN doc_id % 7 = 1 THEN 'PASS' END AS FILTER
  FROM documents
)
SELECT doc_id, FILTER FROM flagged
WHERE FILTER IS NULL OR NOT contains(FILTER, 'common_variant')
"""


def j8_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-table lookup with UNKNOWN fallback (J8, oncotree join,
    genie/database_to_staging.py:1240-1283): broadcast left join of a
    fact table against a small code→label dim; unmatched codes map to
    'UNKNOWN'."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").where(F.col("n_nationkey") < 15)
    out = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey, "left"
    ).select(
        "c_custkey",
        F.coalesce(F.col("n_name"), F.lit("UNKNOWN")).alias("nation_label"),
    )
    return out


J8_SQL = """
SELECT c_custkey, coalesce(n_name, 'UNKNOWN') AS nation_label
FROM customer LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 15) n
  ON c_nationkey = n_nationkey
"""


def j10_symbol_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CNA symbol remap (J10, genie_registry/cna.py:14-66): part names
    play CNA symbols, a supplier-derived dim plays the BED — direct
    match keeps the symbol, ID match remaps, no match nulls."""
    from genie_spark.operators.remap import cna_symbol_remap

    p = _t(spark, sf_dir, "part")
    cna = p.select(F.col("p_partkey").alias("row_id"), (F.col("p_partkey") % 500).cast("string").alias("Hugo_Symbol"))
    bed = p.where(F.col("p_partkey") % 3 == 0).select(
        (F.col("p_partkey") % 200).cast("string").alias("Hugo_Symbol"),
        (F.col("p_partkey") % 350).cast("string").alias("ID"),
    )
    return cna_symbol_remap(cna, bed).select("row_id", "Hugo_Symbol", "remapped_symbol")


J10_SQL = """
WITH cna AS (
  SELECT p_partkey AS row_id, CAST(p_partkey % 500 AS VARCHAR) AS Hugo_Symbol FROM part
), bed AS (
  SELECT CAST(p_partkey % 200 AS VARCHAR) AS Hugo_Symbol, CAST(p_partkey % 350 AS VARCHAR) AS ID
  FROM part WHERE p_partkey % 3 = 0
), id_map AS (
  SELECT ID, min(Hugo_Symbol) AS via_id FROM bed WHERE ID IS NOT NULL GROUP BY ID
)
SELECT row_id, cna.Hugo_Symbol,
       coalesce(CASE WHEN EXISTS (SELECT 1 FROM bed b WHERE b.Hugo_Symbol = cna.Hugo_Symbol)
                     THEN cna.Hugo_Symbol END,
                (SELECT via_id FROM id_map m WHERE m.ID = cna.Hugo_Symbol)) AS remapped_symbol
FROM cna
"""


def a17_value_decreases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group per-column value-distribution decrease flags (reference
    check_column_decreases, dashboard_table_updater.py:633-807) over two
    synthetic customer "releases": the current release drops every 5th
    customer and redacts every 7th name."""
    from genie_spark.operators.aggregations import value_count_decreases

    cust = _t(spark, sf_dir, "customer")
    older = cust.select("c_custkey", "c_name", "c_mktsegment")
    current = (
        cust.where(F.col("c_custkey") % 5 != 0)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 7 == 0, F.lit("REDACTED"))
            .otherwise(F.col("c_name"))
            .alias("c_name"),
            "c_mktsegment",
        )
    )
    return value_count_decreases(
        current, older,
        group_col="c_mktsegment", id_col="c_custkey",
        columns=["c_custkey", "c_name"],
    )


A17_SQL = """
WITH older AS (
  SELECT c_custkey, c_name, c_mktsegment FROM customer
), cur AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN 'REDACTED' ELSE c_name END AS c_name,
         c_mktsegment
  FROM customer WHERE c_custkey % 5 <> 0
), cur_kept AS (
  SELECT * FROM cur WHERE c_custkey IN (SELECT c_custkey FROM older)
), melt_new AS (
  SELECT c_mktsegment, 'c_custkey' AS col, CAST(c_custkey AS VARCHAR) AS value
  FROM cur_kept
  UNION ALL
  SELECT c_mktsegment, 'c_name', c_name FROM cur_kept
), melt_old AS (
  SELECT c_mktsegment, 'c_custkey' AS col, CAST(c_custkey AS VARCHAR) AS value
  FROM older
  UNION ALL
  SELECT c_mktsegment, 'c_name', c_name FROM older
), nc AS (
  SELECT c_mktsegment, col, value, count(*) AS n FROM melt_new
  WHERE value IS NOT NULL GROUP BY 1, 2, 3
), oc AS (
  SELECT c_mktsegment, col, value, count(*) AS n_old FROM melt_old
  WHERE value IS NOT NULL GROUP BY 1, 2, 3
)
SELECT c_mktsegment,
       col AS column,
       max(coalesce(nc.n, 0) < coalesce(oc.n_old, 0)) AS has_decrease
FROM nc FULL OUTER JOIN oc USING (c_mktsegment, col, value)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (l_orderkey, l_partkey) —
    the lakehouse layout primitive behind multi-dimensional file
    skipping (io/layout.py; Delta OPTIMIZE ZORDER / Iceberg zorder
    rewrite re-expressed as pure integer column expressions).  Bounds
    via one min/max aggregate; quantization is a pure right shift
    (exact, engine-portable); the 32 interleave terms fold into one
    codegen stage.  Result: per-2^16-wide key bucket, row count and
    exact key extrema — value-checks every interleaved bit."""
    from genie_spark.io.layout import with_zorder

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    z = with_zorder(li, ["l_orderkey", "l_partkey"], n_bits=16)
    return z.groupBy(F.shiftright("__z", 16).alias("z_bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("__z").alias("z_min"),
        F.max("__z").alias("z_max"),
    )


def _zorder_sql(n_bits: int = 16) -> str:
    """DuckDB mirror: identical shift quantization (bin() length ==
    integer bit_length, the established conv/bin trick) and the same
    bit-interleave as a sum of disjoint-bit terms."""
    terms = " + ".join(
        f"(((ca >> {b}) & 1) << {2 * b}) + (((cb >> {b}) & 1) << {2 * b + 1})"
        for b in range(n_bits)
    )
    return f"""
WITH b AS (
  SELECT min(l_orderkey) AS lo_o, max(l_orderkey) AS hi_o,
         min(l_partkey) AS lo_p, max(l_partkey) AS hi_p
  FROM lineitem
), s AS (
  SELECT lo_o, lo_p,
         greatest(length(bin(hi_o - lo_o)) - {n_bits}, 0) AS sh_o,
         greatest(length(bin(hi_p - lo_p)) - {n_bits}, 0) AS sh_p
  FROM b
), c AS (
  SELECT ((l_orderkey - lo_o) >> sh_o) AS ca,
         ((l_partkey - lo_p) >> sh_p) AS cb
  FROM lineitem, s
), z AS (
  SELECT ({terms}) AS zval FROM c
)
SELECT zval >> 16 AS z_bucket, count(*) AS n_rows,
       min(zval) AS z_min, max(zval) AS z_max
FROM z GROUP BY 1
"""


def layout_zorder_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over a (STRING, numeric) pair — the round-9
    dictionary-encoded string clustering path (io/layout.py
    ``with_zorder`` string dims): c_mktsegment maps to its 1-based
    sorted-distinct rank (CENTER-like low cardinality), c_nationkey
    quantizes by the shift rule; the key interleaves both.  Result
    shape mirrors ``layout_zorder`` — per-bucket count and exact key
    extrema value-check every interleaved bit, including the
    dictionary ranks."""
    from genie_spark.io.layout import with_zorder

    cust = _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey")
    z = with_zorder(cust, ["c_mktsegment", "c_nationkey"], n_bits=16)
    return z.groupBy(F.shiftright("__z", 16).alias("z_bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("__z").alias("z_min"),
        F.max("__z").alias("z_max"),
    )


def _zorder_str_sql(n_bits: int = 16) -> str:
    """DuckDB mirror of the string-dictionary path: rank = row_number
    over the sorted distinct values (identical to array_position in
    the sorted literal array), then the same shift/interleave
    arithmetic as ``_zorder_sql``."""
    terms = " + ".join(
        f"(((ca >> {b}) & 1) << {2 * b}) + (((cb >> {b}) & 1) << {2 * b + 1})"
        for b in range(n_bits)
    )
    return f"""
WITH d AS (
  SELECT s, CAST(row_number() OVER (ORDER BY s) AS BIGINT) AS rk
  FROM (SELECT DISTINCT c_mktsegment AS s FROM customer)
), nv AS (SELECT count(*) AS n FROM d),
b AS (
  SELECT min(c_nationkey) AS lo_b, max(c_nationkey) AS hi_b FROM customer
), sh AS (
  SELECT lo_b,
         greatest(length(bin(n)) - {n_bits}, 0) AS sh_a,
         greatest(length(bin(hi_b - lo_b)) - {n_bits}, 0) AS sh_b
  FROM b, nv
), c AS (
  SELECT (d.rk >> sh_a) AS ca,
         ((c_nationkey - lo_b) >> sh_b) AS cb
  FROM customer JOIN d ON customer.c_mktsegment = d.s, sh
), z AS (
  SELECT ({terms}) AS zval FROM c
)
SELECT zval >> 16 AS z_bucket, count(*) AS n_rows,
       min(zval) AS z_min, max(zval) AS z_max
FROM z GROUP BY 1
"""


def layout_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X76 Hilbert-curve clustering key over (l_orderkey, l_partkey) —
    the locality upgrade over layout_zorder (consecutive curve cells
    are always grid-adjacent; Faloutsos & Roseman 1989, the layout
    Databricks liquid clustering moved to).  Same shift quantization
    and bucket report shape as layout_zorder, so the two oracles
    value-check the identical plumbing around the different curves."""
    from genie_spark.io.layout import with_hilbert

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    h = with_hilbert(li, ["l_orderkey", "l_partkey"], n_bits=16)
    return h.groupBy(F.shiftright("__h", 16).alias("h_bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("__h").alias("h_min"),
        F.max("__h").alias("h_max"),
    )


def _hilbert_sql(n_bits: int = 16) -> str:
    """DuckDB mirror: identical shift quantization, then the xy→d
    state loop UNROLLED as one materialized CTE per bit level (the
    reflect/swap state feeds the next level, which is why the Spark
    side runs it as an Arrow scan rather than a doubling expression
    tree — the oracle's CTE steps sidestep that by materializing)."""
    parts = [
        """b AS (
  SELECT min(l_orderkey) AS lo_o, max(l_orderkey) AS hi_o,
         min(l_partkey) AS lo_p, max(l_partkey) AS hi_p
  FROM lineitem
)""",
        f"""s AS (
  SELECT lo_o, lo_p,
         greatest(length(bin(hi_o - lo_o)) - {n_bits}, 0) AS sh_o,
         greatest(length(bin(hi_p - lo_p)) - {n_bits}, 0) AS sh_p
  FROM b
)""",
        """h0 AS (
  SELECT ((l_orderkey - lo_o) >> sh_o) AS hx,
         ((l_partkey - lo_p) >> sh_p) AS hy,
         CAST(0 AS BIGINT) AS hd
  FROM lineitem, s
)""",
    ]
    idx = 0
    for k in range(n_bits - 1, -1, -1):
        sv = 1 << k
        idx += 1
        parts.append(
            f"""h{idx} AS (
  SELECT
    CASE WHEN ((hy >> {k}) & 1) = 0 THEN
         CASE WHEN ((hx >> {k}) & 1) = 1 THEN {sv - 1} - hy ELSE hy END
         ELSE hx END AS hx,
    CASE WHEN ((hy >> {k}) & 1) = 0 THEN
         CASE WHEN ((hx >> {k}) & 1) = 1 THEN {sv - 1} - hx ELSE hx END
         ELSE hy END AS hy,
    hd + {sv * sv} * xor(3 * ((hx >> {k}) & 1), (hy >> {k}) & 1) AS hd
  FROM h{idx - 1})"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT hd >> 16 AS h_bucket, count(*) AS n_rows,
       min(hd) AS h_min, max(hd) AS h_max
FROM h{idx} GROUP BY 1"""
    )


def layout_hilbert_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 N-D Hilbert clustering key (VERDICT r12 item 4) over
    (l_orderkey, l_partkey, l_suppkey) — Skilling's transpose form of
    the Butz/Hamilton walk at 8 bits/dim (24-bit key), same shift
    quantization and bucket report shape as layout_hilbert, so the
    2-D and 3-D oracles value-check identical plumbing around the two
    curve engines."""
    from genie_spark.io.layout import with_hilbert

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    h = with_hilbert(
        li, ["l_orderkey", "l_partkey", "l_suppkey"], n_bits=8
    )
    return h.groupBy(F.shiftright("__h", 8).alias("h_bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("__h").alias("h_min"),
        F.max("__h").alias("h_max"),
    )


def _hilbert3d_sql(n_bits: int = 8) -> str:
    """DuckDB mirror of the 3-D Skilling walk: identical shift
    quantization, then the inverse-undo loop UNROLLED as one
    materialized CTE per (level, dimension) step, followed by the
    Gray encode, the t-fold over x2's bits, and the bit interleave
    (dim 0 most significant per level) — exactly ``_hilbert_nd``."""
    cols = ["l_orderkey", "l_partkey", "l_suppkey"]
    parts = [
        f"""b AS (
  SELECT {", ".join(f"min({c}) AS lo_{i}, max({c}) AS hi_{i}"
                    for i, c in enumerate(cols))}
  FROM lineitem
)""",
        f"""s AS (
  SELECT {", ".join(f"lo_{i}" for i in range(3))},
         {", ".join(
             f"greatest(length(bin(hi_{i} - lo_{i})) - {n_bits}, 0)"
             f" AS sh_{i}" for i in range(3))}
  FROM b
)""",
        f"""h0 AS (
  SELECT {", ".join(f"(({c} - lo_{i}) >> sh_{i}) AS x{i}"
                    for i, c in enumerate(cols))}
  FROM lineitem, s
)""",
    ]
    idx = 0
    q = 1 << (n_bits - 1)
    while q > 1:
        p = q - 1
        for i in range(3):
            idx += 1
            if i == 0:
                sel = (
                    f"CASE WHEN (x0 & {q}) != 0 THEN xor(x0, {p}) "
                    f"ELSE x0 END AS x0, x1, x2"
                )
            else:
                others = ", ".join(
                    f"x{j}" for j in range(1, 3) if j != i
                )
                sel = (
                    f"CASE WHEN (x{i} & {q}) != 0 THEN xor(x0, {p}) "
                    f"ELSE xor(x0, xor(x0, x{i}) & {p}) END AS x0, "
                    f"CASE WHEN (x{i} & {q}) != 0 THEN x{i} "
                    f"ELSE xor(x{i}, xor(x0, x{i}) & {p}) END AS x{i}"
                    + (f", {others}" if others else "")
                )
            parts.append(f"h{idx} AS (SELECT {sel} FROM h{idx - 1})")
        q >>= 1
    idx += 1
    parts.append(
        f"""h{idx} AS (
  SELECT x0, xor(x1, x0) AS x1, xor(x2, xor(x1, x0)) AS x2
  FROM h{idx - 1})"""
    )
    tfold = "CAST(0 AS BIGINT)"
    for k in range(1, n_bits):
        tfold = (
            f"xor({tfold}, CASE WHEN ((x2 >> {k}) & 1) = 1 "
            f"THEN {(1 << k) - 1} ELSE 0 END)"
        )
    idx += 1
    parts.append(
        f"h{idx} AS (SELECT x0, x1, x2, {tfold} AS t FROM h{idx - 1})"
    )
    idx += 1
    parts.append(
        f"""h{idx} AS (
  SELECT xor(x0, t) AS x0, xor(x1, t) AS x1, xor(x2, t) AS x2
  FROM h{idx - 1})"""
    )
    terms = " + ".join(
        f"(((x{i} >> {j}) & 1) * {1 << (j * 3 + (2 - i))})"
        for j in range(n_bits)
        for i in range(3)
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT hd >> {n_bits} AS h_bucket, count(*) AS n_rows,
       min(hd) AS h_min, max(hd) AS h_max
FROM (SELECT ({terms}) AS hd FROM h{idx}) GROUP BY 1"""
    )


def dedup_edit_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance ≤ 1 near-miss pairs over distinct customer names
    (X46: FastSS deletion-neighborhood candidates + exact levenshtein
    verify — the identifier-typo detector).  Sequentially-numbered
    c_name values give a dense, non-trivial answer (names differing in
    exactly one digit)."""
    from genie_spark.analytics.dedup import edit_near_miss_pairs

    return edit_near_miss_pairs(
        _t(spark, sf_dir, "customer"), value_col="c_name"
    )


EDIT_NEAR_SQL = """
WITH v AS (
  SELECT DISTINCT c_name AS val FROM customer
  WHERE c_name IS NOT NULL AND length(c_name) > 0
)
SELECT a.val AS a, b.val AS b,
       CAST(levenshtein(a.val, b.val) AS BIGINT) AS dist
FROM v a JOIN v b
  ON a.val < b.val AND abs(length(a.val) - length(b.val)) <= 1
WHERE levenshtein(a.val, b.val) <= 1
"""


def a19_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (the A1 counts-with-Total shape
    generalized to the native multi-level operator): orders rolled up
    over (status, priority) with per-level grouping flags — Spark
    ``rollup`` plans ONE Expand + one aggregate (a single shuffle for
    every level), not one union branch per level.  Exact integer
    cents; grouping flags per column (engine-stable, unlike the
    bit-packed grouping_id whose bit order is engine-defined)."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        o.withColumn("__c", cents)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            # grouping() is an aggregate-context expression — it must
            # live in the agg list, not a downstream select
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__c").cast("long").alias("sum_total_cents"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "g_status",
            "g_priority",
            "n",
            "sum_total_cents",
        )
    )


A19_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_total_cents
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def a20_cube_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE cross-tab totals: every (status, priority) subtotal combo
    in one Expand + one aggregate — the native form of the A3 pivot
    matrix's margin totals."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "g_status",
            "g_priority",
            "n",
        )
    )


A20_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def a21_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated (continuous) percentiles per group — the exact
    ``percentile()`` aggregate, deterministic here because both
    engines compute position p·(n−1) and lo + frac·(hi − lo) in the
    same IEEE doubles over integer cents inputs (exact below 2^52;
    frac ∈ {0, .25, .5, .75} is a dyadic rational).  Complements A7's
    exact lower-median with the continuous estimator the reference's
    summary statistics use."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    agg = (
        o.withColumn("__c", cents)
        .groupBy("o_orderstatus")
        .agg(
            F.expr(
                "percentile(__c, array(0.25D, 0.5D, 0.75D))"
            ).alias("qs"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    return agg.select(
        "o_orderstatus",
        "n",
        F.posexplode("qs").alias("pos", "est_cents"),
    ).select(
        "o_orderstatus",
        "n",
        (F.lit(25) + F.col("pos") * 25).cast("long").alias("phi_centi"),
        "est_cents",
    )


A21_SQL = """
WITH g AS (
  SELECT o_orderstatus,
         quantile_cont(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
                       [0.25, 0.5, 0.75]) AS qs,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, n,
       CAST(25 + (i - 1) * 25 AS BIGINT) AS phi_centi,
       CAST(qs[i] AS DOUBLE) AS est_cents
FROM g CROSS JOIN unnest(generate_series(1, 3)) AS t(i)
"""


def w8_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window battery (§2.5 completion): dense_rank /
    percent_rank / cume_dist / ntile(4) per customer over order value
    — one window spec, one exchange, a TOTAL order (cents DESC,
    orderkey ASC) so peer-sensitive functions are deterministic in
    both engines."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("__c"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("__c", cents)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("__c").alias("total_cents"),
            F.dense_rank().over(w).cast("long").alias("drank"),
            F.percent_rank().over(w).alias("prank"),
            F.cume_dist().over(w).alias("cdist"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
    )


W8_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
       CAST(dense_rank() OVER w AS BIGINT) AS drank,
       percent_rank() OVER w AS prank,
       cume_dist() OVER w AS cdist,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey
  ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC, o_orderkey
)
"""


EXTRA_QUERIES: dict = {
    "a19_rollup_totals": a19_rollup_totals,
    "a20_cube_totals": a20_cube_totals,
    "a21_percentile_cont": a21_percentile_cont,
    "w8_rank_battery": w8_rank_battery,
    "j5_feature_type": j5_feature_type,
    "a4_completeness": a4_completeness,
    "a6_release_diff": a6_release_diff,
    "set_except_distinct": set_except_distinct,
    "scalar_battery": scalar_battery,
    "s15_apply_upsert": s15_apply_upsert,
    "a15_case_lists": a15_case_lists,
    "a14_distinct_union": a14_distinct_union,
    "a16_filtered_counts": a16_filtered_counts,
    "p7_contains_filter": p7_contains_filter,
    "j8_broadcast_lookup": j8_broadcast_lookup,
    "j10_symbol_remap": j10_symbol_remap,
    "a17_value_decreases": a17_value_decreases,
    "layout_zorder": layout_zorder,
    "layout_hilbert": layout_hilbert,
    "layout_hilbert_3d": layout_hilbert_3d,
    "layout_zorder_str": layout_zorder_str,
    "dedup_edit_near": dedup_edit_near,
}

EXTRA_ORACLES: dict = {
    "a19_rollup_totals": A19_SQL,
    "a20_cube_totals": A20_SQL,
    "a21_percentile_cont": A21_SQL,
    "w8_rank_battery": W8_SQL,
    "j5_feature_type": J5_SQL,
    "a4_completeness": A4_SQL,
    "a6_release_diff": A6_SQL,
    "set_except_distinct": SET_EXCEPT_SQL,
    "scalar_battery": SCALAR_SQL,
    "s15_apply_upsert": S15_SQL,
    "a15_case_lists": A15_SQL,
    "a14_distinct_union": A14_SQL,
    "a16_filtered_counts": A16_SQL,
    "p7_contains_filter": P7_SQL,
    "j8_broadcast_lookup": J8_SQL,
    "j10_symbol_remap": J10_SQL,
    "a17_value_decreases": A17_SQL,
    "layout_zorder": _zorder_sql(),
    "layout_hilbert": _hilbert_sql(),
    "layout_hilbert_3d": _hilbert3d_sql(),
    "layout_zorder_str": _zorder_str_sql(),
    "dedup_edit_near": EDIT_NEAR_SQL,
}
