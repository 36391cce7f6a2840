"""Demonstration workload: every SURVEY.md §2 operator expressed as a
query over the driver-provided testdata tables, paired with an ANSI-SQL
oracle that DuckDB runs on the same parquet files.

Determinism rules used throughout (so the driver's value-hash compare
is stable across engines):
  * monetary aggregates are computed in exact integer cents
    (``sum(floor(x*100 + 0.5))`` as BIGINT) — float addition order
    differs between engines, integer addition doesn't;
  * timestamps are emitted as epoch microseconds (BIGINT), never as
    raw timestamp types;
  * per-row float expressions are fine (IEEE ops are deterministic
    given identical inputs); cross-row float aggregation is not.

Each query function takes (spark, sf_dir) and returns a DataFrame whose
column names match the oracle SQL's aliases exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genie_spark.functions.redact import redact_phi
from genie_spark.operators.aggregations import (
    counts_with_total,
    distinct_counts,
    duplicate_keys,
    fill_count_algebra,
    group_concat,
    merge_duplicate_values,
    pivot_counts,
)
from genie_spark.operators.filters import (
    anti_filter,
    greatest_threshold_predicate,
    group_count_filter,
    semi_filter,
)
from genie_spark.operators.intervals import (
    containment_join,
    interval_join,
    max_overlap_remap,
)
from genie_spark.operators.upsert import upsert_diff
from genie_spark.operators.windows import adjacent_pairs, latest_per_key


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver constructs its own SparkSession, so the session-builder
    # conf in genie_spark.session does not apply here.  events.parquet
    # stores TIMESTAMP(NANOS), which Spark refuses to read unless this
    # runtime-settable conf is on (read as epoch-nanos bigint instead).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with a ``ts_us`` epoch-microseconds column.

    The driver's events.parquet has changed physical type between rounds
    (TIMESTAMP(NANOS) → timestamp[us]), so branch on the *observed* dtype
    exhaustively:

    - ``bigint``: nanos read via ``nanosAsLong``; integer ``div`` (not
      float division — 1e18 ns overflows a double mantissa) truncates to
      µs exactly like DuckDB's ns→µs conversion.
    - ``timestamp_ntz``: plain timestamp[us] with no zone.  The wall
      clock IS the epoch value (DuckDB's ``epoch_us`` reads it the same
      way), so diff against the NTZ epoch literal directly — no session
      ``timeZone`` mutation, which would silently change timestamp
      semantics for every later query in the session.
    - ``timestamp`` (LTZ): ``unix_micros`` directly.
    """
    ev = _t(spark, sf_dir, "events")
    dt = dict(ev.dtypes).get("ts")
    if dt == "bigint":
        ev = ev.withColumn("ts_us", F.expr("ts div 1000"))
    elif dt == "timestamp_ntz":
        ev = ev.withColumn(
            "ts_us",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ),
        )
    else:
        ev = ev.withColumn("ts_us", F.unix_micros("ts"))
    # ts_t is TIMESTAMP_NTZ holding the UTC wall clock: date_format /
    # date_trunc on it render the same text under ANY session zone (the
    # driver constructs its own session, whose zone we must not rely on
    # — or mutate)
    return ev.withColumn(
        "ts_t",
        F.expr(
            "timestampadd(MICROSECOND, ts_us, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ),
    )


def _cents(col) -> F.Column:
    """Exact integer cents: floor(x*100 + 0.5) — identical in Spark and
    DuckDB (avoids round() half-up vs half-even divergence)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


_CENTS_SQL = "CAST(floor({x} * 100 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# Flagship + scans
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped groupBy aggregation over lineitem — the engine's
    flagship scan+agg path (partial aggregation, codegen, pushdown)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_price_cents"),
            F.sum(F.floor(disc_price * 100 + F.lit(0.5)).cast("long")).alias(
                "sum_disc_price_cents"
            ),
            F.sum(F.floor(charge * 100 + F.lit(0.5)).cast("long")).alias(
                "sum_charge_cents"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS DOUBLE)                                            AS sum_qty,
       CAST(sum({_CENTS_SQL.format(x='l_extendedprice')}) AS BIGINT)              AS sum_base_price_cents,
       CAST(sum({_CENTS_SQL.format(x='l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS sum_disc_price_cents,
       CAST(sum({_CENTS_SQL.format(x='l_extendedprice * (1 - l_discount) * (1 + l_tax)')}) AS BIGINT) AS sum_charge_cents,
       count(*)                                                                   AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def s12_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate pushdown scan (reference S12: SQL-on-table
    with WHERE/SELECT pushed to storage, genie/extract.py:176-189)."""
    return (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey", _cents("o_totalprice").alias("price_cents"))
    )


S12_SQL = f"""
SELECT o_orderkey, o_custkey, {_CENTS_SQL.format(x='o_totalprice')} AS price_cents
FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped 3-table join + top-k: BUILDING-segment
    customers, orders before / lineitems shipped after the cutoff,
    top-10 open orders by revenue.  The dims (filtered customer,
    orders) broadcast under AQE; lineitem streams once; the top-k is
    TakeOrdered, never a global sort."""
    cutoff = "1998-06-30"
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(cutoff)
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(cutoff)
    )
    disc_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    return (
        li.join(F.broadcast(orders.join(
                    F.broadcast(cust),
                    orders["o_custkey"] == cust["c_custkey"],
                ).select("o_orderkey")),
                li["l_orderkey"] == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.sum(disc_cents).alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey,
       CAST(sum({_CENTS_SQL.format(x='l_extendedprice * (1 - l_discount)')})
            AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
GROUP BY l_orderkey
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped group-having semi-pattern: orders whose summed
    line quantity exceeds 200, joined back to orders + customer for
    the report columns.  The having-aggregate is the big-side reducer;
    the join-back sides broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .where(F.col("total_qty") > 200)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", _cents("o_totalprice").alias("total_cents")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        big.join(
            F.broadcast(orders), big["l_orderkey"] == orders["o_orderkey"]
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .select(
            "c_mktsegment", "o_custkey", "o_orderkey",
            "total_qty", "total_cents",
        )
    )


Q18_SQL = f"""
SELECT c_mktsegment, o_custkey, o_orderkey,
       CAST(total_qty AS DOUBLE) AS total_qty,
       {_CENTS_SQL.format(x='o_totalprice')} AS total_cents
FROM (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200
) b
JOIN orders ON o_orderkey = b.l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

def j1_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim equi-join chain with broadcast dims (reference J1
    patient⋈sample join + J8 broadcast lookup)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(_cents("o_totalprice")).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


J1_SQL = f"""
SELECT n_name,
       CAST(sum({_CENTS_SQL.format(x='o_totalprice')}) AS BIGINT) AS revenue_cents,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def j9_code_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code→label remap via a literal map (reference J9
    ``remap_clinical_values`` genie_registry/clinical.py:321-382)."""
    mapping = F.create_map(
        F.lit("R"), F.lit("Returned"), F.lit("A"), F.lit("Accepted"), F.lit("N"), F.lit("NotReturned")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.withColumn("return_label", F.coalesce(mapping[F.col("l_returnflag")], F.lit("Unknown")))
        .groupBy("return_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


J9_SQL = """
SELECT CASE l_returnflag WHEN 'R' THEN 'Returned' WHEN 'A' THEN 'Accepted'
            WHEN 'N' THEN 'NotReturned' ELSE 'Unknown' END AS return_label,
       count(*) AS n
FROM lineitem GROUP BY 1
"""


def j11_containment_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-file id-containment check (reference J11
    ``check_values_between_two_df`` genie/validate.py:308-368): ids of
    the child file must all exist in the parent; emit violations."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    violations = (
        li.select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
        .join(orders.select("o_orderkey"), "o_orderkey", "left_anti")
    )
    return violations.agg(F.count(F.lit(1)).alias("n_violations"))


J11_SQL = """
SELECT count(*) AS n_violations FROM (
  SELECT DISTINCT l_orderkey FROM lineitem
  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
)
"""


# ---------------------------------------------------------------------------
# Filters / predicates
# ---------------------------------------------------------------------------

def p3_semi_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-samples semi filter (reference P3 ``remove_maf_samples``)."""
    li = _t(spark, sf_dir, "lineitem")
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return semi_filter(li, urgent, "l_orderkey").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )


P3_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def p4_anti_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-diff anti filter (reference P4 ``_get_left_diff_df``):
    customers with no urgent orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_filter(cust, orders, "c_custkey").select("c_custkey", "c_name")


P4_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def p6_greatest_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise max-over-columns predicate (reference P6 gnomAD germline
    filter, max(8 AF cols) > 0.0005 → drop)."""
    li = _t(spark, sf_dir, "lineitem")
    keep = greatest_threshold_predicate(["l_discount", "l_tax"], 0.07)
    return li.where(keep).select("l_orderkey", "l_linenumber", "l_discount", "l_tax")


P6_SQL = """
SELECT l_orderkey, l_linenumber, l_discount, l_tax FROM lineitem
WHERE greatest(l_discount, l_tax) IS NULL OR greatest(l_discount, l_tax) <= 0.07
"""


def p12_date_window_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-window release filter (reference P12 ``seqDateFilter``:
    keep rows within N days of the processing date)."""
    orders = _t(spark, sf_dir, "orders")
    cutoff_days = 184
    processing = F.lit("1995-06-01").cast("timestamp")
    return (
        orders.where(
            (F.datediff(processing, F.col("o_orderdate")) <= cutoff_days)
            & (F.datediff(processing, F.col("o_orderdate")) >= 0)
        )
        .select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
    )


P12_SQL = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date FROM orders
WHERE date_diff('day', CAST(o_orderdate AS DATE), DATE '1995-06-01') BETWEEN 0 AND 184
"""


def p14_group_count_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-group filter via window count (reference P14
    ``seq_assay_id_filter``: assays with <50 samples dropped)."""
    li = _t(spark, sf_dir, "lineitem")
    return group_count_filter(li, "l_partkey", 40).select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )


P14_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey FROM (
  SELECT l_orderkey, l_linenumber, l_partkey,
         count(*) OVER (PARTITION BY l_partkey) AS n
  FROM lineitem
) WHERE n >= 40
"""


def p15_retract_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction with cascade (reference P15 genie/toRetract.py:9-84):
    retracting parents (customers in BUILDING segment) removes their
    child orders."""
    orders = _t(spark, sf_dir, "orders")
    retracted = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    from genie_spark.operators.filters import retract_cascade

    return retract_cascade(orders, retracted, "o_custkey").select(
        "o_orderkey", "o_custkey"
    )


P15_SQL = """
SELECT o_orderkey, o_custkey FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

def a1_counts_with_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group counts + Total row (reference A1 dashboard center
    counts)."""
    return counts_with_total(_t(spark, sf_dir, "orders"), "o_orderpriority")


A1_SQL = """
SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT 'Total' AS o_orderpriority, count(*) AS n FROM orders
"""


def a2_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-id counts per group (reference A2)."""
    return distinct_counts(_t(spark, sf_dir, "orders"), "o_orderpriority", "o_custkey")


A2_SQL = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_distinct
FROM orders GROUP BY o_orderpriority
"""


def a3_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group × category count matrix (reference A3 oncotree-by-center
    pivot).  Pivot values passed explicitly to skip the discovery job."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return pivot_counts(joined, "n_name", "c_mktsegment", segs)


A3_SQL = """
SELECT n_name,
       CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS "AUTOMOBILE",
       CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 ELSE 0 END) AS BIGINT) AS "BUILDING",
       CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 ELSE 0 END) AS BIGINT) AS "FURNITURE",
       CAST(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 ELSE 0 END) AS BIGINT) AS "HOUSEHOLD",
       CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 ELSE 0 END) AS BIGINT) AS "MACHINERY"
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def a7_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group (reference A7 AGE median sanity rule)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty")
    )


A7_SQL = """
SELECT l_returnflag, CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty
FROM lineitem GROUP BY l_returnflag
"""


def a8_merge_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CNA duplicate-value merge semantics (reference A8
    ``mergeCNAvalues``): 1 distinct → keep; 2 distinct incl. 0 → the
    nonzero; else null."""
    li = _t(spark, sf_dir, "lineitem")
    return merge_duplicate_values(li, ["l_partkey", "l_suppkey"], "l_discount")


A8_SQL = """
SELECT l_partkey, l_suppkey,
       CASE WHEN count(DISTINCT l_discount) = 1 THEN min(l_discount)
            WHEN count(DISTINCT l_discount) = 2 AND min(l_discount) = 0 THEN max(l_discount)
            ELSE NULL END AS merged_value
FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def a9_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-key detection (reference A9, e.g. the MAF 5-column
    variant key)."""
    li = _t(spark, sf_dir, "lineitem")
    return duplicate_keys(li, ["l_partkey", "l_suppkey"])


A9_SQL = """
SELECT l_partkey, l_suppkey, count(*) AS n FROM lineitem
GROUP BY l_partkey, l_suppkey HAVING count(*) > 1
"""


def a11_fill_count_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """depth = ref + alt null-filling (reference A11
    ``calculate_missing_variant_counts``).  Nulls are synthesized
    deterministically (orderkey mod 3 picks which member is missing)."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 3 == 0, F.lit(None)).otherwise(
            F.col("l_quantity") + F.col("l_linenumber")
        ).alias("t_depth"),
        F.when(F.col("l_orderkey") % 3 == 1, F.lit(None)).otherwise(
            F.col("l_quantity")
        ).alias("t_ref_count"),
        F.when(F.col("l_orderkey") % 3 == 2, F.lit(None)).otherwise(
            F.col("l_linenumber").cast("double")
        ).alias("t_alt_count"),
    )
    return fill_count_algebra(base, "t_depth", "t_ref_count", "t_alt_count")


A11_SQL = """
WITH base AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_orderkey % 3 = 0 THEN NULL ELSE l_quantity + l_linenumber END AS t_depth,
         CASE WHEN l_orderkey % 3 = 1 THEN NULL ELSE l_quantity END AS t_ref_count,
         CASE WHEN l_orderkey % 3 = 2 THEN NULL ELSE CAST(l_linenumber AS DOUBLE) END AS t_alt_count
  FROM lineitem
), s1 AS (
  SELECT l_orderkey, l_linenumber,
         coalesce(t_depth, t_ref_count + t_alt_count) AS t_depth,
         t_ref_count, t_alt_count
  FROM base
), s2 AS (
  SELECT l_orderkey, l_linenumber, t_depth,
         coalesce(t_ref_count, t_depth - t_alt_count) AS t_ref_count, t_alt_count
  FROM s1
)
SELECT l_orderkey, l_linenumber, t_depth, t_ref_count,
       coalesce(t_alt_count, t_depth - t_ref_count) AS t_alt_count
FROM s2
"""


def a13_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic group-concat (reference A13 error-report
    assembly)."""
    nation = _t(spark, sf_dir, "nation")
    return group_concat(nation, "n_regionkey", "n_name", sep=";")


A13_SQL = """
SELECT n_regionkey, string_agg(n_name, ';' ORDER BY n_name) AS combined
FROM nation GROUP BY n_regionkey
"""


# ---------------------------------------------------------------------------
# Upsert / MERGE
# ---------------------------------------------------------------------------

def j7_upsert_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff-based MERGE classification (reference J7/S15
    genie/load.py:255-296): new batch vs existing table → insert /
    update / delete sets."""
    orders = _t(spark, sf_dir, "orders")
    existing = orders.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", _cents("o_totalprice").alias("price_cents")
    )
    new = orders.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_custkey",
        (_cents("o_totalprice") + (F.col("o_orderkey") % 5)).alias("price_cents"),
    )
    return upsert_diff(new, existing, keys=["o_orderkey"])


J7_SQL = f"""
WITH existing AS (
  SELECT o_orderkey, o_custkey, {_CENTS_SQL.format(x='o_totalprice')} AS price_cents
  FROM orders WHERE o_orderkey % 2 = 0
), new AS (
  SELECT o_orderkey, o_custkey,
         {_CENTS_SQL.format(x='o_totalprice')} + (o_orderkey % 5) AS price_cents
  FROM orders WHERE o_orderkey % 3 = 0
), j AS (
  SELECT coalesce(n.o_orderkey, e.o_orderkey) AS o_orderkey,
         coalesce(n.o_custkey, e.o_custkey)   AS o_custkey,
         coalesce(n.price_cents, e.price_cents) AS price_cents,
         CASE WHEN e.o_orderkey IS NULL THEN 'insert'
              WHEN n.o_orderkey IS NULL THEN 'delete'
              WHEN n.o_custkey IS DISTINCT FROM e.o_custkey
                OR n.price_cents IS DISTINCT FROM e.price_cents THEN 'update'
              END AS __change
  FROM new n FULL OUTER JOIN existing e ON n.o_orderkey = e.o_orderkey
)
SELECT * FROM j WHERE __change IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

def w1_adjacent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-pair neighbor analytics — the mutation-in-cis shape
    (reference W1 R/mergecheck_functions.R:150-168): per user, events
    sorted by time; flag pairs <5 min apart with |Δvalue| < 10."""
    ev = _events(spark, sf_dir)
    paired = adjacent_pairs(
        ev,
        partition_by="user_id",
        order_by=["ts_us", "event_id"],
        lag_cols={"ts_us": "prev_ts_us", "value": "prev_value", "event_id": "prev_event_id"},
    )
    return (
        paired.where(
            (F.col("ts_us") - F.col("prev_ts_us") < 300_000_000)
            & (F.abs(F.col("value") - F.col("prev_value")) < 10)
        )
        .select("user_id", "event_id", "prev_event_id",
                (F.col("ts_us") - F.col("prev_ts_us")).alias("gap_us"))
    )


W1_SQL = """
WITH ev AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER w AS prev_ts_us,
         lag(value)        OVER w AS prev_value,
         lag(event_id)     OVER w AS prev_event_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT user_id, event_id, prev_event_id, ts_us - prev_ts_us AS gap_us
FROM ev
WHERE ts_us - prev_ts_us < 300000000 AND abs(value - prev_value) < 10
"""


def w2_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key dedup (reference W2 current-release pick,
    genie/extract.py:152-159)."""
    ev = _events(spark, sf_dir)
    return latest_per_key(ev, "user_id", ["ts_us", "event_id"]).select(
        "user_id", "event_id", "event_type", "value"
    )


W2_SQL = """
SELECT user_id, event_id, event_type, value FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def w4_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (W-family extension): each click attributed
    to the user's most recent view at-or-before it — the union-window
    single-shuffle form (``operators.windows.asof_join``), never a
    range join.  The oracle is DuckDB's NATIVE ASOF LEFT JOIN, a
    semantically independent implementation."""
    from genie_spark.operators.windows import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts_us", "event_id", "value"
    )
    return asof_join(
        clicks, views, on=["user_id"], ts_col="ts_us",
        payload=["event_id", "value"], tiebreak="event_id",
    )


W4_SQL = """
WITH c AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
  FROM events WHERE event_type = 'click'
),
v AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         max(event_id) AS asof_event_id,
         arg_max(value, event_id) AS asof_value
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, epoch_us(ts)
)
SELECT c.event_id, c.user_id, c.ts_us, c.value,
       v.asof_event_id, v.asof_value
FROM c ASOF LEFT JOIN v
  ON c.user_id = v.user_id AND c.ts_us >= v.ts_us
"""


def a18_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON property analytics (functions/jsonx —
    the events.props column, untouched until r15): extract ``$.k`` as
    a long JVM-side (get_json_object + try_cast, no UDF) and reduce
    per event type with exact integer stats (milli-mean via long
    ``div`` — the engine-stability rule)."""
    from genie_spark.functions.jsonx import json_long

    ev = _events(spark, sf_dir).withColumn("k", json_long("props", "k"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count("k").cast("long").alias("n_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .withColumn("avg_k_milli", F.expr("(sum_k * 1000) div n_k"))
    )


A18_SQL = """
WITH ev AS (
  -- TRY_CAST mirrors the Spark side's try_cast NULL-on-malformed
  -- contract (r15 code-review finding: a plain CAST would error the
  -- oracle on exactly the inputs the contract is about)
  SELECT event_type,
         TRY_CAST(CASE WHEN json_valid(props)
                       THEN json_extract_string(props, '$.k') END
                  AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(k) AS BIGINT) AS n_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k,
       CAST((sum(k) * 1000) // count(k) AS BIGINT) AS avg_k_milli
FROM ev GROUP BY event_type
"""


def w5_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization + per-session stats (W-family
    extension; see ``operators.sessions.session_stats``): 30-minute
    inactivity gap, exact integer epoch-µs arithmetic."""
    from genie_spark.operators.sessions import session_stats

    return session_stats(_events(spark, sf_dir), gap_us=1_800_000_000)


W5_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
l AS (
  SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
         AS prev
  FROM ev
),
b AS (
  SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
                 THEN 1 ELSE 0 END AS ns
  FROM l
),
s AS (
  SELECT *, CAST(sum(ns) OVER (
      PARTITION BY user_id ORDER BY ts_us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_seq
  FROM b
)
SELECT user_id, session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts_us) AS start_us,
       max(ts_us) AS end_us,
       max(ts_us) - min(ts_us) AS duration_us,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types
FROM s GROUP BY user_id, session_seq
"""


FUNNEL_STEPS = ("view", "click", "purchase")


def w6_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-sequence funnel view→click→purchase per user (W-family
    extension; ``operators.sessions.funnel_times``): step k converts
    only strictly after step k-1."""
    from genie_spark.operators.sessions import funnel_times

    return funnel_times(_events(spark, sf_dir), steps=list(FUNNEL_STEPS))


W6_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
s1 AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts_us END) AS t_step1_us
  FROM ev GROUP BY user_id
),
s2 AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'click' AND e.ts_us > s1.t_step1_us
                  THEN e.ts_us END) AS t_step2_us
  FROM ev e JOIN s1 USING (user_id) GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts_us > s2.t_step2_us
                  THEN e.ts_us END) AS t_step3_us
  FROM ev e JOIN s2 USING (user_id) GROUP BY e.user_id
)
SELECT s1.user_id, t_step1_us, t_step2_us, t_step3_us,
       CAST((t_step1_us IS NOT NULL)::INT + (t_step2_us IS NOT NULL)::INT
            + (t_step3_us IS NOT NULL)::INT AS BIGINT) AS steps_reached
FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
WHERE t_step1_us IS NOT NULL
"""


def w7_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (W-family extension;
    ``operators.sessions.retention_matrix``): cohort = integer epoch-
    week of the user's first event (exact ``div``, no calendar
    truncation ambiguity across engines)."""
    from genie_spark.operators.sessions import retention_matrix

    return retention_matrix(_events(spark, sf_dir))


W7_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
),
a AS (
  SELECT user_id, wk,
         min(wk) OVER (PARTITION BY user_id) AS cohort_period
  FROM ev
)
SELECT cohort_period, wk - cohort_period AS period_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM a GROUP BY cohort_period, wk - cohort_period
"""


def w9_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel (W6 + conversion window): each step must land
    within 24 hours of the previous one — the product-analytics
    "convert within N" rule."""
    from genie_spark.operators.sessions import funnel_times

    return funnel_times(
        _events(spark, sf_dir),
        steps=list(FUNNEL_STEPS),
        within_us=86_400_000_000,
    )


W9_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
s1 AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts_us END) AS t_step1_us
  FROM ev GROUP BY user_id
),
s2 AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'click' AND e.ts_us > s1.t_step1_us
                       AND e.ts_us <= s1.t_step1_us + 86400000000
                  THEN e.ts_us END) AS t_step2_us
  FROM ev e JOIN s1 USING (user_id) GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts_us > s2.t_step2_us
                       AND e.ts_us <= s2.t_step2_us + 86400000000
                  THEN e.ts_us END) AS t_step3_us
  FROM ev e JOIN s2 USING (user_id) GROUP BY e.user_id
)
SELECT s1.user_id, t_step1_us, t_step2_us, t_step3_us,
       CAST((t_step1_us IS NOT NULL)::INT + (t_step2_us IS NOT NULL)::INT
            + (t_step3_us IS NOT NULL)::INT AS BIGINT) AS steps_reached
FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
WHERE t_step1_us IS NOT NULL
"""


def a22_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier report per order status
    (``operators.aggregations.robust_outlier_stats``) over exact
    integer cents."""
    from genie_spark.operators.aggregations import robust_outlier_stats

    o = _t(spark, sf_dir, "orders").withColumn(
        "total_cents", _cents("o_totalprice")
    )
    return robust_outlier_stats(o, ["o_orderstatus"], "total_cents")


A22_SQL = f"""
WITH v AS (
  SELECT o_orderstatus, {_CENTS_SQL.format(x='o_totalprice')} AS c
  FROM orders
),
m AS (
  SELECT o_orderstatus, quantile_cont(c, 0.5) AS med
  FROM v GROUP BY o_orderstatus
),
d AS (
  SELECT v.o_orderstatus, c, med, abs(c - med) AS dev
  FROM v JOIN m USING (o_orderstatus)
),
md AS (
  SELECT o_orderstatus, quantile_cont(dev, 0.5) AS mad
  FROM d GROUP BY o_orderstatus
)
SELECT d.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(d.med) AS DOUBLE) AS median_value,
       CAST(max(md.mad) AS DOUBLE) AS mad_value,
       CAST(sum(CASE WHEN d.dev > 3 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM d JOIN md USING (o_orderstatus) GROUP BY d.o_orderstatus
"""


def a24_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value (the profiling op behind
    every dashboard distribution panel): fixed 25k-cent buckets over
    exact integer cents — bucket id = floor division, identical in
    both engines; empty buckets are absent (see w10 for the
    gap-filled pattern)."""
    o = _t(spark, sf_dir, "orders")
    w = 2_500_000
    return (
        o.withColumn("__c", _cents("o_totalprice"))
        .groupBy(F.expr(f"__c div {w}").cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("__c").alias("lo_cents"),
            F.max("__c").alias("hi_cents"),
        )
    )


A24_SQL = f"""
SELECT {_CENTS_SQL.format(x='o_totalprice')} // 2500000 AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       min({_CENTS_SQL.format(x='o_totalprice')}) AS lo_cents,
       max({_CENTS_SQL.format(x='o_totalprice')}) AS hi_cents
FROM orders GROUP BY 1
"""


def w10_zero_filled_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily time series per event type (the resampling /
    zero-fill op every monitoring query needs): one row per (type,
    epoch-day) across the full observed range, missing days filled
    with 0 — the day spine is a ``sequence`` + explode over the
    GLOBAL min/max day (a broadcast-sized dim), cross-joined with the
    type dim and left-joined to the counted facts.  Integer epoch
    days (``ts_us div 86400e6``) — no calendar/timezone arithmetic to
    diverge on."""
    ev = _events(spark, sf_dir).withColumn(
        "day", F.expr("ts_us div 86400000000").cast("long")
    )
    counts = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    rng = ev.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = rng.select(
        F.explode(F.expr("sequence(lo, hi)")).alias("day")
    )
    types = ev.select("event_type").distinct()
    return (
        types.crossJoin(F.broadcast(spine))
        .join(counts, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
    )


W10_SQL = """
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events
),
counts AS (
  SELECT event_type, day, CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY event_type, day
),
spine AS (
  SELECT unnest(generate_series((SELECT min(day) FROM ev),
                                (SELECT max(day) FROM ev))) AS day
),
types AS (SELECT DISTINCT event_type FROM ev)
SELECT t.event_type, s.day,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n
FROM types t CROSS JOIN spine s
LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = s.day
"""


def j13_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of total revenue in exact
    basis points — the percent-of-total report op, computed as the
    nation aggregate cross-joined with its own broadcast 1-row total
    (dim-sized; no unpartitioned window, the rank_bounded
    discipline)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders")
    per_nation = (
        orders.join(F.broadcast(cust),
                    orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.sum(_cents("o_totalprice")).alias("revenue_cents"))
    )
    total = per_nation.agg(
        F.sum("revenue_cents").alias("total_cents")
    )
    return (
        per_nation.crossJoin(F.broadcast(total))
        .select(
            "c_nationkey",
            "revenue_cents",
            F.expr("(revenue_cents * 10000) div total_cents")
            .cast("long")
            .alias("share_bp"),
        )
    )


J13_SQL = f"""
WITH per AS (
  SELECT c_nationkey,
         CAST(sum({_CENTS_SQL.format(x='o_totalprice')}) AS BIGINT)
             AS revenue_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey
),
tot AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS total_cents FROM per)
SELECT c_nationkey, revenue_cents,
       CAST((revenue_cents * 10000) // total_cents AS BIGINT) AS share_bp
FROM per, tot
"""


def w11_retention_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 merge law, driver-hard (the sketch-sharded pattern applied
    to event analytics): the event stream is cut into three TIME
    shards (epoch-day mod 3 — users straddle shards, so the merge is
    real), each reduced to its distinct (user, day) ACTIVITY MAP (the
    per-batch artifact an ingest store would persist — activity-days-
    sized, never event-sized), the maps merged by union-distinct, and
    the retention matrix computed from the MERGED artifact — while
    the oracle computes retention over the raw events globally.
    Value-hash equality is the dedup-union merge law end-to-end."""
    from genie_spark.operators.sessions import retention_matrix

    ev = _events(spark, sf_dir).withColumn(
        "day", F.expr("ts_us div 86400000000").cast("long")
    )
    shards = [
        ev.where(F.pmod(F.col("day"), F.lit(3)) == i)
        .select("user_id", "day")
        .distinct()
        for i in range(3)
    ]
    merged = shards[0].unionByName(shards[1]).unionByName(shards[2]).distinct()
    # the merged activity map re-enters the standard operator with day
    # units (period 1 day over the day column == epoch-day cohorts)
    return retention_matrix(
        merged.withColumn("ts_us", F.col("day")), period_us=1
    )


W11_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS wk FROM events
),
a AS (
  SELECT user_id, wk,
         min(wk) OVER (PARTITION BY user_id) AS cohort_period
  FROM ev
)
SELECT cohort_period, wk - cohort_period AS period_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM a GROUP BY cohort_period, wk - cohort_period
"""


def a5_lag_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-vs-prior-release difference via lag (reference A5
    ``update_sample_difference_table``): monthly event counts per type,
    delta vs previous month."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    monthly = ev.groupBy(
        "event_type", F.date_format("ts_t", "yyyy-MM").alias("month")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("month")
    return monthly.withColumn(
        "delta", F.col("n") - F.coalesce(F.lag("n").over(w), F.lit(0))
    )


A5_SQL = """
WITH monthly AS (
  SELECT event_type, strftime(ts, '%Y-%m') AS month, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, month, n,
       n - coalesce(lag(n) OVER (PARTITION BY event_type ORDER BY month), 0) AS delta
FROM monthly
"""


# ---------------------------------------------------------------------------
# Interval joins (the genomic-range machinery, §2.3 J3-J6)
# ---------------------------------------------------------------------------
# Intervals are derived from `part`, points from `lineitem`, with a shared
# group key — the same shape as (chromosome, position) vs BED panels.

_IV_SQL = """
  SELECT p_partkey AS iv_id, p_partkey % 7 AS grp,
         (p_partkey * 37) % 50000 AS istart,
         (p_partkey * 37) % 50000 + p_size * 20 AS iend
  FROM part
"""
_PT_SQL = """
  SELECT l_orderkey, l_linenumber, l_partkey % 7 AS grp,
         (l_orderkey * 13 + l_linenumber * 997) % 50000 AS pos
  FROM lineitem
"""


def _intervals(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("iv_id"),
        (F.col("p_partkey") % 7).alias("grp"),
        ((F.col("p_partkey") * 37) % 50000).alias("istart"),
        (((F.col("p_partkey") * 37) % 50000) + F.col("p_size") * 20).alias("iend"),
    )


def _points(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # The driver's parquet files are single-row-group → one scan task.
    # Repartition (cheap: MBs) so the interval-join fan-out uses every
    # core.  HASH on the row key, not round-robin: a keyless
    # repartition(n) first pays a local binary sort of its input
    # (sortBeforeRepartition, needed for retry determinism — guide
    # §2.5) which measured 0.96 s vs 0.55 s for the hash form on this
    # table, and hash partitioning is retry-deterministic by
    # construction.  On a real cluster the input arrives pre-split.
    n = spark.sparkContext.defaultParallelism
    return li.repartition(
        n, F.col("l_orderkey"), F.col("l_linenumber")
    ).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 7).alias("grp"),
        ((F.col("l_orderkey") * 13 + F.col("l_linenumber") * 997) % 50000).alias("pos"),
    )


def j3_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned interval join — MAF-in-BED overlap (reference J3
    R/MAFinBED.R:126-161).  The bin-bucketed equi key makes this a
    hash join instead of a nested-loop; see operators/intervals.py."""
    out = interval_join(
        _points(spark, sf_dir),
        _intervals(spark, sf_dir),
        on=["grp"],
        pos="pos",
        start="istart",
        end="iend",
        bin_size=1000,
    )
    return out.select("l_orderkey", "l_linenumber", "pos", "iv_id")


J3_SQL = f"""
WITH iv AS ({_IV_SQL}), pt AS ({_PT_SQL})
SELECT l_orderkey, l_linenumber, pos, iv_id
FROM pt JOIN iv ON pt.grp = iv.grp AND pt.pos BETWEEN iv.istart AND iv.iend
"""


def j3_interval_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MAFinBED *remove* set: points overlapping no interval
    (reference R/MAFinBED.R:133-136)."""
    from genie_spark.operators.intervals import interval_anti_join

    out = interval_anti_join(
        _points(spark, sf_dir),
        _intervals(spark, sf_dir),
        on=["grp"],
        pos="pos",
        start="istart",
        end="iend",
        bin_size=1000,
    )
    return out.select("l_orderkey", "l_linenumber", "pos")


J3_ANTI_SQL = f"""
WITH iv AS ({_IV_SQL}), pt AS ({_PT_SQL})
SELECT l_orderkey, l_linenumber, pos FROM pt
WHERE NOT EXISTS (
  SELECT 1 FROM iv WHERE pt.grp = iv.grp AND pt.pos BETWEEN iv.istart AND iv.iend
)
"""


def j4_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment join — whitelist variant check (reference J4
    pyranges ``intersect(how="containment")``,
    genie/database_to_staging.py:253-292): left ranges fully inside a
    right interval."""
    pts = _points(spark, sf_dir).withColumn("pos_end", F.col("pos") + 25)
    out = containment_join(
        pts,
        _intervals(spark, sf_dir),
        on=["grp"],
        start_left="pos",
        end_left="pos_end",
        start="istart",
        end="iend",
        bin_size=1000,
        how="left_semi",
    )
    return out.select("l_orderkey", "l_linenumber", "pos")


J4_SQL = f"""
WITH iv AS ({_IV_SQL}), pt AS (SELECT *, pos + 25 AS pos_end FROM ({_PT_SQL}))
SELECT l_orderkey, l_linenumber, pos FROM pt
WHERE EXISTS (
  SELECT 1 FROM iv
  WHERE pt.grp = iv.grp AND pt.pos >= iv.istart AND pt.pos_end <= iv.iend
)
"""


def j6_max_overlap_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-overlap symbol remap (reference J6 genie_registry/bed.py:
    250-393): each segment maps to the overlapping gene with the largest
    overlap ratio when unambiguous and ratio > 0.9."""
    segs = (
        _t(spark, sf_dir, "orders")
        # hash, not round-robin: skips the sort-before-repartition
        # pass and is retry-deterministic (see _points)
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("o_orderkey")
        )
        .select(
            F.col("o_orderkey").alias("seg_id"),
            (F.col("o_orderkey") % 7).alias("grp"),
            ((F.col("o_orderkey") * 53) % 50000).alias("sstart"),
        )
        .withColumn("send", F.col("sstart") + 30)
    )
    genes = _intervals(spark, sf_dir).select(
        "grp", "istart", "iend", F.concat(F.lit("G"), F.col("iv_id")).alias("symbol")
    )
    out = max_overlap_remap(
        segs,
        genes,
        on=["grp"],
        seg_start="sstart",
        seg_end="send",
        gene_start="istart",
        gene_end="iend",
        gene_symbol="symbol",
        min_ratio=0.9,
        bin_size=1000,
        seg_id="seg_id",
    )
    return out.select("seg_id", "remapped_symbol")


J6_SQL = f"""
WITH genes AS (SELECT grp, istart, iend, 'G' || CAST(iv_id AS VARCHAR) AS symbol FROM ({_IV_SQL})),
segs AS (
  SELECT o_orderkey AS seg_id, o_orderkey % 7 AS grp,
         (o_orderkey * 53) % 50000 AS sstart,
         (o_orderkey * 53) % 50000 + 30 AS send
  FROM orders
),
hits AS (
  SELECT s.seg_id, g.symbol,
         CAST(least(s.send, g.iend) - greatest(s.sstart, g.istart) + 1 AS DOUBLE)
           / (s.send - s.sstart + 1) AS ratio
  FROM segs s JOIN genes g
    ON s.grp = g.grp AND s.sstart <= g.iend AND s.send >= g.istart
),
best AS (
  SELECT seg_id, symbol, ratio,
         max(ratio) OVER (PARTITION BY seg_id) AS max_ratio
  FROM hits
),
chosen AS (
  SELECT seg_id,
         CASE WHEN count(DISTINCT symbol) = 1 AND max(ratio) > 0.9
              THEN min(symbol) ELSE NULL END AS remapped_symbol
  FROM best WHERE ratio = max_ratio
  GROUP BY seg_id
)
SELECT s.seg_id, c.remapped_symbol
FROM segs s LEFT JOIN chosen c ON s.seg_id = c.seg_id
"""


# ---------------------------------------------------------------------------
# PHI redaction (§2.9)
# ---------------------------------------------------------------------------

def phi_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHI redaction pass (reference genie/database_to_staging.py:109-233)
    applied to a synthesized patient table derived from customer."""
    cust = _t(spark, sf_dir, "customer")
    patients = cust.select(
        F.col("c_custkey").alias("PATIENT_ID"),
        F.floor(F.col("c_acctbal") * 4).cast("long").cast("string").alias("AGE_AT_SEQ_REPORT"),
        (F.lit(1900) + F.col("c_custkey") % 120).cast("string").alias("BIRTH_YEAR"),
        (F.lit(1990) + F.col("c_custkey") % 40).cast("string").alias("YEAR_CONTACT"),
    )
    return redact_phi(
        patients,
        interval_cols=("AGE_AT_SEQ_REPORT",),
        birth_year_col="BIRTH_YEAR",
        year_cols=("YEAR_CONTACT",),
    )


PHI_SQL = """
WITH p AS (
  SELECT c_custkey AS PATIENT_ID,
         CAST(CAST(floor(c_acctbal * 4) AS BIGINT) AS VARCHAR) AS age,
         CAST(1900 + c_custkey % 120 AS VARCHAR) AS byr,
         CAST(1990 + c_custkey % 40 AS VARCHAR) AS yct
  FROM customer
), flags AS (
  SELECT PATIENT_ID, age, byr, yct,
         (age LIKE '%>%' OR TRY_CAST(age AS DOUBLE) > 32485) AS over89,
         (age LIKE '%<%') AS ped,
         (TRY_CAST(yct AS DOUBLE) - TRY_CAST(byr AS DOUBLE) > 89) AS yeardiff
  FROM p
)
SELECT PATIENT_ID,
       CASE WHEN ped THEN 'withheld' WHEN over89 THEN '>32485' ELSE age END AS AGE_AT_SEQ_REPORT,
       CASE WHEN coalesce(over89, FALSE) THEN 'cannotReleaseHIPAA'
            WHEN byr LIKE '%>%' THEN 'cannotReleaseHIPAA'
            WHEN byr LIKE '%<%' THEN 'withheld'
            WHEN coalesce(yeardiff, FALSE) THEN 'cannotReleaseHIPAA'
            ELSE byr END AS BIRTH_YEAR,
       CASE WHEN yct LIKE '%<%' THEN 'withheld' ELSE yct END AS YEAR_CONTACT
FROM flags
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

from genie_spark.workload_analytics import ANALYTICS_ORACLES, ANALYTICS_QUERIES
from genie_spark.workload_extra import EXTRA_ORACLES, EXTRA_QUERIES

_ALL_QUERIES: dict = {
    "q1_pricing_summary": q1_pricing_summary,
    "s12_pushdown_scan": s12_pushdown_scan,
    "j1_revenue_per_nation": j1_revenue_per_nation,
    "j9_code_remap": j9_code_remap,
    "j11_containment_check": j11_containment_check,
    "p3_semi_filter": p3_semi_filter,
    "p4_anti_filter": p4_anti_filter,
    "p6_greatest_threshold": p6_greatest_threshold,
    "p12_date_window_filter": p12_date_window_filter,
    "p14_group_count_filter": p14_group_count_filter,
    "p15_retract_cascade": p15_retract_cascade,
    "a1_counts_with_total": a1_counts_with_total,
    "a2_distinct_counts": a2_distinct_counts,
    "a3_pivot_counts": a3_pivot_counts,
    "a5_lag_difference": a5_lag_difference,
    "a7_median": a7_median,
    "a8_merge_duplicates": a8_merge_duplicates,
    "a9_duplicate_keys": a9_duplicate_keys,
    "a11_fill_count_algebra": a11_fill_count_algebra,
    "a13_group_concat": a13_group_concat,
    "j7_upsert_diff": j7_upsert_diff,
    "w1_adjacent_events": w1_adjacent_events,
    "w2_latest_per_key": w2_latest_per_key,
    "w4_asof_join": w4_asof_join,
    "q3_shipping_priority": q3_shipping_priority,
    "q18_large_orders": q18_large_orders,
    "a18_json_props_stats": a18_json_props_stats,
    "w5_sessionize": w5_sessionize,
    "w6_funnel_conversion": w6_funnel_conversion,
    "w7_retention_cohorts": w7_retention_cohorts,
    "w9_funnel_windowed": w9_funnel_windowed,
    "a22_robust_outliers": a22_robust_outliers,
    "a24_histogram": a24_histogram,
    "j13_revenue_share": j13_revenue_share,
    "w11_retention_sharded": w11_retention_sharded,
    "w10_zero_filled_daily": w10_zero_filled_daily,
    "j3_interval_join": j3_interval_join,
    "j3_interval_anti": j3_interval_anti,
    "j4_containment_join": j4_containment_join,
    "j6_max_overlap_remap": j6_max_overlap_remap,
    "phi_redaction": phi_redaction,
    **ANALYTICS_QUERIES,
    **EXTRA_QUERIES,
}

# The driver checks at most 50 queries in registration order, so every
# distinct SURVEY.md §2 id must land in the first 50.  Redundant
# variants (a second row for an id already covered) go last.  The
# tail: j3's anti variant (J3 checked via j3_interval_join), the O(n²)
# cosine-pairs baseline (similarity checked via ann_topk/ann_ivf_topk),
# set_except (§2.7 checked via a14_distinct_union), a2_distinct_counts
# (A2's distinct-count shape is also exercised by a1/a3),
# p7_contains_filter (P-family contains filter, same family as the
# driver-checked a6/p6 shapes), a16_filtered_counts (A1's
# conditional-count family) and ann_lsh_banded (multi-table variant of
# the driver-checked ann_lsh_buckets) — rotated out in round 5 so
# a17_value_decreases (per-column release decrease check) and
# dedup_embedding_drop (the IVF-candidate embedding near-dup pipeline)
# sit inside the driver-checked window.  All tail queries still verify
# locally via tools/verify_oracle.py.
# Round-5 rotation: the new corpus-pipeline ops (decontamination,
# packing, tf·idf) take window slots; freed by rotating out
# dedup_components (connected components also runs inside the
# driver-checked dedup_embedding_drop), ann_topk (brute-force
# baseline; the family stays covered by ann_ivf_topk + ann_lsh_buckets
# and ann_topk stays a bench headline) and a9_duplicate_keys (dup
# detection family covered by a8_merge_duplicates + dedup_exact).
# text_repetition and corpus_stratified_sample land in the tail —
# still locally verified by tools/verify_oracle.py.
# Round-5 additions: cluster_kmeans (iterative Lloyd) and
# corpus_passage_dedup (CCNet-style passage dedup) are NEW §2-extension
# families, so they take window slots; freed by rotating out
# dedup_ngram_jaccard (the quadratic exact-Jaccard baseline — the same
# rationale that already rotated ann_cosine_pairs; its candidates→verify
# family stays covered by the driver-checked dedup_minhash_lsh) and
# ann_ivf_topk (the IVF candidate path is driver-checked inside
# dedup_embedding_drop; the ANN family keeps ann_lsh_buckets in-window).
# corpus_split_shuffle and dedup_quality_survivors are variants of
# already-checked families (md5-deterministic sampling / survivor
# selection) and start in the tail — locally verified.
# Round-5 late additions: dedup_semantic (SemDeDup — Lloyd-cell
# candidate geometry, a distinct published family) and
# sketch_kmv_distinct (mergeable KMV distinct sketch — a NEW family)
# take window slots; freed by rotating out dedup_simhash (the
# signature-banding family stays driver-checked via dedup_minhash_lsh)
# and text_tfidf_topk (the text-scoring family stays via text_quality;
# tf·idf still locally verified by tools/verify_oracle.py).
# Round-6 rotation (VERDICT r5 item 4): the 14 queries that had never
# had a DRIVER-green row (ann_lsh_banded, cluster_balanced_sample,
# corpus_chunk_overlap, corpus_keep_list, corpus_split_shuffle,
# corpus_stratified_sample, dedup_incremental_minhash,
# dedup_quality_survivors, sketch_kmv_jaccard, sketch_quantiles,
# text_lm_surprisal, text_pii_scrub, text_repetition, text_tfidf_topk)
# move INTO the 50-slot window; freed by rotating out 14 queries with
# green rows in CORRECTNESS_r05.json (j9, p4, p12, p14, a5, a7, a11,
# a13, w2, j4, a4, a6, j8, j10) — every rotated-out query keeps its
# historical driver row and still verifies locally via
# tools/verify_oracle.py.
# Round-7 rotation (VERDICT r6 item 1 — the FINAL rotation): the 13
# queries that had never had a driver-green row (set_except_distinct,
# j3_interval_anti, ann_cosine_pairs, a2_distinct_counts,
# p7_contains_filter, a16_filtered_counts, dedup_components, ann_topk,
# a9_duplicate_keys, dedup_ngram_jaccard, ann_ivf_topk, dedup_simhash,
# text_fingerprint) move INTO the 50-slot window; freed by rotating out
# 13 queries with green rows in CORRECTNESS_r06.json (ann_lsh_banded,
# cluster_balanced_sample, corpus_chunk_overlap, corpus_keep_list,
# corpus_split_shuffle, corpus_stratified_sample,
# dedup_incremental_minhash, dedup_quality_survivors,
# sketch_kmv_jaccard, sketch_quantiles, text_lm_surprisal,
# text_repetition, text_tfidf_topk).  text_pii_scrub keeps its window
# slot because round 7 touches its audit-count semantics.  After this
# round, every registered query has had at least one driver-green row.
# Round-8 rotation (VERDICT r7 item 4 — freshness, not first-coverage:
# every query already has a driver-green row somewhere): the 15 queries
# whose latest driver row was ROUND 5 (three rounds of engine drift
# ago) rotate back INTO the window — j9, p4, p12, p14, a4–a7, a11,
# a13, a14, w2, j4, j8, j10 — freed by rotating out the 15 YOUNGEST
# green rows: the 13 round-7 first-timers (redundant family variants
# by construction — that's why they were checked last) plus
# text_pii_scrub (text family stays via text_quality/text_token_stats)
# and a17_value_decreases (the decrease family's a6 rotates IN).
# Round-8 second rotation: the three NEW X41-X43 queries
# (dedup_setsim_prefix, corpus_priority_sample, sketch_heavy_hitters)
# need first driver rows, and the four tail queries whose ENGINES
# CHANGED this round (ann_ivf_topk: IVF md5 reseed; ann_lsh_banded:
# measured plane sizing; dedup_simhash: shared hamming extraction;
# cluster_balanced_sample: k-means md5 seeding) rotate back IN for a
# fresh post-change driver row.  The 7 slots come from r7-green
# queries untouched by any round-8 change (phi_redaction,
# scalar_battery, j5_feature_type, a15_case_lists, s15_apply_upsert,
# j11_containment_check, corpus_passage_dedup) — each keeps its
# r7-green row and the local sf0.01 sweep.
_TAIL_QUERIES = [
    # Round-16 rotation (VERDICT r15 item 2 + the r15 rotation plan):
    # the 50-slot window takes (a) the two r12-cohort queries DEFERRED
    # in r15 (ann_ivfpq_residual_topk, sketch_kll_grouped), (b) the 25
    # r15 newcomers with no driver row yet (W-family, OLAP battery,
    # TPC-H shapes, graph, sharded CM, X87/X88/X89/X90 — each with
    # local sf0.001+sf0.01 sweep evidence), (c) the 12 r15-REWRITTEN
    # queries the r15 driver window happened to miss (map-side
    # signatures, fused components, SHJ graph/j5/j6, PQ training,
    # setsim, ngram_jaccard strategy hints) — the VERDICT r15 item-2
    # list verbatim — and (d) 11 of the stalest (r13-green) cohort
    # (substring pairs/clean share r15's rewritten span mask; the
    # multimodal/ANN/text retrieval families are 3 rounds stale).
    # The 50 freed slots are the r15 window — all 50 green in
    # CORRECTNESS_r15.json (rows+schema+hash, 0 err) — which moves
    # to the tail below, each keeping that driver row and the local
    # oracle sweeps.  No query is added or removed: same 162
    # registered queries, same oracles, only window membership moves.
    "q1_pricing_summary",
    "s12_pushdown_scan",
    "j1_revenue_per_nation",
    "j9_code_remap",
    "j11_containment_check",
    "p3_semi_filter",
    "p4_anti_filter",
    "p6_greatest_threshold",
    "p12_date_window_filter",
    "p14_group_count_filter",
    "p15_retract_cascade",
    "a1_counts_with_total",
    "a2_distinct_counts",
    "a3_pivot_counts",
    "a5_lag_difference",
    "a7_median",
    "a8_merge_duplicates",
    "a9_duplicate_keys",
    "a11_fill_count_algebra",
    "a13_group_concat",
    "j7_upsert_diff",
    "w1_adjacent_events",
    "w2_latest_per_key",
    "w4_asof_join",
    "j3_interval_join",
    "j3_interval_anti",
    "j4_containment_join",
    "phi_redaction",
    "dedup_exact",
    "dedup_simhash",
    "dedup_embedding_drop",
    "ann_ivf_topk",
    "ann_lsh_buckets",
    "ann_lsh_banded",
    "text_token_stats",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "text_repetition",
    "text_lm_surprisal",
    "corpus_bloom_decontaminate",
    "corpus_stratified_sample",
    "corpus_pack_sequences",
    "corpus_split_shuffle",
    "cluster_kmeans",
    "cluster_balanced_sample",
    "dedup_semantic",
    "sketch_kmv_jaccard",
    "sketch_quantiles",
    "corpus_chunk_overlap",
    "text_pii_scrub",
    "corpus_keep_list",
    "multimodal_features",
    "sketch_count_min",
    "sketch_hll_distinct",
    "sketch_hll_sharded",
    "sketch_kmv_sharded",
    "corpus_token_budget",
    "corpus_priority_sample",
    "sketch_heavy_hitters",
    "text_quality_classifier",
    "corpus_dsir_sample",
    "text_bpe_merges",
    "dedup_substring_clean_min50",
    "text_bpe_encode",
    "text_normalize_nfc",
    "text_token_drift",
    "corpus_domain_cap",
    "corpus_temperature_mix",
    "sketch_kll_quantiles",
    "sketch_moments",
    "sketch_moments_sharded",
    "corpus_ccnet_buckets",
    "text_wordpiece_encode",
    "text_wordpiece_coverage",
    "text_wordpiece_train",
    "text_unigram_encode",
    "text_unigram_seed",
    "emb_random_projection",
    "retrieval_rrf_fusion",
    "corpus_leakage_safe_split",
    "corpus_leakage_split_store",
    "corpus_epoch_allocation",
    "sketch_kmv_setops",
    "sketch_kmv_containment",
    "corpus_decontaminate_semantic",
    "corpus_soft_dedup",
    "text_bpe_fertility",
    "text_gopher_filter",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "text_lm_bigram",
    "text_line_repetition",
    "text_char_entropy",
    "text_blocklist",
    "a4_completeness",
    "a6_release_diff",
    "set_except_distinct",
    "scalar_battery",
    "s15_apply_upsert",
    "a15_case_lists",
    "a14_distinct_union",
    "a16_filtered_counts",
    "p7_contains_filter",
    "j8_broadcast_lookup",
    "j10_symbol_remap",
    "a17_value_decreases",
    "layout_zorder",
    "layout_hilbert",
    "layout_hilbert_3d",
    "layout_zorder_str",
    "dedup_edit_near",
]

QUERIES: dict = {k: v for k, v in _ALL_QUERIES.items() if k not in _TAIL_QUERIES}
QUERIES.update({k: _ALL_QUERIES[k] for k in _TAIL_QUERIES if k in _ALL_QUERIES})

ORACLES: dict = {
    "q1_pricing_summary": Q1_SQL,
    "s12_pushdown_scan": S12_SQL,
    "j1_revenue_per_nation": J1_SQL,
    "j9_code_remap": J9_SQL,
    "j11_containment_check": J11_SQL,
    "p3_semi_filter": P3_SQL,
    "p4_anti_filter": P4_SQL,
    "p6_greatest_threshold": P6_SQL,
    "p12_date_window_filter": P12_SQL,
    "p14_group_count_filter": P14_SQL,
    "p15_retract_cascade": P15_SQL,
    "a1_counts_with_total": A1_SQL,
    "a2_distinct_counts": A2_SQL,
    "a3_pivot_counts": A3_SQL,
    "a5_lag_difference": A5_SQL,
    "a7_median": A7_SQL,
    "a8_merge_duplicates": A8_SQL,
    "a9_duplicate_keys": A9_SQL,
    "a11_fill_count_algebra": A11_SQL,
    "a13_group_concat": A13_SQL,
    "j7_upsert_diff": J7_SQL,
    "w1_adjacent_events": W1_SQL,
    "w2_latest_per_key": W2_SQL,
    "w4_asof_join": W4_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q18_large_orders": Q18_SQL,
    "a18_json_props_stats": A18_SQL,
    "w5_sessionize": W5_SQL,
    "w6_funnel_conversion": W6_SQL,
    "w7_retention_cohorts": W7_SQL,
    "w9_funnel_windowed": W9_SQL,
    "a22_robust_outliers": A22_SQL,
    "a24_histogram": A24_SQL,
    "j13_revenue_share": J13_SQL,
    "w11_retention_sharded": W11_SQL,
    "w10_zero_filled_daily": W10_SQL,
    "j3_interval_join": J3_SQL,
    "j3_interval_anti": J3_ANTI_SQL,
    "j4_containment_join": J4_SQL,
    "j6_max_overlap_remap": J6_SQL,
    "phi_redaction": PHI_SQL,
    **ANALYTICS_ORACLES,
    **EXTRA_ORACLES,
}
