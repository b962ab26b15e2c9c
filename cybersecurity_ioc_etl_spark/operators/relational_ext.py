"""Second wave of relational coverage: the TPC-H classics and join/window
flavors not yet in :mod:`relational` — Q3 shipping priority (join + agg +
distributed top-k), Q18 large-volume customers (HAVING subquery feeding a
semi/broadcast join), left- and full-outer joins with NULL repair,
argmin/argmax aggregates, date arithmetic through a join, and UNPIVOT.

The reference has none of these (SURVEY.md §2.3-2.6 "none in reference");
they complete the relational surface a migrating user expects.  All money
math follows the integer-mantissa contract (relational.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import query
from .relational import ISUM, MI, isum, mi

# disc_price at mantissa scale 6 (see relational.py: products are
# truncate-divided to keep the summed integer < 2^53)
_DISC_SQL = (
    "(" + MI.format(x="l_extendedprice") + " * (10000 - "
    + MI.format(x="l_discount") + ")) // 100"
)


@query(
    "shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
  {ISUM.format(x=_DISC_SQL)} / 1000000.0 AS revenue,
  strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
  o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-06-01'
  AND l.l_shipdate > TIMESTAMP '1997-06-01'
GROUP BY l.l_orderkey, order_date, o.o_orderpriority
ORDER BY revenue DESC, order_date, l.l_orderkey
LIMIT 10
""",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue for one segment.

    Scale shape: the segment-filtered customer dim broadcasts into the
    date-filtered orders scan (both predicates reach the parquet scan),
    so the only shuffle is lineitem⋈orders on l_orderkey — which the
    groupBy then reuses (same key, no second exchange).  The final top-10
    is TakeOrderedAndProject: a per-partition heap, never a global sort.
    Ties at the cutoff are determinized by (order_date, l_orderkey)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp")
    )
    disc = F.expr(
        "(cast(round(l_extendedprice * 10000.0) as bigint)"
        " * (10000 - cast(round(l_discount * 10000.0) as bigint))) div 100"
    )
    return (
        l.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
               l.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .agg((isum(disc) / 1e6).alias("revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "order_date", "l_orderkey")
        .limit(10)
    )


@query(
    "large_volume_customers",
    oracle=f"""
SELECT c.c_custkey, c.c_name, o.o_orderkey,
  strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
  {ISUM.format(x=MI.format(x='l.l_quantity'))} / 10000.0 AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, order_date
HAVING SUM({MI.format(x='l.l_quantity')}) > 250 * 10000
""",
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers whose single order exceeds 250 units.

    Scale shape: lineitem pre-aggregates by l_orderkey (map-side partial
    agg does ~all the work) and the HAVING filter on the exact integer
    mantissa cuts the survivor set to ~1% BEFORE any join; the survivors
    then broadcast into orders, and the customer dim broadcasts last —
    the one full shuffle is the l_orderkey aggregation."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # bigint accumulator, not the decimal(38,0) isum: the group key is a
    # single order (< ~10 lines × qty ≤ 50 → sum < 10^7), so overflow is
    # impossible at any corpus size and the codegen'd long sum is ~25%
    # faster than the decimal path at sf0.1.
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(mi(F.col("l_quantity"))).alias("qty_mi"))
        .filter(F.col("qty_mi") > 250 * 10000)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            (F.col("qty_mi").cast("double") / 1e4).alias("total_qty"),
        )
    )


@query(
    "customer_order_leftjoin",
    oracle=f"""
SELECT c.c_custkey, c.c_mktsegment,
  COALESCE(agg.n_orders, 0) AS n_orders,
  COALESCE(agg.total_spent, 0.0) AS total_spent
FROM customer c
LEFT JOIN (
  SELECT o_custkey,
    COUNT(*) AS n_orders,
    {ISUM.format(x=MI.format(x='o_totalprice'))} / 10000.0 AS total_spent
  FROM orders GROUP BY o_custkey
) agg ON c.c_custkey = agg.o_custkey
""",
)
def q_customer_order_leftjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join with NULL repair: every customer, zero-filled when
    orderless (the reference-era 'who sent nothing' report).  Aggregate
    FIRST then join: the outer join sees one row per customer per side
    instead of one per order — and the orderless rows survive via
    COALESCE, which an inner join would silently drop."""
    c = load_table(spark, sf_dir, "customer")
    agg = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders_raw"),
            (isum(mi(F.col("o_totalprice"))) / 1e4).alias("total_spent_raw"),
        )
    )
    return c.join(agg, c.c_custkey == agg.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce("n_orders_raw", F.lit(0)).alias("n_orders"),
        F.coalesce("total_spent_raw", F.lit(0.0)).alias("total_spent"),
    )


@query(
    "nation_presence_fulljoin",
    oracle="""
SELECT COALESCE(cu.nk, su.nk) AS nationkey,
  COALESCE(cu.n_customers, 0) AS n_customers,
  COALESCE(su.n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
      FROM customer GROUP BY 1) cu
FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
                 FROM supplier GROUP BY 1) su
  ON cu.nk = su.nk
""",
)
def q_nation_presence_fulljoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join over two pre-aggregated sides: which nations have
    customers, suppliers, or both (the fixture's supplier table covers
    only 10 of 25 nations, so both outer sides are exercised).  Both
    inputs collapse to <=25 rows before the join — at 100 TB this is the
    canonical 'aggregate first, outer-join the summaries' reconciliation
    shape."""
    cu = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("cnk"))
        .agg(F.count("*").alias("n_customers_raw"))
    )
    su = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count("*").alias("n_suppliers_raw"))
    )
    return cu.join(su, cu.cnk == su.snk, "full_outer").select(
        F.coalesce("cnk", "snk").alias("nationkey"),
        F.coalesce("n_customers_raw", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers_raw", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "order_fulfillment_lag",
    oracle="""
SELECT o.o_orderpriority,
  CAST(SUM(lag.first_ship_lag) AS DOUBLE) / COUNT(*) AS avg_lag_days,
  MIN(lag.first_ship_lag) AS min_lag_days,
  MAX(lag.first_ship_lag) AS max_lag_days,
  COUNT(*) AS n_orders
FROM orders o
JOIN (
  SELECT l_orderkey,
    date_diff('day', MIN(CAST(o2.o_orderdate AS DATE)),
                     MIN(CAST(l.l_shipdate AS DATE))) AS first_ship_lag
  FROM lineitem l JOIN orders o2 ON l.l_orderkey = o2.o_orderkey
  GROUP BY l_orderkey
) lag ON o.o_orderkey = lag.l_orderkey
GROUP BY o.o_orderpriority
""",
)
def q_order_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic through a join: days from order placement to first
    shipment, profiled per priority.  The per-order MIN pre-aggregation
    shuffles on l_orderkey once; day-counts are exact integers so the
    average is a single int-sum → double division (bit-identical both
    engines).  orders is read once on the Spark side and joined back on
    the already-shuffled key."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    lag = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.datediff(
                F.min(F.col("l_shipdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            ).alias("first_ship_lag")
        )
    )
    return (
        o.join(lag, o.o_orderkey == lag.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            (
                F.sum(F.col("first_ship_lag").cast("decimal(38,0)")).cast("double")
                / F.count("*")
            ).alias("avg_lag_days"),
            F.min(F.col("first_ship_lag")).cast("long").alias("min_lag_days"),
            F.max(F.col("first_ship_lag")).cast("long").alias("max_lag_days"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "first_last_order_price",
    oracle="""
SELECT o_custkey,
  arg_min(o_totalprice, o_orderkey) AS first_price,
  arg_max(o_totalprice, o_orderkey) AS last_price,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
""",
)
def q_first_last_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax aggregates (min_by/max_by): each customer's first and
    last order price by order key — the 'first touch / last touch'
    attribution shape, one shuffle, no window or self-join.  The ordering
    key (o_orderkey) is unique, so both engines pick the same row; prices
    pass through untouched (never re-associated).

    NULL contract: DuckDB's arg_min/arg_max IGNORE rows whose VALUE is
    NULL, while Spark's min_by/max_by would return the (NULL) value at
    the extreme key — so the ordering key is masked to NULL on null-price
    rows, which Spark's min_by skips, matching the oracle
    (tools/null_probe.py finding)."""
    o = load_table(spark, sf_dir, "orders")
    key_if_priced = F.when(
        F.col("o_totalprice").isNotNull(), F.col("o_orderkey")
    )
    return o.groupBy("o_custkey").agg(
        F.min_by("o_totalprice", key_if_priced).alias("first_price"),
        F.max_by("o_totalprice", key_if_priced).alias("last_price"),
        F.count("*").alias("n_orders"),
    )


@query(
    "part_measure_unpivot",
    oracle=f"""
SELECT measure,
  COUNT(*) AS n,
  MIN(value) AS min_value,
  MAX(value) AS max_value,
  {ISUM.format(x=MI.format(x='value'))} / 10000.0 AS sum_value
FROM (
  SELECT 'p_retailprice' AS measure, p_retailprice AS value FROM part
  UNION ALL
  SELECT 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
)
GROUP BY measure
""",
)
def q_part_measure_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt) + per-measure profile: the inverse of the
    pivot queries and the standard first step of a stats-over-columns
    sweep.  Spark's unpivot is a zero-shuffle generator (each row emits
    one row per measure in place); the only exchange is the 2-group
    aggregation."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
        F.col("p_size").cast("double").alias("p_size"),
    )
    long = p.unpivot(["p_partkey"], ["p_retailprice", "p_size"], "measure", "value")
    return long.groupBy("measure").agg(
        F.count("*").alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (isum(mi(F.col("value"))) / 1e4).alias("sum_value"),
    )


@query(
    "customer_order_timeline",
    oracle="""
SELECT o_orderkey, o_custkey,
  date_diff('day', CAST(o_orderdate AS DATE),
            CAST(lead(o_orderdate) OVER w AS DATE)) AS days_to_next,
  first_value(o_totalprice) OVER w AS first_order_price,
  CAST(row_number() OVER w AS BIGINT) AS order_idx
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q_customer_order_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-looking window functions: lead (days to the customer's
    next order), first_value (their first order's price), and the order
    index — one shuffle on o_custkey shared by all three (Spark plans a
    single Window node; the sort key includes o_orderkey so ties are
    deterministic in both engines)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.lead(F.col("o_orderdate").cast("date")).over(w),
            F.col("o_orderdate").cast("date"),
        )
        .cast("long")
        .alias("days_to_next"),
        F.first("o_totalprice").over(w).alias("first_order_price"),
        F.row_number().over(w).cast("long").alias("order_idx"),
    )


@query(
    "returned_never_accepted",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
  AND NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'A')
GROUP BY o.o_orderpriority
""",
)
def q_returned_never_accepted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained semi + anti join (EXISTS ∧ NOT EXISTS) on the same fact —
    TPC-H Q21's shape without the self-join blowup.  Both probes ride
    the identical l_orderkey shuffle; Catalyst plans them as successive
    semi/anti hash joins, so the fact is scanned twice but shuffled on
    one key."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    returned = l.filter(F.col("l_returnflag") == "R")
    accepted = l.filter(F.col("l_returnflag") == "A")
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .join(accepted, o.o_orderkey == accepted.l_orderkey, "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "nation_trade_flows",
    oracle=f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
  CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
  {ISUM.format(x=_DISC_SQL)} / 1000000.0 AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
WHERE ns.n_nationkey < 3 AND nc.n_nationkey < 3
  AND ns.n_nationkey != nc.n_nationkey
GROUP BY supp_nation, cust_nation, ship_year
""",
)
def q_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flowing between (supplier nation, customer
    nation) pairs by ship year — the same dimension table joined twice
    under different aliases on both ends of the fact.  All four dims
    broadcast; the nation filters prune BEFORE the join so the fact rows
    that survive carry only cross-nation trades.  One shuffle
    (lineitem⋈orders), one small-key agg."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ns = n.filter(F.col("n_nationkey") < 3).select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.filter(F.col("n_nationkey") < 3).select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    disc = F.expr(
        "(cast(round(l_extendedprice * 10000.0) as bigint)"
        " * (10000 - cast(round(l_discount * 10000.0) as bigint))) div 100"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .filter(F.col("ns_key") != F.col("nc_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg((isum(disc) / 1e6).alias("revenue"))
    )


@query(
    "returned_item_customers",
    oracle=f"""
SELECT c.c_custkey, c.c_name, c.c_mktsegment,
  {ISUM.format(x=_DISC_SQL)} / 1000000.0 AS lost_revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01'
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
ORDER BY lost_revenue DESC, c.c_custkey
LIMIT 20
""",
)
def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    quarter-window.  Return-flag and date filters reach both scans; the
    only shuffle is the join key; the ranking is TakeOrderedAndProject
    with c_custkey as the deterministic tiebreak."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    disc = F.expr(
        "(cast(round(l_extendedprice * 10000.0) as bigint)"
        " * (10000 - cast(round(l_discount * 10000.0) as bigint))) div 100"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg((isum(disc) / 1e6).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "disjunctive_promo_revenue",
    oracle=f"""
SELECT COUNT(*) AS n_lines,
  {ISUM.format(x=_DISC_SQL)} / 1000000.0 AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#13' AND p.p_size <= 10
       AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#20' AND p.p_size <= 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 35)
   OR (p.p_brand = 'Brand#23' AND p.p_size <= 40
       AND l.l_quantity >= 20 AND l.l_quantity <= 50)
""",
)
def q_disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of conjunct bundles spanning both join
    sides.  Catalyst cannot push the disjunction whole, but it derives
    and pushes the per-side common envelopes (brand ∈ {…}, size ≤ 40 on
    part; quantity ∈ [1,50] on lineitem), broadcasts the slimmed part
    side, and evaluates the residual OR inside the join — the difference
    between scanning 3 brands and all of `part` at 100 TB."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 10)
         & (q >= 1) & (q <= 20))
        | ((F.col("p_brand") == "Brand#20") & (F.col("p_size") <= 25)
           & (q >= 10) & (q <= 35))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 40)
           & (q >= 20) & (q <= 50))
    )
    disc = F.expr(
        "(cast(round(l_extendedprice * 10000.0) as bigint)"
        " * (10000 - cast(round(l_discount * 10000.0) as bigint))) div 100"
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count("*").alias("n_lines"),
            (isum(disc) / 1e6).alias("revenue"),
        )
    )


@query(
    "customer_order_distribution",
    oracle="""
WITH per_customer AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT n_orders, COUNT(*) AS n_customers
FROM per_customer
GROUP BY n_orders
""",
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the count-of-counts (degree distribution) — how
    many customers placed 0, 1, 2… orders.  Two chained aggregations:
    the first groups on the join key it already shuffled on (no extra
    exchange), the second groups on the tiny count domain.  The LEFT
    join + COUNT(column) keeps zero-order customers (COUNT(*) would
    count the NULL row as 1 — the classic outer-join counting bug)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_customer = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_customer.groupBy("n_orders").agg(
        F.count("*").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# Bipartite projection — part-part co-supply similarity
# ---------------------------------------------------------------------------

_COSUPPLY_ORACLE = """
WITH bp AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
  WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
),
pairs AS (
  SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS n_shared
  FROM bp a JOIN bp b ON a.s = b.s AND a.p < b.p
  GROUP BY 1, 2
)
SELECT CAST(part_a AS BIGINT) AS part_a, CAST(part_b AS BIGINT) AS part_b,
  CAST(n_shared AS BIGINT) AS n_shared
FROM pairs
WHERE n_shared >= 2
ORDER BY n_shared DESC, part_a, part_b
LIMIT 20
"""


@query("part_cosupply_pairs", oracle=_COSUPPLY_ORACLE)
def q_part_cosupply_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIPARTITE PROJECTION — the part-part co-supply graph: two parts
    are similar when the same suppliers ship both (one quarter's
    distinct (part, supplier) incidence, supplier-keyed self-join,
    pairs with >= 2 shared suppliers, top-20).  Projection of a
    bipartite incidence onto one side is the standard recommender /
    substitutability construction (users×items → item-item), and a
    JOIN shape the engine didn't have: the pair fan-out is
    Σ_s deg(s)² — bounded by the HUB side's degree, so at 100 TB the
    skew lever is capping or sampling the highest-degree suppliers
    (the same degree-orientation family as the triangle census), and
    the n_shared >= 2 filter prunes the long singleton tail before it
    ever aggregates widely.

    Scale shape: the incidence distinct-projects once (shuffle on the
    pair); the self-join is supplier-keyed (never all-parts²); top-20
    is TakeOrderedAndProject."""
    bp = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").between("1995-01-01", "1995-03-31"))
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a, b = bp.alias("a"), bp.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    return (
        pairs.orderBy(F.col("n_shared").desc(), "part_a", "part_b")
        .limit(20)
        .select(
            F.col("part_a").cast("bigint").alias("part_a"),
            F.col("part_b").cast("bigint").alias("part_b"),
            F.col("n_shared").cast("bigint").alias("n_shared"),
        )
    )
