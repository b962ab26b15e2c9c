"""Third wave of TPC-H classics — the shapes still missing after
:mod:`relational` / :mod:`relational_ext`: Q8 (market-share ratio of
conditional to total revenue), Q12 (late-shipment conditional priority
counts through a fact⋈fact join), Q15 (top supplier vs a global-max
scalar subquery, tie-safe on exact integers), Q16 (distinct-count with a
broadcast anti-join exclusion), Q22 (global-average scalar subquery +
anti join against the fact), and Q2's correlated-min shape (best offer
per part with deterministic tie-break, joined back to dims + top-k).

The fixture schema lacks ``partsupp``, ``l_shipmode`` and ``c_phone``
(TESTDATA.md), so each query re-expresses its TPC-H shape on available
columns; the *plan* shape (what shuffles, what broadcasts, where the
scalar subquery materializes) is the thing being covered.  The reference
has no joins or subqueries at all (SURVEY.md §2.3: "none in reference").

All money math follows the integer-mantissa contract
(:mod:`relational` docstring): quantize once per row, aggregate exact
integers, divide as double exactly once on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import query
from .relational import ISUM, MI, isum, mi

_DISC_SQL = (
    "(" + MI.format(x="l_extendedprice") + " * (10000 - "
    + MI.format(x="l_discount") + ")) // 100"
)

# Spark-side disc-price mantissa (scale 6), identical to _DISC_SQL
_DISC_EXPR = (
    "(cast(round(l_extendedprice * 10000.0) as bigint)"
    " * (10000 - cast(round(l_discount * 10000.0) as bigint))) div 100"
)


@query(
    "market_share_by_year",
    oracle=f"""
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
  {ISUM.format(x=f"CASE WHEN ns.n_name = 'NATION_6' THEN {_DISC_SQL} ELSE 0 END")}
    / {ISUM.format(x=_DISC_SQL)} AS mkt_share,
  {ISUM.format(x=_DISC_SQL)} / 1000000.0 AS total_revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
JOIN region r   ON nc.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
WHERE r.r_name = 'AMERICA'
GROUP BY order_year
""",
)
def q_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of revenue sold into a
    customer region, by order year.

    Scale shape: the share is a ratio of two exact integer sums computed
    in ONE aggregation pass (conditional numerator via CASE, common
    denominator), so the fact is scanned and shuffled once; the region
    filter prunes the customer side before its broadcast; the final
    divide is one double op on both engines (bit-identical).  Never
    compute numerator and denominator as two queries — that doubles the
    fact scan at 100 TB."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nc = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("nc_key")
    )
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    disc = F.expr(_DISC_EXPR)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            (
                isum(F.when(F.col("supp_nation") == "NATION_6", disc).otherwise(0))
                / isum(disc)
            ).alias("mkt_share"),
            (isum(disc) / 1e6).alias("total_revenue"),
        )
    )


@query(
    "late_shipment_priority_counts",
    oracle="""
SELECT l.l_linestatus,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_lines
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 60
GROUP BY l.l_linestatus
""",
)
def q_late_shipment_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counts over late shipments
    (fixture has no l_shipmode/l_commitdate, so "late" = shipped > 60
    days after ordering — the same cross-table date predicate that
    cannot be pushed below the join).

    Scale shape: a genuine fact⋈fact join — both sides shuffle on
    orderkey (nothing to broadcast), the date predicate evaluates inside
    the joined stage, and both CASE counts ride one partial-aggregated
    shuffle on the 2-value grouping key."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .filter(
            F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"), 60)
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_lines"),
        )
    )


@query(
    "top_revenue_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_DISC_SQL}) AS rev_mi
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
  CAST(rev.rev_mi AS DOUBLE) / 1000000.0 AS total_revenue
FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
WHERE rev.rev_mi = (SELECT MAX(rev_mi) FROM rev)
""",
)
def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) whose quarterly revenue equals the
    global maximum — a scalar aggregate subquery over a derived view.

    Scale shape: the quarter filter reaches the parquet scan; revenue
    pre-aggregates per supplier (one shuffle, map-side partials); the
    global max is a 1-row broadcast joined back against the SAME
    aggregated frame (Spark caches nothing — the agg is cheap and AQE
    reuses the exchange).  The equality compare happens on the exact
    integer mantissa, so "ties at the max" are bit-safe in both engines
    — comparing summed doubles here would be flaky."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        F.sum(F.expr(_DISC_EXPR).cast("decimal(38,0)")).alias("rev_mi")
    )
    mx = rev.agg(F.max("rev_mi").alias("max_mi"))
    return (
        rev.join(F.broadcast(mx), rev.rev_mi == mx.max_mi)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_mi").cast("double") / 1e6).alias("total_revenue"),
        )
    )


@query(
    "supplier_count_by_part_attrs",
    oracle="""
SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#13' AND p.p_size < 30
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%3')
GROUP BY p.p_brand, p.p_type
""",
)
def q_supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each surviving
    (brand, type) bucket, excluding a denylist of suppliers (fixture has
    no partsupp; lineitem is the part↔supplier bridge).

    Scale shape: the denylist subquery collapses to a tiny frame and
    anti-joins as a broadcast (no shuffle); part predicates prune before
    its broadcast join; COUNT(DISTINCT) expands to Spark's two-phase
    plan — partial distinct on (group, suppkey), then count — both
    shuffles on small keys."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & (F.col("p_size") < 30)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_name").endswith("3")
    )
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "idle_rich_customers",
    oracle=f"""
WITH pool AS (
  SELECT c_custkey, c_mktsegment, {MI.format(x='c_acctbal')} AS bal_mi
  FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
    AND c_acctbal > 0.0
), stats AS (
  SELECT SUM(bal_mi) AS sum_mi, COUNT(*) AS n FROM pool
)
SELECT p.c_mktsegment,
  COUNT(*) AS n_customers,
  {ISUM.format(x='p.bal_mi')} / 10000.0 AS total_acctbal
FROM pool p, stats st
WHERE p.bal_mi * st.n > st.sum_mi
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey)
GROUP BY p.c_mktsegment
""",
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers richer than the (positive-balance)
    segment-pool average who have never ordered.

    Scale shape: the global average is a 1-row broadcast; "above
    average" compares ``bal_mi * n > sum_mi`` in exact integer space
    (no double division at all — mantissa ~10^8 × customer count stays
    under 2^53 up to ~10^8 customers; beyond that lift to decimal).  The
    NOT EXISTS is a left-anti join against orders — the only real
    shuffle, on the join key both sides."""
    pool = (
        load_table(spark, sf_dir, "customer")
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
            & (F.col("c_acctbal") > 0.0)
        )
        .select("c_custkey", "c_mktsegment", mi(F.col("c_acctbal")).alias("bal_mi"))
    )
    stats = pool.agg(
        F.sum(F.col("bal_mi").cast("decimal(38,0)")).alias("sum_mi"),
        F.count("*").alias("n"),
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        pool.join(F.broadcast(stats))
        .filter(F.col("bal_mi").cast("decimal(38,0)") * F.col("n") > F.col("sum_mi"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            (isum(F.col("bal_mi")) / 1e4).alias("total_acctbal"),
        )
    )


@query(
    "best_offer_per_part",
    oracle=f"""
WITH offer AS (
  SELECT l_partkey, l_suppkey,
    {MI.format(x='l_extendedprice')} AS price_mi
  FROM lineitem
), cheapest AS (
  SELECT l_partkey, MIN(price_mi) AS min_price_mi
  FROM offer GROUP BY l_partkey
), best AS (
  SELECT o.l_partkey, o.price_mi AS min_price_mi,
    MIN(o.l_suppkey) AS best_suppkey
  FROM offer o JOIN cheapest ch
    ON o.l_partkey = ch.l_partkey AND o.price_mi = ch.min_price_mi
  GROUP BY o.l_partkey, o.price_mi
)
SELECT p.p_partkey, p.p_name, p.p_brand, p.p_retailprice AS retail_price,
  b.best_suppkey, s.s_name, n.n_name AS supplier_nation,
  CAST(b.min_price_mi AS DOUBLE) / 10000.0 AS best_price
FROM best b
JOIN part p     ON b.l_partkey = p.p_partkey
JOIN supplier s ON b.best_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
ORDER BY retail_price DESC, p.p_partkey
LIMIT 25
""",
)
def q_best_offer_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the cheapest offer per part and the supplier who
    made it (min suppkey among tied offers), decorated with dims, top-25
    by retail price.  Fixture has no partsupp, so the lineitem history
    is the offer book and l_extendedprice the offer price.

    Scale shape: the correlated MIN decorrelates into agg + join-back
    ON THE SAME KEY — the second join reuses the l_partkey exchange
    (no new shuffle), which is the whole trick of Q2 at scale.  The
    min-price equality compares exact integer mantissas; the supplier
    tie-break makes the picked row deterministic in both engines.  Dims
    broadcast; the final 25 is TakeOrderedAndProject, never a global
    sort."""
    offer = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", mi(F.col("l_extendedprice")).alias("price_mi")
    )
    cheapest = offer.groupBy(
        F.col("l_partkey").alias("ch_partkey")
    ).agg(F.min("price_mi").alias("min_price_mi"))
    best = (
        offer.join(
            cheapest,
            (offer.l_partkey == cheapest.ch_partkey)
            & (offer.price_mi == cheapest.min_price_mi),
        )
        .groupBy("l_partkey", "price_mi")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
    )
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), F.col("best_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            F.col("p_retailprice").alias("retail_price"),
            "best_suppkey",
            "s_name",
            F.col("n_name").alias("supplier_nation"),
            (F.col("price_mi").cast("double") / 1e4).alias("best_price"),
        )
        .orderBy(F.col("retail_price").desc(), "p_partkey")
        .limit(25)
    )


_QTY_INT_SQL = "CAST(ROUND(l_quantity) AS BIGINT)"
_COST_SQL = (
    MI.format(x="p_retailprice") + " * CAST(ROUND(l_quantity * 100.0) AS BIGINT)"
)
# Spark-side cost mantissa (scale 6 = retail scale 4 × qty scale 2)
_COST_EXPR = (
    "cast(round(p_retailprice * 10000.0) as bigint)"
    " * cast(round(l_quantity * 100.0) as bigint)"
)


@query(
    "nation_profit_by_year",
    oracle=f"""
SELECT n.n_name AS nation,
  CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
  {ISUM.format(x=f"({_DISC_SQL}) - ({_COST_SQL})")} / 1000000.0 AS sum_profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, order_year
""",
)
def q_nation_profit_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus cost) per supplier nation
    per order year, over parts matching a name pattern.  Fixture has no
    partsupp, so unit cost is p_retailprice — the plan shape (fact joined
    to three broadcast dims plus one fact⋈fact edge, profit computed
    row-wise then one grouped sum) is identical.

    Scale shape: the p_name LIKE filter prunes part BEFORE its broadcast
    so only matching partkeys ship to executors; profit is one exact
    integer expression per row (scale-6 mantissa both terms — no
    intermediate double drift); the orderkey edge is the only shuffle
    join and the (25-nation × year) grouping key partial-aggregates
    map-side to a few hundred rows."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = F.expr(_DISC_EXPR) - F.expr(_COST_EXPR)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
        )
        .agg((isum(profit) / 1e6).alias("sum_profit"))
    )


@query(
    "dominant_part_suppliers",
    oracle=f"""
WITH shipped AS (
  SELECT l.l_partkey, l.l_suppkey, SUM({_QTY_INT_SQL}) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE 'small%'
  GROUP BY l.l_partkey, l.l_suppkey
), totals AS (
  SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name, n.n_name AS nation
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
  SELECT sh.l_suppkey
  FROM shipped sh JOIN totals t ON sh.l_partkey = t.l_partkey
  WHERE sh.qty * 5 > t.total_qty)
ORDER BY s.s_suppkey
""",
)
def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the semi-join chain — suppliers qualified by a
    per-(part, supplier) aggregate compared against a per-part scalar,
    decorated with nation.  Fixture has no partsupp/availqty, so the
    threshold is "ships >20% of the part's total volume" (qty*5 >
    total), compared in exact integer space.

    Scale shape: the part name filter prunes before broadcast, so
    shipped only aggregates matching lines; totals re-aggregates the
    ALREADY-REDUCED (part, supplier) frame — tiny second shuffle; the
    qualifying supplier set collapses to a distinct key list that
    broadcast-SEMI-joins into supplier, so the supplier table never
    shuffles and no row widens before the final dim decoration."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    shipped = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round("l_quantity").cast("bigint")).alias("qty"))
    )
    totals = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    dominant = (
        shipped.join(F.broadcast(totals), shipped.l_partkey == totals.t_partkey)
        .filter(F.col("qty") * 5 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(dominant), s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


@query(
    "forecast_revenue_change",
    oracle=f"""
SELECT {ISUM.format(
    x=f"{MI.format(x='l_extendedprice')} * {MI.format(x='l_discount')}"
)} / 100000000.0 AS revenue_delta,
  COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND {MI.format(x='l_discount')} BETWEEN 500 AND 700
  AND l_quantity < 24
""",
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the what-if revenue delta of dropping mid-band discounts
    — a pure scan-side scalar aggregate.  Every predicate (year window,
    discount band, quantity cap) is sargable and reaches the parquet
    scan; the discount band compares QUANTIZED integers (BETWEEN 500 AND
    700 at scale 4) so the boundary rows are engine-identical, then
    price×discount accumulates as exact 8-scale integers.  At 100 TB
    this is the canonical 'scan speed' query: no shuffle except the
    single-row final reduce."""
    l = load_table(spark, sf_dir, "lineitem")
    di = mi(F.col("l_discount"))
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & di.between(500, 700)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (isum(mi(F.col("l_extendedprice")) * di) / F.lit(1e8)).alias(
                "revenue_delta"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "important_stock_shape",
    oracle=f"""
WITH sp AS (
  SELECT l_suppkey, l_partkey,
    SUM({MI.format(x='l_extendedprice')}) AS vi
  FROM lineitem
  GROUP BY l_suppkey, l_partkey
),
total AS (SELECT SUM(vi) AS t FROM sp)
SELECT l_suppkey, l_partkey,
  round(CAST(vi AS DOUBLE) / 10000.0, 2) AS part_value
FROM sp, total
WHERE vi * 10000 > t * 5
""",
)
def q_important_stock_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp is absent from the fixture, so lineitem
    supplies the supplier×part value): group to (supplier, part) value,
    compare each group against a fraction of the GLOBAL total — the
    scalar-subquery HAVING pattern.  The global total is a 1-row
    broadcast join-back (never a second scan); the group sums stay exact
    integer mantissas and the threshold is an exact integer cross-
    multiplication (vi*10000 > t*5), so no boundary row can flip between
    engines.  Completes the 22 TPC-H query shapes."""
    li = load_table(spark, sf_dir, "lineitem")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(mi(F.col("l_extendedprice"))).alias("vi")
    )
    total = sp.agg(F.sum(F.col("vi").cast("decimal(38,0)")).alias("t"))
    # threshold as EXACT integer cross-multiplication (0.0005 = 5/10000):
    # vi*10000 > t*5 in decimal(38,0) — no double sum, no boundary drift
    return (
        sp.crossJoin(F.broadcast(total))
        .filter(
            F.col("vi").cast("decimal(38,0)") * F.lit(10000)
            > F.col("t") * F.lit(5)
        )
        .select(
            "l_suppkey",
            "l_partkey",
            F.round(F.col("vi").cast("double") / F.lit(1e4), 2).alias(
                "part_value"
            ),
        )
    )
