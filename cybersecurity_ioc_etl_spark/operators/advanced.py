"""Advanced operator coverage: as-of joins, range joins, pivot, sliding
windows, exact quantiles, edit-distance similarity, array kernels, and
the full batch tweet pipeline (reference §3.2) — each with a DuckDB
oracle.

These are the operator families SURVEY.md §2.3-2.6 records as absent in
the reference but required of a complete engine (plus north-star text
ops).  Scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table
from .registry import query

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@query(
    "asof_click_before_purchase",
    oracle=f"""
SELECT p.event_id, p.user_id,
  strftime(p.ts, '{_TS_FMT_DUCK}') AS purchase_ts,
  strftime(c.ts, '{_TS_FMT_DUCK}') AS last_click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def q_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (most recent click at-or-before each purchase, per user),
    implemented Spark-side with the union+window trick: tag both sides,
    sort (ts, kind) within user, carry the last click ts forward.

    Scale: ONE shuffle on user_id for both sides together — the same cost
    as a sort-merge join, with no range-duplication; this is the standard
    scalable as-of plan on Spark (no built-in ASOF operator)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"), F.lit(0).alias("kind")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id"), F.lit(1).alias("kind")
    )
    u = clicks.unionByName(purchases)
    # kind orders clicks before purchases at equal ts → ">=" semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.last(
        F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        u.withColumn("click_ts", last_click)
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", _TS_FMT_SPARK).alias("purchase_ts"),
            F.date_format("click_ts", _TS_FMT_SPARK).alias("last_click_ts"),
        )
    )


@query(
    "quantity_tier_counts",
    oracle="""
WITH tiers(lo, hi, tier) AS (VALUES
  (0.0, 10.0, 'xs'), (10.0, 25.0, 's'), (25.0, 40.0, 'm'), (40.0, 1e9, 'l'))
SELECT t.tier, COUNT(*) AS n_lines,
  COUNT(DISTINCT l.l_orderkey) AS n_orders
FROM lineitem l JOIN tiers t ON l.l_quantity >= t.lo AND l.l_quantity < t.hi
GROUP BY t.tier
""",
)
def q_quantity_tier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a tiny tier table: Spark plans this as a
    BroadcastNestedLoopJoin — correct, and cheap because the broadcast
    side is 4 rows.  At scale the alternative is binning with width_bucket
    and an equi-join; this query keeps the genuine inequality join."""
    l = load_table(spark, sf_dir, "lineitem")
    tiers = spark.createDataFrame(
        [(0.0, 10.0, "xs"), (10.0, 25.0, "s"), (25.0, 40.0, "m"), (40.0, 1e9, "l")],
        "lo double, hi double, tier string",
    )
    return (
        l.join(
            F.broadcast(tiers),
            (l.l_quantity >= tiers.lo) & (l.l_quantity < tiers.hi),
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_lines"),
            F.count_distinct("l_orderkey").alias("n_orders"),
        )
    )


@query(
    "returnflag_linestatus_pivot",
    oracle="""
SELECT l_returnflag,
  COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS "F",
  COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS "O"
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_returnflag_linestatus_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (groupBy().pivot() — the dedicated Spark operator, not a CASE
    emulation); absent combinations normalized to 0 to match SQL COUNT."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O"])
    )


@query(
    "events_sliding_counts",
    oracle="""
WITH win AS (
  SELECT event_type,
    unnest([
      make_timestamp((epoch_us(ts) // 1800000000) * 1800000000),
      make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000)
    ]) AS window_start
  FROM events
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type, COUNT(*) AS n_events
FROM win
GROUP BY 1, 2
""",
)
def q_events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour every 30 minutes) — each event lands in 2
    overlapping windows.  Uses Spark's native window() generator; the
    oracle expands the same two epoch-aligned starts per event."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )


@query(
    "order_price_quartiles",
    oracle="""
SELECT o_orderstatus,
  quantile_cont(CAST(ROUND(o_totalprice * 10000.0) AS BIGINT), 0.25) / 10000.0 AS p25,
  quantile_cont(CAST(ROUND(o_totalprice * 10000.0) AS BIGINT), 0.50) / 10000.0 AS median,
  quantile_cont(CAST(ROUND(o_totalprice * 10000.0) AS BIGINT), 0.75) / 10000.0 AS p75,
  COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus
""",
)
def q_order_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles over integer mantissas: linear interpolation at
    quarter fractions on <2^53 integers is exact float math, so Spark's
    percentile() and DuckDB's quantile_cont() agree bit-for-bit.  At 100 TB
    swap percentile() for approx_percentile (t-digest) — documented
    tradeoff; the exact form is the oracle-checkable one."""
    o = load_table(spark, sf_dir, "orders")
    m = F.round(F.col("o_totalprice") * F.lit(10000.0)).cast("bigint")
    return o.groupBy("o_orderstatus").agg(
        (F.percentile(m, F.lit(0.25)) / 1e4).alias("p25"),
        (F.percentile(m, F.lit(0.50)) / 1e4).alias("median"),
        (F.percentile(m, F.lit(0.75)) / 1e4).alias("p75"),
        F.count("*").alias("n"),
    )


@query(
    "similar_part_names",
    oracle="""
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
  levenshtein(a.p_name, b.p_name) AS edit_dist
FROM part a JOIN part b ON a.p_partkey < b.p_partkey
WHERE a.p_partkey < 40 AND b.p_partkey < 40
  AND levenshtein(a.p_name, b.p_name) <= 12
""",
)
def q_similar_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity (fuzzy matching kernel).  Bounded pair set
    here; the scale plan is blocking (join on a cheap key like soundex or
    length band) before the quadratic distance — same shape as LSH."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 40)
    a = p.select(
        F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a")
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b")
    )
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 12)
    )


@query(
    "part_token_profile",
    oracle="""
SELECT p_partkey,
  array_to_string(list_sort(list_distinct(str_split(p_name, ' '))), ',') AS sorted_tokens,
  len(str_split(p_name, ' ')) AS n_tokens,
  CASE WHEN list_contains(str_split(p_name, ' '), 'red') THEN 1 ELSE 0 END AS has_red
FROM part
""",
)
def q_part_token_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array kernel composition: split → distinct → sort → join, plus
    membership — the array-function surface (SURVEY §2.8 note)."""
    p = load_table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.array_join(F.array_sort(F.array_distinct(toks)), ",").alias("sorted_tokens"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.when(F.array_contains(toks, "red"), F.lit(1)).otherwise(F.lit(0)).alias(
            "has_red"
        ),
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier) — dominance pruning via shared-shuffle
# windows, distributive two-phase plan
# ---------------------------------------------------------------------------

_SKYLINE_WINDOWS_SQL = """
  MAX(p_size) OVER (PARTITION BY {part} ORDER BY pi
    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_le,
  MAX(p_size) OVER (PARTITION BY {part} ORDER BY pi
    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_lt
"""

_PARETO_ORACLE = f"""
WITH p AS (
  SELECT p_partkey, p_brand, p_size,
    CAST(ROUND(p_retailprice * 100.0) AS BIGINT) AS pi
  FROM part WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL
),
local AS (
  SELECT * FROM (
    SELECT p_partkey, p_brand, p_size, pi,
      {_SKYLINE_WINDOWS_SQL.format(part='p_brand')}
    FROM p
  ) WHERE NOT m_le > p_size AND NOT COALESCE(m_lt, -1) >= p_size
),
gsky AS (
  SELECT * FROM (
    SELECT p_partkey, p_brand, p_size, pi,
      {_SKYLINE_WINDOWS_SQL.format(part='1')}
    FROM local
  ) WHERE NOT m_le > p_size AND NOT COALESCE(m_lt, -1) >= p_size
)
SELECT p_partkey, p_brand, p_size,
  CAST(pi AS DOUBLE) / 100.0 AS price
FROM gsky
"""


def _skyline_pass(df: DataFrame, part_cols: list) -> DataFrame:
    """One dominance-pruning pass (maximize p_size, minimize pi): a row
    is dominated iff some row has size STRICTLY greater at price <=
    (m_le window, RANGE frame includes price peers) or size >= at price
    STRICTLY less (m_lt window, RANGE ... 1 PRECEDING excludes peers).
    Two window functions over ONE (partition, price-order) shuffle."""
    base = Window.partitionBy(*part_cols).orderBy("pi") if part_cols else (
        Window.partitionBy().orderBy("pi")
    )
    w_le = base.rangeBetween(Window.unboundedPreceding, 0)
    w_lt = base.rangeBetween(Window.unboundedPreceding, -1)
    return (
        df.withColumn("m_le", F.max("p_size").over(w_le))
        .withColumn("m_lt", F.max("p_size").over(w_lt))
        .filter(
            ~(F.col("m_le") > F.col("p_size"))
            & ~(F.coalesce(F.col("m_lt"), F.lit(-1)) >= F.col("p_size"))
        )
        .drop("m_le", "m_lt")
    )


@query("pareto_frontier_parts", oracle=_PARETO_ORACLE)
def q_pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier operator (Börzsönyi et al., ICDE'01):
    the parts no other part beats on BOTH axes — size maximized, price
    minimized (ties don't dominate).  Dominance is resolved by two
    window maxima sharing one price-ordered shuffle (RANGE frames: the
    peer-inclusive frame catches strictly-taller-at-equal-or-lower-
    price dominators, the 1-PRECEDING frame catches
    equal-or-taller-at-strictly-cheaper) — no self-join, no quadratic
    dominance test.

    Scale shape: the skyline is DISTRIBUTIVE — skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B)) — so phase 1 prunes within each
    p_brand partition in parallel (the window shuffle is partitioned,
    never global) and phase 2 re-runs the same pass over the tiny
    survivor set.  At 100 TB the phase-1 partitioning key is any
    existing layout column (or a grid over the axes); survivors per
    partition are O(frontier), so the global pass is a single small
    task — the canonical two-level skyline plan."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isNotNull() & F.col("p_retailprice").isNotNull()
    )
    base = p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.round(F.col("p_retailprice") * F.lit(100.0))
        .cast("bigint")
        .alias("pi"),
    )
    local = _skyline_pass(base, ["p_brand"])
    glob = _skyline_pass(local, [])
    return glob.select(
        "p_partkey",
        "p_brand",
        "p_size",
        (F.col("pi").cast("double") / F.lit(100.0)).alias("price"),
    )


@query(
    "asof_next_purchase_tolerance",
    oracle=f"""
WITH u AS (
  SELECT user_id, ts, event_id,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS kind
  FROM events
  WHERE event_type IN ('click', 'purchase')
    AND ts IS NOT NULL AND user_id IS NOT NULL
),
carried AS (
  SELECT user_id, ts, event_id, kind,
    last_value(CASE WHEN kind = 1 THEN ts END IGNORE NULLS) OVER w AS p_ts,
    last_value(CASE WHEN kind = 1 THEN event_id END IGNORE NULLS) OVER w
      AS p_eid
  FROM u
  WINDOW w AS (PARTITION BY user_id
    ORDER BY ts DESC, kind DESC, event_id DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
clicks AS (
  SELECT event_id, user_id, strftime(ts, '{_TS_FMT_DUCK}') AS click_ts,
    epoch_us(p_ts) // 1000000 - epoch_us(ts) // 1000000 AS gap_raw,
    p_eid
  FROM carried WHERE kind = 0
)
SELECT event_id, user_id, click_ts,
  CASE WHEN gap_raw <= 3600 THEN p_eid END AS next_purchase_id,
  CAST(CASE WHEN gap_raw <= 3600 THEN gap_raw END AS BIGINT) AS gap_secs
FROM clicks
""",
)
def q_asof_next_purchase_tolerance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FORWARD as-of join with a tolerance — for each click, the next
    purchase by the same user at-or-after it, matched only within one
    hour (pandas merge_asof(direction='forward', tolerance=...), the
    attribution-window primitive).  Same union+window plan as the
    backward as-of, with the ordering REVERSED (ts desc; purchases
    before clicks at equal ts → '>=' semantics; event_id completes the
    total order so equal-timestamp purchase ties resolve identically
    in both engines — DuckDB's native ASOF leaves that tie
    unspecified, so the oracle states this exact window instead).
    Out-of-tolerance matches null out AFTER the carry, one CASE.

    Scale shape: ONE shuffle on user_id for both sides together;
    tolerance filtering is a post-window projection, never a range
    join — the standard scalable as-of plan."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    )
    u = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").desc(), F.col("kind").desc(), F.col("event_id").desc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last(
            F.when(F.col("kind") == 1, F.col("ts")), ignorenulls=True
        ).over(w).alias("p_ts"),
        F.last(
            F.when(F.col("kind") == 1, F.col("event_id")), ignorenulls=True
        ).over(w).alias("p_eid"),
    )
    gap_raw = F.unix_timestamp("p_ts") - F.unix_timestamp("ts")
    return (
        carried.filter(F.col("kind") == 0)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", _TS_FMT_SPARK).alias("click_ts"),
            F.when(gap_raw <= 3600, F.col("p_eid")).alias("next_purchase_id"),
            F.when(gap_raw <= 3600, gap_raw).cast("bigint").alias("gap_secs"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket lift — co-purchased part pairs at order grain
# ---------------------------------------------------------------------------

_BASKET_MIN_SUPPORT = 3

_BASKET_ORACLE = f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM op),
sup AS (SELECT p, COUNT(*) AS c FROM op GROUP BY 1),
pairs AS (
  SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS n_both
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
),
f AS (SELECT * FROM pairs WHERE n_both >= {_BASKET_MIN_SUPPORT})
SELECT f.part_a, f.part_b, CAST(f.n_both AS BIGINT) AS n_both,
  CAST(sa.c AS BIGINT) AS n_a, CAST(sb.c AS BIGINT) AS n_b,
  CAST((SELECT n_orders FROM n) * f.n_both AS DOUBLE)
    / CAST(sa.c * sb.c AS DOUBLE) AS lift
FROM f
JOIN sup sa ON f.part_a = sa.p
JOIN sup sb ON f.part_b = sb.p
"""


@query("market_basket_lift", oracle=_BASKET_ORACLE)
def q_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association lift over co-purchased part pairs —
    the retail recommender primitive: lift = N·supp(a,b) /
    (supp(a)·supp(b)) > 1 means the parts co-occur more than chance.
    The pair census self-joins the DISTINCT (order, part) projection on
    the order key, so fan-out is bounded by items-per-order² (≤ 13²
    here — baskets, not catalogs, set the cost); a minimum pair
    support prunes before the lift math, and lift is one double
    division of exact integer counts.

    Scale shape: one shuffle on the order key for the pair generation
    (map-side combined census after), part-grain support tables
    broadcast back, the order count a 1-row scalar.  Never all-pairs
    over the catalog — the basket join IS the blocking."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n = li.agg(F.count_distinct("o").alias("n_orders"))
    sup = li.groupBy("p").agg(F.count("*").alias("c"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")),
        )
        .groupBy(
            F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b")
        )
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= _BASKET_MIN_SUPPORT)
    )
    sa = sup.select(F.col("p").alias("part_a"), F.col("c").alias("n_a"))
    sb = sup.select(F.col("p").alias("part_b"), F.col("c").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("n_both").cast("bigint").alias("n_both"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            (
                (F.col("n_orders") * F.col("n_both")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )
