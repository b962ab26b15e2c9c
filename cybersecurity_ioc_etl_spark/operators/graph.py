"""Graph analytics on DataFrames — PageRank as the second iterative
operator (dedup.connected_components is the first).

The graph is derived from the data: an edge supplier-nation → customer-
nation exists when any lineitem ships between them (the distinct pair
set of operators.relational_ext.q_nation_trade_flows).  PageRank then
ranks nations by trade in-flow centrality.

Determinism contract for an ITERATIVE float algorithm: ranks live as
integer mantissas (scale 1e7); each round's update is

    ri' = round(0.15 * 1e7) + (85 * Σ_in (ri div out_deg)) div 100

— integer division for the per-neighbor contribution split and for the
damping multiply, exact integer sums in between, so every round's vector
is bit-identical in Spark and DuckDB (the oracle unrolls the same three
rounds as CTEs).  Dangling-node mass is deliberately dropped (the
simple-PageRank variant) — documented, identical both sides.

Scale shape: ranks and degrees are (node, int) pairs — at web scale this
iterates a join of edges (shuffled by src) against the rank table,
re-using the same partitioning every round; per-round results
localCheckpoint to truncate lineage exactly like connected_components.
The fixture graph is small, but the loop body is the 100 TB plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import query

_N_ITER = 3
_EDGES_SQL = """
  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE l.l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
"""

_ITER_SQL = """
r{next} AS (
  SELECT n.id,
    CAST(1500000 + (85 * COALESCE(SUM(r.ri // d.d), 0)) // 100 AS BIGINT) AS ri
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.id
  LEFT JOIN r{cur} r ON r.id = e.src
  LEFT JOIN deg d ON d.src = e.src
  GROUP BY n.id
)"""

_PAGERANK_ORACLE = f"""
WITH edges AS ({_EDGES_SQL}),
nodes AS (SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst FROM edges),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
r0 AS (
  SELECT id,
    CAST(ROUND(10000000.0 / (SELECT COUNT(*) FROM nodes)) AS BIGINT) AS ri
  FROM nodes
),{",".join(_ITER_SQL.format(next=i + 1, cur=i) for i in range(_N_ITER))}
SELECT id AS nation_id,
  CAST(ri AS DOUBLE) / 10000000.0 AS pagerank
FROM r{_N_ITER}
"""


def pagerank(
    edges: DataFrame, n_iter: int = _N_ITER, nodes: DataFrame | None = None
) -> DataFrame:
    """Fixed-iteration simple PageRank over `edges` (src, dst).  Returns
    (id, ri) with ri the integer-mantissa rank after `n_iter` rounds.
    `nodes` defaults to every endpoint of `edges`."""
    # materialize the edge set ONCE — nodes, degrees, and every round's
    # join all reuse the checkpointed leaf instead of re-running the
    # (possibly expensive) edge-derivation plan
    edges = edges.localCheckpoint(eager=True)
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    nodes = nodes.localCheckpoint(eager=True)
    n_nodes = nodes.count()  # scalar bound for the init constant only
    if n_nodes == 0:
        return nodes.select("id", F.lit(0).cast("bigint").alias("ri"))
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    # half-away-from-zero to match DuckDB ROUND (Python round() is
    # banker's: 1e7/256 = 39062.5 would seed 39062 vs the oracle's 39063)
    ranks = nodes.select(
        "id", F.lit(int(1e7 / n_nodes + 0.5)).cast("bigint").alias("ri")
    )
    for it in range(n_iter):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["id"])
            .join(deg, "src")
            .select("dst", F.expr("ri div d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = nodes.join(contrib, nodes["id"] == contrib["dst"], "left").select(
            "id",
            (
                F.lit(1500000).cast("bigint")
                + F.expr("85 * coalesce(csum, 0) div 100")
            ).alias("ri"),
        )
        # truncate lineage every OTHER round (same amortization as
        # connected_components): plan depth stays bounded while half the
        # materialization jobs disappear
        if it % 2 == 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


@query("pagerank_nations", oracle=_PAGERANK_ORACLE)
def q_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation trade graph, 3 exact-integer rounds (see
    module docstring for the determinism contract and the 100 TB loop
    shape)."""
    # one-quarter trade window: the shipdate predicate reaches the
    # parquet scan (PushedFilters) and bounds the edge-derivation join
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate").between("1995-01-01", "1995-03-31")
        )
        .select("l_orderkey", "l_suppkey")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .distinct()
    )
    ranks = pagerank(edges)
    return ranks.select(
        F.col("id").alias("nation_id"),
        (F.col("ri").cast("double") / F.lit(1e7)).alias("pagerank"),
    )
