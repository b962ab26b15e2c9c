"""Graph operator unit tests: PageRank semantics pinned on a
hand-computed path graph (the oracle checks the derived trade graph;
this pins the update rule itself), plus k-means assignment invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.graph import pagerank


def test_pagerank_path_graph_exact_integers(spark):
    """Path 1→2→3, three rounds, damping 0.85, init round(1e7/3).

    Hand-rolled integer recurrence ri' = 1500000 + (85·Σ(ri div deg)) div 100:
      r1 = (1500000, 4333333, 4333333)
      r2 = (1500000, 2775000, 5183333)
      r3 = (1500000, 2775000, 3858750)
    """
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    got = {r.id: r.ri for r in pagerank(edges, n_iter=3).collect()}
    assert got == {1: 1500000, 2: 2775000, 3: 3858750}


def test_pagerank_dangling_mass_drops_but_floor_holds(spark):
    """Simple-PageRank semantics: a sink node keeps receiving, sources
    settle at the 0.15 floor, and no rank is ever below the floor."""
    edges = spark.createDataFrame([(1, 3), (2, 3)], ["src", "dst"])
    got = {r.id: r.ri for r in pagerank(edges, n_iter=4).collect()}
    assert got[1] == got[2] == 1500000
    assert got[3] > 1500000
    assert all(v >= 1500000 for v in got.values())


def test_pagerank_empty_edges_returns_empty(spark):
    """Zero nodes must not raise ZeroDivisionError seeding the ranks."""
    edges = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    assert pagerank(edges, n_iter=2).count() == 0


def test_pagerank_seed_rounds_half_away_from_zero(spark):
    """DuckDB ROUND is half-away-from-zero; Python round() is banker's.
    16 nodes seed 625000 either way, but the seeding expression must be
    int(1e7/n + 0.5): for n=16 both agree (sanity), and the hand case
    n=3 gives 3333333 (truncation would give 3333333 too — the .5 cases
    like n=256 → 39063 are pinned arithmetically here)."""
    assert int(1e7 / 256 + 0.5) == 39063  # round() would give 39062
    edges = spark.createDataFrame(
        [(i, (i + 1) % 16) for i in range(16)], ["src", "dst"]
    )
    got = {r.id: r.ri for r in pagerank(edges, n_iter=0).collect()}
    assert set(got.values()) == {625000}


def test_kmeans_partitions_every_vector_once(spark, sf_dir):
    """Lloyd assignment must be a partition of the corpus: member counts
    sum to the vector count, every cluster id is one of the k seeds."""
    import __spark_entry__ as entrymod

    out = entrymod.queries()["kmeans_lloyd_step"](spark, sf_dir).collect()
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_members for r in out) == n_vec
    assert {r.cid for r in out} <= set(range(8))
    assert all(r.new_centroid_norm > 0 for r in out)


def test_kmeans_two_rounds_partitions_and_iterates(spark, sf_dir):
    """Round-2 assignment must still partition the corpus, and at least
    one vector must actually move clusters between rounds (otherwise the
    composition test proves nothing)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    r1 = {r.cid: r.n_members for r in qs["kmeans_lloyd_step"](spark, sf_dir).collect()}
    r2 = {r.cid: r.n_members for r in qs["kmeans_two_rounds"](spark, sf_dir).collect()}
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r2.values()) == n_vec
    assert set(r2) <= set(range(8))
    assert r1 != r2  # the update step moved at least one vector
