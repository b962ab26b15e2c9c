"""Structural invariants for the round-4 corpus ops — properties the
oracle hash can't state directly (permutation-ness, monotonicity,
partition algebra)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_shard_shuffle_is_a_permutation(spark, sf_dir):
    """Every document appears exactly once, and within each shard the
    positions are a contiguous 1..n_shard run — i.e. the output really
    is a partitioned permutation of the corpus, not a sample."""
    out = QUERIES["corpus_shard_shuffle"](spark, sf_dir).cache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    per_shard = out.groupBy("shard").agg(
        F.count("*").alias("c"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("d"),
    )
    for r in per_shard.collect():
        assert (r["lo"], r["hi"], r["d"]) == (1, r["c"], r["c"]), r
    out.unpersist()


def test_dsir_targets_score_at_least_background(spark, sf_dir):
    """The selected top-20 must be sorted non-increasing, every
    importance positive, and the target language over-represented
    relative to its corpus share (the whole point of the reweighting)."""
    rows = QUERIES["dsir_importance_sample"](spark, sf_dir).collect()
    imps = [r["importance"] for r in rows]
    assert all(a >= b for a, b in zip(imps, imps[1:]))
    assert all(i > 0 for i in imps)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    en_share = (
        docs.filter(F.col("lang") == "en").count() / docs.count()
    )
    sel_share = sum(1 for r in rows if r["lang"] == "en") / len(rows)
    assert sel_share > en_share, (sel_share, en_share)


def test_semdedup_audit_partitions_members(spark, sf_dir):
    """kept + dropped == members per cluster, and the cluster member
    total equals the (capped) corpus — no vector lost or double-counted
    by the prune."""
    rows = QUERIES["semdedup_prune"](spark, sf_dir).collect()
    assert rows, "fixture must produce clusters"
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_members"], r
        assert 0 <= r["n_dropped"] <= r["n_members"], r
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    capped = e.filter(F.col("vec_id") < 1000).count()
    assert sum(r["n_members"] for r in rows) == capped


def test_lang_classifier_covers_every_heldout_doc_once(spark, sf_dir):
    """Confusion counts must total exactly the held-out split (every
    test doc classified once), and predictions only ever name classes
    that exist in the training data."""
    from cybersecurity_ioc_etl_spark.operators.sampling import hash_bucket

    rows = QUERIES["lang_classifier_confusion"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_test = docs.filter(hash_bucket(F.col("doc_id")) >= 80).count()
    assert sum(r["n_docs"] for r in rows) == n_test
    train_langs = {
        r["lang"]
        for r in docs.filter(hash_bucket(F.col("doc_id")) < 80)
        .select("lang")
        .distinct()
        .collect()
    }
    assert {r["pred_lang"] for r in rows} <= train_langs
