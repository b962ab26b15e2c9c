"""Exactly-once resume for the model-serving stream: a second run with
the SAME checkpoint must score only files that arrived after the first
run — no document re-predicted, none skipped.  This is the serving-path
twin of test_streaming.py::test_ioc_stream_checkpoint_resume, with the
real trained grid + classify_docs inside foreachBatch."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.classify import (
    classify_docs,
    train_weight_grid,
)
from cybersecurity_ioc_etl_spark.operators.sampling import hash_bucket
from cybersecurity_ioc_etl_spark.sources.readers import load_table


def _drain(spark, schema, grid, src, out_dir, ckpt):
    def score(batch, _bid):
        if batch.isEmpty():
            return
        classify_docs(batch, grid).write.mode("append").parquet(out_dir)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(score)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_classify_resumes_exactly_once(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    grid = train_weight_grid(spark, d.filter(hash_bucket(F.col("doc_id")) < 80))
    test = d.filter(hash_bucket(F.col("doc_id")) >= 80).select(
        "doc_id", "lang", "text"
    )
    half_a = test.filter(F.col("doc_id") % 2 == 0)
    half_b = test.filter(F.col("doc_id") % 2 == 1)

    src = tempfile.mkdtemp(prefix="clf_resume_src_")
    out_dir = tempfile.mkdtemp(prefix="clf_resume_out_")
    ckpt = tempfile.mkdtemp(prefix="clf_resume_ckpt_")

    # run 1: only half A has arrived
    half_a.coalesce(1).write.mode("append").parquet(src)
    _drain(spark, test.schema, grid, src, out_dir, ckpt)
    n_after_a = spark.read.parquet(out_dir).count()
    assert n_after_a == half_a.count()

    # run 2, same checkpoint: half B arrives — ONLY it may be scored
    half_b.coalesce(1).write.mode("append").parquet(src)
    _drain(spark, test.schema, grid, src, out_dir, ckpt)

    scored = spark.read.parquet(out_dir)
    assert scored.count() == test.count()  # nothing skipped...
    assert scored.select("doc_id").distinct().count() == test.count()  # ...or doubled
    # and the resumed predictions are the batch predictions exactly
    batch_pred = classify_docs(test, grid)
    assert (
        scored.exceptAll(batch_pred).count() == 0
        and batch_pred.exceptAll(scored).count() == 0
    )
