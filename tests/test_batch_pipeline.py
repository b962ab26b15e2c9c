"""End-to-end batch pipeline (the reference's `h-isac.py main()` as one
engine job — cybersecurity_ioc_etl_spark/batch.py)."""

from __future__ import annotations

import glob

from cybersecurity_ioc_etl_spark.batch import run_hisac_batch


def test_csv_fork_writes_and_counts(spark, sf_dir, tmp_path):
    out = str(tmp_path / "run1")
    m = run_hisac_batch(spark, sf_dir, out)
    assert m["n_iocs"] > 0 and m["n_messages"] > 0
    assert set(m) >= {"ip", "hash", "url", "email"}

    back = spark.read.option("header", True).csv(f"{out}/iocs_csv")
    assert back.count() == m["n_iocs"]
    # metrics table accumulated this run
    mt = spark.read.parquet(f"{out}/metrics")
    assert mt.count() == 4  # one row per type


def test_kv_fork_batches_without_csv(spark, sf_dir, tmp_path):
    """The reference crashed when --splunk was omitted (h-isac.py:210);
    here both forks work and the KV fork posts every row exactly once."""
    import json

    out = str(tmp_path / "run2")
    posted: list[str] = []

    class Collect:
        """Executor-side collector via local filesystem (local-mode test)."""
        def __init__(self, d): self.d = d
        def __call__(self, batch):
            import os, uuid
            with open(os.path.join(self.d, uuid.uuid4().hex), "w") as f:
                f.write("\n".join(batch))

    bdir = tmp_path / "batches"; bdir.mkdir()
    m = run_hisac_batch(spark, sf_dir, out, poster=Collect(str(bdir)))
    rows = []
    for p in glob.glob(f"{bdir}/*"):
        rows += open(p).read().splitlines()
    assert len(rows) == m["n_iocs"]
    assert json.loads(rows[0])["platform"] == "H-ISAC"
    # CSV fork was not taken
    assert not glob.glob(f"{out}/iocs_csv/*")
