"""Golden-record consolidation receipts: the CC stability probe must
hold (the unroll bound was sufficient), and on the fixture — where the
supervised FS rule measures precision 1.00 — every consolidated entity
must be a clean star: exactly ONE original plus its replica(s), keyed
by the original's custkey (a multiple of the dirty-replica modulus).
"""

from __future__ import annotations

from cybersecurity_ioc_etl_spark import operators as _ops
from cybersecurity_ioc_etl_spark.operators.linkage import _LNK_DIRTY_MOD


def test_golden_records_converged_and_star_shaped(spark, sf_dir):
    rows = _ops.QUERIES["linkage_golden_records"](
        spark, sf_dir
    ).collect()
    assert rows, "fixture must produce at least one matched entity"
    for r in rows:
        assert r.converged is True, "CC unroll bound overran"
        assert r.n_orig == 1, f"FP bridge merged entities: {r}"
        assert r.n_dirty >= 1 and r.n_members == r.n_orig + r.n_dirty
        assert r.entity_id % _LNK_DIRTY_MOD == 0, (
            "entity keyed off a non-replicated original"
        )


def test_incremental_linkage_fold_matches_recompute(spark, sf_dir):
    rows = _ops.QUERIES["incremental_linkage_maintenance"](
        spark, sf_dir
    ).collect()
    assert rows
    both = 0
    for r in rows:
        assert r.incr_consistent is True, "fold diverged from recompute"
        assert r.fold_converged is True and r.recompute_converged is True
        if r.n_base_dirty >= 1 and r.n_new_dirty >= 1:
            both += 1
            assert r.entity_id % 77 == 0, (
                "both-batch entity must be a common multiple of the "
                f"replica mods: {r}"
            )
    assert both >= 1, "fixture must produce at least one merged entity"
