"""Record linkage (entity resolution) — the Fellegi-Sunter model over a
blocked candidate space, with a deterministic corrupted-replica fixture
so precision/recall are measurable against known ground truth.

Reference parity note: the reference ETL (h-isac.py / splunk2.py)
deduplicates IOCs by exact key only; probabilistic linkage is an
engine extension (the entity-resolution member of the dedup family —
exact dedup handles identical records, near-dup handles similar TEXT,
linkage handles similar STRUCTURED records across sources).

Fellegi & Sunter (JASA 1969): candidate pairs get an agreement vector
over comparison fields; each field contributes log(m/u) when it agrees
and log((1-m)/(1-u)) when it disagrees (m = P[agree | match],
u = P[agree | non-match]); the summed score classifies link /
non-link.  Here the m/u rates are CALIBRATED from the labeled fixture
(the supervised variant — production systems bootstrap them via EM;
the weight algebra is identical), and every statistic is exact-integer
or FLOOR-quantized-log so both engines walk bit-identical numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .dedup import _SHINGLE_INT_SQL, _shingle_int
from .registry import query

_LNK_DIRTY_MOD = 7  # dirty replica: custkey % 7 == 0
_LNK_FIELDS = ["name", "seg", "bal"]

_LINKAGE_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey AS k, c_name AS name, c_nationkey AS nat,
    CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS bal_i,
    c_mktsegment AS seg
  FROM customer
),
dirty AS MATERIALIZED (
  SELECT k, nat,
    CASE WHEN k % 5 = 0
      THEN name || '~' || CAST({_SHINGLE_INT_SQL.format(
          x="'n:' || CAST(k AS VARCHAR)")} % 10 AS VARCHAR)
      ELSE name END AS name,
    CASE WHEN k % 3 = 0
      THEN bal_i + 1 + {_SHINGLE_INT_SQL.format(
          x="'b:' || CAST(k AS VARCHAR)")} % 100
      ELSE bal_i END AS bal_i,
    CASE WHEN k % 4 = 0 THEN seg || 'X' ELSE seg END AS seg
  FROM cust WHERE k % {_LNK_DIRTY_MOD} = 0
),
pairs AS MATERIALIZED (
  SELECT o.k AS ok, d.k AS dk,
    CASE WHEN o.name = d.name THEN 1 ELSE 0 END AS a_name,
    CASE WHEN o.seg = d.seg THEN 1 ELSE 0 END AS a_seg,
    CASE WHEN o.bal_i = d.bal_i THEN 1 ELSE 0 END AS a_bal,
    CASE WHEN o.k = d.k THEN 1 ELSE 0 END AS is_match
  FROM cust o JOIN dirty d ON o.nat = d.nat
),
rates AS MATERIALIZED (
  SELECT
    COALESCE(CAST(SUM(is_match) AS BIGINT), 0) AS nm,
    COALESCE(CAST(SUM(1 - is_match) AS BIGINT), 0) AS nu,
    COALESCE(CAST(SUM(a_name * is_match) AS BIGINT), 0) AS m_name,
    COALESCE(CAST(SUM(a_name * (1 - is_match)) AS BIGINT), 0) AS u_name,
    COALESCE(CAST(SUM(a_seg * is_match) AS BIGINT), 0) AS m_seg,
    COALESCE(CAST(SUM(a_seg * (1 - is_match)) AS BIGINT), 0) AS u_seg,
    COALESCE(CAST(SUM(a_bal * is_match) AS BIGINT), 0) AS m_bal,
    COALESCE(CAST(SUM(a_bal * (1 - is_match)) AS BIGINT), 0) AS u_bal
  FROM pairs
),
wts AS MATERIALIZED (
  SELECT nm, nu,
    m_name, u_name, m_seg, u_seg, m_bal, u_bal,
    CAST(FLOOR(1000000000.0 * (ln(CAST(m_name + 1 AS DOUBLE)) - ln(CAST(nm + 2 AS DOUBLE))
      - ln(CAST(u_name + 1 AS DOUBLE)) + ln(CAST(nu + 2 AS DOUBLE)))) AS BIGINT) AS wa_name,
    CAST(FLOOR(1000000000.0 * (ln(CAST(nm - m_name + 1 AS DOUBLE)) - ln(CAST(nm + 2 AS DOUBLE))
      - ln(CAST(nu - u_name + 1 AS DOUBLE)) + ln(CAST(nu + 2 AS DOUBLE)))) AS BIGINT) AS wd_name,
    CAST(FLOOR(1000000000.0 * (ln(CAST(m_seg + 1 AS DOUBLE)) - ln(CAST(nm + 2 AS DOUBLE))
      - ln(CAST(u_seg + 1 AS DOUBLE)) + ln(CAST(nu + 2 AS DOUBLE)))) AS BIGINT) AS wa_seg,
    CAST(FLOOR(1000000000.0 * (ln(CAST(nm - m_seg + 1 AS DOUBLE)) - ln(CAST(nm + 2 AS DOUBLE))
      - ln(CAST(nu - u_seg + 1 AS DOUBLE)) + ln(CAST(nu + 2 AS DOUBLE)))) AS BIGINT) AS wd_seg,
    CAST(FLOOR(1000000000.0 * (ln(CAST(m_bal + 1 AS DOUBLE)) - ln(CAST(nm + 2 AS DOUBLE))
      - ln(CAST(u_bal + 1 AS DOUBLE)) + ln(CAST(nu + 2 AS DOUBLE)))) AS BIGINT) AS wa_bal,
    CAST(FLOOR(1000000000.0 * (ln(CAST(nm - m_bal + 1 AS DOUBLE)) - ln(CAST(nm + 2 AS DOUBLE))
      - ln(CAST(nu - u_bal + 1 AS DOUBLE)) + ln(CAST(nu + 2 AS DOUBLE)))) AS BIGINT) AS wd_bal
  FROM rates
),
scored AS (
  SELECT p.is_match,
    (CASE WHEN p.a_name = 1 THEN w.wa_name ELSE w.wd_name END
     + CASE WHEN p.a_seg = 1 THEN w.wa_seg ELSE w.wd_seg END
     + CASE WHEN p.a_bal = 1 THEN w.wa_bal ELSE w.wd_bal END) AS score
  FROM pairs p CROSS JOIN wts w
),
conf AS (
  SELECT
    COALESCE(CAST(SUM(CASE WHEN score > 0 AND is_match = 1 THEN 1 ELSE 0 END) AS BIGINT), 0) AS tp,
    COALESCE(CAST(SUM(CASE WHEN score > 0 AND is_match = 0 THEN 1 ELSE 0 END) AS BIGINT), 0) AS fp,
    COALESCE(CAST(SUM(CASE WHEN score <= 0 AND is_match = 1 THEN 1 ELSE 0 END) AS BIGINT), 0) AS fn
  FROM scored
),
fields AS (
  SELECT 'name' AS field, m_name AS m_num, u_name AS u_num,
    wa_name AS w_agree, wd_name AS w_disagree, nm, nu FROM wts
  UNION ALL
  SELECT 'seg', m_seg, u_seg, wa_seg, wd_seg, nm, nu FROM wts
  UNION ALL
  SELECT 'bal', m_bal, u_bal, wa_bal, wd_bal, nm, nu FROM wts
)
SELECT f.field,
  f.nm AS n_match_pairs, f.nu AS n_nonmatch_pairs,
  f.m_num, f.u_num, f.w_agree, f.w_disagree,
  c.tp, c.fp, c.fn,
  CAST(c.tp AS DOUBLE) / NULLIF(CAST(c.tp + c.fp AS DOUBLE), 0.0)
    AS precision,
  CAST(c.tp AS DOUBLE) / NULLIF(CAST(c.tp + c.fn AS DOUBLE), 0.0)
    AS recall
FROM fields f CROSS JOIN conf c
"""


@query("customer_record_linkage", oracle=_LINKAGE_ORACLE)
def q_customer_record_linkage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FELLEGI-SUNTER record linkage with a measurable ground truth —
    the entity-resolution member of the dedup family (exact dedup =
    identical records, near-dup = similar text, linkage = similar
    STRUCTURED records across sources): a DIRTY REPLICA of every 7th
    customer is synthesized with deterministic md5-driven corruptions
    (every 5th name gets a suffix, every 3rd balance a cent shift,
    every 4th segment a typo), candidate pairs BLOCK on the
    never-corrupted nation key, and each pair's agreement vector over
    (name, segment, balance-mantissa) scores with the classical
    log(m/u) / log((1-m)/(1-u)) weights — m/u rates CALIBRATED from
    the labeled pairs (exact integer censuses; the supervised variant
    of the EM bootstrap), each weight FLOOR-quantized from
    Laplace-smoothed exact-integer ln args (the DGA-score discipline),
    pair scores exact integer sums, and score > 0 the link rule.
    Emits one row per comparison field (m/u counts + both weights)
    with the global tp/fp/fn confusion and precision/recall repeated —
    so a weight regression, a blocking miss, or a classification
    change all break the hash.

    Scale shape: the dirty replica is a per-row map; blocking bounds
    candidates to Σ_block |orig|·|dirty| (never all-pairs — the
    blocking key is the lever, exactly as in the banded-LSH family);
    the rate/weight calibration is ONE map-side-combined global
    census; scoring re-rides the same blocked join with the 1-row
    weight frame broadcast.  At 100 TB linkage runs exactly like the
    PPJoin near-dup: block, score within blocks, never cartesian."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.round(F.col("c_acctbal") * 100.0).cast("bigint").alias("bal_i"),
        F.col("c_mktsegment").alias("seg"),
    )
    md = lambda p: _shingle_int(  # noqa: E731
        F.concat(F.lit(p), F.col("k").cast("string"))
    )
    dirty = c.filter(F.col("k") % _LNK_DIRTY_MOD == 0).select(
        "k",
        "nat",
        F.when(
            F.col("k") % 5 == 0,
            F.concat(
                F.col("name"), F.lit("~"), (md("n:") % 10).cast("string")
            ),
        )
        .otherwise(F.col("name"))
        .alias("name"),
        F.when(
            F.col("k") % 3 == 0, F.col("bal_i") + 1 + md("b:") % 100
        )
        .otherwise(F.col("bal_i"))
        .alias("bal_i"),
        F.when(F.col("k") % 4 == 0, F.concat(F.col("seg"), F.lit("X")))
        .otherwise(F.col("seg"))
        .alias("seg"),
    )
    ag = lambda a, b: F.when(F.col(a) == F.col(b), 1).otherwise(0)  # noqa: E731
    pairs = (
        c.alias("o")
        .join(dirty.alias("d"), F.col("o.nat") == F.col("d.nat"))
        .select(
            ag("o.name", "d.name").alias("a_name"),
            ag("o.seg", "d.seg").alias("a_seg"),
            ag("o.bal_i", "d.bal_i").alias("a_bal"),
            F.when(F.col("o.k") == F.col("d.k"), 1)
            .otherwise(0)
            .alias("is_match"),
        )
        .localCheckpoint(eager=True)
    )
    z = F.lit(0).cast("bigint")
    rates = pairs.agg(
        F.coalesce(F.sum("is_match").cast("bigint"), z).alias("nm"),
        F.coalesce(F.sum(1 - F.col("is_match")).cast("bigint"), z).alias(
            "nu"
        ),
        *[
            x
            for f in _LNK_FIELDS
            for x in (
                F.coalesce(
                    F.sum(F.col(f"a_{f}") * F.col("is_match")).cast(
                        "bigint"
                    ),
                    z,
                ).alias(f"m_{f}"),
                F.coalesce(
                    F.sum(
                        F.col(f"a_{f}") * (1 - F.col("is_match"))
                    ).cast("bigint"),
                    z,
                ).alias(f"u_{f}"),
            )
        ],
    )
    lnq = lambda col: F.log(col.cast("double"))  # noqa: E731
    wcols = []
    for f in _LNK_FIELDS:
        wa = F.floor(
            F.lit(1e9)
            * (
                lnq(F.col(f"m_{f}") + 1)
                - lnq(F.col("nm") + 2)
                - lnq(F.col(f"u_{f}") + 1)
                + lnq(F.col("nu") + 2)
            )
        ).cast("bigint")
        wd = F.floor(
            F.lit(1e9)
            * (
                lnq(F.col("nm") - F.col(f"m_{f}") + 1)
                - lnq(F.col("nm") + 2)
                - lnq(F.col("nu") - F.col(f"u_{f}") + 1)
                + lnq(F.col("nu") + 2)
            )
        ).cast("bigint")
        wcols += [wa.alias(f"wa_{f}"), wd.alias(f"wd_{f}")]
    wts = rates.select("*", *wcols).localCheckpoint(eager=True)
    score = None
    for f in _LNK_FIELDS:
        term = F.when(
            F.col(f"a_{f}") == 1, F.col(f"wa_{f}")
        ).otherwise(F.col(f"wd_{f}"))
        score = term if score is None else score + term
    conf = (
        pairs.crossJoin(F.broadcast(wts))
        .select("is_match", score.alias("score"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("score") > 0) & (F.col("is_match") == 1),
                        1,
                    ).otherwise(0)
                ).cast("bigint"),
                z,
            ).alias("tp"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("score") > 0) & (F.col("is_match") == 0),
                        1,
                    ).otherwise(0)
                ).cast("bigint"),
                z,
            ).alias("fp"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("score") <= 0) & (F.col("is_match") == 1),
                        1,
                    ).otherwise(0)
                ).cast("bigint"),
                z,
            ).alias("fn"),
        )
    )
    frows = None
    for f in _LNK_FIELDS:
        r = wts.select(
            F.lit(f).alias("field"),
            F.col("nm").alias("n_match_pairs"),
            F.col("nu").alias("n_nonmatch_pairs"),
            F.col(f"m_{f}").alias("m_num"),
            F.col(f"u_{f}").alias("u_num"),
            F.col(f"wa_{f}").alias("w_agree"),
            F.col(f"wd_{f}").alias("w_disagree"),
        )
        frows = r if frows is None else frows.unionByName(r)
    return frows.crossJoin(F.broadcast(conf)).select(
        "field",
        "n_match_pairs",
        "n_nonmatch_pairs",
        "m_num",
        "u_num",
        "w_agree",
        "w_disagree",
        "tp",
        "fp",
        "fn",
        (
            F.col("tp").cast("double")
            / F.nullif((F.col("tp") + F.col("fp")).cast("double"), F.lit(0.0))
        ).alias("precision"),
        (
            F.col("tp").cast("double")
            / F.nullif((F.col("tp") + F.col("fn")).cast("double"), F.lit(0.0))
        ).alias("recall"),
    )
