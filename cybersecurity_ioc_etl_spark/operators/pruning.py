"""Scan-pruning and data-layout audits — the physical-design operators a
100 TB lakehouse lives or dies by, made measurable and oracle-checked.

Families:

- **Z-order layout** (`zorder_layout_audit`): the Morton-interleave
  clustering every table format exposes (Delta ``ZORDER BY``, Iceberg
  sort orders).  The audit assigns rows to files under a z-ordered vs a
  linear (time-sorted) layout and emits each layout's per-file min/max
  envelopes plus how many files a range probe on EACH dimension would
  touch — the exact quantity a format's file-skipping uses.  The writer
  twin lives in ``sinks/bucketed.py::write_zordered``.
- **Bloom-filter semi-join pruning** (`bloom_semijoin_audit`): the
  runtime row-group/shuffle filter Spark builds for selective joins
  (``spark.sql.optimizer.runtime.bloomFilter.enabled``), restated with
  deterministic md5-prefix hash functions so BOTH engines construct the
  bit-identical filter and the false-positive count — not just a bound —
  is hash-checked.  `stream_bloom_build` maintains the same filter from
  a dim STREAM by bit-set union of replay-safe per-batch partials.

Reference analog: none (the reference is a single-feed ETL script);
these are engine-provided scale operators per the builder's brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sinks.bucketed import zvalue
from ..sources.readers import load_table
from .dedup import _shingle_int, _SHINGLE_INT_SQL
from .registry import query

# --------------------------------------------------------------------------
# Z-order layout audit
# --------------------------------------------------------------------------

_Z_BITS = 16
_Z_FILES = 16
# a 1/16-of-domain range probe centred in the normalized [0, 65535] space
_PROBE_LO = 32768
_PROBE_HI = 36863

_Z_INTERLEAVE_SQL = " + ".join(
    f"(((xn >> {i}) & 1) << {2 * i}) + (((yn >> {i}) & 1) << {2 * i + 1})"
    for i in range(_Z_BITS)
)

_ZORDER_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey AS x,
    date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS y
  FROM orders WHERE o_orderdate IS NOT NULL AND o_custkey IS NOT NULL
),
b AS (
  SELECT MIN(x) AS xmin, MAX(x) AS xmax, MIN(y) AS ymin, MAX(y) AS ymax
  FROM base
),
n AS (
  SELECT o_orderkey,
    CAST(((x - xmin) * 65535) // GREATEST(xmax - xmin, 1) AS BIGINT) AS xn,
    CAST(((y - ymin) * 65535) // GREATEST(ymax - ymin, 1) AS BIGINT) AS yn
  FROM base CROSS JOIN b
),
z AS (SELECT o_orderkey, xn, yn, {_Z_INTERLEAVE_SQL} AS zv FROM n),
assigned AS (
  SELECT 'zorder' AS layout, xn, yn,
    ntile({_Z_FILES}) OVER (ORDER BY zv, o_orderkey) AS f
  FROM z
  UNION ALL
  SELECT 'linear' AS layout, xn, yn,
    ntile({_Z_FILES}) OVER (ORDER BY yn, o_orderkey) AS f
  FROM n
),
stats AS (
  SELECT layout, f, MIN(xn) AS xmn, MAX(xn) AS xmx,
    MIN(yn) AS ymn, MAX(yn) AS ymx
  FROM assigned GROUP BY 1, 2
)
SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
  CAST(SUM(xmx - xmn) AS BIGINT) AS sum_x_span,
  CAST(SUM(ymx - ymn) AS BIGINT) AS sum_y_span,
  CAST(SUM(CASE WHEN xmn <= {_PROBE_HI} AND xmx >= {_PROBE_LO}
           THEN 1 ELSE 0 END) AS BIGINT) AS files_hit_x,
  CAST(SUM(CASE WHEN ymn <= {_PROBE_HI} AND ymx >= {_PROBE_LO}
           THEN 1 ELSE 0 END) AS BIGINT) AS files_hit_y
FROM stats GROUP BY 1
"""


@query("zorder_layout_audit", oracle=_ZORDER_ORACLE)
def q_zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear file-layout audit on orders(custkey, orderdate):
    both dimensions normalize to a shared 16-bit domain, rows are
    assigned to 16 files either by Morton z-value or by the linear
    time order, and the output is each layout's file-skipping profile —
    summed min/max envelope spans plus the number of files a centred
    1/16-domain range probe touches PER dimension.  The z-order rows
    show bounded envelopes on BOTH dimensions (a probe on either key
    prunes to ~sqrt-law file counts) where the linear layout prunes
    only its sort dimension and must read every file for the other —
    the measurable reason Delta/Iceberg expose ZORDER clustering.

    Determinism: file assignment is ntile over the (zv, o_orderkey)
    total order — the cross-engine-checkable stand-in for
    repartitionByRange (whose sampled boundaries are not reproducible);
    the production writer is sinks/bucketed.py::write_zordered, which
    uses the same zvalue expression.  Normalization bounds are a 1-row
    broadcast (the min/max pass every layout optimizer needs anyway).

    Scale shape: two window sorts over (rows) — at 100 TB the audit
    runs per partition/day slice, and the real write replaces ntile
    with repartitionByRange on zv (sampling, fully parallel); the
    envelope statistics aggregate map-side to n_files rows."""
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull() & F.col("o_custkey").isNotNull())
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("x"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
            ).cast("bigint").alias("y"),
        )
    )
    b = base.agg(
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
    )
    n = base.crossJoin(F.broadcast(b)).select(
        "o_orderkey",
        F.expr("CAST(((x - xmin) * 65535) div GREATEST(xmax - xmin, 1) AS BIGINT)")
        .alias("xn"),
        F.expr("CAST(((y - ymin) * 65535) div GREATEST(ymax - ymin, 1) AS BIGINT)")
        .alias("yn"),
    )
    z = n.select(
        "o_orderkey",
        "xn",
        "yn",
        zvalue(F.col("xn"), F.col("yn"), bits=_Z_BITS).alias("zv"),
    )
    zf = z.select(
        F.lit("zorder").alias("layout"),
        "xn",
        "yn",
        F.ntile(_Z_FILES).over(Window.orderBy("zv", "o_orderkey")).alias("f"),
    )
    lf = n.select(
        F.lit("linear").alias("layout"),
        "xn",
        "yn",
        F.ntile(_Z_FILES).over(Window.orderBy("yn", "o_orderkey")).alias("f"),
    )
    stats = (
        zf.unionByName(lf)
        .groupBy("layout", "f")
        .agg(
            F.min("xn").alias("xmn"),
            F.max("xn").alias("xmx"),
            F.min("yn").alias("ymn"),
            F.max("yn").alias("ymx"),
        )
    )
    return stats.groupBy("layout").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum(F.col("xmx") - F.col("xmn")).cast("bigint").alias("sum_x_span"),
        F.sum(F.col("ymx") - F.col("ymn")).cast("bigint").alias("sum_y_span"),
        F.sum(
            F.when(
                (F.col("xmn") <= _PROBE_HI) & (F.col("xmx") >= _PROBE_LO), 1
            ).otherwise(0)
        ).cast("bigint").alias("files_hit_x"),
        F.sum(
            F.when(
                (F.col("ymn") <= _PROBE_HI) & (F.col("ymx") >= _PROBE_LO), 1
            ).otherwise(0)
        ).cast("bigint").alias("files_hit_y"),
    )


# --------------------------------------------------------------------------
# Bloom-filter semi-join pruning audit
# --------------------------------------------------------------------------

# m sized for the LARGEST fixture's dim cardinality (sf0.1: ~3k keys →
# k·n/m ≈ 0.36, fill ≈ 30%, fp ≈ 0.9%); production sizes m ≈ 10·n per
# the same law the audit makes measurable — an undersized filter
# saturates (fill → 1) and passes everything
_BLOOM_M = 32768  # bits
_BLOOM_K = 4  # hash functions

_BLOOM_HASH_SQL = (
    _SHINGLE_INT_SQL.format(
        x="concat(CAST({t} AS VARCHAR), ':', CAST({key} AS VARCHAR))"
    )
    + f" % {_BLOOM_M}"
)

_BLOOM_ORACLE = f"""
WITH dim AS (
  SELECT DISTINCT c_custkey AS key FROM customer
  WHERE c_mktsegment = 'BUILDING'
),
bits AS (
  SELECT DISTINCT {_BLOOM_HASH_SQL.format(t='r.t', key='d.key')} AS pos
  FROM dim d CROSS JOIN range({_BLOOM_K}) r(t)
),
fact AS (
  SELECT DISTINCT o_custkey AS key FROM orders WHERE o_custkey IS NOT NULL
),
probe AS (
  SELECT f.key, {_BLOOM_HASH_SQL.format(t='r.t', key='f.key')} AS pos
  FROM fact f CROSS JOIN range({_BLOOM_K}) r(t)
),
pass AS (
  SELECT p.key
  FROM probe p JOIN bits b ON p.pos = b.pos
  GROUP BY p.key HAVING COUNT(*) = {_BLOOM_K}
),
counts AS (
  SELECT
    (SELECT COUNT(*) FROM dim) AS n_dim_keys,
    (SELECT COUNT(*) FROM bits) AS bits_set,
    (SELECT COUNT(*) FROM fact) AS n_fact_keys,
    (SELECT COUNT(*) FROM pass) AS n_pass,
    (SELECT COUNT(*) FROM fact f JOIN dim d ON f.key = d.key) AS n_true
)
SELECT CAST(n_dim_keys AS BIGINT) AS n_dim_keys,
  CAST(bits_set AS BIGINT) AS bits_set,
  CAST(n_fact_keys AS BIGINT) AS n_fact_keys,
  CAST(n_pass AS BIGINT) AS n_pass,
  CAST(n_true AS BIGINT) AS n_true,
  CAST(n_pass - n_true AS BIGINT) AS n_false_pos,
  CAST(n_pass - n_true AS DOUBLE)
    / CAST(NULLIF(n_fact_keys - n_true, 0) AS DOUBLE) AS fp_rate
FROM counts
"""


def _bloom_positions(key, prefix_alias: str):
    """The k md5-prefix bit positions of one key — deterministic, so
    both engines set/probe identical bits."""
    return F.explode(
        F.array(
            *[
                _shingle_int(
                    F.concat(F.lit(str(t)), F.lit(":"), key.cast("string"))
                )
                % _BLOOM_M
                for t in range(_BLOOM_K)
            ]
        )
    ).alias(prefix_alias)


@query("bloom_semijoin_audit", oracle=_BLOOM_ORACLE)
def q_bloom_semijoin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, hash-checked end to end: the
    filter over the selective dim side (BUILDING-segment customers,
    m=4096 bits, k=4 deterministic md5-prefix hashes) is applied to the
    fact side's distinct keys, and the output counts exactly which keys
    pass, which are true members, and which are FALSE POSITIVES —
    the quantity Spark's runtime bloom pushdown
    (spark.sql.optimizer.runtime.bloomFilter.enabled) trades shuffle
    volume against.  Because the hash functions are the engine's
    portable md5 discipline, DuckDB constructs the bit-identical filter
    and the fp count itself is value-hashed (no bound boolean needed).

    Scale shape: the filter is built from the DIM side (tiny — its
    distinct positions broadcast, <= m rows); the fact side is touched
    once with a distinct-project + k-position explode; no fact shuffle
    carries non-passing rows past the filter.  This is the explicit
    form of what the AQE bloom join does inside the shuffle — the
    audit makes its selectivity measurable per dim predicate."""
    dim = bloom_dim(spark, sf_dir)
    bits = bloom_bits(dim)
    return bloom_audit_row(spark, sf_dir, dim, bits)


def bloom_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selective dim side the filter is built from."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
        .distinct()
    )


def bloom_bits(dim: DataFrame) -> DataFrame:
    """Distinct set bit positions of a key frame — the Bloom filter.
    Set-union mergeable: partial bit sets from any key batching union
    to the same filter (exercised by stream_bloom_build)."""
    return dim.select(_bloom_positions(F.col("key"), "pos")).distinct()


def bloom_audit_row(
    spark: SparkSession, sf_dir: str, dim: DataFrame, bits: DataFrame
) -> DataFrame:
    """The audit row: probe the fact side's distinct keys through a
    prebuilt bit set and count exact pass/true/false-positive."""
    fact = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull())
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    probe = fact.select("key", _bloom_positions(F.col("key"), "pos"))
    passed = (
        probe.join(F.broadcast(bits), "pos")
        .groupBy("key")
        .agg(F.count("*").alias("nmatch"))
        .filter(F.col("nmatch") == _BLOOM_K)
        .select("key")
    )
    n_dim = dim.agg(F.count("*").cast("bigint").alias("n_dim_keys"))
    n_bits = bits.agg(F.count("*").cast("bigint").alias("bits_set"))
    n_fact = fact.agg(F.count("*").cast("bigint").alias("n_fact_keys"))
    n_pass = passed.agg(F.count("*").cast("bigint").alias("n_pass"))
    n_true = (
        fact.join(F.broadcast(dim), "key", "left_semi")
        .agg(F.count("*").cast("bigint").alias("n_true"))
    )
    row = (
        n_dim.crossJoin(F.broadcast(n_bits))
        .crossJoin(F.broadcast(n_fact))
        .crossJoin(F.broadcast(n_pass))
        .crossJoin(F.broadcast(n_true))
    )
    return row.select(
        "n_dim_keys",
        "bits_set",
        "n_fact_keys",
        "n_pass",
        "n_true",
        (F.col("n_pass") - F.col("n_true")).cast("bigint").alias("n_false_pos"),
        (
            (F.col("n_pass") - F.col("n_true")).cast("double")
            / F.nullif(F.col("n_fact_keys") - F.col("n_true"), F.lit(0)).cast(
                "double"
            )
        ).alias("fp_rate"),
    )


@query("stream_bloom_build", oracle=_BLOOM_ORACLE)
def q_stream_bloom_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Bloom-filter construction — the third mergeable-sketch
    law exercised end to end (count-min merges by integer ADDITION,
    KMV by bottom-k set union, Bloom by bit-set UNION): each dim
    micro-batch writes its distinct bit positions as a replay-safe
    bid-keyed partial, the fold unions them into the full filter, and
    the audit row probed through the merged filter must hash-match the
    one-shot batch build exactly (same oracle as
    bloom_semijoin_audit).  This is how a long-lived runtime filter is
    maintained against a dim that arrives continuously — cost per
    trigger is the batch's distinct positions, never the dim."""
    from ..streaming.pipeline import run_stream_bloom

    return run_stream_bloom(spark, sf_dir)


# --------------------------------------------------------------------------
# Hilbert-curve layout audit — the locality-preserving alternative to Z
# --------------------------------------------------------------------------

_H_BITS = 8  # 256x256 grid: 8 unrolled rotation levels
_H_N = 1 << _H_BITS
_H_FILES = 16
# a 1/16-of-domain range probe centred in the normalized [0, 255] space
_H_PROBE_LO = 128
_H_PROBE_HI = 143


def _hilbert_level_exprs(i: int, xor_call: bool) -> tuple[str, str, str]:
    """One unrolled level of the standard xy2d walk (s = 2^(bits-1-i)):
    the (new_hx, new_hy, new_hd) expression strings over the previous
    level's hx/hy/hd.  ``xor_call`` picks DuckDB's xor(a,b) vs Spark
    SQL's ^ operator."""
    s = 1 << (_H_BITS - 1 - i)
    rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
    quad = (
        f"xor(3 * {rx}, {ry})" if xor_call else f"((3 * {rx}) ^ {ry})"
    )
    new_x = (
        f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
        f" THEN {_H_N - 1} - hy ELSE hy END) ELSE hx END"
    )
    new_y = (
        f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
        f" THEN {_H_N - 1} - hx ELSE hx END) ELSE hy END"
    )
    return new_x, new_y, f"hd + {s * s} * {quad}"


def _hilbert_level_sql(i: int) -> str:
    nx, ny, nd = _hilbert_level_exprs(i, xor_call=True)
    return (
        f"SELECT o_orderkey, xn, yn, {nx} AS hx, {ny} AS hy, {nd} AS hd"
    )


_HILBERT_CHAIN_SQL = ",\n".join(
    f"h{i + 1} AS MATERIALIZED ({_hilbert_level_sql(i)} FROM h{i})"
    for i in range(_H_BITS)
)

_Z8_INTERLEAVE_SQL = " + ".join(
    f"(((xn >> {i}) & 1) << {2 * i}) + (((yn >> {i}) & 1) << {2 * i + 1})"
    for i in range(_H_BITS)
)

_HILBERT_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey AS x,
    date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS y
  FROM orders WHERE o_orderdate IS NOT NULL AND o_custkey IS NOT NULL
),
b AS (
  SELECT MIN(x) AS xmin, MAX(x) AS xmax, MIN(y) AS ymin, MAX(y) AS ymax
  FROM base
),
n AS (
  SELECT o_orderkey,
    CAST(((x - xmin) * {_H_N - 1}) // GREATEST(xmax - xmin, 1) AS BIGINT) AS xn,
    CAST(((y - ymin) * {_H_N - 1}) // GREATEST(ymax - ymin, 1) AS BIGINT) AS yn
  FROM base CROSS JOIN b
),
h0 AS (SELECT o_orderkey, xn, yn, xn AS hx, yn AS hy, 0 AS hd FROM n),
{_HILBERT_CHAIN_SQL},
assigned AS (
  SELECT 'hilbert' AS layout, xn, yn,
    ntile({_H_FILES}) OVER (ORDER BY hd, o_orderkey) AS f
  FROM h{_H_BITS}
  UNION ALL
  SELECT 'zorder8' AS layout, xn, yn,
    ntile({_H_FILES}) OVER (ORDER BY {_Z8_INTERLEAVE_SQL}, o_orderkey) AS f
  FROM n
),
stats AS (
  SELECT layout, f, MIN(xn) AS xmn, MAX(xn) AS xmx,
    MIN(yn) AS ymn, MAX(yn) AS ymx
  FROM assigned GROUP BY 1, 2
)
SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
  CAST(SUM(xmx - xmn) AS BIGINT) AS sum_x_span,
  CAST(SUM(ymx - ymn) AS BIGINT) AS sum_y_span,
  CAST(SUM(CASE WHEN xmn <= {_H_PROBE_HI} AND xmx >= {_H_PROBE_LO}
           THEN 1 ELSE 0 END) AS BIGINT) AS files_hit_x,
  CAST(SUM(CASE WHEN ymn <= {_H_PROBE_HI} AND ymx >= {_H_PROBE_LO}
           THEN 1 ELSE 0 END) AS BIGINT) AS files_hit_y
FROM stats GROUP BY 1
"""


@query("hilbert_layout_audit", oracle=_HILBERT_ORACLE)
def q_hilbert_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve vs Z-order layout audit — the locality comparison
    behind Delta's liquid clustering and Iceberg's hilbert sort order:
    the Hilbert walk never makes the long diagonal jumps Morton
    interleave does, so consecutive file slices cover TIGHTER (x, y)
    envelopes and a range probe touches fewer files on both dimensions.
    Same audit shape as zorder_layout_audit, on the same
    orders(custkey, orderdate) pair normalized to an 8-bit grid:
    per-layout summed envelope spans + files hit by the centred
    1/16-domain probe per dimension.

    The Hilbert d-value is the standard xy2d walk (8 unrolled
    quadrant-digit + reflect/swap rotation levels) — pure integer
    CASE/mask arithmetic, bit-identical on both engines; the oracle
    unrolls the same 8 levels as MATERIALIZED CTEs (each level
    references its predecessor 5×, so plain CTEs would inline 5^8
    copies — the viterbi lesson at its sharpest).  Spark-side the 8
    levels chain as column expressions; at 8 bits the collapsed
    projection stays within codegen limits (16-bit Hilbert would want
    a mid-chain barrier).

    Scale shape: identical to the z-order audit — a 1-row broadcast of
    the normalization bounds, one window sort per layout (production
    swaps ntile for repartitionByRange on hd), map-side envelope
    stats."""
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull() & F.col("o_custkey").isNotNull())
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("x"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
            ).cast("bigint").alias("y"),
        )
    )
    b = base.agg(
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
    )
    n = base.crossJoin(F.broadcast(b)).select(
        "o_orderkey",
        F.expr(
            f"CAST(((x - xmin) * {_H_N - 1}) div GREATEST(xmax - xmin, 1)"
            " AS BIGINT)"
        ).alias("xn"),
        F.expr(
            f"CAST(((y - ymin) * {_H_N - 1}) div GREATEST(ymax - ymin, 1)"
            " AS BIGINT)"
        ).alias("yn"),
    )
    h = n.select(
        "o_orderkey",
        "xn",
        "yn",
        F.col("xn").alias("hx"),
        F.col("yn").alias("hy"),
        F.lit(0).cast("bigint").alias("hd"),
    )
    for i in range(_H_BITS):
        nx, ny, nd = _hilbert_level_exprs(i, xor_call=False)
        h = h.selectExpr(
            "o_orderkey",
            "xn",
            "yn",
            f"({nx}) AS hx",
            f"({ny}) AS hy",
            f"({nd}) AS hd",
        )
    zv8 = F.expr(_Z8_INTERLEAVE_SQL)
    hf = h.select(
        F.lit("hilbert").alias("layout"),
        "xn",
        "yn",
        F.ntile(_H_FILES).over(Window.orderBy("hd", "o_orderkey")).alias("f"),
    )
    zf = n.select(
        F.lit("zorder8").alias("layout"),
        "xn",
        "yn",
        F.ntile(_H_FILES).over(Window.orderBy(zv8, "o_orderkey")).alias("f"),
    )
    stats = (
        hf.unionByName(zf)
        .groupBy("layout", "f")
        .agg(
            F.min("xn").alias("xmn"),
            F.max("xn").alias("xmx"),
            F.min("yn").alias("ymn"),
            F.max("yn").alias("ymx"),
        )
    )
    return stats.groupBy("layout").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum(F.col("xmx") - F.col("xmn")).cast("bigint").alias("sum_x_span"),
        F.sum(F.col("ymx") - F.col("ymn")).cast("bigint").alias("sum_y_span"),
        F.sum(
            F.when(
                (F.col("xmn") <= _H_PROBE_HI) & (F.col("xmx") >= _H_PROBE_LO), 1
            ).otherwise(0)
        ).cast("bigint").alias("files_hit_x"),
        F.sum(
            F.when(
                (F.col("ymn") <= _H_PROBE_HI) & (F.col("ymx") >= _H_PROBE_LO), 1
            ).otherwise(0)
        ).cast("bigint").alias("files_hit_y"),
    )
