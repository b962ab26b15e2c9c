"""Property-based tests (SURVEY.md §5.4, Hypothesis): defang→extract→
refang round-trips, refang idempotence, and classification totality.

Each example batches many generated strings into ONE Spark job (a per-
string job would dominate runtime); max_examples stays small because
every example already covers dozens of generated inputs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.functions import ioc as K

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

octet = st.integers(0, 255)
dot = st.sampled_from([".", "[.]"])
word = st.text("abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)


@st.composite
def defanged_ip(draw):
    parts = [str(draw(octet)) for _ in range(4)]
    seps = [draw(dot) for _ in range(3)]
    plain = ".".join(parts)
    fanged = parts[0] + seps[0] + parts[1] + seps[1] + parts[2] + seps[2] + parts[3]
    return fanged, plain


@st.composite
def defanged_url(draw):
    scheme = draw(st.sampled_from(["hxxp", "hxxps", "http", "https"]))
    host = [draw(word) for _ in range(draw(st.integers(2, 4)))]
    seps = [draw(dot) for _ in range(len(host) - 1)]
    fanged_host = host[0] + "".join(s + h for s, h in zip(seps, host[1:]))
    plain_host = ".".join(host)
    plain_scheme = "http" + ("s" if scheme.endswith("s") else "")
    return f"{scheme}://{fanged_host}/x", f"{plain_scheme}://{plain_host}/x"


def _apply(spark, values, colfn):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r.out for r in df.select(colfn(F.col("s")).alias("out")).collect()]


@given(st.lists(defanged_ip(), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_refang_recovers_plain_ip(spark, pairs):
    fanged = [f for f, _ in pairs]
    expected = [p for _, p in pairs]
    assert _apply(spark, fanged, K.refang) == expected


@given(st.lists(defanged_url(), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_refang_recovers_plain_url(spark, pairs):
    fanged = [f for f, _ in pairs]
    expected = [p for _, p in pairs]
    assert _apply(spark, fanged, K.refang) == expected


@given(st.lists(st.one_of(defanged_ip(), defanged_url()), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_refang_idempotent(spark, pairs):
    once = [p for _, p in pairs]
    assert _apply(spark, once, K.refang) == once


@given(st.lists(defanged_ip(), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_extraction_finds_embedded_defanged_ip(spark, pairs):
    """A defanged IP embedded in prose must be extracted and refanged —
    the core h-isac.py contract, over generated inputs."""
    bodies = [f"alert: contact {f} for details" for f, _ in pairs]
    expected = [[p] for _, p in pairs]
    got = _apply(spark, bodies, lambda c: K.extract_iocs(c)["ip"])
    assert got == expected


@given(
    st.lists(
        st.text(
            "abcdefghijklmnopqrstuvwxyzABCDEF0123456789./:@-", min_size=1, max_size=40
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_classification_is_total(spark, values):
    """classify_ioc never nulls and never leaves the 4-value enum,
    whatever the input (firehose.py:82-103 decision tree)."""
    got = _apply(spark, values, K.classify_ioc)
    assert all(g in {"ip", "url", "hash", "unmatched"} for g in got)


def test_aggregation_bit_identical_across_partitionings(spark, sf_dir):
    """The integer-mantissa contract's core claim: results are
    bit-identical regardless of partitioning (summation order).  Run the
    money-heaviest aggregation under three shuffle-partition settings
    and require byte-equal results."""
    import __spark_entry__ as m

    def run():
        rows = m.queries()["pricing_summary"](spark, sf_dir).collect()
        return sorted(tuple(r) for r in rows)

    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = []
        for n in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.append(run())
        assert results[0] == results[1] == results[2]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)


def test_md5_prefix_int_matches_python_reference(spark):
    """The engine's portable-hash contract: Spark's
    conv(substring(md5(x),1,8),16,10) must equal Python's
    int(md5(x).hexdigest()[:8], 16) for arbitrary utf-8 keys — this is
    what makes sampling/splits/dedup reproducible across engines."""
    import hashlib

    from pyspark.sql import functions as F

    from cybersecurity_ioc_etl_spark.operators.dedup import _shingle_int

    keys = ["", "a", "doc-42", "ünïcode-ß", "\x01sep", " spaces  ", "0" * 64,
            "the quick brown fox", "123456789", "\U0001f600emoji"]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r.k: r.h
        for r in df.select("k", _shingle_int(F.col("k")).alias("h")).collect()
    }
    for k in keys:
        want = int(hashlib.md5(k.encode("utf-8")).hexdigest()[:8], 16)
        assert got[k] == want, k


def test_zvalue_matches_python_reference_and_is_injective(spark):
    """Morton interleave: Spark's bitwise column expression must equal
    the Python bit-twiddling reference for arbitrary 16-bit pairs, and
    distinct pairs must map to distinct z-values (injectivity is what
    makes the z-curve a total order over the grid)."""
    import random

    from cybersecurity_ioc_etl_spark.sinks.bucketed import zvalue

    rng = random.Random(7)
    pts = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
    pts += [(0, 0), (65535, 65535), (0, 65535), (65535, 0), (1, 2), (2, 1)]

    def ref(x: int, y: int) -> int:
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pts, ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zvalue(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == ref(x, y), (x, y)
    assert len(set(got.values())) == len(set(pts))


ascii_text = st.text(
    st.characters(min_codepoint=0x20, max_codepoint=0x7E), min_size=0, max_size=40
)


@given(values=st.lists(ascii_text, min_size=1, max_size=24))
@settings(**_SETTINGS)
def test_fingerprint_case_and_whitespace_invariant_for_ascii(spark, values):
    """The dedup fingerprint must be invariant to ASCII case and to
    whitespace-run width — and the ASCII translate casefold must agree
    with full lower() wherever the input is pure ASCII (the unicode
    probe pins the non-ASCII side)."""
    from cybersecurity_ioc_etl_spark.operators.dedup import fingerprint

    rows = [(v, v.swapcase(), v.replace(" ", "   ")) for v in values]
    df = spark.createDataFrame(rows, "a: string, b: string, c: string")
    out = df.select(
        fingerprint(F.col("a")).alias("fa"),
        fingerprint(F.col("b")).alias("fb"),
        fingerprint(F.col("c")).alias("fc"),
        fingerprint(F.lower(F.col("a"))).alias("fl"),
    ).collect()
    for r in out:
        assert r["fa"] == r["fb"] == r["fc"] == r["fl"]


@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=400),
    st.integers(2, 6),
    st.integers(2, 32),
)
@settings(max_examples=200, deadline=None)
def test_quantile_summary_merge_rank_bound_holds_for_any_input(
    values, parts, stride
):
    """The mergeable-summary LAW behind quantile_summary_merge, pinned
    model-side for ARBITRARY inputs (the fixture run only proves the
    bound held once): rank-sample every `stride`-th rank + tail per
    part, merge by weighted union, estimate the p-quantile as the
    first value whose cumulative weight reaches ceil(p·N) — then the
    estimate's true-rank interval deviates from the target by at most
    parts × stride.  (The Spark/DuckDB pair is hash-checked against
    each other; this pins the guarantee both encode.)"""
    import math

    n = len(values)
    # deterministic round-robin part assignment (the engine uses
    # event_id % parts; any disjoint cover obeys the law)
    per_part = [sorted(values[p::parts]) for p in range(parts)]
    merged = []  # (value, weight)
    for rows in per_part:
        prev = 0
        for rank in range(1, len(rows) + 1):
            if rank % stride == 0 or rank == len(rows):
                merged.append((rows[rank - 1], rank - prev))
                prev = rank
    merged.sort()
    total = sum(w for _, w in merged)
    assert total == n
    all_sorted = sorted(values)
    for p_num, p_den in ((1, 2), (9, 10)):
        target = math.ceil(n * p_num / p_den)
        cum = 0
        est = None
        for v, w in merged:
            cum += w
            if cum >= target:
                est = v
                break
        assert est is not None
        lt = sum(1 for v in all_sorted if v < est)
        le = sum(1 for v in all_sorted if v <= est)
        # true-rank interval of est is [lt+1, le]; its distance from
        # the target rank is the merge error
        err = max(0, target - le, (lt + 1) - target)
        assert err <= parts * stride, (err, parts, stride, n)
