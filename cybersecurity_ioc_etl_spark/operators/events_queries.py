"""Event-stream analytics over the `events` fixture — the batch-equivalent
forms of the streaming operators in SURVEY.md §2.9 (tumbling windows,
sessionization, JSON projection).  The true Structured Streaming pipeline
lives in `streaming/`; `stream_hourly_counts` below actually *runs* it
(Trigger.AvailableNow → memory sink) and is checked against the same
DuckDB oracle as the batch form — the strongest streaming-parity evidence
the driver's harness can record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table
from .registry import query

_HOURLY_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(ROUND(value * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_value
FROM events
GROUP BY 1, 2
"""


def _value_sum() -> F.Column:
    """Exact integer-mantissa sum of `value` (see relational.py contract)."""
    vi = F.round(F.col("value") * F.lit(10000.0)).cast("bigint")
    return (F.sum(vi.cast("decimal(38,0)")).cast("double") / 1e4).alias("total_value")


@query("events_hourly", oracle=_HOURLY_ORACLE)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregation, batch form (ST-window family)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), _value_sum())
    )


@query("stream_hourly_counts", oracle=_HOURLY_ORACLE)
def q_stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME hourly aggregation executed through Structured Streaming:
    file source → window() agg → complete-mode memory sink, drained with
    Trigger.AvailableNow (the engine's replacement for the reference's
    resume-from-last_run batch loop, h-isac.py:149-153 / SURVEY ST2)."""
    from ..streaming.pipeline import run_hourly_counts_stream

    return run_hourly_counts_stream(spark, sf_dir)


@query(
    "stream_dedup_unique_users",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_unique_users
FROM events GROUP BY event_type
""",
)
def q_stream_dedup_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (LLM-pipeline + ST family): the fixture is
    split into micro-batches and run through
    ``dropDuplicatesWithinWatermark('user_id','event_type')`` with an
    append-mode sink — keyed state drops duplicates across batch
    boundaries.  Counting the emitted rows per event_type must equal the
    batch COUNT(DISTINCT user_id): the streaming dedup's keep-set IS the
    distinct key set, however arrival order shuffled the micro-batches.
    See streaming/pipeline.py::run_dedup_stream for the watermark/state
    story at scale."""
    from ..streaming.pipeline import run_dedup_stream

    deduped = run_dedup_stream(spark, sf_dir)
    return deduped.groupBy("event_type").agg(
        F.count("*").alias("n_unique_users")
    )


# ---------------------------------------------------------------------------
# Streaming dedup WITH state eviction — dropDuplicatesWithinWatermark under
# a tight delay, the eviction boundary pinned empirically
# ---------------------------------------------------------------------------

_EVICT_N = 6  # staged micro-batches (event-time-range file split)
_EVICT_D_US = 43_200_000_000  # 12-hour watermark delay, microseconds


def _evict_oracle() -> str:
    """Unrolled per-user dedup-state chain over the N staged batches.

    Empirically pinned semantics (probed via recentProgress + state
    numRowsTotal, the CLAUDE.md watermark discipline):
    - eviction at the END of batch k uses the watermark IN EFFECT
      DURING batch k (wm_{k-1}, from batch k-1's max event time) — the
      new wm_k only takes effect in batch k+1, so state from an
      emission at batch j survives INTO batch k iff exp_j > wm_{k-2}
      (one batch later than the naive model; observed as state
      numRows 50→50→0 under a 1-day delay where the naive model
      predicts eviction a batch earlier);
    - a duplicate probing EXPIRED-but-unevicted state still DROPS
      (key-existence check, no expiry re-check at probe time);
    - expiry anchors at the FIRST (emitted) event: ts + delay, NOT
      extended by dropped duplicates (under a 1-day delay all 50 users
      re-emitted at batch 3 — the extension model predicts most drop);
    - watermark arithmetic is at Spark's millisecond event-time-stats
      grain: wm_k = floor_ms(max staged ts of batches <= k) - delay.
    """
    n, d = _EVICT_N, _EVICT_D_US
    cols = ",\n    ".join(
        f"MAX(CASE WHEN b={k} THEN epoch_us(ts) END) AS t{k}"
        for k in range(n)
    )
    wms = ",\n    ".join(
        f"(SELECT MAX(tb) FROM bm WHERE b<={k}) * 1000 - {d} AS w{k}"
        for k in range(n - 2)
    )
    steps = ""
    for k in range(1, n):
        if k == 1:
            # wm in effect through batch 1's eviction is the initial
            # epoch-0 watermark: any batch-0 state is still live
            cond = "t1 IS NOT NULL AND le0 IS NULL"
        else:
            cond = (
                f"t{k} IS NOT NULL"
                f" AND NOT COALESCE(le{k - 1} > w{k - 2}, FALSE)"
            )
        steps += f""",
s{k} AS (SELECT *, {cond} AS e{k},
  CASE WHEN {cond} THEN t{k} + {d} ELSE le{k - 1} END AS le{k}
  FROM s{k - 1})"""
    nsum = " + ".join(
        f"CASE WHEN e{k} THEN 1 ELSE 0 END" for k in range(n)
    )
    firstc = ", ".join(f"CASE WHEN e{k} THEN t{k} END" for k in range(n))
    lastc = ", ".join(
        f"CASE WHEN e{k} THEN t{k} END" for k in reversed(range(n))
    )
    return f"""
WITH ev AS (
  SELECT user_id, ts, event_id FROM events
  WHERE user_id < 50 AND ts IS NOT NULL
),
m AS (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM ev),
eb AS (
  SELECT user_id, ts, event_id,
    ({n} * (epoch_us(ts) - m.mn)) // (m.mx - m.mn + 1) AS b
  FROM ev, m
),
fb AS (
  SELECT user_id, b, ts FROM (
    SELECT user_id, b, ts,
      row_number() OVER (PARTITION BY user_id, b ORDER BY ts, event_id)
        AS rn
    FROM eb) WHERE rn = 1
),
bm AS (SELECT b, MAX(epoch_ms(ts)) AS tb FROM fb GROUP BY b),
wm AS (SELECT {wms}),
ch AS (SELECT user_id, {cols} FROM fb GROUP BY user_id),
s0 AS (SELECT ch.*, wm.*, t0 IS NOT NULL AS e0,
  CASE WHEN t0 IS NOT NULL THEN t0 + {d} END AS le0 FROM ch, wm){steps}
SELECT user_id, CAST(({nsum}) AS BIGINT) AS n_emitted,
  strftime(make_timestamp(COALESCE({firstc})), '%Y-%m-%d %H:%M:%S')
    AS first_emit,
  strftime(make_timestamp(COALESCE({lastc})), '%Y-%m-%d %H:%M:%S')
    AS last_emit
FROM s{n - 1}
"""


@query("stream_dedup_evicting", oracle=_evict_oracle())
def q_stream_dedup_evicting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with REAL state eviction — the state-bounded
    production config of stream_dedup_unique_users (whose 3650-day
    delay disables eviction by design): a tight 12-hour watermark
    delay evicts each key at first-seen ts + delay, so a later event
    by the same user RE-EMITS — one row per key per eviction epoch,
    the crawler-dedup horizon semantics.  The fixture is staged into
    6 event-time-range micro-batches reduced to the first row per
    (user, batch) — see streaming/pipeline.py::
    run_dedup_evicting_stream for why that makes the run
    deterministic — and the oracle replays the per-user state chain
    under the EMPIRICALLY PINNED eviction timing (one-batch lag,
    probe-before-evict, first-event expiry anchor; the _evict_oracle
    docstring records the probes).  Per user: emission count and
    first/last emitted event time.

    Scale shape: dedup state holds one (key, expiry) entry per key
    seen within the watermark horizon — O(horizon keys), not O(stream
    length), which is the entire point of the WithinWatermark variant;
    emission and eviction are both state-local, no shuffle beyond the
    key partitioning."""
    from ..streaming.pipeline import run_dedup_evicting_stream

    deduped = run_dedup_evicting_stream(
        spark, sf_dir, delay="12 hours", n_batches=_EVICT_N
    )
    return deduped.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_emitted"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "first_emit"
        ),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "last_emit"
        ),
    )


@query(
    "stream_static_category_counts",
    oracle="""
SELECT CASE WHEN event_type IN ('click', 'view') THEN 'engagement'
            WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
            ELSE 'operational' END AS category,
  COUNT(*) AS n_events
FROM events GROUP BY category
""",
)
def q_stream_static_category_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join run as a REAL stream: the event
    stream enriches against a static category dimension per micro-batch
    (no state store, no watermark on the dim side), then aggregates —
    checked against the equivalent batch CASE rollup.  See
    streaming/pipeline.py::run_stream_static_join."""
    from ..streaming.pipeline import run_stream_static_join

    return run_stream_static_join(spark, sf_dir)


@query(
    "events_sessionize",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              > 1800 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions, COUNT(*) AS n_events
FROM sessions GROUP BY user_id
""",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap — lag + running-sum
    session ids (the batch equivalent of session_window(); SURVEY §2.9
    lists session windows as an engine extension)."""
    e = load_table(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w_lag).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w_lag))
                > 1800
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    sessions = flagged.select(
        "user_id", F.sum("new_session").over(w_run).alias("session_id")
    )
    return sessions.groupBy("user_id").agg(
        F.count_distinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@query(
    "events_json_props",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
  COUNT(*) AS n
FROM events
GROUP BY 1
""",
)
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured projection (T15 family, from_json/get_json_object
    replacing the reference's json.loads at firehose.py:20)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            (F.get_json_object("props", "$.k").cast("bigint") % 10).alias("k_bucket")
        )
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"))
    )


@query(
    "events_type_pivot",
    oracle="""
SELECT user_id % 100 AS user_bucket,
  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signups,
  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS errors
FROM events
GROUP BY 1
""",
)
def q_events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional counts (wide metrics rollup)."""
    e = load_table(spark, sf_dir, "events")

    def cnt(t: str) -> F.Column:
        return F.count(F.when(F.col("event_type") == t, 1))

    return (
        e.groupBy((F.col("user_id") % 100).alias("user_bucket"))
        .agg(
            cnt("click").alias("clicks"),
            cnt("view").alias("views"),
            cnt("purchase").alias("purchases"),
            cnt("signup").alias("signups"),
            cnt("error").alias("errors"),
        )
    )


@query(
    "events_dow_hour_profile",
    oracle="""
SELECT dayofweek(ts) AS dow, hour(ts) AS hr, event_type,
  COUNT(*) AS n_events
FROM events
WHERE event_type IN ('click', 'error')
GROUP BY 1, 2, 3
""",
)
def q_events_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function profile (day-of-week × hour × type).  Spark's
    dayofweek is 1-based Sunday=1 vs DuckDB's 0-based Sunday=0 — aligned
    here by shifting Spark down one (a documented dialect divergence,
    not a semantics change)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    return (
        ev.select(
            (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
            F.hour("ts").cast("bigint").alias("hr"),
            "event_type",
        )
        .groupBy("dow", "hr", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "events_native_sessions",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch(ts) - epoch(LAG(ts) OVER w) >= 1800
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions,
  CAST(SUM(n) AS BIGINT) AS n_events,
  MAX(n) AS max_session_events
FROM per_session GROUP BY user_id
""",
)
def q_events_native_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE session_window() (30-minute
    inactivity gap) — the merging-window stateful operator, here in
    batch.  Unlike the lag+cumsum formulation (events_sessionize, which
    breaks on gap > 1800s), session_window's half-open [start, last+gap)
    windows break on gap >= 1800s — the oracle mirrors that boundary.
    One shuffle on user_id; in streaming the same expression runs with a
    watermark bounding session state."""
    e = load_table(spark, sf_dir, "events")
    per_session = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"))
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n").cast("bigint").alias("n_events"),
        F.max("n").alias("max_session_events"),
    )


@query(
    "stream_session_counts",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch(ts) - epoch(LAG(ts) OVER w) >= 1800
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions,
  CAST(SUM(n) AS BIGINT) AS n_events,
  MAX(n) AS max_session_events
FROM per_session GROUP BY user_id
""",
)
def q_stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window() executed through Structured Streaming (merging
    session state in the state store, AvailableNow, complete mode —
    append+watermark in production) — checked against the same DuckDB oracle as the batch form
    (events_native_sessions): streaming/batch sessionization parity."""
    from ..streaming.pipeline import run_session_window_stream

    return run_session_window_stream(spark, sf_dir)


@query(
    "stream_click_error_join",
    oracle="""
SELECT a.event_id AS click_id, b.event_id AS error_id,
  epoch_us(b.ts) - epoch_us(a.ts) AS lag_us
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
WHERE a.event_type = 'click' AND b.event_type = 'error' AND a.user_id < 40
""",
)
def q_stream_click_error_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join executed as a REAL Structured Streaming query
    (watermarked state-bounded self-join, AvailableNow) and checked
    against the same DuckDB oracle as the batch range join — streaming/
    batch join parity, the reference's missing capability (SURVEY §2.9
    'none in reference': stream-stream joins)."""
    from ..streaming.pipeline import run_click_error_join_stream

    return run_click_error_join_stream(spark, sf_dir)


@query(
    "stream_click_error_semi_join",
    oracle="""
SELECT c.event_id AS click_id, c.user_id,
  epoch_us(c.ts) AS c_ts_us
FROM events c
WHERE c.event_type = 'click' AND c.user_id < 40
  AND EXISTS (
    SELECT 1 FROM events e
    WHERE e.event_type = 'error' AND e.user_id = c.user_id
      AND e.ts > c.ts AND e.ts <= c.ts + INTERVAL 10 MINUTE)
""",
)
def q_stream_click_error_semi_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked stream-stream LEFT SEMI join — the fourth and last
    Structured Streaming join mode beside inner / leftOuter /
    fullOuter: a click emits ONCE, with left-side columns only, as
    soon as an error lands inside its 10-minute horizon.  Unlike the
    outer modes, emission never waits on the watermark (only state
    EVICTION does), so the AvailableNow drain equals the batch EXISTS
    semi-join with no final-watermark cutoff in the oracle — the
    one stream-stream mode whose end-of-stream truncation is empty.

    Scale shape: identical to the inner form — user_id carries the
    state partitioning, both watermarks + the range condition bound
    state to the 40-minute horizon; the semi form additionally
    DROPS a matched click's state immediately (at-most-one emission),
    so steady-state memory is strictly smaller than inner."""
    from ..streaming.pipeline import run_click_error_join_stream

    return run_click_error_join_stream(spark, sf_dir, how="leftSemi")


@query(
    "stream_click_error_outer_join",
    oracle="""
WITH clicks AS (
  SELECT event_id AS cid, user_id AS cu, ts AS cts
  FROM events WHERE event_type = 'click' AND user_id < 40
),
errors AS (
  SELECT event_id AS eid, user_id AS eu, ts AS ets
  FROM events WHERE event_type = 'error'
),
wm AS (
  -- the global watermark: min over both sides' max event time - delay.
  -- The error side's max is computed over user_id < 40 errors ONLY:
  -- Catalyst infers the click side's key predicate onto the error side
  -- through the equi-join (InferFiltersFromConstraints) and pushes it
  -- BELOW the error branch's watermark node, so fewer rows feed that
  -- node's event-time stats — an optimizer rewrite that is output-
  -- invariant for the join but OBSERVABLE through eviction timing
  -- (verified against q.recentProgress eventTime.watermark at sf0.1).
  SELECT LEAST((SELECT MAX(cts) FROM clicks),
               (SELECT MAX(ets) FROM errors WHERE eu < 40))
         - INTERVAL 30 MINUTE AS w
),
matched AS (
  SELECT c.cid AS click_id, e.eid AS error_id,
    epoch_us(e.ets) - epoch_us(c.cts) AS lag_us
  FROM clicks c JOIN errors e
    ON c.cu = e.eu AND e.ets > c.cts
   AND e.ets <= c.cts + INTERVAL 10 MINUTE
),
unmatched AS (
  SELECT c.cid AS click_id, CAST(NULL AS BIGINT) AS error_id,
    CAST(NULL AS BIGINT) AS lag_us
  FROM clicks c, wm
  WHERE NOT EXISTS (
    SELECT 1 FROM errors e
    WHERE e.eu = c.cu AND e.ets > c.cts
      AND e.ets <= c.cts + INTERVAL 10 MINUTE
  )
  AND c.cts + INTERVAL 10 MINUTE < wm.w
)
SELECT click_id, error_id, lag_us FROM matched
UNION ALL
SELECT click_id, error_id, lag_us FROM unmatched
""",
)
def q_stream_click_error_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join (the remaining
    Structured Streaming join mode with real semantics): matches emit
    as they arrive exactly like the inner form; a click with NO error
    in its 10-minute horizon emits ONCE with NULL error columns when
    the global watermark (min of both sides' max event time − 30 min)
    strictly passes the end of its match window — i.e. when its join
    state is provably complete and evicted.  The batch oracle states
    that cutoff explicitly: unmatched clicks qualify only if
    c_ts + 10 min < final_watermark; later clicks are PENDING at
    end-of-stream, not unmatched (the truncation every watermarked
    append sink has — verified empirically against Spark's eviction,
    and exercised with controlled late data in
    tests/test_stateful_streaming.py).

    Scale shape identical to the inner form: user_id carries the state
    partitioning, both watermarks + the range condition bound state to
    the 40-minute horizon, so the operator runs indefinitely at
    cluster scale with O(horizon) state."""
    from ..streaming.pipeline import run_click_error_join_stream

    return run_click_error_join_stream(spark, sf_dir, how="leftOuter")


@query(
    "stream_click_error_full_outer_join",
    oracle="""
WITH clicks AS (
  SELECT event_id AS cid, user_id AS cu, ts AS cts
  FROM events WHERE event_type = 'click' AND user_id < 40
),
errors AS (
  SELECT event_id AS eid, user_id AS eu, ts AS ets
  FROM events WHERE event_type = 'error'
),
wm AS (
  -- the global watermark: min over both sides' max event time - delay.
  -- UNLIKE the leftOuter form, NO filter is inferred onto the error
  -- side here: pushing the click side's user_id < 40 into a FULL OUTER
  -- join's other input would change its unmatched-error output, so
  -- Catalyst leaves the error branch unfiltered and its event-time
  -- stats cover ALL errors (verified against q.recentProgress
  -- eventTime.watermark at sf0.01/sf0.1 — it differs from the
  -- leftOuter run's watermark on the same fixture for exactly this
  -- reason).
  SELECT LEAST((SELECT MAX(cts) FROM clicks),
               (SELECT MAX(ets) FROM errors))
         - INTERVAL 30 MINUTE AS w
),
matched AS (
  SELECT c.cid AS click_id, e.eid AS error_id,
    epoch_us(e.ets) - epoch_us(c.cts) AS lag_us
  FROM clicks c JOIN errors e
    ON c.cu = e.eu AND e.ets > c.cts
   AND e.ets <= c.cts + INTERVAL 10 MINUTE
),
unmatched_clicks AS (
  SELECT c.cid AS click_id, CAST(NULL AS BIGINT) AS error_id,
    CAST(NULL AS BIGINT) AS lag_us
  FROM clicks c, wm
  WHERE NOT EXISTS (
    SELECT 1 FROM errors e
    WHERE e.eu = c.cu AND e.ets > c.cts
      AND e.ets <= c.cts + INTERVAL 10 MINUTE
  )
  AND c.cts + INTERVAL 10 MINUTE < wm.w
),
unmatched_errors AS (
  SELECT CAST(NULL AS BIGINT) AS click_id, e.eid AS error_id,
    CAST(NULL AS BIGINT) AS lag_us
  FROM errors e, wm
  WHERE NOT EXISTS (
    SELECT 1 FROM clicks c
    WHERE c.cu = e.eu AND e.ets > c.cts
      AND e.ets <= c.cts + INTERVAL 10 MINUTE
  )
  AND e.ets < wm.w
)
SELECT click_id, error_id, lag_us FROM matched
UNION ALL
SELECT click_id, error_id, lag_us FROM unmatched_clicks
UNION ALL
SELECT click_id, error_id, lag_us FROM unmatched_errors
""",
)
def q_stream_click_error_full_outer_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked stream-stream FULL OUTER join — the last Structured
    Streaming join mode (VERDICT r8 item 6): matches emit as they
    arrive; a click with no error in its 10-minute horizon emits once
    with NULL error columns when the global watermark strictly passes
    the END of its match window (c_ts + 10 min < W, same cutoff as the
    leftOuter form); an error with no qualifying click emits once with
    NULL click columns when the watermark passes ITS eviction bound —
    e_ts < W, because an error at e_ts can only ever match clicks with
    c_ts < e_ts, so once W reaches e_ts no admissible click can still
    arrive (Spark derives exactly this state-value watermark from the
    e_ts > c_ts conjunct).

    TWO watermark regimes differ from the leftOuter query on the same
    fixture: full-outer semantics FORBID inferring the click side's
    user_id < 40 key predicate onto the error input (it would delete
    unmatched errors for users >= 40 that this mode must emit), so the
    error branch's event-time stats — and hence the global watermark —
    cover ALL errors.  Both cutoffs and the non-inference are pinned
    empirically from q.recentProgress (the CLAUDE.md stream-stream
    watermark gotcha), and the batch oracle states them in closed form.

    Scale shape identical to the inner/leftOuter forms: user_id carries
    the state partitioning, both watermarks + the range condition bound
    state to the 40-minute horizon; unmatched emission is pure eviction,
    adding no state."""
    from ..streaming.pipeline import run_click_error_join_stream

    return run_click_error_join_stream(spark, sf_dir, how="fullOuter")


@query(
    "events_hourly_gapfill",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events WHERE event_type = 'error' AND user_id < 5
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
),
actual AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events WHERE event_type = 'error' AND user_id < 5
  GROUP BY 1
)
SELECT strftime(spine.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
  COALESCE(actual.n, 0) AS n_events
FROM spine LEFT JOIN actual ON spine.h = actual.h
""",
)
def q_events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: a complete hourly spine
    (sequence + explode between the observed bounds) left-joined to the
    sparse actuals, zeros filled — dashboards and anomaly detectors need
    the empty buckets a plain groupBy silently drops.  The spine is
    generated, not scanned (O(hours), broadcast side); the sparse
    actuals aggregate with one small shuffle."""
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "error") & (F.col("user_id") < 5)
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    actual = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").alias("n")
    )
    return spine.join(actual, "h", "left").select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
    )


@query(
    "user_weekly_retention",
    oracle="""
WITH activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
),
cohorts AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM activity GROUP BY user_id
)
SELECT strftime(c.cohort_wk, '%Y-%m-%d') AS cohort_week,
  CAST(date_diff('day', CAST(c.cohort_wk AS DATE), CAST(a.wk AS DATE)) // 7
       AS BIGINT) AS week_offset,
  COUNT(DISTINCT a.user_id) AS n_active_users
FROM activity a JOIN cohorts c ON a.user_id = c.user_id
GROUP BY 1, 2
""",
)
def q_user_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active week, counted in
    each later week they return — THE product-analytics triangle.  The
    per-user first-week aggregation and the (cohort, offset) rollup
    share the user_id shuffle; distinct-ing activity FIRST collapses the
    fact table to user×week before any join, so the join side is
    O(users × weeks), not O(events)."""
    e = load_table(spark, sf_dir, "events")
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    # cohort week attaches as a window min over the SAME user_id
    # shuffle the distinct already produced — no join back (the LTV
    # triangle optimization, applied here too)
    activity = activity.withColumn(
        "cohort_wk", F.min("wk").over(Window.partitionBy("user_id"))
    )
    return (
        activity
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(F.col("wk").cast("date"), F.col("cohort_wk").cast("date"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


@query(
    "event_value_outliers",
    oracle="""
WITH stats AS (
  SELECT event_type,
    CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS DOUBLE) AS s,
    CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)
           * CAST(ROUND(value * 100.0) AS BIGINT)) AS DOUBLE) AS q,
    COUNT(*) AS n
  FROM events GROUP BY event_type
),
scored AS (
  SELECT e.event_type,
    round((CAST(CAST(ROUND(e.value * 100.0) AS BIGINT) AS DOUBLE) - st.s / st.n)
          / sqrt(st.q / st.n - (st.s / st.n) * (st.s / st.n)), 6) AS z
  FROM events e JOIN stats st ON e.event_type = st.event_type
)
SELECT event_type,
  CAST(COUNT(*) FILTER (WHERE z >= 3.0) AS BIGINT) AS n_outliers,
  COUNT(*) AS n_events,
  MAX(z) AS max_z
FROM scored GROUP BY event_type
""",
)
def q_event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection: per-type mean/std from one pass of
    exact integer moment sums (scale-2 mantissas keep Σv² < 2^53 — same
    contract as lineitem_stats_by_flag), tiny stats broadcast back, and
    every event scored in a second narrow pass.  The outlier boundary
    tests the ROUNDED z so both engines cut the identical set.  Two
    scans, one 5-row shuffle — the shape of every streaming-adjacent
    anomaly monitor at 100 TB (swap pass two for the live stream)."""
    e = load_table(spark, sf_dir, "events")
    return score_value_outliers(e, value_stats(e))


_OUTLIERS_ORACLE = """
WITH stats AS (
  SELECT event_type,
    CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS DOUBLE) AS s,
    CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)
           * CAST(ROUND(value * 100.0) AS BIGINT)) AS DOUBLE) AS q,
    COUNT(*) AS n
  FROM events GROUP BY event_type
),
scored AS (
  SELECT e.event_type,
    round((CAST(CAST(ROUND(e.value * 100.0) AS BIGINT) AS DOUBLE) - st.s / st.n)
          / sqrt(st.q / st.n - (st.s / st.n) * (st.s / st.n)), 6) AS z
  FROM events e JOIN stats st ON e.event_type = st.event_type
)
SELECT event_type,
  CAST(COUNT(*) FILTER (WHERE z >= 3.0) AS BIGINT) AS n_outliers,
  COUNT(*) AS n_events,
  MAX(z) AS max_z
FROM scored GROUP BY event_type
"""


@query("stream_value_outliers", oracle=_OUTLIERS_ORACLE)
def q_stream_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING anomaly monitoring: the z-score pass deployed the way
    event_value_outliers' docstring promises — stats trained once on
    the static history, broadcast into real micro-batches, per-batch
    partial censuses merged associatively (sum/sum/max), so the drained
    result hash-matches the batch oracle (same SQL) however the stream
    was batched.  See streaming/pipeline.py::run_stream_outliers for
    the stateless-serving scale story."""
    from ..streaming.pipeline import run_stream_outliers

    return run_stream_outliers(spark, sf_dir)


def value_stats(e: DataFrame) -> DataFrame:
    """Per-type exact integer moment sums (s, q, n) — the broadcastable
    'model' of the z-score monitor, shared by the batch and streaming
    scoring passes."""
    vi = F.round(F.col("value") * 100.0).cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(vi).cast("double").alias("s"),
        F.sum(vi * vi).cast("double").alias("q"),
        F.count("*").alias("n"),
    )


def score_value_outliers(e: DataFrame, stats: DataFrame) -> DataFrame:
    """Score events against broadcast stats; per-type outlier census."""
    vi = F.round(F.col("value") * 100.0).cast("bigint")
    mu = F.col("s") / F.col("n")
    z = F.round(
        (vi.cast("double") - mu)
        / F.sqrt(F.col("q") / F.col("n") - mu * mu),
        6,
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .select("event_type", z.alias("z"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("z") >= 3.0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
            F.count("*").alias("n_events"),
            F.max("z").alias("max_z"),
        )
    )


@query(
    "funnel_click_purchase",
    oracle="""
WITH firsts AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
)
SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
  COUNT(*) AS n_users,
  CAST(COUNT(*) FILTER (WHERE first_click IS NOT NULL) AS BIGINT) AS n_clicked,
  CAST(COUNT(*) FILTER (WHERE first_click IS NOT NULL
                          AND first_purchase > first_click) AS BIGINT) AS n_converted
FROM firsts GROUP BY 1
""",
)
def q_funnel_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion: users whose first purchase follows their first
    click, bucketed — the step-ordering analysis every growth team runs.
    One conditional-MIN aggregation per user (map-side combinable, no
    join, no window), then a tiny bucket rollup; at 100 TB the funnel is
    two shuffles of per-user scalars, never event-level pairs."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("fc"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("fp"),
    )
    return (
        firsts.groupBy((F.col("user_id") % 10).cast("bigint").alias("user_bucket"))
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.when(F.col("fc").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clicked"),
            F.sum(
                F.when(
                    F.col("fc").isNotNull() & (F.col("fp") > F.col("fc")), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_converted"),
        )
    )


@query(
    "cdc_snapshot_fold",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, value, ts,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
  event_type AS last_op,
  CAST(ROUND(value * 10000.0) AS BIGINT) AS last_value_i,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
FROM ranked
WHERE rn = 1 AND event_type != 'error'
""",
)
def q_cdc_snapshot_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → snapshot fold (the CDC compaction every lakehouse
    ingest runs): keep each key's LATEST record by (ts, event_id), drop
    keys whose latest record is a tombstone ('error' here).  One window
    shuffle on the key — at 100 TB this is the same plan over the
    Kafka-compacted topic dump, and the (ts, id) tie-break is what makes
    replays deterministic.  Value is surfaced as its exact integer
    mantissa so the oracle comparison is bit-free."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.select(
            "user_id",
            "event_type",
            "value",
            "ts",
            F.row_number().over(w).alias("rn"),
        )
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            F.round(F.col("value") * F.lit(10000.0)).cast("bigint").alias(
                "last_value_i"
            ),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
    )


@query(
    "events_hourly_interpolated",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events WHERE event_type = 'error' AND user_id < 5
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
),
actual AS (
  SELECT date_trunc('hour', ts) AS h,
    CAST(ROUND(CAST(SUM(CAST(ROUND(value * 10000.0) AS BIGINT)) AS DOUBLE)
               / COUNT(*)) AS BIGINT) AS mean_i
  FROM events WHERE event_type = 'error' AND user_id < 5
  GROUP BY 1
),
laid AS (
  SELECT spine.h, epoch(spine.h) // 3600 AS ih, actual.mean_i,
    LAST_VALUE(actual.mean_i IGNORE NULLS) OVER
      (ORDER BY spine.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    LAST_VALUE(CASE WHEN actual.mean_i IS NOT NULL THEN epoch(spine.h) // 3600 END
               IGNORE NULLS) OVER
      (ORDER BY spine.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pih,
    FIRST_VALUE(actual.mean_i IGNORE NULLS) OVER
      (ORDER BY spine.h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    FIRST_VALUE(CASE WHEN actual.mean_i IS NOT NULL THEN epoch(spine.h) // 3600 END
                IGNORE NULLS) OVER
      (ORDER BY spine.h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nih
  FROM spine LEFT JOIN actual ON spine.h = actual.h
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
  CASE WHEN mean_i IS NOT NULL THEN 'observed' ELSE 'interpolated' END AS kind,
  CAST(COALESCE(mean_i,
    CAST(ROUND(CAST(pv AS DOUBLE)
               + CAST(nv - pv AS DOUBLE) * (CAST(ih - pih AS DOUBLE)
                                            / CAST(nih - pih AS DOUBLE)))
         AS BIGINT)) AS DOUBLE) / 10000.0 AS mean_value
FROM laid
""",
)
def q_events_hourly_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series linear interpolation: the hourly mean of a sparse
    series on a complete spine, with missing buckets filled by the
    linear interpolant between the nearest observed neighbors (the
    resampling step feature pipelines run before differencing or model
    input).  Window scaffolding is last/first IGNORE NULLS over the
    spine; spine edges are observed by construction (bounds come from
    the data), so every gap is interior.

    Determinism: means and interpolants are integer mantissas with ONE
    IEEE division + half-away-from-zero round each — both engines
    compute the identical double expression, so no epsilon.  The spine
    is a bounded report series (one window partition); a per-key
    version partitions the same windows by series id."""
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "error") & (F.col("user_id") < 5)
    )
    vi = F.round(F.col("value") * F.lit(10000.0)).cast("bigint")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    actual = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.round(F.sum(vi).cast("double") / F.count("*")).cast("bigint").alias(
            "mean_i"
        )
    )
    ih = (F.unix_timestamp("h") / F.lit(3600)).cast("bigint")
    w_prev = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("h").rowsBetween(0, Window.unboundedFollowing)
    obs_ih = F.when(F.col("mean_i").isNotNull(), ih)
    laid = (
        spine.join(actual, "h", "left")
        .select(
            "h",
            ih.alias("ih"),
            "mean_i",
            F.last("mean_i", ignorenulls=True).over(w_prev).alias("pv"),
            F.last(obs_ih, ignorenulls=True).over(w_prev).alias("pih"),
            F.first("mean_i", ignorenulls=True).over(w_next).alias("nv"),
            F.first(obs_ih, ignorenulls=True).over(w_next).alias("nih"),
        )
    )
    interp = F.round(
        F.col("pv").cast("double")
        + (F.col("nv") - F.col("pv")).cast("double")
        * (
            (F.col("ih") - F.col("pih")).cast("double")
            / (F.col("nih") - F.col("pih")).cast("double")
        )
    ).cast("bigint")
    return laid.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        F.when(F.col("mean_i").isNotNull(), F.lit("observed"))
        .otherwise(F.lit("interpolated"))
        .alias("kind"),
        (F.coalesce(F.col("mean_i"), interp).cast("double") / F.lit(1e4)).alias(
            "mean_value"
        ),
    )


@query(
    "user_value_locf",
    oracle="""
SELECT user_id,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
  event_type,
  LAST_VALUE(CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 10000.0) AS BIGINT) END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_i
FROM events
WHERE user_id < 10
""",
)
def q_user_value_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last observation carried forward): every event row carries
    the user's most recent purchase value — the third imputation mode
    next to zero-fill (events_hourly_gapfill) and linear interpolation
    (events_hourly_interpolated), and the standard way feature pipelines
    attach 'state as of this event' without an as-of join (the window
    IS the as-of, riding one shuffle on the partition key).  Carried
    values stay integer mantissas; rows before the first purchase are
    NULL by definition."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    vi = F.round(F.col("value") * F.lit(10000.0)).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "event_type",
        F.last(
            F.when(F.col("event_type") == "purchase", vi), ignorenulls=True
        )
        .over(w)
        .alias("last_purchase_i"),
    )


@query(
    "events_variant_stats",
    oracle="""
SELECT event_type,
  COUNT(*) AS n_events,
  MIN(k) AS min_k, MAX(k) AS max_k,
  CAST(SUM(k) AS BIGINT) AS sum_k
FROM (
  SELECT event_type,
    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
""",
)
def q_events_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured stats through the Spark 4 VARIANT type: props is
    parsed ONCE into the binary variant encoding and typed paths are
    extracted with variant_get — at 100 TB this replaces per-path JSON
    re-parsing (get_json_object re-tokenizes the string for every path
    extracted; variant parses once and the shredded binary serves all
    extractions, the same reason warehouses store shredded JSON).  The
    oracle states the identical result relationally over json_extract."""
    e = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
    )


# ---------------------------------------------------------------------------
# Two-sample test: Welch z between event-type value distributions
# ---------------------------------------------------------------------------

_ZTEST_ORACLE = """
WITH m AS (
  SELECT
    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n1,
    SUM(CASE WHEN event_type = 'click'
             THEN CAST(ROUND(value * 10000.0) AS BIGINT) ELSE 0 END) AS s1,
    SUM(CASE WHEN event_type = 'click'
             THEN CAST(ROUND(value * 10000.0) AS BIGINT)
                  * CAST(ROUND(value * 10000.0) AS BIGINT) ELSE 0 END) AS q1,
    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n2,
    SUM(CASE WHEN event_type = 'purchase'
             THEN CAST(ROUND(value * 10000.0) AS BIGINT) ELSE 0 END) AS s2,
    SUM(CASE WHEN event_type = 'purchase'
             THEN CAST(ROUND(value * 10000.0) AS BIGINT)
                  * CAST(ROUND(value * 10000.0) AS BIGINT) ELSE 0 END) AS q2
  FROM events
)
SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_purchase,
  CAST(s1 AS DOUBLE) / 10000.0 / n1 AS mean_click,
  CAST(s2 AS DOUBLE) / 10000.0 / n2 AS mean_purchase,
  (CAST(s1 AS DOUBLE) / 10000.0 / n1 - CAST(s2 AS DOUBLE) / 10000.0 / n2)
  / sqrt(
      ((CAST(q1 AS DOUBLE) / 100000000.0
        - n1 * (CAST(s1 AS DOUBLE) / 10000.0 / n1)
             * (CAST(s1 AS DOUBLE) / 10000.0 / n1)) / (n1 - 1)) / n1
    + ((CAST(q2 AS DOUBLE) / 100000000.0
        - n2 * (CAST(s2 AS DOUBLE) / 10000.0 / n2)
             * (CAST(s2 AS DOUBLE) / 10000.0 / n2)) / (n2 - 1)) / n2
    ) AS z_stat
FROM m
"""


@query("events_value_ztest", oracle=_ZTEST_ORACLE)
def q_events_value_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch z-test of mean event value, click vs purchase —
    the A/B-readout shape (did the treatment move the metric?) computed
    as ONE conditional-aggregation pass: both groups' count / sum /
    sum-of-squares accumulate as exact integer mantissas in the same
    map-side-combined aggregate, so the corpus is scanned and shuffled
    once for all six moments.

    Float contract: counts and moment sums are exact int64 (vi <= 5e6,
    so sum-of-squares stays under 2^63 at any fixture scale); every
    downstream mean/variance/z expression is the IDENTICAL chain of
    correctly-rounded IEEE ops in both engines — no rounding needed, no
    SUM over doubles anywhere."""
    e = load_table(spark, sf_dir, "events")
    vi = F.round(F.col("value") * F.lit(10000.0)).cast("bigint")

    def _moments(t: str, i: int):
        is_t = F.col("event_type") == t
        return [
            F.sum(F.when(is_t, 1).otherwise(0)).alias(f"n{i}"),
            F.sum(F.when(is_t, vi).otherwise(F.lit(0).cast("bigint"))).alias(f"s{i}"),
            F.sum(F.when(is_t, vi * vi).otherwise(F.lit(0).cast("bigint"))).alias(
                f"q{i}"
            ),
        ]

    m = e.agg(*_moments("click", 1), *_moments("purchase", 2))
    mean = lambda s, n: F.col(s).cast("double") / F.lit(1e4) / F.col(n)  # noqa: E731
    var = lambda q, s, n: (  # noqa: E731
        F.col(q).cast("double") / F.lit(1e8) - F.col(n) * mean(s, n) * mean(s, n)
    ) / (F.col(n) - 1)
    z = (mean("s1", "n1") - mean("s2", "n2")) / F.sqrt(
        var("q1", "s1", "n1") / F.col("n1") + var("q2", "s2", "n2") / F.col("n2")
    )
    return m.select(
        F.col("n1").cast("bigint").alias("n_click"),
        F.col("n2").cast("bigint").alias("n_purchase"),
        mean("s1", "n1").alias("mean_click"),
        mean("s2", "n2").alias("mean_purchase"),
        z.alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Running COUNT(DISTINCT): cumulative unique users by day
# ---------------------------------------------------------------------------

_CUMULATIVE_USERS_ORACLE = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events
  WHERE ts IS NOT NULL GROUP BY user_id
),
daily AS (SELECT d, COUNT(*) AS n_new FROM first_seen GROUP BY d)
SELECT strftime(d, '%Y-%m-%d') AS day,
  n_new AS n_new_users,
  CAST(SUM(n_new) OVER (ORDER BY d
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cumulative_users
FROM daily
"""


@query("cumulative_new_users", oracle=_CUMULATIVE_USERS_ORACLE)
def q_cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT users) by day — the DAU/'total accounts'
    growth curve.  A windowed distinct count is not directly computable
    (distinct does not decompose over frames), so it is restated with
    the FIRST-SEEN trick: a user contributes exactly once, on the day
    of their first event, and the cumulative distinct count is a plain
    running SUM of daily first-appearances.

    Scale shape: one shuffle on user_id for the min-date (map-side
    combined), one tiny per-day aggregate, and a running-sum window
    over DAYS (bounded cardinality — never a window over raw events).
    This restatement is how every 'unique-to-date' metric survives
    100 TB: convert the distinct to an idempotent first-event flag,
    then aggregate flags."""
    # ts IS NOT NULL on BOTH sides: an all-NULL-ts user would otherwise
    # produce a NULL first-seen day whose window position differs between
    # engines (Spark orders NULLS FIRST, DuckDB NULLS LAST), shifting
    # every cumulative value — safe now independent of the ingest
    # contract that ts is never null
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    first_seen = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d")
    )
    daily = first_seen.groupBy("d").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n_new").alias("n_new_users"),
        F.sum("n_new").over(w).cast("bigint").alias("cumulative_users"),
    )


# ---------------------------------------------------------------------------
# Exact distributed percentiles (median / p90) on integer mantissas
# ---------------------------------------------------------------------------

_PCTL_ORACLE = """
WITH ranked AS (
  SELECT event_type, CAST(ROUND(value * 100.0) AS BIGINT) AS vi,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY CAST(ROUND(value * 100.0) AS BIGINT), event_id)
      AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
  WHERE value IS NOT NULL
)
SELECT event_type, MAX(n) AS n_events,
  CAST(SUM(CASE WHEN rn = ((n - 1) * 5) // 10 + 1 THEN vi * (10 - ((n - 1) * 5) % 10)
                WHEN rn = ((n - 1) * 5) // 10 + 2 AND ((n - 1) * 5) % 10 > 0
                  THEN vi * (((n - 1) * 5) % 10)
                ELSE 0 END) AS DOUBLE) / 1000.0 AS p50_value,
  CAST(SUM(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 THEN vi * (10 - ((n - 1) * 9) % 10)
                WHEN rn = ((n - 1) * 9) // 10 + 2 AND ((n - 1) * 9) % 10 > 0
                  THEN vi * (((n - 1) * 9) % 10)
                ELSE 0 END) AS DOUBLE) / 1000.0 AS p90_value
FROM ranked GROUP BY event_type
"""


def _pctl_weighted(tenths: int) -> Column:
    """Exact interpolated percentile numerator at p = tenths/10: the
    linear-interpolation weights (10−g, g) around position (n−1)·p stay
    INTEGERS because p has denominator 10 — so the weighted sum is an
    exact int64 and the percentile needs exactly ONE double division
    (by 1000 = weight·mantissa scales), bit-identical across engines."""
    pos = (F.col("n") - 1) * tenths
    lo = F.expr(f"((n - 1) * {tenths}) div 10") + 1
    g = pos % 10
    return F.sum(
        F.when(F.col("rn") == lo, F.col("vi") * (10 - g))
        .when((F.col("rn") == lo + 1) & (g > 0), F.col("vi") * g)
        .otherwise(0)
    )


@query("event_value_percentiles", oracle=_PCTL_ORACLE)
def q_event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed median + p90 of event value per type — the
    order statistic every metrics pipeline wants and most engines only
    approximate.  Built-in percentile/quantile_cont interpolate in
    floating point with engine-specific operation order, so they are NOT
    bit-reproducible; here values quantize once to scale-2 integer
    mantissas, ranks come from one window pass, and the interpolation at
    p = k/10 is restated as an INTEGER-weighted sum (weights 10−g / g
    around position (n−1)·p) — one double division at the end, identical
    in both engines (see _pctl_weighted).

    Scale shape: one shuffle partitioned by event_type with a per-type
    sort (bounded type cardinality keeps partitions healthy; a skewed
    type is handled by the two-pass value-histogram median — count per
    value bucket, then binary-search the bucket holding rank n/2 —
    which this integer-mantissa domain makes exact, since values are
    already buckets).  The conditional aggregate that follows is
    map-side combined; no driver-side work at all.

    value IS NOT NULL on BOTH sides: a NULL value would rank first in
    Spark's window but last in DuckDB's, shifting every rank — and an
    order statistic over absent measurements is meaningless anyway."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vi = F.round(F.col("value") * 100.0).cast("bigint")
    w = Window.partitionBy("event_type").orderBy("vi", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select("event_type", "event_id", vi.alias("vi")).select(
        "event_type",
        "vi",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        (_pctl_weighted(5).cast("double") / F.lit(1000.0)).alias("p50_value"),
        (_pctl_weighted(9).cast("double") / F.lit(1000.0)).alias("p90_value"),
    )


# ---------------------------------------------------------------------------
# SCD2 history fold: event log → validity-interval dimension
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM events
  WHERE ts IS NOT NULL AND user_id % 10 = 0
),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_type IS NULL OR event_type != prev_type
),
versions AS (  -- ORDER BY (ts, event_id): two change points sharing a
               -- timestamp would otherwise get engine-dependent
               -- valid_to assignment (tie order is unspecified)
  SELECT user_id, event_type, ts AS vf,
    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
  FROM changes
)
SELECT user_id, event_type,
  strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
  COALESCE(strftime(vt, '%Y-%m-%d %H:%M:%S'), 'current') AS valid_to,
  CAST(vt IS NULL AS BOOLEAN) AS is_current
FROM versions
"""


@query("user_value_scd2", oracle=_SCD2_ORACLE)
def q_user_value_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 fold: compact the raw event log
    into the versioned dimension a lakehouse MERGE maintains — one row
    per (user, attribute-value run) carrying its validity interval and
    a current flag.  cdc_snapshot_fold keeps only each key's LATEST
    state; SCD2 keeps the full history, which is what joins-as-of-then
    (pricing at order time, segment at click time) require.

    Restated as two windows instead of a MERGE loop: change points are
    rows whose attribute differs from their lag (runs collapse), and
    each version's valid_to is the lead of the next change — no
    self-join, no driver iteration; both shuffles share the user_id
    partitioning (Spark plans one Window node per frame on the same
    key).  At 100 TB this is the standard daily compaction: partition
    by key-hash, the per-key sort is bounded by per-user event counts,
    and the output replaces the dimension table atomically
    (sinks/bucketed.py's overwrite pattern).

    ts IS NOT NULL on both sides (NULL would rank first in Spark,
    last in DuckDB); user_id % 10 scopes the fixture output — the plan
    is identical unscoped."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & (F.col("user_id") % 10 == 0))
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    # (ts, event_id) total order: equal-ts change points would get
    # engine-dependent valid_to under a ts-only sort
    wv = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = changes.withColumn("vt", F.lead("ts").over(wv))
    return versions.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("vt", "yyyy-MM-dd HH:mm:ss"), F.lit("current")
        ).alias("valid_to"),
        F.col("vt").isNull().alias("is_current"),
    )


_WINSOR_ORACLE = """
WITH ranked AS (
  SELECT event_type, CAST(ROUND(value * 100.0) AS BIGINT) AS vi,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY CAST(ROUND(value * 100.0) AS BIGINT), event_id)
      AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
  WHERE value IS NOT NULL
),
bounds AS (  -- exact rank-based p05 / p95 cut mantissas (no interpolation:
             -- winsorization clips at ORDER STATISTICS, so the bound is a
             -- row's own integer value — engine-identical by construction)
  SELECT event_type,
    MAX(CASE WHEN rn = ((n - 1) * 5) // 100 + 1 THEN vi END) AS lo,
    MAX(CASE WHEN rn = ((n - 1) * 95) // 100 + 1 THEN vi END) AS hi
  FROM ranked GROUP BY event_type
)
SELECT r.event_type, MAX(r.n) AS n_events,
  CAST(b.lo AS DOUBLE) / 100.0 AS p05_cut,
  CAST(b.hi AS DOUBLE) / 100.0 AS p95_cut,
  CAST(SUM(LEAST(GREATEST(r.vi, b.lo), b.hi)) AS DOUBLE) / MAX(r.n) / 100.0
    AS winsorized_mean,
  CAST(SUM(CASE WHEN r.vi < b.lo OR r.vi > b.hi THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clipped
FROM ranked r JOIN bounds b ON r.event_type = b.event_type
GROUP BY r.event_type, b.lo, b.hi
"""


@query("event_value_winsorized", oracle=_WINSOR_ORACLE)
def q_event_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped) robust mean per event type: values below the
    p05 / above the p95 order statistic are clamped to the cut before
    averaging — the robust aggregate metrics pipelines use when a few
    bad instruments would otherwise drag the mean (the plain mean is
    exactly what event_value_outliers shows being dragged).  Cuts are
    ORDER STATISTICS (a row's own integer mantissa, rank
    ⌊(n−1)·p⌋+1), not interpolations — so clamping compares exact
    integers, the clipped sum is an exact int64, and the mean divides
    once (÷n, ÷scale) — bit-identical across engines.

    Same one-window + conditional-aggregate shape as
    event_value_percentiles (the rank pass could even be shared); the
    5-row bounds table broadcasts back onto the ranked rows, and the
    final aggregate is map-side combined."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vi = F.round(F.col("value") * 100.0).cast("bigint")
    w = Window.partitionBy("event_type").orderBy("vi", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select("event_type", "event_id", vi.alias("vi")).select(
        "event_type",
        "vi",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.expr("((n - 1) * 5) div 100") + 1, F.col("vi"))
        ).alias("lo"),
        F.max(
            F.when(F.col("rn") == F.expr("((n - 1) * 95) div 100") + 1, F.col("vi"))
        ).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("vi"), F.col("lo")), F.col("hi"))
    return (
        ranked.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.max("n").alias("n_events"),
            F.sum(clipped).alias("s"),
            F.sum(
                F.when((F.col("vi") < F.col("lo")) | (F.col("vi") > F.col("hi")), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_clipped"),
        )
        .select(
            "event_type",
            "n_events",
            (F.col("lo").cast("double") / F.lit(100.0)).alias("p05_cut"),
            (F.col("hi").cast("double") / F.lit(100.0)).alias("p95_cut"),
            (
                F.col("s").cast("double") / F.col("n_events") / F.lit(100.0)
            ).alias("winsorized_mean"),
            "n_clipped",
        )
    )


_APCTL_ORACLE = """
WITH ranked AS (
  SELECT event_type, CAST(ROUND(value * 100.0) AS BIGINT) AS vi,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY CAST(ROUND(value * 100.0) AS BIGINT), event_id)
      AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
  WHERE value IS NOT NULL
)
SELECT event_type, MAX(n) AS n_events,
  CAST(SUM(CASE WHEN rn = ((n - 1) * 5) // 10 + 1 THEN vi * (10 - ((n - 1) * 5) % 10)
                WHEN rn = ((n - 1) * 5) // 10 + 2 AND ((n - 1) * 5) % 10 > 0
                  THEN vi * (((n - 1) * 5) % 10)
                ELSE 0 END) AS DOUBLE) / 1000.0 AS p50_exact,
  CAST(SUM(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 THEN vi * (10 - ((n - 1) * 9) % 10)
                WHEN rn = ((n - 1) * 9) // 10 + 2 AND ((n - 1) * 9) % 10 > 0
                  THEN vi * (((n - 1) * 9) % 10)
                ELSE 0 END) AS DOUBLE) / 1000.0 AS p90_exact,
  TRUE AS p50_within_bound,
  TRUE AS p90_within_bound
FROM ranked GROUP BY event_type
"""


@query("approx_value_percentiles", oracle=_APCTL_ORACLE)
def q_approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) of event value per
    type, restated as a BOUND AUDIT so the sketch is hash-checkable:
    sketch cut points are engine-specific (DuckDB's approx_quantile is a
    t-digest), so instead of emitting the raw estimates we emit the
    EXACT p50/p90 (the integer-mantissa order statistic, engine-
    identical — same expression as event_value_percentiles) plus one
    boolean per percentile asserting the GK rank guarantee: with
    accuracy A, the estimate's true-rank interval [#(<est)+1, #(≤est)]
    must intersect the target rank ± (⌈n/A⌉ + 2) — the +2 absorbs the
    definitional off-by-ones between "smallest value such that ≤ p·n are
    below" and the interpolated (n−1)·p position.  The oracle computes
    the exact side and states TRUE for both bounds: a sketch drifting
    out of its guarantee breaks the value hash and the driver flags it
    (the banding_recall_audit pattern applied to a sketch).

    Scale shape: the sketch is the production path — fixed-size,
    mergeable, map-side combined, no per-group sort; the exact rank pass
    here is the CALIBRATION side (one shuffle, integer weights).  At
    100 TB a skewed type makes the exact window's per-group sort the
    bottleneck; dashboards serve the sketch, this audit reconciles it."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vi = F.round(F.col("value") * 100.0).cast("bigint")
    base = e.select("event_type", "event_id", vi.alias("vi"))
    pct = F.percentile_approx(
        "vi", F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)
    )
    est = base.groupBy("event_type").agg(pct.alias("p")).select(
        "event_type", F.col("p")[0].alias("est50"), F.col("p")[1].alias("est90")
    )
    w = Window.partitionBy("event_type").orderBy("vi", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = base.select(
        "event_type",
        "vi",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    agg = (
        ranked.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            (_pctl_weighted(5).cast("double") / F.lit(1000.0)).alias(
                "p50_exact"
            ),
            (_pctl_weighted(9).cast("double") / F.lit(1000.0)).alias(
                "p90_exact"
            ),
            F.sum(F.when(F.col("vi") < F.col("est50"), 1).otherwise(0)).alias("lt50"),
            F.sum(F.when(F.col("vi") <= F.col("est50"), 1).otherwise(0)).alias("le50"),
            F.sum(F.when(F.col("vi") < F.col("est90"), 1).otherwise(0)).alias("lt90"),
            F.sum(F.when(F.col("vi") <= F.col("est90"), 1).otherwise(0)).alias("le90"),
        )
    )
    n = F.col("n_events")
    slack = F.ceil(n / F.lit(10000.0)) + F.lit(2)

    def ok(tenths: int, lt: str, le: str) -> Column:
        pos = F.expr(f"((n_events - 1) * {tenths}) div 10") + 1
        return ((F.col(lt) + 1) <= pos + slack) & (F.col(le) >= pos - slack)

    return agg.select(
        "event_type",
        "n_events",
        "p50_exact",
        "p90_exact",
        ok(5, "lt50", "le50").alias("p50_within_bound"),
        ok(9, "lt90", "le90").alias("p90_within_bound"),
    )


@query(
    "value_equidepth_histogram",
    oracle="""
WITH ranked AS (
  SELECT event_type, CAST(ROUND(value * 100.0) AS BIGINT) AS vi,
    NTILE(8) OVER (PARTITION BY event_type
                   ORDER BY CAST(ROUND(value * 100.0) AS BIGINT), event_id)
      AS bucket
  FROM events
  WHERE value IS NOT NULL
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
  COUNT(*) AS n_values,
  CAST(MIN(vi) AS DOUBLE) / 100.0 AS lo_value,
  CAST(MAX(vi) AS DOUBLE) / 100.0 AS hi_value
FROM ranked
GROUP BY event_type, bucket
""",
)
def q_value_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of event value per type (8 buckets of equal
    row count, boundaries wherever the data is dense) — the complement
    of doc_length_histogram's fixed log2 buckets, and the statistic
    query optimizers and drift monitors actually want (equal-width
    buckets collapse under skew; equal-depth boundaries ARE the
    distribution).  NTILE over the (mantissa, event_id) total order is
    engine-deterministic: both engines deal n rows into 8 runs with the
    first n mod 8 runs one longer, so bucket membership — and every
    min/max/count — is identical.

    One window shuffle on event_type (same partitioning the percentile
    queries share), then a map-side-combined aggregate; at 100 TB the
    per-type sort swaps for the two-pass counting route exactly as
    documented on event_value_percentiles.  Bucket boundaries divide
    once from exact integer mantissas."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vi = F.round(F.col("value") * 100.0).cast("bigint")
    w = Window.partitionBy("event_type").orderBy("vi", "event_id")
    ranked = e.select("event_type", "event_id", vi.alias("vi")).select(
        "event_type", "vi", F.ntile(8).over(w).cast("bigint").alias("bucket")
    )
    return ranked.groupBy("event_type", "bucket").agg(
        F.count("*").alias("n_values"),
        (F.min("vi").cast("double") / F.lit(100.0)).alias("lo_value"),
        (F.max("vi").cast("double") / F.lit(100.0)).alias("hi_value"),
    )


# ---------------------------------------------------------------------------
# OHLC downsampling — the time-series bar compaction (metrics / market
# data shape): one row per (hour, type) with open/high/low/close
# ---------------------------------------------------------------------------

_OHLC_ORACLE = """
WITH ev AS (
  SELECT date_trunc('hour', ts) AS h, event_type, ts, event_id,
    CAST(ROUND(value * 10000.0) AS BIGINT) AS vi
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY h, event_type
                       ORDER BY ts, event_id) AS rn_a,
    row_number() OVER (PARTITION BY h, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM ev
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start, event_type,
  CAST(MAX(CASE WHEN rn_a = 1 THEN vi END) AS DOUBLE) / 10000.0 AS open,
  CAST(MAX(vi) AS DOUBLE) / 10000.0 AS high,
  CAST(MIN(vi) AS DOUBLE) / 10000.0 AS low,
  CAST(MAX(CASE WHEN rn_d = 1 THEN vi END) AS DOUBLE) / 10000.0 AS close,
  COUNT(*) AS volume,
  CAST(SUM(vi) AS DOUBLE) / 10000.0 AS total_value
FROM ranked
GROUP BY 1, 2
"""


@query("events_ohlc_bars", oracle=_OHLC_ORACLE)
def q_events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar downsampling: each (hour, event_type) group compacts to
    open (value at the earliest (ts, event_id)), high, low, close
    (latest), volume, and exact total — the canonical time-series
    rollup every metrics store and market-data pipeline runs.  Open and
    close use the argmin/argmax struct idiom on the (ts, event_id)
    total order (event_id breaks ts ties deterministically); the oracle
    states the same order as ROW_NUMBER.  NULL ts / NULL value rows are
    excluded on BOTH sides (the window NULL-ordering divergence rule).
    All extrema and sums are integer mantissas converted once.

    Scale shape: ONE map-side-combined aggregation — min/max/sum/count
    partials are associative, so a year of raw events compacts to
    (hours x types) rows in a single shuffle whose payload is the
    partial structs, never the events.  This is the streaming-friendly
    form too: the same partials fold per micro-batch (stream_hourly's
    pattern).  min/max over structs plan as SortAggregate (struct
    buffers aren't hash-agg compatible) — still map-side combined."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    vi = F.round(F.col("value") * F.lit(10000.0)).cast("bigint")
    ev = e.select(
        F.date_format(
            F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
        ).alias("hour_start"),
        "event_type",
        "ts",
        "event_id",
        vi.alias("vi"),
    )
    first_s = F.min(F.struct("ts", "event_id", "vi"))
    last_s = F.max(F.struct("ts", "event_id", "vi"))
    return ev.groupBy("hour_start", "event_type").agg(
        (first_s.getField("vi").cast("double") / F.lit(1e4)).alias("open"),
        (F.max("vi").cast("double") / F.lit(1e4)).alias("high"),
        (F.min("vi").cast("double") / F.lit(1e4)).alias("low"),
        (last_s.getField("vi").cast("double") / F.lit(1e4)).alias("close"),
        F.count("*").alias("volume"),
        (F.sum("vi").cast("double") / F.lit(1e4)).alias("total_value"),
    )


@query("stream_ohlc_bars", oracle=_OHLC_ORACLE)
def q_stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING OHLC bars: per-micro-batch partial bars (first/last
    structs + extrema + moments) merged by the same struct-extrema
    aggregation — hash-identical to the batch bars for ANY batching
    (see run_stream_ohlc).  Same oracle as events_ohlc_bars."""
    from ..streaming.pipeline import run_stream_ohlc

    return run_stream_ohlc(spark, sf_dir)


# ---------------------------------------------------------------------------
# OLS trend per key — drift detection as one exact-moment aggregation
# ---------------------------------------------------------------------------

_TREND_ORACLE = """
WITH ev AS (
  SELECT event_type,
    (epoch_us(ts) // 1000000 - 1704067200) // 3600 AS x,
    CAST(ROUND(value * 100.0) AS BIGINT) AS y
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
    AND ts >= TIMESTAMP '2024-01-01'
),
m AS (
  SELECT event_type, COUNT(*) AS n,
    SUM(x) AS sx, SUM(y) AS sy,
    SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM ev GROUP BY 1
),
fit AS (
  SELECT event_type, n,
    CAST(n * sxy - sx * sy AS DOUBLE) AS nd,
    CAST(n * sxx - sx * sx AS DOUBLE) AS dd,
    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS ed,
    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM m
)
SELECT event_type, n,
  nd / NULLIF(dd, 0) / 100.0 AS slope_per_hour,
  (syd - nd / NULLIF(dd, 0) * sxd) / n / 100.0 AS intercept,
  nd * nd / (NULLIF(dd, 0) * NULLIF(ed, 0)) AS r2
FROM fit
"""


@query("event_value_trend_ols", oracle=_TREND_ORACLE)
def q_event_value_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend of event value over time — the drift-detection
    fit every metrics pipeline runs, as ONE map-side-combined moment
    aggregation: x is integer hours since the epoch origin, y the value
    mantissa, and the five moment sums (Sx, Sy, Sxx, Sxy, Syy) are
    exact int64 per group, so slope numerator/denominator
    (n·Sxy − Sx·Sy, n·Sxx − Sx²) are EXACT integers converted once;
    slope, intercept, and r² are then identical closed-form double
    expressions on both engines.  Overflow margins at sf0.1: x ≤ 720,
    y ≤ 5.7e4, n = 1e5 keep every product ≤ ~4e17 < 2^63 (r²'s n·Syy
    term would not, so that one derives from the exact ints in double —
    still deterministic IEEE ops).  At larger corpora, re-center x per
    group (two-pass) or per time-shard to keep the int64 headroom.

    Scale shape: one shuffle carrying 7 numbers per event type —
    associative partials (the Welch-z/stddev discipline), so it folds
    per micro-batch too."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
    )
    ev = e.select(
        "event_type",
        F.expr("(unix_timestamp(ts) - 1704067200) div 3600").alias("x"),
        F.round(F.col("value") * F.lit(100.0)).cast("bigint").alias("y"),
    )
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    # Degenerate groups (single bucket / constant value) make dd or ed
    # exactly 0: NULLIF both so slope/intercept/r2 come out NULL instead
    # of IEEE Inf/NaN — the two engines then agree by construction.
    dd = F.nullif(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
        F.lit(0.0),
    )
    ed = F.nullif(
        F.col("n").cast("double") * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double"),
        F.lit(0.0),
    )
    return m.select(
        "event_type",
        "n",
        (nd / dd / F.lit(100.0)).alias("slope_per_hour"),
        (
            (F.col("sy").cast("double") - nd / dd * F.col("sx").cast("double"))
            / F.col("n")
            / F.lit(100.0)
        ).alias("intercept"),
        (nd * nd / (dd * ed)).alias("r2"),
    )



# ---------------------------------------------------------------------------
# Time-weighted average price — irregular-sample integration per type
# ---------------------------------------------------------------------------

_TWAP_ORACLE = """
WITH ev AS (
  SELECT event_type, ts, event_id,
    epoch_us(ts) // 1000000 AS sec,
    CAST(ROUND(value * 100.0) AS BIGINT) AS vi
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
seg AS (
  SELECT event_type, vi,
    lead(sec) OVER (PARTITION BY event_type ORDER BY ts, event_id) - sec
      AS dt
  FROM ev
),
agg AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n_intervals,
    SUM(vi * dt) AS swv, SUM(dt) AS sw
  FROM seg WHERE dt IS NOT NULL GROUP BY 1
)
SELECT event_type, n_intervals,
  CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) / 100.0 AS twap
FROM agg
WHERE sw > 0
"""


@query("events_twap", oracle=_TWAP_ORACLE)
def q_events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per type (TWAP) — the
    irregular-sample integral every metrics/market pipeline needs when
    events arrive unevenly: each value is weighted by how long it was
    CURRENT (seconds until the type's next event, one lead window),
    and the per-type mean is Sum(v_i * dt_i) / Sum(dt_i) on exact int64
    products (vi <= 5.7e4, dt <= the month in seconds: every product
    and sum stays far inside int64; the final ratio is one double
    division).  The last observation of each type carries no interval
    and drops on both engines; dt truncates to whole seconds by the
    same epoch_us // 1e6 floor Spark's unix_timestamp applies.

    Scale shape: one per-type-partitioned lead window (parallel — no
    global sort) followed by one map-side-combined aggregation; at
    100 TB the window key extends to (type, day) so partitions bound
    state, splicing the per-day edges exactly like rolling_30d_spend's
    RANGE frames."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    ev = e.select(
        "event_type",
        "ts",
        "event_id",
        F.expr("unix_timestamp(ts)").alias("sec"),
        F.round(F.col("value") * F.lit(100.0)).cast("bigint").alias("vi"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seg = ev.select(
        "event_type",
        "vi",
        (F.lead("sec").over(w) - F.col("sec")).alias("dt"),
    ).filter(F.col("dt").isNotNull())
    agg = seg.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_intervals"),
        F.sum(F.col("vi") * F.col("dt")).alias("swv"),
        F.sum("dt").alias("sw"),
    )
    return agg.filter(F.col("sw") > 0).select(
        "event_type",
        "n_intervals",
        (
            F.col("swv").cast("double") / F.col("sw").cast("double")
            / F.lit(100.0)
        ).alias("twap"),
    )



# ---------------------------------------------------------------------------
# MAD robust outliers — two exact weighted-median passes
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH ranked AS (
  SELECT event_type, event_id, CAST(ROUND(value * 100.0) AS BIGINT) AS vi,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY CAST(ROUND(value * 100.0) AS BIGINT), event_id)
      AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT event_type, MAX(n) AS n,
    SUM(CASE WHEN rn = ((n - 1) * 5) // 10 + 1 THEN vi * (10 - ((n - 1) * 5) % 10)
             WHEN rn = ((n - 1) * 5) // 10 + 2 AND ((n - 1) * 5) % 10 > 0
               THEN vi * (((n - 1) * 5) % 10)
             ELSE 0 END) AS med10
  FROM ranked GROUP BY event_type
),
dev AS (
  SELECT r.event_type, r.event_id, r.vi,
    abs(10 * r.vi - m.med10) AS dv,
    ROW_NUMBER() OVER (PARTITION BY r.event_type
                       ORDER BY abs(10 * r.vi - m.med10), r.event_id) AS rn,
    m.n
  FROM ranked r JOIN med m ON r.event_type = m.event_type
),
mad AS (
  SELECT event_type,
    SUM(CASE WHEN rn = ((n - 1) * 5) // 10 + 1 THEN dv * (10 - ((n - 1) * 5) % 10)
             WHEN rn = ((n - 1) * 5) // 10 + 2 AND ((n - 1) * 5) % 10 > 0
               THEN dv * (((n - 1) * 5) % 10)
             ELSE 0 END) AS mad100
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
  CAST(MAX(d.n) AS BIGINT) AS n_events,
  CAST(MAX(m.med10) AS DOUBLE) / 1000.0 AS median_value,
  CAST(MAX(a.mad100) AS DOUBLE) / 10000.0 AS mad_value,
  CAST(SUM(CASE WHEN 10 * d.dv > 3 * a.mad100 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_outliers
FROM dev d
JOIN med m ON d.event_type = m.event_type
JOIN mad a ON d.event_type = a.event_type
GROUP BY d.event_type
"""


@query("event_value_mad_outliers", oracle=_MAD_ORACLE)
def q_event_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via the Median Absolute Deviation — the
    breakdown-resistant alternative to z-scores (one wild value drags a
    mean/stddev fence, but not the median-of-deviations): per type,
    median and MAD come from TWO exact weighted-median passes (the
    event_value_percentiles idiom, each a rank window + integer-weighted
    interpolation), deviations stay integers by scaling — dv = |10·vi −
    med10| — and the 3-MAD fence is the pure integer predicate
    10·dv > 3·mad100, so the outlier census is engine-identical with no
    double anywhere in the decision.

    Scale shape: two rank-window passes partitioned by type (parallel;
    same health note as the percentile query) and map-side-combined
    aggregates between them; the median/MAD tables are type-cardinality
    and broadcast back.  The classic two-pass robust statistic with
    nothing driver-side."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vi = F.round(F.col("value") * 100.0).cast("bigint")
    w = Window.partitionBy("event_type").orderBy("vi", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select("event_type", "event_id", vi.alias("vi")).select(
        "event_type", "event_id", "vi",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    med = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"), _pctl_weighted(5).alias("med10")
    )
    dv_col = F.abs(10 * F.col("vi") - F.col("med10"))
    w2 = Window.partitionBy("event_type").orderBy("dv", "event_id")
    dev = (
        ranked.select("event_type", "event_id", "vi")
        .join(F.broadcast(med), "event_type")
        .select(
            "event_type", "event_id", "n", dv_col.alias("dv"), "med10"
        )
        .select(
            "event_type", "event_id", "n", "dv", "med10",
            F.row_number().over(w2).alias("rn"),
        )
    )
    mad = dev.groupBy("event_type").agg(
        F.sum(
            F.when(
                F.col("rn") == F.expr("((n - 1) * 5) div 10") + 1,
                F.col("dv") * (10 - ((F.col("n") - 1) * 5) % 10),
            )
            .when(
                (F.col("rn") == F.expr("((n - 1) * 5) div 10") + 2)
                & (((F.col("n") - 1) * 5) % 10 > 0),
                F.col("dv") * (((F.col("n") - 1) * 5) % 10),
            )
            .otherwise(0)
        ).alias("mad100")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            (F.max("med10").cast("double") / F.lit(1000.0)).alias(
                "median_value"
            ),
            (F.max("mad100").cast("double") / F.lit(10000.0)).alias(
                "mad_value"
            ),
            F.sum(
                F.when(10 * F.col("dv") > 3 * F.col("mad100"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Markov transition matrix — sequence mining over per-user event streams
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
),
pr AS (
  SELECT event_type AS next_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM ev
),
c AS (
  SELECT prev_type, next_type, COUNT(*) AS n FROM pr
  WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
t AS (SELECT prev_type, SUM(n) AS tot FROM c GROUP BY 1)
SELECT c.prev_type, c.next_type, c.n,
  CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
FROM c JOIN t USING (prev_type)
"""


@query("event_transition_matrix", oracle=_TRANSITION_ORACLE)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the sequence-mining primitive behind next-action
    prediction, funnel discovery, and session-quality heuristics: one
    lag window on the (user, ts, event_id) total order yields the
    (prev → next) bigram stream, and the row-conditional probabilities
    are a single integer-count division (n/tot, one double op — no
    float sums).  NULL ts/user/type rows are excluded on BOTH sides
    (the window NULL-ordering divergence rule).

    Scale shape: the lag window partitions by user_id (parallel, no
    global sort), the census shuffles only (types² ≤ 25) pair rows, and
    the per-prev totals derive FROM the census (a second agg over 25
    rows, broadcast back) — the corpus is scanned once."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pr = e.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    c = pr.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    t = c.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.col("tot").cast("double")).alias("p"),
    )


# ---------------------------------------------------------------------------
# EWMA with a power-of-two decay — recursion restated as a bounded exact fold
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH ev AS (
  SELECT event_type, ts, event_id,
    CAST(ROUND(value * 10000.0) AS BIGINT) AS vi
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
recent AS (
  SELECT event_type, ts, event_id, vi,
    row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC)
      AS rn
  FROM ev
),
arr AS (
  SELECT event_type,
    list_transform(list(vi ORDER BY ts, event_id), x -> CAST(x AS DOUBLE))
      AS xs
  FROM recent WHERE rn <= 12 GROUP BY 1
)
SELECT event_type, CAST(len(xs) AS BIGINT) AS n_used,
  list_reduce(xs, (acc, x) -> (acc + x) / 2.0) / 10000.0 AS ewma
FROM arr
"""


@query("events_ewma_half_life", oracle=_EWMA_ORACLE)
def q_events_ewma_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA of the last 12 values per type with alpha = 1/2 — the
    classic recursive smoother s_t = (x_t + s_{t-1})/2 restated as a
    BOUNDED exact fold: a power-of-two decay halves exactly in binary
    doubles, and 12 steps over integer mantissas < 2^31 accumulate at
    most 12 fractional bits (43 significand bits total < 53), so every
    intermediate state is exactly representable and the two engines
    fold bit-identically — the only legal way to hash-check a
    left-recursive float chain (general alpha would drift).  The last-k
    slice comes from one descending row_number window; the fold runs
    over the chronological array (array_sort on the (ts, event_id, vi)
    struct = list(... ORDER BY ts, event_id)).

    Scale shape: per-key state is k=12 values — the window partitions
    by type (parallel), and the fold is a per-row array op with zero
    extra shuffle.  This is the batch twin of a streaming EWMA whose
    state is one double per key."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    vi = F.round(F.col("value") * F.lit(10000.0)).cast("bigint")
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    recent = (
        e.select("event_type", "ts", "event_id", vi.alias("vi"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 12)
    )
    arr = recent.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "vi"))),
            lambda s: s.vi.cast("double"),
        ).alias("xs")
    )
    folded = F.aggregate(
        F.slice(F.col("xs"), 2, F.size(F.col("xs")) - 1),
        F.element_at(F.col("xs"), 1),
        lambda acc, x: (acc + x) / F.lit(2.0),
    )
    return arr.select(
        "event_type",
        F.size("xs").cast("bigint").alias("n_used"),
        (folded / F.lit(10000.0)).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# Holt's linear trend with power-of-two coefficients — double-exponential
# smoothing as a bounded exact unroll (the EWMA contract, extended)
# ---------------------------------------------------------------------------

_HOLT_K = 8


def _holt_step_sql(t: int, prev: str) -> str:
    """One Holt step as a MATERIALIZED CTE (plain CTEs would inline and
    re-evaluate the whole chain 2^steps times — the viterbi lesson)."""
    ln = f"(xs[{t}] + l + b) / 2.0"
    return f"""s{t} AS MATERIALIZED (
  SELECT event_type, xs, {ln} AS l, (({ln}) - l + b) / 2.0 AS b
  FROM {prev}
)"""


_HOLT_STEPS_SQL = ",\n".join(
    _holt_step_sql(t, f"s{t - 1}") for t in range(3, _HOLT_K + 1)
)

_HOLT_ORACLE = f"""
WITH ev AS (
  SELECT event_type, ts, event_id,
    CAST(ROUND(value * 10000.0) AS BIGINT) AS vi
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
recent AS (
  SELECT event_type, ts, event_id, vi,
    row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC)
      AS rn
  FROM ev
),
arr AS (
  SELECT event_type,
    list_transform(list(vi ORDER BY ts, event_id), x -> CAST(x AS DOUBLE))
      AS xs
  FROM recent WHERE rn <= {_HOLT_K} GROUP BY 1
),
s2 AS MATERIALIZED (
  SELECT event_type, xs, xs[2] AS l, xs[2] - xs[1] AS b
  FROM arr WHERE len(xs) = {_HOLT_K}
),
{_HOLT_STEPS_SQL}
SELECT event_type, CAST({_HOLT_K} AS BIGINT) AS n_used,
  l / 10000.0 AS level, b / 10000.0 AS trend,
  (l + b) / 10000.0 AS forecast_next
FROM s{_HOLT_K}
"""


@query("events_holt_linear", oracle=_HOLT_ORACLE)
def q_events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) smoothing over the last 8
    values per type with alpha = beta = 1/2 — level AND trend state,
    the one-step-ahead forecaster a monitoring pipeline runs per
    metric.  The recursion l_t = (x_t + l_{{t-1}} + b_{{t-1}})/2,
    b_t = (l_t − l_{{t-1}} + b_{{t-1}})/2 is hash-checkable for the same
    reason events_ewma_half_life is: power-of-two smoothing halves
    exactly in binary doubles, and the unrolled chain over integer
    mantissas < 2^31 accumulates ≤ 2 fractional bits per step (≤ 12
    over 6 steps; 43 significand bits < 53), so every intermediate
    level/trend is exactly representable and both engines compute
    bit-identical state.  General (alpha, beta) would drift — the
    coefficient choice IS the determinism contract.  Types with fewer
    than 8 values are excluded (the init needs x_1, x_2; partial
    chains would fork the oracle into 7 length variants for no
    signal).

    Scale shape: one descending row_number window per type (parallel,
    no global sort), then per-row arithmetic on an 8-element array —
    state per key is (level, trend), the streaming twin's two doubles.
    The DuckDB oracle MATERIALIZES each unrolled step: plain CTEs
    inline and cost 2^steps re-evaluations (the viterbi lesson)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    vi = F.round(F.col("value") * F.lit(10000.0)).cast("bigint")
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    recent = (
        e.select("event_type", "ts", "event_id", vi.alias("vi"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HOLT_K)
    )
    arr = (
        recent.groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "vi"))),
                lambda s: s.vi.cast("double"),
            ).alias("xs")
        )
        .filter(F.size("xs") == _HOLT_K)
    )
    df = arr.withColumn("l", F.element_at("xs", 2)).withColumn(
        "b", F.element_at("xs", 2) - F.element_at("xs", 1)
    )
    for t in range(3, _HOLT_K + 1):
        l_new = (F.element_at("xs", t) + F.col("l") + F.col("b")) / F.lit(2.0)
        df = (
            df.withColumn("l_new", l_new)
            .withColumn("b", (F.col("l_new") - F.col("l") + F.col("b")) / F.lit(2.0))
            .withColumn("l", F.col("l_new"))
            .drop("l_new")
        )
    return df.select(
        "event_type",
        F.lit(_HOLT_K).cast("bigint").alias("n_used"),
        (F.col("l") / F.lit(10000.0)).alias("level"),
        (F.col("b") / F.lit(10000.0)).alias("trend"),
        ((F.col("l") + F.col("b")) / F.lit(10000.0)).alias("forecast_next"),
    )


# ---------------------------------------------------------------------------
# Interval coalescing — gaps-and-islands union coverage per user
# ---------------------------------------------------------------------------

_INTERVALS_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id,
    epoch_us(ts) // 1000000 AS s,
    epoch_us(ts) // 1000000 + 300 AS e
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
flag AS (
  SELECT user_id, event_id, s, e,
    CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
    THEN 1 ELSE 0 END AS new_island
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl AS (
  SELECT user_id, s, e,
    SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flag
),
merged AS (
  SELECT user_id, island, MIN(s) AS st, MAX(e) AS en
  FROM isl GROUP BY 1, 2
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
  CAST(SUM(en - st) AS BIGINT) AS active_secs,
  MAX(en - st) AS longest_secs
FROM merged GROUP BY 1
"""


@query("user_active_intervals", oracle=_INTERVALS_ORACLE)
def q_user_active_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (gaps-and-islands UNION) per user: each
    event opens a 300-second presence interval, overlapping/touching
    intervals merge, and the output is the exact union coverage — the
    dwell-time/uptime operator that sessionization does NOT give you
    (a session counts events; coalesced intervals measure covered
    seconds, the billing/SLA quantity).  Islands come from the
    classic running-max-of-end window: an interval starts a new island
    iff its start exceeds the max end seen so far; the island id is
    the running sum of those flags.  All arithmetic is integer
    seconds (epoch_us // 1e6, the unix_timestamp truncation contract);
    NULL ts/user rows are excluded on BOTH sides.

    Scale shape: two windows and one aggregation, all partitioned by
    user_id — no global sort, per-user state is a single running max.
    At 100 TB the key extends to (user, day) with edge splicing
    exactly like rolling_30d_spend."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    # unix_timestamp truncates to whole seconds — the epoch_us // 1e6
    # floor the oracle states (DuckDB's epoch() would ROUND instead)
    sec = F.unix_timestamp("ts")
    ev = e.select(
        "user_id",
        "event_id",
        sec.alias("s"),
        (sec + F.lit(300)).alias("e"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flag = ev.withColumn(
        "new_island",
        F.when(
            F.max("e").over(w).isNull() | (F.col("s") > F.max("e").over(w)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    isl = flag.withColumn("island", F.sum("new_island").over(wrun))
    merged = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("st"), F.max("e").alias("en")
    )
    return merged.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_islands"),
        F.sum(F.col("en") - F.col("st")).alias("active_secs"),
        F.max(F.col("en") - F.col("st")).alias("longest_secs"),
    )


# ---------------------------------------------------------------------------
# Chi-square independence residuals — event_type × day-of-week
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH ev AS (
  SELECT event_type, dayofweek(ts) AS dow FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
cell AS (SELECT event_type, dow, COUNT(*) AS observed FROM ev GROUP BY 1, 2),
r AS (SELECT event_type, SUM(observed) AS rn FROM cell GROUP BY 1),
c AS (SELECT dow, SUM(observed) AS cn FROM cell GROUP BY 1),
n AS (SELECT SUM(observed) AS n FROM cell)
SELECT cell.event_type, cell.dow, cell.observed,
  CAST(r.rn AS DOUBLE) * CAST(c.cn AS DOUBLE) / CAST(n.n AS DOUBLE)
    AS expected,
  (CAST(cell.observed AS DOUBLE)
   - CAST(r.rn AS DOUBLE) * CAST(c.cn AS DOUBLE) / CAST(n.n AS DOUBLE))
  / sqrt(CAST(r.rn AS DOUBLE) * CAST(c.cn AS DOUBLE) / CAST(n.n AS DOUBLE))
    AS residual
FROM cell JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN n
"""


@query("event_dow_residuals", oracle=_CHI2_ORACLE)
def q_event_dow_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson standardized residuals of the event_type × day-of-week
    contingency table — the chi-square independence diagnostic emitted
    PER CELL (which type over-/under-indexes on which weekday) instead
    of as one summed statistic: a float sum over cells would be
    order-dependent and unhashable, while per-cell residuals
    (o − e)/√e are closed-form doubles from exact integer counts
    (marginals and total are int64 sums; e = r·c/n is three casts and
    two IEEE ops; √ is correctly rounded) — bit-identical by
    construction.  Spark's 1-based dayofweek is aligned to DuckDB's
    0-based convention (the documented divergence).

    Scale shape: one census shuffle carrying (types × 7) cells; the
    marginals derive from the census itself (25-row aggregations,
    broadcast back) — the events table is scanned once."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    cell = e.select(
        "event_type", (F.dayofweek("ts") - 1).cast("bigint").alias("dow")
    ).groupBy("event_type", "dow").agg(F.count("*").alias("observed"))
    r = cell.groupBy("event_type").agg(F.sum("observed").alias("rn"))
    c = cell.groupBy("dow").agg(F.sum("observed").alias("cn"))
    n = cell.agg(F.sum("observed").alias("n"))
    expected = (
        F.col("rn").cast("double")
        * F.col("cn").cast("double")
        / F.col("n").cast("double")
    )
    return (
        cell.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "dow",
            "observed",
            expected.alias("expected"),
            (
                (F.col("observed").cast("double") - expected)
                / F.sqrt(expected)
            ).alias("residual"),
        )
    )


# ---------------------------------------------------------------------------
# Quantile normalization — map each type's values onto the global distribution
# ---------------------------------------------------------------------------

_QNORM_ORACLE = """
WITH ev AS (
  SELECT event_id, event_type, CAST(ROUND(value * 10000.0) AS BIGINT) AS vi
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
tr AS (
  SELECT event_id, event_type, vi,
    row_number() OVER (PARTITION BY event_type ORDER BY vi, event_id) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n_t
  FROM ev
),
gr AS (
  SELECT vi, row_number() OVER (ORDER BY vi, event_id) AS rg FROM ev
),
ng AS (SELECT COUNT(*) AS n_g FROM ev),
tgt AS (
  SELECT t.event_id, t.event_type, t.vi,
    CASE WHEN t.n_t > 1
      THEN CAST(((t.rn - 1) * (ng.n_g - 1)) // (t.n_t - 1) AS BIGINT) + 1
      ELSE CAST((ng.n_g - 1) // 2 AS BIGINT) + 1
    END AS idx
  FROM tr t CROSS JOIN ng
)
SELECT t.event_id, t.event_type,
  CAST(t.vi AS DOUBLE) / 10000.0 AS value_orig,
  CAST(g.vi AS DOUBLE) / 10000.0 AS value_norm
FROM tgt t JOIN gr g ON t.idx = g.rg
"""


@query("event_value_quantile_normalized", oracle=_QNORM_ORACLE)
def q_event_value_quantile_normalized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile normalization: each event's value is replaced by the
    GLOBAL distribution's value at the same relative rank within its
    type — the feature-engineering transform that makes heterogeneous
    metrics comparable (microarray normalization, learned-feature
    preprocessing) and the distribution-matching step behind
    copula-style synthetic data.  Ranks are integer row_numbers with
    event_id tie-breaks, the target index is one exact integer
    proportion ((rn−1)·(n_g−1) div (n_t−1), singleton types map to the
    global median index), and the lookup is a rank-keyed equi-join —
    every step deterministic, no float interpolation.

    Scale shape: the per-type rank partitions by type; the global rank
    is the audit-exact form (single ordering) — at 100 TB the same
    transform uses the equi-depth histogram's range-partitioned rank
    (value_equidepth_histogram) or approx-quantile reference cutpoints
    broadcast to a narrow map, trading exactness for zero global
    sort; semantics are pinned here."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    ev = e.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * F.lit(10000.0)).cast("bigint").alias("vi"),
    )
    wt = Window.partitionBy("event_type").orderBy("vi", "event_id")
    tr = ev.select(
        "event_id",
        "event_type",
        "vi",
        F.row_number().over(wt).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n_t"),
    )
    gr = ev.select(
        "vi",
        F.row_number()
        .over(Window.orderBy("vi", "event_id"))
        .alias("rg"),
    )
    ng = ev.agg(F.count("*").alias("n_g"))
    tgt = tr.crossJoin(F.broadcast(ng)).select(
        "event_id",
        "event_type",
        "vi",
        F.when(
            F.col("n_t") > 1,
            F.expr("CAST(((rn - 1) * (n_g - 1)) div (n_t - 1) AS BIGINT)")
            + 1,
        )
        .otherwise(F.expr("CAST((n_g - 1) div 2 AS BIGINT)") + 1)
        .alias("idx"),
    )
    # tgt and gr derive from the same ev frame — alias both sides (the
    # AMBIGUOUS_SELF_JOIN gotcha) and qualify every column
    t, g = tgt.alias("t"), gr.alias("g")
    return t.join(g, F.col("t.idx") == F.col("g.rg")).select(
        F.col("t.event_id").alias("event_id"),
        F.col("t.event_type").alias("event_type"),
        (F.col("t.vi").cast("double") / F.lit(1e4)).alias("value_orig"),
        (F.col("g.vi").cast("double") / F.lit(1e4)).alias("value_norm"),
    )


# ---------------------------------------------------------------------------
# SCD2 temporal join — facts joined to the dimension version valid at
# event time (join-as-of-then)
# ---------------------------------------------------------------------------

_SCD2_JOIN_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE ts IS NOT NULL AND user_id % 10 = 0
),
marked AS (
  SELECT user_id, event_type, ts, event_id,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM ev
),
versions AS (
  SELECT user_id, event_type, ts AS vf,
    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
  FROM marked
  WHERE prev_type IS NULL OR event_type != prev_type
),
purchases AS (
  SELECT user_id, ts, event_id FROM ev WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
  v.event_type AS regime_type,
  strftime(v.vf, '%Y-%m-%d %H:%M:%S') AS regime_from
FROM purchases p JOIN versions v
  ON p.user_id = v.user_id
 AND v.vf <= p.ts AND (p.ts < v.vt OR v.vt IS NULL)
"""


@query("scd2_temporal_join", oracle=_SCD2_JOIN_ORACLE)
def q_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-as-of-THEN: each purchase is joined to the SCD2 dimension
    version valid AT ITS TIMESTAMP (vf ≤ ts < vt, open-ended current
    version) — the lakehouse temporal-join pattern (price at order
    time, segment at click time) that plain as-of joins approximate
    and SCD2 makes exact.  The dimension is the user_value_scd2 fold
    (change-point runs with lead validity); zero-length versions from
    equal-timestamp change points match nothing in BOTH engines
    (vf ≤ ts < vt is vacuous), so the tie rule of the fold carries
    through the join unchanged.

    Scale shape: dimension build and join share the user_id
    partitioning — the interval predicate rides a KEYED join (per-user
    intervals, bounded versions per user), never a cartesian; at
    100 TB the dimension is the compacted bucketed table and the join
    is co-located (sinks/bucketed.py)."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & (F.col("user_id") % 10 == 0))
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_type", F.col("ts").alias("vf"), "event_id")
        .withColumn(
            "vt",
            F.lead("vf").over(
                Window.partitionBy("user_id").orderBy("vf", "event_id")
            ),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    p, v = purchases.alias("p"), versions.alias("v")
    return (
        p.join(
            v,
            (F.col("p.user_id") == F.col("v.user_id"))
            & (F.col("v.vf") <= F.col("p.ts"))
            & ((F.col("p.ts") < F.col("v.vt")) | F.col("v.vt").isNull()),
        )
        .select(
            F.col("p.event_id").alias("event_id"),
            F.col("p.user_id").alias("user_id"),
            F.date_format("p.ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.col("v.event_type").alias("regime_type"),
            F.date_format("v.vf", "yyyy-MM-dd HH:mm:ss").alias("regime_from"),
        )
    )


@query("stream_scd2_enrich", oracle=_SCD2_JOIN_ORACLE)
def q_stream_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scd2_temporal_join run as a STREAM-STATIC join: purchase facts
    stream in micro-batches and enrich against the broadcast SCD2
    dimension per trigger — stateless (static side, inner join), so
    the drained sink equals the batch temporal join for any
    micro-batching; same oracle.  The serving shape for
    slowly-changing lookups: the dimension refreshes out-of-band, the
    fact stream never blocks on it.  See streaming/pipeline.py::
    run_stream_scd2_enrich."""
    from ..streaming.pipeline import run_stream_scd2_enrich

    return run_stream_scd2_enrich(spark, sf_dir)


# ---------------------------------------------------------------------------
# Linear attribution — purchase value split equally over the click window
# ---------------------------------------------------------------------------

_ATTRIBUTION_ORACLE = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts,
    epoch_us(ts) // 1000000 AS sec,
    CAST(ROUND(value * 10000.0) AS BIGINT) AS vi
  FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL
    AND user_id IS NOT NULL AND value IS NOT NULL
),
c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) // 1000000 AS sec
  FROM events
  WHERE event_type = 'click' AND ts IS NOT NULL AND user_id IS NOT NULL
),
j AS (
  SELECT p.purchase_id, c.click_id, p.user_id, p.vi,
    COUNT(*) OVER (PARTITION BY p.purchase_id) AS n_clicks
  FROM p JOIN c
    ON p.user_id = c.user_id
   AND c.sec <= p.sec AND p.sec - c.sec <= 3600
)
SELECT purchase_id, click_id, user_id,
  CAST(n_clicks AS BIGINT) AS n_clicks,
  CAST(vi AS DOUBLE) / CAST(n_clicks AS DOUBLE) / 10000.0 AS credit
FROM j
"""


@query("linear_attribution_credits", oracle=_ATTRIBUTION_ORACLE)
def q_linear_attribution_credits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-weight) attribution: every purchase's value is
    split evenly across the same user's clicks in the preceding hour —
    the marketing-attribution primitive between last-touch (the as-of
    join) and data-driven models.  The click window is a keyed
    time-range join on user_id (never a cartesian), the per-purchase
    click count one window over the join result, and each credit is a
    single double division of the exact value mantissa.

    Scale shape: join and window share the key partitioning; output is
    (purchase × window clicks) rows — bounded by the tolerance, the
    same state law as the stream-stream click/error join."""
    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    p = base.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_timestamp("ts").alias("p_sec"),
        F.round(F.col("value") * F.lit(10000.0)).cast("bigint").alias("vi"),
    )
    c = base.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.unix_timestamp("ts").alias("c_sec"),
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_sec") <= F.col("p_sec"))
        & (F.col("p_sec") - F.col("c_sec") <= 3600),
    ).withColumn(
        "n_clicks", F.count("*").over(Window.partitionBy("purchase_id"))
    )
    return j.select(
        "purchase_id",
        "click_id",
        "user_id",
        F.col("n_clicks").cast("bigint").alias("n_clicks"),
        (
            F.col("vi").cast("double")
            / F.col("n_clicks").cast("double")
            / F.lit(10000.0)
        ).alias("credit"),
    )


# ---------------------------------------------------------------------------
# Stationary distribution of the event-type Markov chain — unrolled
# integer power iteration on the transition counts
# ---------------------------------------------------------------------------

_STATIONARY_ROUND_SQL = """
v{r} AS (
  SELECT c.next_type AS event_type,
    CAST(SUM(CAST((v.v * c.n) // t.tot AS BIGINT)) AS BIGINT) AS v
  FROM c JOIN v{p} v ON c.prev_type = v.event_type
         JOIN t ON c.prev_type = t.prev_type
  GROUP BY 1
)"""

_STATIONARY_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
),
pr AS (
  SELECT event_type AS next_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM ev
),
c AS (
  SELECT prev_type, next_type, COUNT(*) AS n FROM pr
  WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
t AS (SELECT prev_type, SUM(n) AS tot FROM c GROUP BY 1),
v0 AS (SELECT DISTINCT prev_type AS event_type, 1000000000 AS v FROM c),
{_STATIONARY_ROUND_SQL.format(r=1, p=0)},
{_STATIONARY_ROUND_SQL.format(r=2, p=1)},
{_STATIONARY_ROUND_SQL.format(r=3, p=2)},
s AS (SELECT CAST(SUM(v) AS BIGINT) AS total FROM v3)
SELECT v3.event_type, v3.v AS mass_i,
  CAST(v3.v AS DOUBLE) / CAST(s.total AS DOUBLE) AS stationary_share
FROM v3 CROSS JOIN s
"""


@query("event_type_stationary_dist", oracle=_STATIONARY_ORACLE)
def q_event_type_stationary_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain — three
    unrolled power-iteration rounds v ← vP over the transition counts
    (where does user attention settle in steady state).  Everything is
    EXACT integer arithmetic: the mass vector starts at 1e9 per type
    and each round's update is Σ_i (v_i·n_ij) div tot_i — floor
    division on non-negative ints is engine-identical, so three rounds
    compose deterministically (the pagerank discipline applied to the
    behavioral chain); the final share is one double division.

    Scale shape: the transition matrix is types² rows (broadcast); each
    round is a broadcast join + types-row aggregate — iteration cost is
    independent of the corpus after the one census pass."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pr = e.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    c = pr.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    c = c.localCheckpoint(eager=True)  # census once; rounds reuse it
    t = c.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    v = c.select(F.col("prev_type").alias("event_type")).distinct().select(
        "event_type", F.lit(1000000000).cast("bigint").alias("v")
    )
    for _ in range(3):
        v = (
            c.join(
                F.broadcast(v),
                c["prev_type"] == v["event_type"],
            )
            .join(F.broadcast(t), "prev_type")
            .select(
                F.col("next_type").alias("event_type"),
                F.expr("CAST((v * n) div tot AS BIGINT)").alias("term"),
            )
            .groupBy("event_type")
            .agg(F.sum("term").cast("bigint").alias("v"))
        )
    s = v.agg(F.sum("v").cast("bigint").alias("total"))
    return v.crossJoin(F.broadcast(s)).select(
        "event_type",
        F.col("v").alias("mass_i"),
        (F.col("v").cast("double") / F.col("total").cast("double")).alias(
            "stationary_share"
        ),
    )


# ---------------------------------------------------------------------------
# Hourly autocorrelation — ACF lags 1..6 over the gapfilled count series
# ---------------------------------------------------------------------------

_ACF_LAGS = 6

_ACF_ORACLE = f"""
WITH base AS (
  SELECT event_type, ts FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
actual AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM base GROUP BY 1, 2
),
b AS (SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM actual GROUP BY 1),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM b
),
series AS (
  SELECT s.event_type, s.h, COALESCE(a.n, 0) AS x
  FROM spine s LEFT JOIN actual a
    ON a.event_type = s.event_type AND a.h = s.h
),
st AS (
  SELECT event_type, h, x,
    COUNT(*) OVER (PARTITION BY event_type) AS n,
    SUM(x) OVER (PARTITION BY event_type) AS s
  FROM series
),
yt AS (SELECT event_type, h, n AS nh, n * x - s AS y FROM st),
ld AS (
  SELECT event_type, nh, y,
    {", ".join(f"lead(y, {k}) OVER w AS y{k}" for k in range(1, _ACF_LAGS + 1))}
  FROM yt WINDOW w AS (PARTITION BY event_type ORDER BY h)
),
agg AS (
  SELECT event_type, MAX(nh) AS n_hours, SUM(y * y) AS d,
    {", ".join(f"SUM(y * y{k}) AS n{k}" for k in range(1, _ACF_LAGS + 1))}
  FROM ld GROUP BY 1
)
{" UNION ALL ".join(
    f"SELECT event_type, CAST({k} AS BIGINT) AS lag, "
    "CAST(n_hours AS BIGINT) AS n_hours, "
    f"CAST(n{k} AS DOUBLE) / CAST(NULLIF(d, 0) AS DOUBLE) AS acf FROM agg"
    for k in range(1, _ACF_LAGS + 1))}
"""


@query("event_hourly_autocorrelation", oracle=_ACF_ORACLE)
def q_event_hourly_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of each event type's hourly count series
    at lags 1..6 — the seasonality detector feeding anomaly thresholds
    and forecast model choice (a daily rhythm shows as structure across
    the lag profile).  The series is gapfilled to a complete hourly
    spine first (missing buckets are real zeros — ACF over a sparse
    series is a different, wrong statistic).  Determinism contract: with
    S = Σx and n the series length, r_k = Σ(n·x_t − S)(n·x_{{t+k}} − S) /
    Σ(n·x_t − S)² — both sums are exact integers (the n² factor
    cancels), divided ONCE; NULLIF guards the constant-series 0/0 (the
    OLS lesson).  The lag alignment is lead() over the complete spine —
    the order key is the generated hour, never NULL.

    Scale shape: the spine is generated O(hours) per type, the census
    map-side combines events to cells, and the n/S/lead windows all ride
    ONE shuffle on event_type; the moment reduction emits one row per
    (type, lag).  Series length, not event count, bounds every stage
    after the census."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    actual = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    bounds = actual.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    series = spine.join(actual, ["event_type", "h"], "left").withColumn(
        "x", F.coalesce("n", F.lit(0))
    )
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("h")
    yt = series.select(
        "event_type",
        "h",
        F.count("*").over(wt).alias("nh"),
        (F.count("*").over(wt) * F.col("x") - F.sum("x").over(wt)).alias("y"),
    )
    ld = yt.select(
        "event_type",
        "nh",
        "y",
        *[F.lead("y", k).over(wo).alias(f"y{k}") for k in range(1, _ACF_LAGS + 1)],
    )
    agg = ld.groupBy("event_type").agg(
        F.max("nh").alias("n_hours"),
        F.sum(F.col("y") * F.col("y")).alias("d"),
        *[
            F.sum(F.col("y") * F.col(f"y{k}")).alias(f"n{k}")
            for k in range(1, _ACF_LAGS + 1)
        ],
    )
    stack_args = ", ".join(
        f"cast({k} as bigint), cast(n{k} as double)"
        for k in range(1, _ACF_LAGS + 1)
    )
    return agg.select(
        "event_type",
        F.col("n_hours").cast("bigint").alias("n_hours"),
        F.expr(f"stack({_ACF_LAGS}, {stack_args})").alias("lag", "nk"),
        F.col("d"),
    ).select(
        "event_type",
        "lag",
        "n_hours",
        (F.col("nk") / F.nullif(F.col("d"), F.lit(0)).cast("double")).alias("acf"),
    )


# ---------------------------------------------------------------------------
# Event debouncing — drop same-key repeats inside a tolerance window
# ---------------------------------------------------------------------------

_DEBOUNCE_US = 21_600 * 1_000_000  # 6 h in microseconds

_DEBOUNCE_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
),
g AS (
  SELECT event_type,
    epoch_us(ts) - lag(epoch_us(ts))
      OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_us
  FROM e
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_total,
  CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > {_DEBOUNCE_US}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > {_DEBOUNCE_US}
                THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
    AS kept_ratio
FROM g GROUP BY 1
"""


@query("events_debounced_counts", oracle=_DEBOUNCE_ORACLE)
def q_events_debounced_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debouncing — per (user, type), an event within 6 h of the
    previous kept-or-not event is a repeat (retry storms, double
    clicks, at-least-once replays) and is dropped before counting.
    This lag-gap form keeps the FIRST event of every burst; gaps are
    exact integer microseconds (unix_micros / epoch_us — second-grain
    truncation never enters), and the window order carries event_id as
    the tiebreak so equal timestamps rank identically in both engines
    (the NULL/tie ordering lesson, applied to ties).

    Scale shape: one window shuffle on (user_id, event_type) — the
    same partitioning every per-user feature rides — then a
    map-side-combined per-type rollup.  Note the simple lag-gap is the
    distributed-friendly variant: the strict sequential debounce
    (gap from the last KEPT event) is a running state and lives in
    streaming as the stateful form."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    )
    kept = F.when(
        F.col("gap_us").isNull() | (F.col("gap_us") > _DEBOUNCE_US), 1
    ).otherwise(0)
    return g.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.sum(kept).cast("bigint").alias("n_kept"),
        (
            F.sum(kept).cast("double") / F.count("*").cast("double")
        ).alias("kept_ratio"),
    )


# ---------------------------------------------------------------------------
# CUSUM change detection — exact-integer cumulative-sum alarms
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH base AS (
  SELECT event_type, ts FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
actual AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM base GROUP BY 1, 2
),
b AS (SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM actual GROUP BY 1),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM b
),
series AS (
  SELECT s.event_type, s.h, COALESCE(a.n, 0) AS x
  FROM spine s LEFT JOIN actual a
    ON a.event_type = s.event_type AND a.h = s.h
),
st AS (
  SELECT event_type, h, x,
    COUNT(*) OVER (PARTITION BY event_type) AS n,
    SUM(x) OVER (PARTITION BY event_type) AS s
  FROM series
),
cs AS (
  SELECT event_type, h, s,
    SUM(n * x - s) OVER (PARTITION BY event_type ORDER BY h
                         ROWS UNBOUNDED PRECEDING) AS c
  FROM st
),
cu AS (
  SELECT event_type, s,
    c - LEAST(0, MIN(c) OVER (PARTITION BY event_type ORDER BY h
                              ROWS UNBOUNDED PRECEDING)) AS cusum
  FROM cs
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_hours,
  CAST(SUM(CASE WHEN cusum > s THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_hours,
  CAST(MAX(cusum) AS BIGINT) AS max_cusum,
  CAST(MAX(cusum) AS DOUBLE) / CAST(MAX(s) AS DOUBLE) AS max_cusum_ratio
FROM cu GROUP BY 1
"""


@query("events_cusum_alarms", oracle=_CUSUM_ORACLE)
def q_events_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detection over each type's gapfilled
    hourly series — the sequential drift detector (Page's test): the
    recursion S_i = max(0, S_{i-1} + (x_i − mean)) looks stateful but
    closes over windows as cs_i − min(0, prefix-min(cs)), so the whole
    detector is two running frames on one shuffle.  Deviations ride the
    n·x − S cross-multiplication (the ACF discipline) keeping every
    intermediate an exact integer; the alarm fence cusum > S (one
    series-total of cumulative excess) is a pure integer predicate.

    Scale shape: identical to the ACF — spine generation, census,
    and all three windows on the single event_type shuffle; the rollup
    emits one row per type."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    actual = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    bounds = actual.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    series = spine.join(actual, ["event_type", "h"], "left").withColumn(
        "x", F.coalesce("n", F.lit(0))
    )
    wt = Window.partitionBy("event_type")
    wo = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    st = series.select(
        "event_type",
        "h",
        "x",
        F.count("*").over(wt).alias("n"),
        F.sum("x").over(wt).alias("s"),
    )
    cs = st.select(
        "event_type",
        "h",
        "s",
        F.sum(F.col("n") * F.col("x") - F.col("s")).over(wo).alias("c"),
    )
    cu = cs.select(
        "event_type",
        "s",
        (
            F.col("c") - F.least(F.lit(0).cast("bigint"), F.min("c").over(wo))
        ).alias("cusum"),
    )
    return cu.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_hours"),
        F.sum(F.when(F.col("cusum") > F.col("s"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_alarm_hours"),
        F.max("cusum").cast("bigint").alias("max_cusum"),
        (
            F.max("cusum").cast("double") / F.max("s").cast("double")
        ).alias("max_cusum_ratio"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival — churn curve with right-censoring
# ---------------------------------------------------------------------------

_KM_ORACLE = """
WITH e AS (
  SELECT user_id, ts FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
gmax AS (SELECT MAX(ts) AS gm FROM e),
u AS (
  SELECT user_id,
    date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS d,
    CASE WHEN MAX(ts) < (SELECT gm FROM gmax) - INTERVAL 7 DAY
         THEN 1 ELSE 0 END AS observed
  FROM e GROUP BY 1
),
c AS (
  SELECT d, SUM(observed) AS ev, COUNT(*) AS tot FROM u GROUP BY 1
),
r AS (
  SELECT d, ev,
    (SELECT COUNT(*) FROM u)
      - COALESCE(SUM(tot) OVER (ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM c
),
ev_rows AS (
  SELECT d, ev, n_risk,
    CASE WHEN n_risk > ev
         THEN CAST(FLOOR(ln(CAST(n_risk - ev AS DOUBLE)
                            / CAST(n_risk AS DOUBLE)) * 1e9) AS BIGINT)
         ELSE NULL END AS term_q
  FROM r WHERE ev > 0
),
km AS (
  SELECT d, ev, n_risk, term_q,
    SUM(term_q) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum_q
  FROM ev_rows
)
SELECT CAST(d AS BIGINT) AS duration_days,
  CAST(n_risk AS BIGINT) AS n_at_risk,
  CAST(ev AS BIGINT) AS n_events,
  CASE WHEN term_q IS NULL THEN CAST(0.0 AS DOUBLE)
       ELSE exp(CAST(cum_q AS DOUBLE) / 1e9) END AS survival
FROM km
"""


@query("user_survival_curve", oracle=_KM_ORACLE)
def q_user_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for user retention — the product-
    limit estimator with right-censoring: a user's lifetime is first→
    last activity; users still active within 7 days of the dataset edge
    are CENSORED (they inform the at-risk denominator without counting
    as churn — the bias naive retention curves carry).  The cumulative
    product Π(1 − d_t/n_t) is a left-recursive float chain, so it rides
    the quantized-log discipline: each factor becomes the exact integer
    FLOOR(ln((n−d)/n)·1e9), the running product an integer prefix sum,
    and exp() is applied once per emitted row to an identical double.
    A step where every at-risk user churns sets survival to exactly 0.

    Scale shape: one per-user min/max aggregation (map-side combined),
    a duration-grain census (output is distinct-durations-sized), and
    two running windows over that tiny frame; the global max broadcasts
    as a 1-row scalar."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    gmax = e.agg(F.max("ts").alias("gm"))
    u = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .crossJoin(F.broadcast(gmax))
        .select(
            F.datediff(F.col("hi").cast("date"), F.col("lo").cast("date")).alias(
                "d"
            ),
            F.when(
                F.col("hi") < F.col("gm") - F.expr("INTERVAL 7 DAYS"), 1
            )
            .otherwise(0)
            .alias("observed"),
        )
    )
    c = u.groupBy("d").agg(
        F.sum("observed").alias("ev"), F.count("*").alias("tot")
    )
    n_users = u.agg(F.count("*").alias("n_users"))
    wprev = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = c.crossJoin(F.broadcast(n_users)).select(
        "d",
        "ev",
        (
            F.col("n_users")
            - F.coalesce(F.sum("tot").over(wprev), F.lit(0).cast("bigint"))
        ).alias("n_risk"),
    )
    ev_rows = r.filter(F.col("ev") > 0).withColumn(
        "term_q",
        F.when(
            F.col("n_risk") > F.col("ev"),
            F.floor(
                F.log(
                    (F.col("n_risk") - F.col("ev")).cast("double")
                    / F.col("n_risk").cast("double")
                )
                * F.lit(1e9)
            ).cast("bigint"),
        ),
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    km = ev_rows.withColumn("cum_q", F.sum("term_q").over(wcum))
    return km.select(
        F.col("d").cast("bigint").alias("duration_days"),
        F.col("n_risk").cast("bigint").alias("n_at_risk"),
        F.col("ev").cast("bigint").alias("n_events"),
        F.when(F.col("term_q").isNull(), F.lit(0.0))
        .otherwise(F.exp(F.col("cum_q").cast("double") / F.lit(1e9)))
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# LTTB downsampling — largest-triangle-three-buckets, 50 buckets
# ---------------------------------------------------------------------------

_LTTB_B = 50

_LTTB_ORACLE = f"""
WITH e AS (
  SELECT ts, event_id, CAST(ROUND(value * 10000.0) AS BIGINT) AS y
  FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL
    AND value IS NOT NULL AND event_id IS NOT NULL
),
m AS (SELECT MIN(epoch_us(ts)) AS mn FROM e),
p AS (
  SELECT ts, event_id, y,
    CAST((epoch_us(ts) - (SELECT mn FROM m)) // 60000000 AS BIGINT) AS x
  FROM e
),
rnn AS (
  SELECT *, row_number() OVER (ORDER BY ts, event_id) AS rn,
    COUNT(*) OVER () AS n
  FROM p
),
bk AS (
  SELECT *, CAST(((rn - 1) * {_LTTB_B}) // n AS BIGINT) AS bucket FROM rnn
),
agg AS (
  SELECT bucket, COUNT(*) AS nb, SUM(x) AS sx, SUM(y) AS sy
  FROM bk GROUP BY 1
),
mm AS (
  SELECT bucket, CAST(sx // nb AS BIGINT) AS mx,
    CAST(sy // nb AS BIGINT) AS my
  FROM agg
),
nbr AS (
  SELECT bucket,
    lag(mx) OVER w AS mxp, lag(my) OVER w AS myp,
    lead(mx) OVER w AS mxn, lead(my) OVER w AS myn
  FROM mm WINDOW w AS (ORDER BY bucket)
),
lastb AS (SELECT MAX(bucket) AS lb FROM bk),
ar AS (
  SELECT b.bucket, b.ts, b.y, b.rn,
    CASE WHEN b.bucket > 0 AND b.bucket < (SELECT lb FROM lastb)
         THEN ABS((v.mxp - v.mxn) * (b.y - v.myp)
                  - (b.x - v.mxp) * (v.myp - v.myn)) END AS area,
    CASE WHEN b.bucket = 0 THEN b.rn
         WHEN b.bucket = (SELECT lb FROM lastb) THEN -b.rn END AS key0
  FROM bk b JOIN nbr v ON b.bucket = v.bucket
),
sel AS (
  SELECT *, row_number() OVER (
    PARTITION BY bucket
    ORDER BY key0 ASC NULLS LAST, area DESC, rn ASC) AS rk
  FROM ar
)
SELECT bucket, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
  CAST(y AS DOUBLE) / 10000.0 AS value_q
FROM sel WHERE rk = 1
"""


@query("events_lttb_downsample", oracle=_LTTB_ORACLE)
def q_events_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB (largest-triangle-three-buckets) downsampling of the
    purchase-value series to 50 visually-representative points — the
    standard dashboard decimation: each bucket keeps the point forming
    the largest triangle with its neighbor buckets, preserving spikes
    and shape where naive bucket means flatten them.  This is the
    parallel LTTB variant (neighbors are bucket MEANS, not the
    sequentially-selected point — the form with no cross-bucket data
    dependency).  Determinism contract: x is exact minutes from the
    series start, y the exact 1e4 value mantissa, bucket means are
    floor-divided integers, so every triangle area is an exact integer
    cross product; first/last buckets pin their boundary points, and
    the per-bucket argmax states its ORDER BY with NULLS LAST + rn
    tiebreak explicitly (Spark defaults NULLS FIRST, DuckDB NULLS
    LAST).

    Scale shape: one row_number ordering shuffle (at 100 TB: a
    pre-sorted/bucketed time layout makes it free), a 50-row bucket
    census whose neighbor means broadcast back, and a per-bucket
    window on the same bucket key.  Output is O(buckets)."""
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_id").isNotNull()
    )
    mn = e.agg(F.min(F.unix_micros("ts")).alias("mn"))
    p = e.crossJoin(F.broadcast(mn)).select(
        "ts",
        "event_id",
        F.round(F.col("value") * F.lit(10000.0)).cast("bigint").alias("y"),
        F.expr("(unix_micros(ts) - mn) div 60000000").cast("bigint").alias("x"),
    )
    wall = Window.partitionBy()
    worder = Window.orderBy("ts", "event_id")
    bk = p.select(
        "*",
        F.row_number().over(worder).alias("rn"),
        F.count("*").over(wall).alias("n"),
    ).withColumn("bucket", F.expr(f"((rn - 1) * {_LTTB_B}) div n").cast("bigint"))
    agg = bk.groupBy("bucket").agg(
        F.count("*").alias("nb"), F.sum("x").alias("sx"), F.sum("y").alias("sy")
    )
    mm = agg.select(
        "bucket",
        F.expr("sx div nb").cast("bigint").alias("mx"),
        F.expr("sy div nb").cast("bigint").alias("my"),
    )
    wb = Window.orderBy("bucket")
    nbr = mm.select(
        "bucket",
        F.lag("mx").over(wb).alias("mxp"),
        F.lag("my").over(wb).alias("myp"),
        F.lead("mx").over(wb).alias("mxn"),
        F.lead("my").over(wb).alias("myn"),
    )
    lastb = bk.agg(F.max("bucket").alias("lb"))
    ar = (
        bk.join(F.broadcast(nbr), "bucket")
        .crossJoin(F.broadcast(lastb))
        .select(
            "bucket",
            "ts",
            "y",
            "rn",
            F.when(
                (F.col("bucket") > 0) & (F.col("bucket") < F.col("lb")),
                F.abs(
                    (F.col("mxp") - F.col("mxn")) * (F.col("y") - F.col("myp"))
                    - (F.col("x") - F.col("mxp"))
                    * (F.col("myp") - F.col("myn"))
                ),
            ).alias("area"),
            F.when(F.col("bucket") == 0, F.col("rn"))
            .when(F.col("bucket") == F.col("lb"), -F.col("rn"))
            .alias("key0"),
        )
    )
    wsel = Window.partitionBy("bucket").orderBy(
        F.col("key0").asc_nulls_last(), F.col("area").desc(), F.col("rn").asc()
    )
    return (
        ar.withColumn("rk", F.row_number().over(wsel))
        .filter(F.col("rk") == 1)
        .select(
            "bucket",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
            (F.col("y").cast("double") / F.lit(10000.0)).alias("value_q"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort LTV triangle — cumulative revenue per user by acquisition week
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH p AS (
  SELECT user_id, ts, CAST(ROUND(value * 10000.0) AS BIGINT) AS v_i
  FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL
    AND user_id IS NOT NULL AND value IS NOT NULL
),
cohorts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_wk FROM p GROUP BY 1
),
sizes AS (SELECT cohort_wk, COUNT(*) AS n_users FROM cohorts GROUP BY 1),
cells AS (
  SELECT c.cohort_wk,
    CAST(date_diff('day', CAST(c.cohort_wk AS DATE),
                   CAST(date_trunc('week', p.ts) AS DATE)) // 7
         AS BIGINT) AS week_offset,
    SUM(p.v_i) AS rev_i
  FROM p JOIN cohorts c ON p.user_id = c.user_id
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort_wk, week_offset, rev_i,
    SUM(rev_i) OVER (PARTITION BY cohort_wk ORDER BY week_offset
                     ROWS UNBOUNDED PRECEDING) AS cum_i
  FROM cells
)
SELECT strftime(cum.cohort_wk, '%Y-%m-%d') AS cohort_week,
  week_offset,
  CAST(s.n_users AS BIGINT) AS n_cohort_users,
  CAST(rev_i AS DOUBLE) / 10000.0 AS revenue,
  CAST(cum_i AS DOUBLE) / CAST(s.n_users * 10000 AS DOUBLE)
    AS cum_ltv_per_user
FROM cum JOIN sizes s ON cum.cohort_wk = s.cohort_wk
"""


@query("cohort_ltv_triangle", oracle=_LTV_ORACLE)
def q_cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle — the MONEY companion to the retention
    triangle (user_weekly_retention): users grouped by first-purchase
    week, purchase revenue summed per (cohort, week-offset) cell, and
    the running cumulative divided by cohort size = the
    lifetime-value-per-user curve every payback-period decision reads.
    Revenue rides 1e4 integer mantissas end-to-end; the cumulative is
    an exact integer window sum and each emitted double is one
    division (the denominator folds cohort size and the mantissa scale
    into a single exact integer).

    Scale shape: the cohort week attaches as a window min over the
    SAME user_id shuffle the purchases already need — no user→cohort
    join at all; the cell census and cohort sizes are both
    cohort-grain, and the cumulative window rides the cohort key."""
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    p = e.select(
        "user_id",
        "ts",
        F.round(F.col("value") * F.lit(10000.0)).cast("bigint").alias("v_i"),
    )
    wuser = Window.partitionBy("user_id")
    p = p.withColumn(
        "cohort_wk", F.date_trunc("week", F.min("ts").over(wuser))
    )
    sizes = (
        p.select("user_id", "cohort_wk")
        .distinct()
        .groupBy("cohort_wk")
        .agg(F.count("*").alias("n_users"))
    )
    cells = (
        p
        .groupBy(
            "cohort_wk",
            (
                F.floor(
                    F.datediff(
                        F.date_trunc("week", "ts").cast("date"),
                        F.col("cohort_wk").cast("date"),
                    )
                    / 7
                )
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.sum("v_i").alias("rev_i"))
    )
    wcum = (
        Window.partitionBy("cohort_wk")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.withColumn("cum_i", F.sum("rev_i").over(wcum))
    return cum.join(F.broadcast(sizes), "cohort_wk").select(
        F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        F.col("n_users").cast("bigint").alias("n_cohort_users"),
        (F.col("rev_i").cast("double") / F.lit(10000.0)).alias("revenue"),
        (
            F.col("cum_i").cast("double")
            / (F.col("n_users") * F.lit(10000)).cast("double")
        ).alias("cum_ltv_per_user"),
    )


# ---------------------------------------------------------------------------
# Strict 3-step funnel — view -> click -> purchase in temporal order
# ---------------------------------------------------------------------------

_FUNNEL3_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, ts FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
w1 AS (
  SELECT user_id, event_type, ts,
    MIN(CASE WHEN event_type = 'view' THEN ts END)
      OVER (PARTITION BY user_id) AS t1
  FROM e
),
w2 AS (
  SELECT user_id, event_type, ts, t1,
    MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
      OVER (PARTITION BY user_id) AS t2
  FROM w1
),
w3 AS (
  SELECT user_id, t1, t2,
    MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
      OVER (PARTITION BY user_id) AS t3
  FROM w2
),
u AS (
  SELECT user_id,
    MAX(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS r1,
    MAX(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS r2,
    MAX(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS r3
  FROM w3 GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(r1) AS BIGINT) AS n_viewed,
  CAST(SUM(r2) AS BIGINT) AS n_clicked_after_view,
  CAST(SUM(r3) AS BIGINT) AS n_purchased_after_click,
  CAST(SUM(r2) AS DOUBLE) / CAST(NULLIF(SUM(r1), 0) AS DOUBLE)
    AS view_to_click,
  CAST(SUM(r3) AS DOUBLE) / CAST(NULLIF(SUM(r2), 0) AS DOUBLE)
    AS click_to_purchase
FROM u
"""


@query("funnel_three_step_strict", oracle=_FUNNEL3_ORACLE)
def q_funnel_three_step_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict temporally-ordered 3-step funnel (view → click →
    purchase): a click only counts AFTER the user's first view, a
    purchase only after that first qualifying click — the ordering
    discipline naive per-type-exists funnels get wrong (they count a
    purchase that preceded the view).  Three chained conditional-min
    windows over the SAME user partition resolve the sequence without
    any self-join; per-user flags then roll up to the funnel row.
    Conversion ratios are single divisions with NULLIF guards (the
    degenerate-denominator lesson).

    Scale shape: ONE user_id shuffle carries all three window passes
    (same partitioning, no re-exchange), then a map-side-combined
    per-user flag rollup into a single row."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    wu = Window.partitionBy("user_id")
    w1 = e.withColumn(
        "t1",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu),
    )
    w2 = w1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(wu),
    )
    w3 = w2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(wu),
    )
    u = w3.groupBy("user_id").agg(
        F.max(F.when(F.col("t1").isNotNull(), 1).otherwise(0)).alias("r1"),
        F.max(F.when(F.col("t2").isNotNull(), 1).otherwise(0)).alias("r2"),
        F.max(F.when(F.col("t3").isNotNull(), 1).otherwise(0)).alias("r3"),
    )
    return u.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("r1").cast("bigint").alias("n_viewed"),
        F.sum("r2").cast("bigint").alias("n_clicked_after_view"),
        F.sum("r3").cast("bigint").alias("n_purchased_after_click"),
        (
            F.sum("r2").cast("double")
            / F.nullif(F.sum("r1"), F.lit(0)).cast("double")
        ).alias("view_to_click"),
        (
            F.sum("r3").cast("double")
            / F.nullif(F.sum("r2"), F.lit(0)).cast("double")
        ).alias("click_to_purchase"),
    )


# ---------------------------------------------------------------------------
# Session path mining — top session-entry paths (first 3 steps)
# ---------------------------------------------------------------------------

_PATH_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
    AND event_id IS NOT NULL
),
flagged AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN LAG(epoch_us(ts))
              OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           OR epoch_us(ts) - LAG(epoch_us(ts))
              OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > 1800000000
         THEN 1 ELSE 0 END AS new_session
  FROM e
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
paths AS (
  SELECT user_id, session_id,
    array_to_string(
      list_slice(list(event_type ORDER BY ts, event_id), 1, 3), '>')
      AS path
  FROM sess GROUP BY 1, 2
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY 1
ORDER BY n_sessions DESC, path
LIMIT 20
"""


@query("session_path_counts", oracle=_PATH_ORACLE)
def q_session_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining — the top session-ENTRY paths (first three
    event types of each 30-minute-gap session): where the transition
    matrix sees only pairs, this ranks whole opening sequences — the
    clickstream question "how do sessions actually start?".  Gaps are
    exact integer microseconds; the session id is the lag+cumsum
    idiom with the (ts, event_id) total order stated on BOTH window
    and list aggregation (ties and NULLS never reorder steps); the
    path string is the sorted-struct slice so both engines assemble
    identical sequences.

    Scale shape: one user_id shuffle carries the lag, the running
    sum, and the per-session list aggregation (only the first 3
    elements survive); the path census map-side combines into path
    cardinality, and the top-20 is a TakeOrdered, never a global
    sort."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w_lag)
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(w_run))
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    1,
                    3,
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Sliding 24 h distinct users — exact trailing-window cardinality
# ---------------------------------------------------------------------------

_SLIDE_DISTINCT_ORACLE = """
WITH e AS (
  SELECT user_id, date_trunc('hour', ts) AS h FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
hu AS (SELECT DISTINCT h, user_id FROM e),
b AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM e),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS t FROM b
)
SELECT strftime(s.t, '%Y-%m-%d %H:%M:%S') AS hour_start,
  CAST(COUNT(DISTINCT hu.user_id) AS BIGINT) AS n_distinct_users_24h
FROM spine s
LEFT JOIN hu ON hu.h BETWEEN s.t - INTERVAL 23 HOUR AND s.t
GROUP BY s.t
"""


@query("sliding_24h_distinct_users", oracle=_SLIDE_DISTINCT_ORACLE)
def q_sliding_24h_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-hour distinct active users per hour — THE dashboard
    cardinality series, and deliberately the hard case: DISTINCT does
    not decompose over sliding windows (window functions cannot take
    DISTINCT aggregates), so the exact form joins the complete hourly
    spine to the deduplicated (hour, user) pair census over a 24-hour
    band and counts distinct per target hour.  The pair census — not
    raw events — pays the 24× band fan-out.

    Scale shape: events collapse to hour×user pairs first (map-side
    combined); the generated spine broadcasts into the band join (the
    interval-join pattern of click_error_range_join — at very large
    spans, bucket both sides by day ±1 first).  When exact cardinality
    stops being worth the fan-out, the SAME series comes from merging
    24 hourly HLL register partials per row (hll_register_audit /
    stream_hll_merge are the calibration and the merge law) — this
    query is the exact side of that tradeoff."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    hu = e.select(
        F.date_trunc("hour", "ts").alias("h"), "user_id"
    ).distinct()
    b = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = b.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("t")
    )
    joined = F.broadcast(spine).join(
        hu,
        F.col("h").between(
            F.col("t") - F.expr("INTERVAL 23 HOURS"), F.col("t")
        ),
        "left",
    )
    return joined.groupBy("t").agg(
        F.count_distinct("user_id").cast("bigint").alias(
            "n_distinct_users_24h"
        )
    ).select(
        F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "n_distinct_users_24h",
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend — median of pairwise slopes, exactly
# ---------------------------------------------------------------------------

_TS_K = 12  # last k points per type; k(k-1)/2 = 66 pairs

_THEIL_SEN_ORACLE = f"""
WITH ev AS (
  SELECT event_type, ts, event_id,
    CAST(ROUND(value * 10000.0) AS BIGINT) AS vi,
    epoch_us(ts) AS tu
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
recent AS (
  SELECT event_type, vi, tu,
    row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC)
      AS rn
  FROM ev
),
pts AS (SELECT event_type, vi, tu, rn FROM recent WHERE rn <= {_TS_K}),
pr AS (
  SELECT a.event_type, a.rn AS i, b.rn AS j,
    CAST(b.vi - a.vi AS DOUBLE) / CAST(b.tu - a.tu AS DOUBLE) AS slope
  FROM pts a JOIN pts b
    ON a.event_type = b.event_type AND a.rn < b.rn AND a.tu != b.tu
),
rk AS (
  SELECT event_type, slope,
    row_number() OVER (PARTITION BY event_type ORDER BY slope, i, j) AS r,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM pr
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_pairs,
  MAX(CASE WHEN r = (n + 1) // 2 THEN slope END) * 1000000.0 / 10000.0
    AS theil_sen_per_sec
FROM rk GROUP BY event_type
"""


@query("events_theil_sen", oracle=_THEIL_SEN_ORACLE)
def q_events_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per type — the MEDIAN of all pairwise
    slopes over the last 12 points, the estimator that shrugs off the
    outliers OLS chases (breakdown point ~29%).  Hash-checkable without
    quantizing slopes: each slope is ONE double division of two exact
    int64s (mantissa delta / microsecond delta) — cast and divide are
    correctly rounded, so both engines produce bit-identical slope
    values — and the median is an order statistic picked under the
    fully-deterministic (slope, i, j) ordering (lower median at rank
    (n+1)//2), not an average of two.  Equal-timestamp pairs are
    excluded on both sides (dt = 0).  The output rescales
    mantissa-per-microsecond to value-per-second: ×1e6/1e4, two exact
    power-of-ten double ops.

    Scale shape: the pair fan-out is k(k-1)/2 = 66 per type — bounded
    by construction, never corpus-sized; one descending row_number
    window per type picks the points, everything after is per-type
    local.  The k lever trades robustness window for cost exactly like
    events_ewma_half_life's."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    pts = (
        e.select(
            "event_type",
            "ts",
            "event_id",
            F.round(F.col("value") * F.lit(10000.0)).cast("bigint").alias("vi"),
            F.unix_micros("ts").alias("tu"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TS_K)
        .select("event_type", "vi", "tu", "rn")
    )
    a, b = pts.alias("a"), pts.alias("b")
    pr = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.rn") < F.col("b.rn"))
        & (F.col("a.tu") != F.col("b.tu")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.rn").alias("i"),
        F.col("b.rn").alias("j"),
        (
            (F.col("b.vi") - F.col("a.vi")).cast("double")
            / (F.col("b.tu") - F.col("a.tu")).cast("double")
        ).alias("slope"),
    )
    wr = Window.partitionBy("event_type").orderBy("slope", "i", "j")
    wn = Window.partitionBy("event_type")
    rk = pr.select(
        "event_type",
        "slope",
        F.row_number().over(wr).alias("r"),
        F.count("*").over(wn).alias("n"),
    )
    return rk.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_pairs"),
        (
            F.max(
                F.when(
                    F.col("r") == F.expr("(n + 1) div 2"), F.col("slope")
                )
            )
            * F.lit(1000000.0)
            / F.lit(10000.0)
        ).alias("theil_sen_per_sec"),
    )


# ---------------------------------------------------------------------------
# Forecast backtest — seasonal-naive vs naive MAE on the hourly series
# ---------------------------------------------------------------------------

_BACKTEST_ORACLE = """
WITH ev AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM ev GROUP BY 1
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM bounds
),
filled AS (
  SELECT s.event_type, s.h, COALESCE(ev.n, 0) AS n
  FROM spine s LEFT JOIN ev ON s.event_type = ev.event_type AND s.h = ev.h
),
lagged AS (
  SELECT event_type, n,
    lag(n, 1) OVER w AS p_naive,
    lag(n, 24) OVER w AS p_seasonal
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY h)
),
scored AS (
  SELECT event_type,
    COUNT(*) AS n_hours,
    SUM(abs(n - p_naive)) AS ae_naive,
    SUM(abs(n - p_seasonal)) AS ae_seasonal
  FROM lagged
  WHERE p_naive IS NOT NULL AND p_seasonal IS NOT NULL
  GROUP BY 1
)
SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
  CAST(ae_naive AS DOUBLE) / n_hours AS mae_naive,
  CAST(ae_seasonal AS DOUBLE) / n_hours AS mae_seasonal
FROM scored
"""


@query("events_forecast_backtest", oracle=_BACKTEST_ORACLE)
def q_events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast BACKTEST — the model-selection loop run as a query:
    score the two canonical baselines over each type's gapfilled hourly
    series — naive (predict last hour) vs seasonal-naive (predict the
    same hour yesterday) — by mean absolute error on every hour where
    both predictions exist.  Any forecasting pipeline needs this gate
    BEFORE fitting anything fancier: a model that can't beat
    seasonal-naive is noise, and the MAE ratio here is the
    seasonality-strength diagnostic.  Errors are exact integer sums of
    integer counts (the spine fills missing hours with true zeros, so
    the error ledger is complete — a plain groupBy would silently skip
    empty hours and flatter both baselines); each MAE is one final
    division.

    Scale shape: one hourly census shuffle, a generated per-type spine
    (O(hours), never event-grain), two lag offsets riding ONE
    event_type window partitioning."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ev = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    bounds = ev.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    filled = spine.join(ev, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = filled.select(
        "event_type",
        "n",
        F.lag("n", 1).over(w).alias("p_naive"),
        F.lag("n", 24).over(w).alias("p_seasonal"),
    ).filter(
        F.col("p_naive").isNotNull() & F.col("p_seasonal").isNotNull()
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n_hours"),
            F.sum(F.abs(F.col("n") - F.col("p_naive"))).alias("ae_naive"),
            F.sum(F.abs(F.col("n") - F.col("p_seasonal"))).alias(
                "ae_seasonal"
            ),
        )
        .select(
            "event_type",
            F.col("n_hours").cast("bigint").alias("n_hours"),
            (F.col("ae_naive").cast("double") / F.col("n_hours")).alias(
                "mae_naive"
            ),
            (F.col("ae_seasonal").cast("double") / F.col("n_hours")).alias(
                "mae_seasonal"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Time-decay attribution — power-of-two recency weights, exactly normalized
# ---------------------------------------------------------------------------

_DECAY_CAP = 20  # ranks beyond 20 share the 2^-20 tail weight

_DECAY_ATTR_ORACLE = f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id,
    epoch_us(ts) // 1000000 AS sec,
    CAST(ROUND(value * 10000.0) AS BIGINT) AS vi
  FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL
    AND user_id IS NOT NULL AND value IS NOT NULL
),
c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) // 1000000 AS sec
  FROM events
  WHERE event_type = 'click' AND ts IS NOT NULL AND user_id IS NOT NULL
),
j AS (
  SELECT p.purchase_id, c.click_id, p.user_id, p.vi,
    row_number() OVER (PARTITION BY p.purchase_id
                       ORDER BY c.sec DESC, c.click_id) AS click_rank
  FROM p JOIN c
    ON p.user_id = c.user_id
   AND c.sec <= p.sec AND p.sec - c.sec <= 3600
),
wt AS (
  SELECT purchase_id, click_id, user_id, vi, click_rank,
    (1::BIGINT << ({_DECAY_CAP} - LEAST(click_rank, {_DECAY_CAP}))) AS w,
    SUM(1::BIGINT << ({_DECAY_CAP} - LEAST(click_rank, {_DECAY_CAP})))
      OVER (PARTITION BY purchase_id) AS norm
  FROM j
)
SELECT purchase_id, click_id, user_id,
  CAST(click_rank AS BIGINT) AS click_rank,
  CAST(vi * w AS DOUBLE) / CAST(norm AS DOUBLE) / 10000.0 AS credit
FROM wt
"""


@query("time_decay_attribution", oracle=_DECAY_ATTR_ORACLE)
def q_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-DECAY attribution — the recency-weighted sibling of
    linear_attribution_credits: each purchase's value splits across the
    same user's preceding-hour clicks with weight 2^-rank by recency
    (most recent click earns half the mass, the next a quarter, ...),
    ranks beyond {_DECAY_CAP} sharing the tail weight so the arithmetic
    stays in int64.  Exactness: weights are integer powers of two
    (1 << (cap - min(rank, cap))), the per-purchase normalizer is their
    exact integer window sum, and each credit is vi·w — an exact
    int64 < 2^51 — divided once by the normalizer and once by the
    mantissa scale: a deterministic three-op double chain, no float
    accumulation anywhere (the general-lambda exponential decay would
    drift — the power-of-two choice IS the determinism contract, as in
    events_ewma_half_life).

    Scale shape: identical to the linear form — keyed time-range join,
    recency rank and normalizer riding one purchase_id partitioning;
    output bounded by the tolerance window."""
    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    p = base.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_timestamp("ts").alias("p_sec"),
        F.round(F.col("value") * F.lit(10000.0)).cast("bigint").alias("vi"),
    )
    c = base.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.unix_timestamp("ts").alias("c_sec"),
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_sec") <= F.col("p_sec"))
        & (F.col("p_sec") - F.col("c_sec") <= 3600),
    ).select("purchase_id", "click_id", "user_id", "vi", "c_sec")
    wr = Window.partitionBy("purchase_id").orderBy(
        F.col("c_sec").desc(), "click_id"
    )
    wn = Window.partitionBy("purchase_id")
    ranked = j.withColumn("click_rank", F.row_number().over(wr))
    w = F.expr(
        f"shiftleft(cast(1 as bigint),"
        f" {_DECAY_CAP} - least(click_rank, {_DECAY_CAP}))"
    )
    wt = ranked.withColumn("w", w).withColumn(
        "norm", F.sum("w").over(wn)
    )
    return wt.select(
        "purchase_id",
        "click_id",
        "user_id",
        F.col("click_rank").cast("bigint").alias("click_rank"),
        (
            (F.col("vi") * F.col("w")).cast("double")
            / F.col("norm").cast("double")
            / F.lit(10000.0)
        ).alias("credit"),
    )


# ---------------------------------------------------------------------------
# Burstiness — index of dispersion of the hourly arrival process
# ---------------------------------------------------------------------------

_BURSTINESS_ORACLE = """
WITH ev AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM ev GROUP BY 1
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM bounds
),
filled AS (
  SELECT s.event_type, COALESCE(ev.n, 0) AS n
  FROM spine s LEFT JOIN ev ON s.event_type = ev.event_type AND s.h = ev.h
),
mo AS (
  SELECT event_type, COUNT(*) AS k, SUM(n) AS s1, SUM(n * n) AS s2
  FROM filled GROUP BY 1
)
SELECT event_type, CAST(k AS BIGINT) AS n_hours,
  CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) AS mean_rate,
  CAST(k * s2 - s1 * s1 AS DOUBLE)
    / CAST(k AS DOUBLE) / CAST(NULLIF(s1, 0) AS DOUBLE) AS fano_factor
FROM mo
"""


@query("event_burstiness_index", oracle=_BURSTINESS_ORACLE)
def q_event_burstiness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BURSTINESS of the arrival process — the Fano factor
    (variance-to-mean ratio of hourly counts) per type: 1 for a
    Poisson process, > 1 for bursty arrivals (retry storms,
    coordinated traffic), < 1 for throttled/regular ones — the
    one-number diagnostic that tells an anomaly pipeline whether
    count-based thresholds are even meaningful for this stream.
    Computed over the gapfilled spine (empty hours are real zeros —
    skipping them biases the variance down exactly when bursts are
    worst).  Var/mean = (k·Σn² − (Σn)²)/k/Σn: exact integer moments,
    two closed-form divisions, NULLIF guarding the zero-event
    degenerate (the r7 assortativity lesson).

    Scale shape: one hourly census shuffle + a generated spine
    (O(hours)); the moment reduction is per-type rows."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ev = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    bounds = ev.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    filled = spine.join(ev, ["event_type", "h"], "left").select(
        "event_type", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    mo = filled.groupBy("event_type").agg(
        F.count("*").alias("k"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    return mo.select(
        "event_type",
        F.col("k").cast("bigint").alias("n_hours"),
        (F.col("s1").cast("double") / F.col("k").cast("double")).alias(
            "mean_rate"
        ),
        (
            (F.col("k") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
            / F.col("k").cast("double")
            / F.nullif(F.col("s1"), F.lit(0)).cast("double")
        ).alias("fano_factor"),
    )


# ---------------------------------------------------------------------------
# Changepoint detection — binary segmentation round 1 on hourly rates
# ---------------------------------------------------------------------------

_CHANGEPOINT_ORACLE = """
WITH ev AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM ev GROUP BY 1
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM bounds
),
filled AS (
  SELECT s.event_type, s.h, COALESCE(ev.n, 0) AS n
  FROM spine s LEFT JOIN ev ON s.event_type = ev.event_type AND s.h = ev.h
),
cum AS (
  SELECT event_type, h, n,
    SUM(n) OVER w AS si,
    row_number() OVER (PARTITION BY event_type ORDER BY h) AS i,
    SUM(n) OVER (PARTITION BY event_type) AS t,
    COUNT(*) OVER (PARTITION BY event_type) AS k
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
dev AS (
  SELECT event_type, h, i, si, t, k,
    abs(si * k - t * i) AS d,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY abs(si * k - t * i) DESC, i) AS r
  FROM cum WHERE i < k
)
SELECT event_type, CAST(k AS BIGINT) AS n_hours,
  CAST(i AS BIGINT) AS cp_index,
  strftime(h, '%Y-%m-%d %H:%M:%S') AS cp_hour,
  CAST(si AS DOUBLE) / CAST(i AS DOUBLE) AS left_mean,
  CAST(t - si AS DOUBLE) / CAST(k - i AS DOUBLE) AS right_mean
FROM dev WHERE r = 1
"""


@query("events_changepoint_split", oracle=_CHANGEPOINT_ORACLE)
def q_events_changepoint_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGEPOINT detection — the first round of binary segmentation
    on each type's hourly rate: the split hour maximizing the scaled
    CUSUM deviation |S_i·k − T·i| (the cross-multiplied form of
    |S_i − T·i/k| — exact integers, no fraction), with the mean rate on
    each side.  This is the diagnosis step after events_cusum_alarms
    fires: WHERE did the level shift, and from what to what — and
    recursing into each side is the full binary-segmentation algorithm
    (one round here keeps the oracle a single window pass).

    Determinism: deviations are exact int64 (S_i·k ≤ counts·hours²,
    far under 2^63 at fixture scale); the argmax breaks ties by the
    earliest hour under a total ordering; the two side means are
    single divisions.  Gapfilled spine so quiet hours pull the split
    correctly (the backtest/burstiness discipline).

    Scale shape: one hourly census + per-type windows riding one
    event_type partitioning; the argmax is a rank-1 filter, not a
    sort-collect."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ev = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    bounds = ev.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    filled = spine.join(ev, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    wo = Window.partitionBy("event_type").orderBy("h")
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy("event_type")
    cum = filled.select(
        "event_type",
        "h",
        F.sum("n").over(wc).alias("si"),
        F.row_number().over(wo).alias("i"),
        F.sum("n").over(wp).alias("t"),
        F.count("*").over(wp).alias("k"),
    ).filter(F.col("i") < F.col("k"))
    d = F.abs(F.col("si") * F.col("k") - F.col("t") * F.col("i"))
    wr = Window.partitionBy("event_type").orderBy(d.desc(), "i")
    dev = cum.withColumn("r", F.row_number().over(wr)).filter(F.col("r") == 1)
    return dev.select(
        "event_type",
        F.col("k").cast("bigint").alias("n_hours"),
        F.col("i").cast("bigint").alias("cp_index"),
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("cp_hour"),
        (F.col("si").cast("double") / F.col("i").cast("double")).alias(
            "left_mean"
        ),
        (
            (F.col("t") - F.col("si")).cast("double")
            / (F.col("k") - F.col("i")).cast("double")
        ).alias("right_mean"),
    )


# ---------------------------------------------------------------------------
# Changepoint detection — depth-2 binary segmentation (recursive binseg)
# ---------------------------------------------------------------------------

_CPT_MINSEG = 24  # a depth-2 split must leave >= this many hours per side

_CHANGEPOINT_TREE_ORACLE = f"""
WITH ev AS MATERIALIZED (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM ev GROUP BY 1
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM bounds
),
filled AS (
  SELECT s.event_type, s.h, COALESCE(ev.n, 0) AS n
  FROM spine s LEFT JOIN ev ON s.event_type = ev.event_type AND s.h = ev.h
),
cum AS MATERIALIZED (
  SELECT event_type, h, n,
    SUM(n) OVER w AS si,
    row_number() OVER (PARTITION BY event_type ORDER BY h) AS i,
    SUM(n) OVER (PARTITION BY event_type) AS t,
    COUNT(*) OVER (PARTITION BY event_type) AS k
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cp1 AS MATERIALIZED (
  SELECT event_type, i AS cp, si AS s_cp, t, k, h
  FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type
                 ORDER BY abs(si * k - t * i) DESC, i) AS r
    FROM cum WHERE i < k
  ) WHERE r = 1
),
seg AS MATERIALIZED (
  SELECT c.event_type, c.h, c.i, c.si,
    CASE WHEN c.i <= p.cp THEN 'L' ELSE 'R' END AS seg,
    c.i  - CASE WHEN c.i <= p.cp THEN 0 ELSE p.cp END  AS j,
    c.si - CASE WHEN c.i <= p.cp THEN 0 ELSE p.s_cp END AS sj,
    CASE WHEN c.i <= p.cp THEN p.cp  ELSE p.k - p.cp  END AS kk,
    CASE WHEN c.i <= p.cp THEN p.s_cp ELSE p.t - p.s_cp END AS tt
  FROM cum c JOIN cp1 p USING (event_type)
),
cp2 AS (
  SELECT event_type, seg, h, i, j, sj, kk, tt
  FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type, seg
                 ORDER BY abs(sj * kk - tt * j) DESC, j) AS r
    FROM seg
    WHERE j < kk AND j >= {_CPT_MINSEG} AND kk - j >= {_CPT_MINSEG}
  ) WHERE r = 1
)
SELECT event_type, 1 AS depth, 'root' AS segment,
  CAST(cp AS BIGINT) AS cp_index,
  strftime(h, '%Y-%m-%d %H:%M:%S') AS cp_hour,
  CAST(k AS BIGINT) AS seg_hours,
  CAST(s_cp AS DOUBLE) / CAST(cp AS DOUBLE) AS left_mean,
  CAST(t - s_cp AS DOUBLE) / CAST(k - cp AS DOUBLE) AS right_mean
FROM cp1
UNION ALL
SELECT event_type, 2 AS depth, seg AS segment,
  CAST(i AS BIGINT) AS cp_index,
  strftime(h, '%Y-%m-%d %H:%M:%S') AS cp_hour,
  CAST(kk AS BIGINT) AS seg_hours,
  CAST(sj AS DOUBLE) / CAST(j AS DOUBLE) AS left_mean,
  CAST(tt - sj AS DOUBLE) / CAST(kk - j AS DOUBLE) AS right_mean
FROM cp2
"""


@query("events_changepoint_tree", oracle=_CHANGEPOINT_TREE_ORACLE)
def q_events_changepoint_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE changepoint detection — binary segmentation to depth 2
    (VERDICT r8 item 5): the depth-1 CUSUM-argmax split per type
    (events_changepoint_split), then the SAME exact-integer argmax run
    INSIDE each side, subject to a minimum-segment floor (24
    hours on both sides of a depth-2 split — segments too short to
    split emit no row, exactly like a significance floor prunes the
    binseg recursion).

    The depth-2 pass re-derives each segment's local cumulative sums
    ARITHMETICALLY from the depth-1 globals (j = i − cp_offset,
    sj = si − s_offset) instead of re-windowing the spine — one join
    against the 5-row cp1 table (broadcast), one new window for the
    per-segment argmax.  All deviations |sj·kk − tt·j| stay exact int64
    (counts·hours² at fixture scale ≪ 2^63; at 100 TB the hourly census
    is already the reduction, so the bound scales with hours², not
    rows).  Ties break on the earliest hour under a total ordering; the
    side means are single exact-int divisions.

    Oracle: the unrolled recursion as MATERIALIZED CTEs (the viterbi
    lesson — plain CTEs would inline cum into cp1/seg/cp2 and re-window
    the spine 2^depth times).

    Scale shape: one hourly census shuffle; BOTH argmax windows ride an
    event_type(-, seg) partitioning of the same tiny spine; depth-d
    recursion adds one broadcast join + one window per level, never a
    rescan of events."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ev = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    bounds = ev.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    filled = spine.join(ev, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    wo = Window.partitionBy("event_type").orderBy("h")
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy("event_type")
    cum = filled.select(
        "event_type",
        "h",
        F.sum("n").over(wc).alias("si"),
        F.row_number().over(wo).alias("i"),
        F.sum("n").over(wp).alias("t"),
        F.count("*").over(wp).alias("k"),
    )
    d1 = F.abs(F.col("si") * F.col("k") - F.col("t") * F.col("i"))
    w1 = Window.partitionBy("event_type").orderBy(d1.desc(), "i")
    cp1 = (
        cum.filter(F.col("i") < F.col("k"))
        .withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("i").alias("cp"),
            F.col("si").alias("s_cp"),
            "t",
            "k",
            F.col("h").alias("cp_h"),
        )
    )
    is_left = F.col("i") <= F.col("cp")
    # only the split point and its prefix sum join back — cum already
    # carries t/k, and duplicating them would make the refs ambiguous
    seg = cum.join(
        F.broadcast(cp1.select("event_type", "cp", "s_cp")), "event_type"
    ).select(
        "event_type",
        "h",
        "i",
        F.when(is_left, F.lit("L")).otherwise(F.lit("R")).alias("seg"),
        (F.col("i") - F.when(is_left, F.lit(0)).otherwise(F.col("cp"))).alias("j"),
        (F.col("si") - F.when(is_left, F.lit(0)).otherwise(F.col("s_cp"))).alias(
            "sj"
        ),
        F.when(is_left, F.col("cp")).otherwise(F.col("k") - F.col("cp")).alias(
            "kk"
        ),
        F.when(is_left, F.col("s_cp")).otherwise(F.col("t") - F.col("s_cp")).alias(
            "tt"
        ),
    )
    d2 = F.abs(F.col("sj") * F.col("kk") - F.col("tt") * F.col("j"))
    w2 = Window.partitionBy("event_type", "seg").orderBy(d2.desc(), "j")
    cp2 = (
        seg.filter(
            (F.col("j") < F.col("kk"))
            & (F.col("j") >= _CPT_MINSEG)
            & (F.col("kk") - F.col("j") >= _CPT_MINSEG)
        )
        .withColumn("r", F.row_number().over(w2))
        .filter(F.col("r") == 1)
    )
    root = cp1.select(
        "event_type",
        F.lit(1).cast("int").alias("depth"),
        F.lit("root").alias("segment"),
        F.col("cp").cast("bigint").alias("cp_index"),
        F.date_format("cp_h", "yyyy-MM-dd HH:mm:ss").alias("cp_hour"),
        F.col("k").cast("bigint").alias("seg_hours"),
        (F.col("s_cp").cast("double") / F.col("cp").cast("double")).alias(
            "left_mean"
        ),
        (
            (F.col("t") - F.col("s_cp")).cast("double")
            / (F.col("k") - F.col("cp")).cast("double")
        ).alias("right_mean"),
    )
    deep = cp2.select(
        "event_type",
        F.lit(2).cast("int").alias("depth"),
        F.col("seg").alias("segment"),
        F.col("i").cast("bigint").alias("cp_index"),
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("cp_hour"),
        F.col("kk").cast("bigint").alias("seg_hours"),
        (F.col("sj").cast("double") / F.col("j").cast("double")).alias(
            "left_mean"
        ),
        (
            (F.col("tt") - F.col("sj")).cast("double")
            / (F.col("kk") - F.col("j")).cast("double")
        ).alias("right_mean"),
    )
    return root.unionByName(deep)


# ---------------------------------------------------------------------------
# Mergeable quantile summaries — the GK merge law, deterministically
# ---------------------------------------------------------------------------

_QS_STRIDE = 16  # summary keeps every 16th rank per part (eps = S/n_part)
_QS_PARTS = 4


_QSUMMARY_ORACLE = f"""
WITH base AS (
  SELECT event_type, event_id, CAST(ROUND(value * 100.0) AS BIGINT) AS vi,
    event_id % {_QS_PARTS} AS part
  FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT event_type, part, vi, event_id,
    row_number() OVER (PARTITION BY event_type, part
                       ORDER BY vi, event_id) AS rn,
    COUNT(*) OVER (PARTITION BY event_type, part) AS np
  FROM base
),
summ AS (
  SELECT event_type, part, vi, rn,
    rn - COALESCE(LAG(rn) OVER (PARTITION BY event_type, part ORDER BY rn),
                  0) AS wt
  FROM ranked WHERE rn % {_QS_STRIDE} = 0 OR rn = np
),
merged AS (
  SELECT event_type, vi, part, rn, wt,
    SUM(wt) OVER (PARTITION BY event_type ORDER BY vi, part, rn
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
    SUM(wt) OVER (PARTITION BY event_type) AS n,
    COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM summ
),
est AS (
  SELECT event_type, MAX(n) AS n, MAX(m) AS m,
    MIN(CASE WHEN cumw >= (n + 1) // 2 THEN vi END) AS e50,
    MIN(CASE WHEN cumw >= (9 * n + 9) // 10 THEN vi END) AS e90
  FROM merged GROUP BY event_type
),
ranks AS (
  SELECT b.event_type,
    SUM(CASE WHEN b.vi < e.e50 THEN 1 ELSE 0 END) AS lt50,
    SUM(CASE WHEN b.vi <= e.e50 THEN 1 ELSE 0 END) AS le50,
    SUM(CASE WHEN b.vi < e.e90 THEN 1 ELSE 0 END) AS lt90,
    SUM(CASE WHEN b.vi <= e.e90 THEN 1 ELSE 0 END) AS le90
  FROM base b JOIN est e USING (event_type)
  GROUP BY b.event_type
)
SELECT e.event_type, CAST(e.n AS BIGINT) AS n_events,
  CAST(e.m AS BIGINT) AS summary_size,
  CAST(e.e50 AS DOUBLE) / 100.0 AS est_p50,
  CAST(e.e90 AS DOUBLE) / 100.0 AS est_p90,
  CAST(GREATEST(0, (e.n + 1) // 2 - r.le50,
                r.lt50 + 1 - (e.n + 1) // 2) AS BIGINT) AS rank_err_p50,
  CAST(GREATEST(0, (9 * e.n + 9) // 10 - r.le90,
                r.lt90 + 1 - (9 * e.n + 9) // 10) AS BIGINT) AS rank_err_p90,
  GREATEST(0, (e.n + 1) // 2 - r.le50,
           r.lt50 + 1 - (e.n + 1) // 2) <= {_QS_PARTS * _QS_STRIDE}
    AS within_bound_p50,
  GREATEST(0, (9 * e.n + 9) // 10 - r.le90,
           r.lt90 + 1 - (9 * e.n + 9) // 10) <= {_QS_PARTS * _QS_STRIDE}
    AS within_bound_p90
FROM est e JOIN ranks r USING (event_type)
"""


@query("quantile_summary_merge", oracle=_QSUMMARY_ORACLE)
def q_quantile_summary_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch MERGE law, made deterministic (VERDICT r8 item
    8): GK/approx_percentile sketch states are engine-specific, so this
    restates the mergeable-summary algebra (Agarwal et al., "Mergeable
    Summaries", PODS'12; the law under percentile_approx's partial
    aggregation) with a summary DuckDB rebuilds bit-identically —
    every 16th rank per partition plus the tail, each carrying
    its rank gap as weight (the countmin_token_audit discipline: a
    deterministic sketch needs no bound form, the values themselves
    hash-check).  The 4 per-part summaries MERGE by weighted
    union: cumulative weight over the (vi, part, rn) total order, and
    the p-quantile estimate is the first value whose cumulative weight
    reaches ceil(p·N) — exactly how per-executor GK partials combine,
    stated in closed form.

    The receipt: the merged estimate's TRUE rank interval (exact
    lt/le census over the raw rows) deviates from the target rank by
    rank_err, and the merge law guarantees rank_err <= parts × stride
    (each part's summary mislocates a rank by < stride; errors add
    under union).  Both the exact error and the bound boolean are
    computed identically on both engines — a drifting merge breaks the
    hash on est/rank_err directly, not just the boolean.

    Scale shape: per-part summaries build in one (event_type, part)
    window pass and are O(n/stride) rows; the merge window rides the
    tiny summary (m ≈ N/16 rows per type); the exact-rank
    census is the audit leg, not the production path — production
    serves the summary."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = e.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100.0).cast("bigint").alias("vi"),
        (F.col("event_id") % _QS_PARTS).alias("part"),
    )
    wpo = Window.partitionBy("event_type", "part").orderBy("vi", "event_id")
    wpp = Window.partitionBy("event_type", "part")
    ranked = base.select(
        "event_type",
        "part",
        "vi",
        F.row_number().over(wpo).alias("rn"),
        F.count("*").over(wpp).alias("np"),
    )
    sel = ranked.filter(
        (F.col("rn") % _QS_STRIDE == 0) | (F.col("rn") == F.col("np"))
    )
    wlag = Window.partitionBy("event_type", "part").orderBy("rn")
    summ = sel.select(
        "event_type",
        "part",
        "vi",
        "rn",
        (F.col("rn") - F.coalesce(F.lag("rn").over(wlag), F.lit(0))).alias(
            "wt"
        ),
    )
    wm = Window.partitionBy("event_type").orderBy("vi", "part", "rn")
    wmc = wm.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy("event_type")
    merged = summ.select(
        "event_type",
        "vi",
        F.sum("wt").over(wmc).alias("cumw"),
        F.sum("wt").over(wt).alias("n"),
        F.count("*").over(wt).alias("m"),
    )
    t50 = F.expr("(n + 1) div 2")
    t90 = F.expr("(9 * n + 9) div 10")
    est = merged.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        F.min(F.when(F.col("cumw") >= t50, F.col("vi"))).alias("e50"),
        F.min(F.when(F.col("cumw") >= t90, F.col("vi"))).alias("e90"),
    )
    ranks = (
        base.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("vi") < F.col("e50"), 1).otherwise(0)).alias(
                "lt50"
            ),
            F.sum(F.when(F.col("vi") <= F.col("e50"), 1).otherwise(0)).alias(
                "le50"
            ),
            F.sum(F.when(F.col("vi") < F.col("e90"), 1).otherwise(0)).alias(
                "lt90"
            ),
            F.sum(F.when(F.col("vi") <= F.col("e90"), 1).otherwise(0)).alias(
                "le90"
            ),
        )
    )
    j = est.join(ranks, "event_type")
    err50 = F.greatest(
        F.lit(0).cast("bigint"),
        (F.expr("(n + 1) div 2") - F.col("le50")).cast("bigint"),
        (F.col("lt50") + 1 - F.expr("(n + 1) div 2")).cast("bigint"),
    )
    err90 = F.greatest(
        F.lit(0).cast("bigint"),
        (F.expr("(9 * n + 9) div 10") - F.col("le90")).cast("bigint"),
        (F.col("lt90") + 1 - F.expr("(9 * n + 9) div 10")).cast("bigint"),
    )
    bound = F.lit(_QS_PARTS * _QS_STRIDE).cast("bigint")
    return j.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("m").cast("bigint").alias("summary_size"),
        (F.col("e50").cast("double") / F.lit(100.0)).alias("est_p50"),
        (F.col("e90").cast("double") / F.lit(100.0)).alias("est_p90"),
        err50.alias("rank_err_p50"),
        err90.alias("rank_err_p90"),
        (err50 <= bound).alias("within_bound_p50"),
        (err90 <= bound).alias("within_bound_p90"),
    )


# ---------------------------------------------------------------------------
# t-digest merge law — the mergeable-CENTROID quantile sketch (k2 scale),
# deterministically, completing the percentile-sketch ladder beside GK
# ---------------------------------------------------------------------------

_TD_PARTS = 4
_TD_C = 6.0  # k2 scale multiplier delta/2: ~2*C*ln(np) clusters per part
_TD_OFF = 10_000_000  # vi offset making the ordering key nonnegative


# Shared digest pipeline (build → merge → bound), used by both the
# merge audit and the quantile-serve leg: per-part scale-function
# centroids, the sort-by-mean re-cluster merge, cumulative merged
# weights, and the two bound ingredients.
_TD_CORE_SQL = f"""base AS (
  SELECT event_type, event_id,
    CASE WHEN vi0 >= -{_TD_OFF} THEN vi0
         ELSE CAST(error('tdigest: vi < -_TD_OFF; widen _TD_OFF')
                   AS BIGINT) END AS vi,
    event_id % {_TD_PARTS} AS part
  FROM (
    SELECT event_type, event_id,
      CAST(ROUND(value * 100.0) AS BIGINT) AS vi0
    FROM events WHERE value IS NOT NULL)
),
ranked AS (
  SELECT event_type, part, vi,
    row_number() OVER (PARTITION BY event_type, part
                       ORDER BY vi, event_id) AS rn,
    COUNT(*) OVER (PARTITION BY event_type, part) AS np
  FROM base
),
pre AS MATERIALIZED (
  SELECT event_type, part, ki,
    CAST(COUNT(*) AS BIGINT) AS w, CAST(SUM(vi) AS BIGINT) AS sv
  FROM (
    SELECT event_type, part, vi,
      CAST(FLOOR({_TD_C} * (ln(CAST(rn AS DOUBLE))
        - ln(CAST(np + 1 - rn AS DOUBLE)))) AS BIGINT) AS ki
    FROM ranked)
  GROUP BY 1, 2, 3
),
ord1 AS (
  SELECT event_type, part, ki, w, sv,
    SUM(w) OVER (PARTITION BY event_type
                 ORDER BY CAST(((sv + w * {_TD_OFF}) * 1000) // w AS BIGINT),
                          part, ki
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
    SUM(w) OVER (PARTITION BY event_type) AS n,
    COUNT(*) OVER (PARTITION BY event_type) AS m_pre
  FROM pre
),
mc AS MATERIALIZED (
  SELECT event_type, km, CAST(SUM(w) AS BIGINT) AS wm,
    CAST(SUM(sv) AS BIGINT) AS svm, MAX(n) AS n, MAX(m_pre) AS m_pre
  FROM (
    SELECT event_type, w, sv, n, m_pre,
      CAST(FLOOR({_TD_C} * (ln(CAST(2 * cumw - w AS DOUBLE))
        - ln(CAST(2 * n - 2 * cumw + w AS DOUBLE)))) AS BIGINT) AS km
    FROM ord1)
  GROUP BY 1, 2
),
mo AS (
  SELECT event_type, km, wm, svm, n, m_pre,
    SUM(wm) OVER (PARTITION BY event_type ORDER BY km
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumwm,
    COUNT(*) OVER (PARTITION BY event_type) AS m_merged
  FROM mc
),
pb AS (
  SELECT event_type, CAST(SUM(mw) AS BIGINT) AS pre_bound FROM (
    SELECT event_type, part, MAX(w) AS mw FROM pre GROUP BY 1, 2)
  GROUP BY 1
),
mb AS (SELECT event_type, MAX(wm) AS max_wm FROM mc GROUP BY 1)"""


_TDIGEST_ORACLE = f"""
WITH {_TD_CORE_SQL},
est AS (
  SELECT event_type, MAX(n) AS n, MAX(m_pre) AS m_pre,
    MAX(m_merged) AS m_merged,
    MAX(CASE WHEN cumwm >= (n + 1) // 2
             AND cumwm - wm < (n + 1) // 2 THEN svm END) AS sv50,
    MAX(CASE WHEN cumwm >= (n + 1) // 2
             AND cumwm - wm < (n + 1) // 2 THEN wm END) AS w50,
    MAX(CASE WHEN cumwm >= (9 * n + 9) // 10
             AND cumwm - wm < (9 * n + 9) // 10 THEN svm END) AS sv90,
    MAX(CASE WHEN cumwm >= (9 * n + 9) // 10
             AND cumwm - wm < (9 * n + 9) // 10 THEN wm END) AS w90,
    MAX(CASE WHEN cumwm >= (n + 1) // 2
             AND cumwm - wm < (n + 1) // 2 THEN cumwm END) AS cum50,
    MAX(CASE WHEN cumwm >= (9 * n + 9) // 10
             AND cumwm - wm < (9 * n + 9) // 10 THEN cumwm END) AS cum90
  FROM mo GROUP BY event_type
),
ranks AS (
  SELECT b.event_type,
    SUM(CASE WHEN b.vi * e.w50 < e.sv50 THEN 1 ELSE 0 END) AS lt50,
    SUM(CASE WHEN b.vi * e.w50 <= e.sv50 THEN 1 ELSE 0 END) AS le50,
    SUM(CASE WHEN b.vi * e.w90 < e.sv90 THEN 1 ELSE 0 END) AS lt90,
    SUM(CASE WHEN b.vi * e.w90 <= e.sv90 THEN 1 ELSE 0 END) AS le90
  FROM base b JOIN est e USING (event_type)
  GROUP BY b.event_type
)
SELECT e.event_type, CAST(e.n AS BIGINT) AS n_events,
  CAST(e.m_pre AS BIGINT) AS n_centroids_pre,
  CAST(e.m_merged AS BIGINT) AS n_centroids_merged,
  CAST(e.sv50 AS DOUBLE) / CAST(e.w50 AS DOUBLE) / 100.0 AS est_p50,
  CAST(e.sv90 AS DOUBLE) / CAST(e.w90 AS DOUBLE) / 100.0 AS est_p90,
  CAST(GREATEST(0, (e.n + 1) // 2 - r.le50,
                r.lt50 + 1 - (e.n + 1) // 2) AS BIGINT) AS rank_err_p50,
  CAST(GREATEST(0, (9 * e.n + 9) // 10 - r.le90,
                r.lt90 + 1 - (9 * e.n + 9) // 10) AS BIGINT) AS rank_err_p90,
  CAST(p.pre_bound + m.max_wm AS BIGINT) AS err_bound,
  GREATEST(0, (e.n + 1) // 2 - r.le50,
           r.lt50 + 1 - (e.n + 1) // 2)
    <= p.pre_bound + m.max_wm AS within_bound_p50,
  GREATEST(0, (9 * e.n + 9) // 10 - r.le90,
           r.lt90 + 1 - (9 * e.n + 9) // 10)
    <= p.pre_bound + m.max_wm AS within_bound_p90
FROM est e
JOIN ranks r USING (event_type)
JOIN pb p USING (event_type)
JOIN mb m USING (event_type)
"""


def _td_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """Shared t-digest pipeline: (base rows, merged centroids mc,
    cumulative merged view mo, per-part bound pb, merged bound mb) —
    the build+merge legs of _TD_CORE_SQL, used by both the merge audit
    and the quantile-serve leg."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    # Domain guard (ADVICE r13): the merge ordering key
    # (sv + w*_TD_OFF)*1000 div w is only engine-identical while it stays
    # nonnegative (Spark `div` truncates toward zero, DuckDB `//` floors)
    # — fail LOUDLY if the fixture's value domain ever drops below
    # -_TD_OFF instead of silently reordering the merge.
    vi_guard = F.expr(
        f"CASE WHEN vi0 >= -{_TD_OFF} THEN vi0"
        " ELSE CAST(raise_error("
        "'tdigest: vi < -_TD_OFF; widen _TD_OFF')"
        " AS BIGINT) END"
    )
    base = e.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100.0).cast("bigint").alias("vi0"),
        (F.col("event_id") % _TD_PARTS).alias("part"),
    ).select("event_type", "event_id", vi_guard.alias("vi"), "part")
    wpo = Window.partitionBy("event_type", "part").orderBy(
        "vi", "event_id"
    )
    wpp = Window.partitionBy("event_type", "part")
    ki = F.floor(
        F.lit(_TD_C)
        * (
            F.log(F.col("rn").cast("double"))
            - F.log((F.col("np") + 1 - F.col("rn")).cast("double"))
        )
    ).cast("bigint")
    pre = (
        base.select(
            "event_type",
            "part",
            "vi",
            F.row_number().over(wpo).alias("rn"),
            F.count("*").over(wpp).alias("np"),
        )
        .select("event_type", "part", "vi", ki.alias("ki"))
        .groupBy("event_type", "part", "ki")
        .agg(
            F.count("*").cast("bigint").alias("w"),
            F.sum("vi").cast("bigint").alias("sv"),
        )
        .localCheckpoint(eager=True)
    )
    qmk = F.expr(f"((sv + w * {_TD_OFF}) * 1000) div w")
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy(qmk, "part", "ki")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_t = Window.partitionBy("event_type")
    ord1 = pre.select(
        "event_type",
        "part",
        "ki",
        "w",
        "sv",
        F.sum("w").over(w_cum).alias("cumw"),
        F.sum("w").over(w_t).alias("n"),
        F.count("*").over(w_t).alias("m_pre"),
    )
    km = F.floor(
        F.lit(_TD_C)
        * (
            F.log((2 * F.col("cumw") - F.col("w")).cast("double"))
            - F.log(
                (2 * F.col("n") - 2 * F.col("cumw") + F.col("w")).cast(
                    "double"
                )
            )
        )
    ).cast("bigint")
    mc = (
        ord1.select("event_type", "w", "sv", "n", "m_pre", km.alias("km"))
        .groupBy("event_type", "km")
        .agg(
            F.sum("w").cast("bigint").alias("wm"),
            F.sum("sv").cast("bigint").alias("svm"),
            F.max("n").alias("n"),
            F.max("m_pre").alias("m_pre"),
        )
        .localCheckpoint(eager=True)
    )
    w_mc = (
        Window.partitionBy("event_type")
        .orderBy("km")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mo = mc.select(
        "event_type",
        "km",
        "wm",
        "svm",
        "n",
        "m_pre",
        F.sum("wm").over(w_mc).alias("cumwm"),
        F.count("*").over(w_t).alias("m_merged"),
    )
    pb = (
        pre.groupBy("event_type", "part")
        .agg(F.max("w").alias("mw"))
        .groupBy("event_type")
        .agg(F.sum("mw").cast("bigint").alias("pre_bound"))
    )
    mb = mc.groupBy("event_type").agg(F.max("wm").alias("max_wm"))
    return base, mc, mo, pb, mb


@query("tdigest_merge_audit", oracle=_TDIGEST_ORACLE)
def q_tdigest_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-DIGEST merge law, made deterministic — the mergeable-CENTROID
    quantile sketch (Dunning & Ertl, "Computing extremely accurate
    quantiles using t-digests"), completing the percentile-sketch
    ladder the way MG completed heavy hitters: GK keeps strided RANKS
    (`quantile_summary_merge`); the t-digest keeps variable-width
    CENTROIDS sized by a scale function that shrinks clusters at the
    tails.  The stock algorithm's greedy sequential clustering is
    replaced by closed-form SCALE-FUNCTION BUCKETING with the k2 scale
    K(q) = C·ln(q/(1-q)) (a published t-digest scale; its derivative
    1/(q(1-q)) gives the tail-accuracy property), which makes every
    cluster assignment an independent per-row expression — fully
    parallel, deterministic, and rebuilt bit-identically by DuckDB:

    1. PER-PART digests (4 parts by event_id): rank rn of np
       within (type, part), cluster ki = FLOOR(C·(ln rn − ln(np+1−rn)))
       — exact-int ln args, so both engines floor identical doubles
       (the ioc_host_dga_scores ln discipline); centroids carry
       (w=count, sv=Σvi) EXACT INTEGER pairs, never float means.
    2. MERGE = sort all parts' centroids by quantized mean
       ((sv + w·OFF)·1000 div w — exact, nonnegative) and RE-CLUSTER by
       the same scale function on merged mid-rank q=(2·cumw−w)/2N —
       precisely the reference t-digest merge (sort by mean, re-bucket
       by scale), in one window pass.
    3. ESTIMATE: the covering centroid of the target rank (the unique
       row with cumwm−wm < target ≤ cumwm); est = sv/w, one exact-int
       division per output double.
    4. AUDIT: exact lt/le rank census of the estimates over the raw
       rows via integer CROSS-MULTIPLY (vi·w < sv — no float compare),
       with the merge-error bound Σ_part max-cluster-weight +
       max-merged-cluster-weight COMPUTED on both sides (each part
       mislocates a rank by < its widest cluster; errors add under
       union — the GK parts×stride argument with data-dependent
       widths).

    Scale shape: per-part digests build in one (type, part) window
    pass and are O(C·ln np) centroids; the merge window rides the
    tiny centroid set; the exact-rank census is the audit leg, not
    the production path — production serves the merged digest.  At
    100 TB parts = executors and the merge folds centroid sets, which
    is the entire point of the t-digest."""
    base, mc, mo, pb, mb = _td_frames(spark, sf_dir)
    t50 = F.expr("(n + 1) div 2")
    t90 = F.expr("(9 * n + 9) div 10")
    cov50 = (F.col("cumwm") >= t50) & (F.col("cumwm") - F.col("wm") < t50)
    cov90 = (F.col("cumwm") >= t90) & (F.col("cumwm") - F.col("wm") < t90)
    est = mo.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("m_pre").alias("m_pre"),
        F.max("m_merged").alias("m_merged"),
        F.max(F.when(cov50, F.col("svm"))).alias("sv50"),
        F.max(F.when(cov50, F.col("wm"))).alias("w50"),
        F.max(F.when(cov90, F.col("svm"))).alias("sv90"),
        F.max(F.when(cov90, F.col("wm"))).alias("w90"),
    )
    ranks = (
        base.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    F.col("vi") * F.col("w50") < F.col("sv50"), 1
                ).otherwise(0)
            ).alias("lt50"),
            F.sum(
                F.when(
                    F.col("vi") * F.col("w50") <= F.col("sv50"), 1
                ).otherwise(0)
            ).alias("le50"),
            F.sum(
                F.when(
                    F.col("vi") * F.col("w90") < F.col("sv90"), 1
                ).otherwise(0)
            ).alias("lt90"),
            F.sum(
                F.when(
                    F.col("vi") * F.col("w90") <= F.col("sv90"), 1
                ).otherwise(0)
            ).alias("le90"),
        )
    )
    j = (
        est.join(ranks, "event_type")
        .join(pb, "event_type")
        .join(mb, "event_type")
    )
    err50 = F.greatest(
        F.lit(0).cast("bigint"),
        (t50 - F.col("le50")).cast("bigint"),
        (F.col("lt50") + 1 - t50).cast("bigint"),
    )
    err90 = F.greatest(
        F.lit(0).cast("bigint"),
        (t90 - F.col("le90")).cast("bigint"),
        (F.col("lt90") + 1 - t90).cast("bigint"),
    )
    bound = (F.col("pre_bound") + F.col("max_wm")).cast("bigint")
    return j.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("m_pre").cast("bigint").alias("n_centroids_pre"),
        F.col("m_merged").cast("bigint").alias("n_centroids_merged"),
        (
            F.col("sv50").cast("double")
            / F.col("w50").cast("double")
            / F.lit(100.0)
        ).alias("est_p50"),
        (
            F.col("sv90").cast("double")
            / F.col("w90").cast("double")
            / F.lit(100.0)
        ).alias("est_p90"),
        err50.alias("rank_err_p50"),
        err90.alias("rank_err_p90"),
        bound.alias("err_bound"),
        (err50 <= bound).alias("within_bound_p50"),
        (err90 <= bound).alias("within_bound_p90"),
    )


# ---------------------------------------------------------------------------
# t-digest quantile SERVE — answer a quantile ladder from the PERSISTED
# merged-centroid artifact, completing build→merge→serve for the
# quantile-sketch family the way the IVF-PQ lifecycle did for ANN
# ---------------------------------------------------------------------------

_TD_QUANTS = [25, 50, 75, 90, 99]

_TDSERVE_ORACLE = f"""
WITH {_TD_CORE_SQL},
qs AS (SELECT * FROM (VALUES {", ".join(f"({qq})" for qq in _TD_QUANTS)})
       AS qs(q_pct)),
tq AS (
  SELECT t.event_type, t.n, qs.q_pct,
    LEAST(GREATEST(CAST((qs.q_pct * (t.n + 1)) // 100 AS BIGINT), 1),
          t.n) AS r
  FROM (SELECT DISTINCT event_type, n FROM mo) t CROSS JOIN qs
),
serve AS (
  SELECT tq.event_type, tq.q_pct, tq.n, tq.r,
    MAX(CASE WHEN mo.cumwm >= tq.r AND mo.cumwm - mo.wm < tq.r
             THEN mo.svm END) AS svq,
    MAX(CASE WHEN mo.cumwm >= tq.r AND mo.cumwm - mo.wm < tq.r
             THEN mo.wm END) AS wq
  FROM tq JOIN mo ON mo.event_type = tq.event_type
  GROUP BY 1, 2, 3, 4
),
rk AS (
  SELECT s.event_type, s.q_pct,
    SUM(CASE WHEN b.vi * s.wq < s.svq THEN 1 ELSE 0 END) AS ltq,
    SUM(CASE WHEN b.vi * s.wq <= s.svq THEN 1 ELSE 0 END) AS leq
  FROM base b JOIN serve s ON b.event_type = s.event_type
  GROUP BY 1, 2
)
SELECT s.event_type,
  CAST(s.q_pct AS BIGINT) AS q_pct,
  CAST(s.n AS BIGINT) AS n_events,
  CAST(s.r AS BIGINT) AS target_rank,
  CAST(s.svq AS DOUBLE) / CAST(s.wq AS DOUBLE) / 100.0 AS est_value,
  CAST(GREATEST(0, s.r - k.leq, k.ltq + 1 - s.r) AS BIGINT) AS rank_err,
  CAST(p.pre_bound + m.max_wm AS BIGINT) AS err_bound,
  GREATEST(0, s.r - k.leq, k.ltq + 1 - s.r)
    <= p.pre_bound + m.max_wm AS within_bound
FROM serve s
JOIN rk k ON k.event_type = s.event_type AND k.q_pct = s.q_pct
JOIN pb p ON p.event_type = s.event_type
JOIN mb m ON m.event_type = s.event_type
"""


@query("tdigest_quantile_serve", oracle=_TDSERVE_ORACLE)
def q_tdigest_quantile_serve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """t-digest quantile SERVE leg — the query-time half the merge
    audit (`tdigest_merge_audit`) leaves implicit, completing
    build → merge → SERVE for the quantile-sketch ladder exactly as
    the IVF-PQ lifecycle did for ANN (VERDICT-r13 item 5):

    1. BUILD+MERGE (ingest-time): the shared `_td_frames` pipeline
       (per-part scale-function centroids → sort-by-mean re-cluster
       merge), then PERSIST the merged centroids as a table whose rows
       carry their OWN error bound (pre_bound + max_wm columns) — the
       digest artifact a serving node loads is self-certifying.
    2. SERVE (query-time): answer a 5-point quantile ladder
       (p25/p50/p75/p90/p99) per event_type from the STORED centroids
       only — one cumulative-weight window over ~C·ln(n) rows per
       type, covering-centroid pick per target rank
       (floor(q·(n+1)/100), clamped), est = svm/wq in one exact-int
       division.  No raw-data touch on the serve path.
    3. AUDIT: the exact lt/le rank census of every served estimate
       over the raw rows (integer cross-multiply, the merge-audit
       discipline), with `within_bound` COMPUTED on both sides — the
       sketch's rank-error guarantee is a checked boolean, so a
       drifting digest breaks the value hash.

    Scale shape: the stored artifact is O(types · C·ln n) rows —
    kilobytes at 100 TB — and the serve path reads ONLY it; the raw
    census is the audit leg, not the production path.  Serving any
    quantile is a broadcast-sized window + one row pick, which is why
    digest-backed percentile dashboards answer in milliseconds while
    the exact query re-scans terabytes."""
    import hashlib

    tbl = "tdq_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8] + "_cent"
    from ..sinks.bucketed import drop_table_and_location

    drop_table_and_location(spark, tbl)
    base, mc, _, pb, mb = _td_frames(spark, sf_dir)
    (
        mc.join(pb, "event_type")
        .join(mb, "event_type")
        .select(
            "event_type", "km", "wm", "svm", "n", "pre_bound", "max_wm"
        )
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(tbl)
    )
    cent = spark.table(tbl)
    w_mc = (
        Window.partitionBy("event_type")
        .orderBy("km")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mo = cent.select(
        "event_type",
        "wm",
        "svm",
        "n",
        F.sum("wm").over(w_mc).alias("cumwm"),
    )
    tq = (
        cent.select("event_type", "n")
        .distinct()
        .select(
            "event_type",
            "n",
            F.explode(
                F.array(
                    *[F.lit(qq).cast("bigint") for qq in _TD_QUANTS]
                )
            ).alias("q_pct"),
        )
        .select(
            "event_type",
            "n",
            "q_pct",
            F.expr(
                "least(greatest((q_pct * (n + 1)) div 100, 1), n)"
            ).alias("r"),
        )
    )
    cov = (F.col("cumwm") >= F.col("r")) & (
        F.col("cumwm") - F.col("wm") < F.col("r")
    )
    serve = (
        mo.join(F.broadcast(tq.drop("n")), "event_type")
        .groupBy("event_type", "q_pct", "r")
        .agg(
            F.max("n").alias("n"),
            F.max(F.when(cov, F.col("svm"))).alias("svq"),
            F.max(F.when(cov, F.col("wm"))).alias("wq"),
        )
        .localCheckpoint(eager=True)
    )
    rk = (
        base.join(F.broadcast(serve), "event_type")
        .groupBy("event_type", "q_pct")
        .agg(
            F.sum(
                F.when(
                    F.col("vi") * F.col("wq") < F.col("svq"), 1
                ).otherwise(0)
            ).alias("ltq"),
            F.sum(
                F.when(
                    F.col("vi") * F.col("wq") <= F.col("svq"), 1
                ).otherwise(0)
            ).alias("leq"),
        )
    )
    bounds = cent.groupBy("event_type").agg(
        F.max("pre_bound").alias("pre_bound"),
        F.max("max_wm").alias("max_wm"),
    )
    err = F.greatest(
        F.lit(0).cast("bigint"),
        (F.col("r") - F.col("leq")).cast("bigint"),
        (F.col("ltq") + 1 - F.col("r")).cast("bigint"),
    )
    bound = (F.col("pre_bound") + F.col("max_wm")).cast("bigint")
    return (
        serve.join(rk, ["event_type", "q_pct"])
        .join(F.broadcast(bounds), "event_type")
        .select(
            "event_type",
            F.col("q_pct").cast("bigint").alias("q_pct"),
            F.col("n").cast("bigint").alias("n_events"),
            F.col("r").cast("bigint").alias("target_rank"),
            (
                F.col("svq").cast("double")
                / F.col("wq").cast("double")
                / F.lit(100.0)
            ).alias("est_value"),
            err.alias("rank_err"),
            bound.alias("err_bound"),
            (err <= bound).alias("within_bound"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming sessionization, APPEND mode — sessions emit as they close
# ---------------------------------------------------------------------------

_SESSION_APPEND_ORACLE = """
WITH ev AS (
  SELECT user_id, ts FROM events WHERE user_id < 10
),
flagged AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
         THEN 1 ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS sid
  FROM flagged
),
per_session AS (
  SELECT user_id, sid, MIN(ts) AS s_start, MAX(ts) AS s_last,
    COUNT(*) AS n_events
  FROM sessions GROUP BY user_id, sid
),
wm AS (
  -- Spark's event-time stats are millisecond-floored; the final
  -- watermark is floor_ms(max event time) - 30 min, and a session
  -- emits when its window end (last event + 30 min gap) is <= the
  -- watermark (pinned empirically per the CLAUDE.md discipline)
  SELECT epoch_ms(MAX(ts)) - 1800000 AS w_ms FROM ev
)
SELECT user_id,
  strftime(s_start, '%Y-%m-%d %H:%M:%S') AS session_start,
  CAST(n_events AS BIGINT) AS n_events
FROM per_session, wm
WHERE epoch_ms(s_last) + 1800000 <= wm.w_ms
"""


@query("stream_session_append", oracle=_SESSION_APPEND_ORACLE)
def q_stream_session_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization in APPEND mode — the production config
    (bounded state, sessions emit exactly once as the watermark closes
    them), complementing stream_session_counts' complete-mode parity
    run: the drained sink holds exactly the sessions whose window end
    (last event + 30-minute gap) the final watermark passed; later
    sessions stay PENDING (the watermarked-append truncation, stated
    as the oracle's closed-form cutoff at the millisecond grain of
    Spark's event-time stats).

    Scale shape: session state is O(open sessions per user) in the
    state store, emission is pure eviction; the batch oracle
    re-derives sessions via the lag/cumsum form and applies the same
    cutoff."""
    from ..streaming.pipeline import run_session_window_stream_append

    return run_session_window_stream_append(spark, sf_dir)


# ---------------------------------------------------------------------------
# Split-conformal calibration — distribution-free prediction intervals
# (Mondrian / class-conditional form), the modern uncertainty primitive
# ---------------------------------------------------------------------------

from .dedup import _SHINGLE_INT_SQL as _SHND_SQL  # noqa: E402
from .dedup import _shingle_int as _shnd  # noqa: E402

_CONF_BUCKET = _SHND_SQL.format(x="CAST(event_id AS VARCHAR)") + " % 100"

_CONFORMAL_ORACLE = f"""
WITH e AS (
  SELECT event_id, event_type,
    CAST(ROUND(value * 100.0) AS BIGINT) AS vi,
    {_CONF_BUCKET} AS b
  FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT event_type, vi AS med_i FROM (
    SELECT event_type, vi,
      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vi, event_id)
        AS rn,
      COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM e WHERE b < 50)
  WHERE rn = (n + 1) // 2
),
ntr AS (
  SELECT event_type, COUNT(*) AS n_train FROM e WHERE b < 50 GROUP BY 1
),
cal AS (
  SELECT c.event_type, abs(c.vi - m.med_i) AS s, c.event_id
  FROM e c JOIN med m ON c.event_type = m.event_type
  WHERE c.b >= 50 AND c.b < 75
),
calc AS (SELECT event_type, COUNT(*) AS n_cal FROM cal GROUP BY 1),
kq AS (
  SELECT event_type, s AS q_i FROM (
    SELECT event_type, s, event_id,
      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY s, event_id)
        AS rn,
      ((COUNT(*) OVER (PARTITION BY event_type) + 1) * 9 + 9) // 10 AS k
    FROM cal)
  WHERE rn = k
),
tst AS (
  SELECT t.event_type, abs(t.vi - m.med_i) AS s
  FROM e t JOIN med m ON t.event_type = m.event_type
  WHERE t.b >= 75
),
cov AS (
  SELECT t.event_type, COUNT(*) AS n_test,
    SUM(CASE WHEN k.q_i IS NULL OR t.s <= k.q_i THEN 1 ELSE 0 END)
      AS n_covered
  FROM tst t LEFT JOIN kq k ON t.event_type = k.event_type
  GROUP BY 1
)
SELECT c.event_type,
  CAST(nt.n_train AS BIGINT) AS n_train,
  CAST(cc.n_cal AS BIGINT) AS n_cal,
  CAST(((cc.n_cal + 1) * 9 + 9) // 10 AS BIGINT) AS q_rank,
  CAST(k.q_i AS DOUBLE) / 100.0 AS q_value,
  CAST(c.n_test AS BIGINT) AS n_test,
  CAST(c.n_covered AS BIGINT) AS n_covered,
  CAST(c.n_covered AS DOUBLE) / c.n_test AS coverage
FROM cov c
JOIN ntr nt ON c.event_type = nt.event_type
JOIN calc cc ON c.event_type = cc.event_type
LEFT JOIN kq k ON c.event_type = k.event_type
"""


def _conformal_base(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(events with md5 split bucket, per-type exact train median) —
    shared by the batch conformal calibration and its streaming twin
    (the trained-model state both legs condition on)."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("vi"),
            (_shnd(F.col("event_id").cast("string")) % 100).alias("b"),
        )
    )
    tr = e.filter(F.col("b") < 50)
    w_med = Window.partitionBy("event_type").orderBy("vi", "event_id")
    med = (
        tr.select(
            "event_type",
            "vi",
            F.row_number().over(w_med).alias("rn"),
            F.count("*")
            .over(Window.partitionBy("event_type"))
            .alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("vi").alias("med_i"))
    )
    return e, med


@query("conformal_value_coverage", oracle=_CONFORMAL_ORACLE)
def q_conformal_value_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SPLIT-CONFORMAL calibration (Vovk; Lei et al. 2018), Mondrian /
    class-conditional form — the distribution-free uncertainty
    primitive every model-serving pipeline bolts on after training:
    a leak-proof md5 split carves events into train (b<50) /
    calibration (50≤b<75) / test (b≥75); the per-type predictor is
    the exact train lower median (rank (n+1) div 2 — no
    interpolation, stays integer); nonconformity is |value − median|
    on the mantissa; the per-type conformal threshold is the
    k = ceil(0.9·(n_cal+1))-th smallest calibration score — the exact
    finite-sample rank, computed as ((n_cal+1)·9+9) div 10 (the
    integer-division idiom; Spark `/` would drift the rank at ties) —
    and held-out coverage counts test scores ≤ threshold (all covered
    when k > n_cal: the threshold is +∞ by convention, expressed as
    the absent-rank LEFT JOIN both engines share).  The ≥ 90%
    guarantee holds in EXPECTATION over splits, so the oracle checks
    the COMPUTED coverage (identical integers), never asserts the
    bound.

    Scale shape: one hash-bucket scan split; medians and thresholds
    are per-type rank windows (type-partitioned, map-side combinable
    censuses); coverage is one broadcast threshold join + conditional
    count.  Everything is type-grain after the first pass — the
    Mondrian grouping is exactly a groupBy key at 100 TB."""
    e, med = _conformal_base(spark, sf_dir)
    tr = e.filter(F.col("b") < 50)
    ntr = tr.groupBy("event_type").agg(F.count("*").alias("n_train"))
    cal = (
        e.filter((F.col("b") >= 50) & (F.col("b") < 75))
        .join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.abs(F.col("vi") - F.col("med_i")).alias("s"),
            "event_id",
        )
    )
    calc = cal.groupBy("event_type").agg(F.count("*").alias("n_cal"))
    w_cal = Window.partitionBy("event_type").orderBy("s", "event_id")
    kq = (
        cal.select(
            "event_type",
            "s",
            F.row_number().over(w_cal).alias("rn"),
            F.count("*")
            .over(Window.partitionBy("event_type"))
            .alias("nc"),
        )
        .filter(F.col("rn") == F.expr("((nc + 1) * 9 + 9) div 10"))
        .select("event_type", F.col("s").alias("q_i"))
    )
    tst = (
        e.filter(F.col("b") >= 75)
        .join(F.broadcast(med), "event_type")
        .select(
            "event_type", F.abs(F.col("vi") - F.col("med_i")).alias("s")
        )
    )
    cov = (
        tst.join(F.broadcast(kq), "event_type", "left")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_test"),
            F.sum(
                F.when(
                    F.col("q_i").isNull() | (F.col("s") <= F.col("q_i")),
                    1,
                ).otherwise(0)
            ).alias("n_covered"),
        )
    )
    return (
        cov.join(ntr, "event_type")
        .join(calc, "event_type")
        .join(kq, "event_type", "left")
        .select(
            "event_type",
            F.col("n_train").cast("bigint").alias("n_train"),
            F.col("n_cal").cast("bigint").alias("n_cal"),
            F.expr("((n_cal + 1) * 9 + 9) div 10")
            .cast("bigint")
            .alias("q_rank"),
            (F.col("q_i").cast("double") / F.lit(100.0)).alias("q_value"),
            F.col("n_test").cast("bigint").alias("n_test"),
            F.col("n_covered").cast("bigint").alias("n_covered"),
            (
                F.col("n_covered").cast("double")
                / F.col("n_test").cast("double")
            ).alias("coverage"),
        )
    )


@query("stream_conformal_coverage", oracle=_CONFORMAL_ORACLE)
def q_stream_conformal_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING twin of conformal_value_coverage — the serving
    monitor every deployed calibration needs: calibration scores
    arrive as micro-batches and fold into per-(type, score) integer
    COUNT-HISTOGRAM partials, written bid-keyed and replay-safe
    (streaming/pipeline.py::run_stream_conformal_scores); the exact
    finite-sample conformal rank is computed at drain from the MERGED
    state (running-count cumsum over the histogram — the
    merged-rank-at-drain form; exact because nonconformity scores are
    mantissa integers, so the histogram IS the score multiset).
    Held-out coverage is then scored against the merged threshold.
    The result is batch-identical for any batching, ordering, or
    at-least-once replay of the calibration stream, so the BATCH
    oracle is the ground truth the streamed fold must hash-match.

    Scale shape: per trigger one map-side-combined histogram count;
    the drain-side rank is a per-type cumsum over distinct scores
    (state ∝ score cardinality, not events); coverage is the batch
    leg's broadcast-threshold join."""
    from ..streaming.pipeline import run_stream_conformal_scores

    hist = run_stream_conformal_scores(spark, sf_dir).localCheckpoint(
        eager=True
    )
    e, med = _conformal_base(spark, sf_dir)
    ntr = (
        e.filter(F.col("b") < 50)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_train"))
    )
    calc = hist.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n_cal")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kq = (
        hist.withColumn("cum", F.sum("c").over(w_cum))
        .join(calc, "event_type")
        .filter(
            F.col("cum") >= F.expr("((n_cal + 1) * 9 + 9) div 10")
        )
        .groupBy("event_type")
        .agg(F.min("s").alias("q_i"))
    )
    tst = (
        e.filter(F.col("b") >= 75)
        .join(F.broadcast(med), "event_type")
        .select(
            "event_type", F.abs(F.col("vi") - F.col("med_i")).alias("s")
        )
    )
    cov = (
        tst.join(F.broadcast(kq), "event_type", "left")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_test"),
            F.sum(
                F.when(
                    F.col("q_i").isNull() | (F.col("s") <= F.col("q_i")),
                    1,
                ).otherwise(0)
            ).alias("n_covered"),
        )
    )
    return (
        cov.join(ntr, "event_type")
        .join(calc, "event_type")
        .join(kq, "event_type", "left")
        .select(
            "event_type",
            F.col("n_train").cast("bigint").alias("n_train"),
            F.col("n_cal").cast("bigint").alias("n_cal"),
            F.expr("((n_cal + 1) * 9 + 9) div 10")
            .cast("bigint")
            .alias("q_rank"),
            (F.col("q_i").cast("double") / F.lit(100.0)).alias("q_value"),
            F.col("n_test").cast("bigint").alias("n_test"),
            F.col("n_covered").cast("bigint").alias("n_covered"),
            (
                F.col("n_covered").cast("double")
                / F.col("n_test").cast("double")
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# Interval-overlap join with Allen-relation census — sessions × incident
# windows, the temporal-warehouse join shape
# ---------------------------------------------------------------------------

_INC_MIN_ERRORS = 6  # an hour with >= this many 'error' events is an incident


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    width: int,
    left_cols: tuple[str, str] = ("a0", "a1"),
    right_cols: tuple[str, str] = ("b0", "b1"),
    broadcast_right: bool = False,
) -> DataFrame:
    """Two-sided INTERVAL-OVERLAP join as a bucketed equi-join — the
    library form of the rewrite that keeps temporal joins keyed at
    100 TB: both sides explode their inclusive [start, end] integer
    intervals into covered ``width``-buckets (bounded by interval
    length / width), equi-join on the bucket key, apply the EXACT
    overlap predicate as a residual, and DISTINCT away multi-bucket
    duplicates.  Never an inequality θ-join / cartesian.

    ``width`` trades explode fan-out against bucket selectivity: pick
    it near the typical interval length so each interval covers O(1)
    buckets while buckets stay selective (hour buckets for session ×
    incident-hour, day buckets for day-grain exposure — both plans
    pinned in tests/test_plans.py).  ``broadcast_right`` marks a
    dimension-sized right side (e.g. incident windows)."""
    la0, la1 = left_cols
    rb0, rb1 = right_cols
    lb = left.withColumn(
        "_ib",
        F.explode(
            F.sequence(
                F.expr(f"{la0} div {width}"), F.expr(f"{la1} div {width}")
            )
        ),
    )
    rb = right.withColumn(
        "_ib",
        F.explode(
            F.sequence(
                F.expr(f"{rb0} div {width}"), F.expr(f"{rb1} div {width}")
            )
        ),
    )
    if broadcast_right:
        rb = F.broadcast(rb)
    return (
        lb.join(rb, "_ib")
        .filter(
            (F.col(la0) <= F.col(rb1)) & (F.col(rb0) <= F.col(la1))
        )
        .drop("_ib")
        .distinct()
    )

_SESS_INC_CTES = f"""ev AS (
  SELECT user_id, ts, event_id, event_type,
    epoch_us(ts) // 1000000 AS es
  FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT user_id, es, ts, event_id,
    CASE WHEN es - LAG(es) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) > 1800
           OR LAG(es) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM ev
),
sess AS (
  SELECT user_id, sid, MIN(es) AS a0, MAX(es) AS a1 FROM (
    SELECT user_id, es,
      SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged)
  GROUP BY user_id, sid
),
inc AS (
  SELECT (epoch_us(date_trunc('hour', ts)) // 1000000) AS b0,
         (epoch_us(date_trunc('hour', ts)) // 1000000) + 3599 AS b1
  FROM events WHERE ts IS NOT NULL AND event_type = 'error'
  GROUP BY 1, 2 HAVING COUNT(*) >= {_INC_MIN_ERRORS}
)"""

_ALLEN_ORACLE = f"""
WITH {_SESS_INC_CTES},
hrs AS (
  SELECT s.user_id, s.sid, s.a0, s.a1, u.h
  FROM sess s, unnest(range(s.a0 // 3600, s.a1 // 3600 + 1)) AS u(h)
),
pairs AS (
  SELECT DISTINCT h.user_id, h.sid, h.a0, h.a1, i.b0, i.b1
  FROM hrs h JOIN inc i ON i.b0 // 3600 = h.h
  WHERE h.a0 <= i.b1 AND i.b0 <= h.a1
),
rel AS (
  SELECT CASE
      WHEN a0 = b0 AND a1 = b1 THEN 'equal'
      WHEN a0 >= b0 AND a1 <= b1 THEN 'during'
      WHEN a0 <= b0 AND a1 >= b1 THEN 'contains'
      WHEN a0 < b0 THEN 'overlaps_left'
      ELSE 'overlaps_right' END AS relation,
    user_id, sid,
    LEAST(a1, b1) - GREATEST(a0, b0) + 1 AS ov
  FROM pairs
)
SELECT relation,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(COUNT(DISTINCT user_id * 1000000 + sid) AS BIGINT) AS n_sessions,
  CAST(SUM(ov) AS BIGINT) AS total_overlap_secs
FROM rel GROUP BY relation
"""


def _session_incident_intervals(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(user sessions as inclusive epoch-second intervals, incident
    hour windows) — shared by the Allen-relation census and the
    day-grain exposure census."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.unix_timestamp("ts").alias("es"),
        )
    )
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "es",
        "ts",
        "event_id",
        F.when(
            (F.col("es") - F.lag("es").over(w_lag) > 1800)
            | F.lag("es").over(w_lag).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    # Cumulative-sum window MUST use the same fully-deterministic
    # (ts, event_id) ordering as the lag window: same-second rows at a
    # session boundary (bare `es` ties) otherwise get engine- and
    # run-dependent session ids (ADVICE r11 — live at sf0.1 where user
    # 1061 has two events in the same second at a boundary).
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        flagged.select(
            "user_id",
            "es",
            F.sum("new_session").over(w_run).alias("sid"),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("es").alias("a0"), F.max("es").alias("a1"))
    )
    inc = (
        ev.filter(F.col("event_type") == "error")
        .select(
            (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))))
            .alias("b0")
        )
        .groupBy("b0")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= _INC_MIN_ERRORS)
        .select("b0", (F.col("b0") + 3599).alias("b1"))
    )
    return sess, inc


@query("session_incident_overlap", oracle=_ALLEN_ORACLE)
def q_session_incident_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INTERVAL-OVERLAP join with an Allen-relation census — the
    temporal-warehouse join shape (which sessions touched which
    incident windows, and HOW): user sessions (30-min-gap
    sessionization, the events_sessionize fold, as inclusive
    epoch-second intervals) joined to incident windows (hours with
    >= {n} 'error' events) on interval overlap, each pair classified
    by its Allen-algebra bucket (equal / during / contains /
    overlaps_left / overlaps_right — the inverse relations fold into
    the left/right pair since the census is direction-agnostic), with
    exact inclusive overlap seconds summed per bucket.

    Scale shape: the overlap join is NOT an inequality θ-join — each
    session explodes into its covered HOUR KEYS (sequence over integer
    hour indexes, bounded by session length) and equi-joins the
    incident hours on the key, with the exact overlap predicate as a
    residual — the standard interval-bucketing rewrite that keeps the
    join keyed at 100 TB (click_error_range_join's discipline applied
    to two-sided intervals).  Incident hours are a broadcast-sized
    dim; second-grain epochs via truncating unix_timestamp, paired
    with the oracle's epoch_us // 1000000 (the events_twap pairing).
    DISTINCT de-dups multi-hour pairs before classification, so each
    (session, window) pair counts once."""
    sess, inc = _session_incident_intervals(spark, sf_dir)
    pairs = interval_overlap_join(
        sess, inc, width=3600, broadcast_right=True
    ).select("user_id", "sid", "a0", "a1", "b0", "b1")
    relation = (
        F.when(
            (F.col("a0") == F.col("b0")) & (F.col("a1") == F.col("b1")),
            "equal",
        )
        .when(
            (F.col("a0") >= F.col("b0")) & (F.col("a1") <= F.col("b1")),
            "during",
        )
        .when(
            (F.col("a0") <= F.col("b0")) & (F.col("a1") >= F.col("b1")),
            "contains",
        )
        .when(F.col("a0") < F.col("b0"), "overlaps_left")
        .otherwise("overlaps_right")
    )
    ov = F.least("a1", "b1") - F.greatest("a0", "b0") + 1
    return (
        pairs.select(
            relation.alias("relation"),
            "user_id",
            "sid",
            ov.alias("ov"),
        )
        .groupBy("relation")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.countDistinct(
                F.col("user_id") * 1000000 + F.col("sid")
            )
            .cast("bigint")
            .alias("n_sessions"),
            F.sum("ov").cast("bigint").alias("total_overlap_secs"),
        )
    )


_EXPOSURE_ORACLE = f"""
WITH {_SESS_INC_CTES},
pairs AS (
  SELECT DISTINCT s.user_id, s.sid, s.a0, s.a1, i.b0, i.b1
  FROM sess s JOIN inc i ON s.a0 <= i.b1 AND i.b0 <= s.a1
)
SELECT CAST(user_id AS BIGINT) AS user_id,
  CAST(COUNT(DISTINCT sid) AS BIGINT) AS n_sessions_exposed,
  CAST(COUNT(DISTINCT b0) AS BIGINT) AS n_windows,
  CAST(SUM(LEAST(a1, b1) - GREATEST(a0, b0) + 1) AS BIGINT)
    AS overlap_secs
FROM pairs GROUP BY user_id
"""


@query("user_incident_exposure", oracle=_EXPOSURE_ORACLE)
def q_user_incident_exposure(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-USER incident exposure census — the second caller of the
    `interval_overlap_join` library rewrite, at a SECOND bucket width
    (day buckets, 86400 s, vs the Allen census's hour buckets): which
    users had sessions open during incident windows, how many distinct
    windows they touched, and for how many total seconds — the blast-
    radius rollup an on-call review runs after a bad day.  Sessions
    and incident windows are the same interval frames as
    session_incident_overlap (shared builder); the oracle states the
    equivalent direct overlap join, since the bucketing is a PLAN
    rewrite, not a semantics change.

    Scale shape: the helper explodes both interval sides into covered
    day-buckets (sessions are minutes-to-hours long, so O(1) buckets
    each) and equi-joins on the bucket key with the exact predicate as
    a residual — never a θ-join; incidents broadcast at dim size; the
    census is one map-side-combined per-user rollup.  Both widths'
    plans are pinned in tests/test_plans.py (no CartesianProduct /
    BroadcastNestedLoopJoin at either width)."""
    sess, inc = _session_incident_intervals(spark, sf_dir)
    pairs = interval_overlap_join(
        sess, inc, width=86400, broadcast_right=True
    )
    ov = F.least("a1", "b1") - F.greatest("a0", "b0") + 1
    return (
        pairs.groupBy("user_id")
        .agg(
            F.countDistinct("sid")
            .cast("bigint")
            .alias("n_sessions_exposed"),
            F.countDistinct("b0").cast("bigint").alias("n_windows"),
            F.sum(ov).cast("bigint").alias("overlap_secs"),
        )
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "n_sessions_exposed",
            "n_windows",
            "overlap_secs",
        )
    )


# ---------------------------------------------------------------------------
# Bradley-Terry preference fit — ranking from pairwise comparisons, the
# preference-data primitive (RLHF reward modeling's classical ancestor)
# ---------------------------------------------------------------------------

_BT_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
    CAST(ROUND(value * 100) AS BIGINT) AS vi
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
adj AS (
  SELECT event_type AS cur_t, vi AS cur_v,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_t,
    LAG(vi) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v
  FROM e
),
gm AS (
  SELECT CASE WHEN cur_v > prev_v THEN cur_t ELSE prev_t END AS wi,
         CASE WHEN cur_v > prev_v THEN prev_t ELSE cur_t END AS lo
  FROM adj
  WHERE prev_t IS NOT NULL AND prev_t != cur_t AND cur_v != prev_v
),
wmat AS MATERIALIZED (
  SELECT wi, lo, CAST(COUNT(*) AS BIGINT) AS w FROM gm GROUP BY 1, 2
),
wins AS (SELECT wi AS t, CAST(SUM(w) AS BIGINT) AS n_wins FROM wmat GROUP BY 1),
ng AS MATERIALIZED (
  SELECT t, o, CAST(SUM(w) AS BIGINT) AS g FROM (
    SELECT wi AS t, lo AS o, w FROM wmat
    UNION ALL SELECT lo AS t, wi AS o, w FROM wmat)
  GROUP BY 1, 2
),
gt AS (SELECT t, CAST(SUM(g) AS BIGINT) AS n_games FROM ng GROUP BY 1),
p1 AS MATERIALIZED (
  SELECT gt.t, gt.n_games, COALESCE(w.n_wins, 0) AS n_wins,
    GREATEST(1, CAST((COALESCE(w.n_wins, 0) * 2 * 1000000000)
                     // gt.n_games AS BIGINT)) AS qp1
  FROM gt LEFT JOIN wins w ON w.t = gt.t
),
d2 AS (
  SELECT n.t,
    CAST(SUM(CAST((n.g * 1000000000000)
      // GREATEST(1, CAST((a.qp1 + b.qp1) // 1000000 AS BIGINT))
      AS BIGINT)) AS BIGINT) AS d2i
  FROM ng n JOIN p1 a ON a.t = n.t JOIN p1 b ON b.t = n.o
  GROUP BY n.t
),
p2 AS MATERIALIZED (
  SELECT p.t, p.n_wins, p.n_games, p.qp1,
    GREATEST(1, CAST((p.n_wins * 1000000000000)
      // GREATEST(1, CAST(d.d2i // 1000000 AS BIGINT)) AS BIGINT)) AS qp2
  FROM p1 p JOIN d2 d ON d.t = p.t
),
ll AS (
  SELECT
    CAST(SUM(FLOOR(1000000000.0 * m.w
      * (ln(CAST(a.qp1 AS DOUBLE)) - ln(CAST(a.qp1 + b.qp1 AS DOUBLE)))))
      AS BIGINT) AS ll1,
    CAST(SUM(FLOOR(1000000000.0 * m.w
      * (ln(CAST(a.qp2 AS DOUBLE)) - ln(CAST(a.qp2 + b.qp2 AS DOUBLE)))))
      AS BIGINT) AS ll2
  FROM wmat m JOIN p2 a ON a.t = m.wi JOIN p2 b ON b.t = m.lo
)
SELECT p.t AS event_type,
  p.n_wins, p.n_games,
  CAST(p.qp1 AS DOUBLE) / 1000000000.0 AS p_round1,
  CAST(p.qp2 AS DOUBLE) / 1000000000.0 AS p_round2,
  (SELECT ll1 FROM ll) AS ll1_num,
  (SELECT ll2 FROM ll) AS ll2_num,
  (SELECT ll2 >= ll1 FROM ll) AS ll_improved
FROM p2 p
"""


@query("event_type_bt_strengths", oracle=_BT_ORACLE)
def q_event_type_bt_strengths(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BRADLEY-TERRY preference fit — ranking items from PAIRWISE
    COMPARISONS, the classical model under RLHF reward training and
    every A/B preference pipeline (Bradley & Terry 1952; MM algorithm
    per Hunter 2004): adjacent same-user events of different types
    form a comparison won by the higher value (deterministic
    (ts, event_id) adjacency — the event_transition_matrix idiom);
    two MM rounds from the uniform prior estimate per-type strengths
    p_i, each round p_i ← W_i / Σ_j n_ij/(p_i+p_j) evaluated entirely
    in QUANTIZED integer arithmetic (strengths held as 1e-9-grain
    ints, every division an integer division with a documented 1e-6
    rescale to stay in int64, floors at 1 to keep logs finite) — so
    both engines walk bit-identical iterates.  Emits per type the
    win/game censuses and both rounds' strengths, plus the quantized
    log-likelihood of the win matrix under round-1 and round-2
    strengths (term-floored exact-int sums, the ioc_host_dga_scores
    discipline) with ll_improved COMPUTED on both sides — MM
    guarantees monotone likelihood in exact arithmetic; the quantized
    walk's monotonicity is asserted empirically in
    tests/test_plans.py, not stated by the oracle.

    Scale shape: comparisons ride the one per-user window pass
    (adjacent pairs, no self-join); the win matrix is item²-sized
    (types² ≪ events) and every MM round is a join over that matrix —
    at 100 TB the comparisons shuffle once and the model state stays
    broadcast-sized, exactly how production BT/Elo fitters run."""
    gm = _bt_comparisons(spark, sf_dir)
    wmat = (
        gm.groupBy("wi", "lo")
        .agg(F.count("*").cast("bigint").alias("w"))
        .localCheckpoint(eager=True)
    )
    return _bt_fit_from_wmat(wmat)


def _bt_comparisons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(wi, lo) pairwise comparisons from deterministic same-user
    adjacency — the input stream a preference pipeline receives."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("vi"),
        )
    )
    w_adj = Window.partitionBy("user_id").orderBy("ts", "event_id")
    adj = e.select(
        F.col("event_type").alias("cur_t"),
        F.col("vi").alias("cur_v"),
        F.lag("event_type").over(w_adj).alias("prev_t"),
        F.lag("vi").over(w_adj).alias("prev_v"),
    ).filter(
        F.col("prev_t").isNotNull()
        & (F.col("prev_t") != F.col("cur_t"))
        & (F.col("cur_v") != F.col("prev_v"))
    )
    return adj.select(
        F.when(F.col("cur_v") > F.col("prev_v"), F.col("cur_t"))
        .otherwise(F.col("prev_t"))
        .alias("wi"),
        F.when(F.col("cur_v") > F.col("prev_v"), F.col("prev_t"))
        .otherwise(F.col("cur_t"))
        .alias("lo"),
    )


def _bt_fit_from_wmat(wmat: DataFrame) -> DataFrame:
    """Two quantized MM rounds + likelihood receipt from a win matrix
    (wi, lo, w) — shared by the batch query and its streaming twin
    (the partials-additive split: the win matrix folds by addition,
    the fit runs once on the merged state)."""
    wins = wmat.groupBy(F.col("wi").alias("t")).agg(
        F.sum("w").cast("bigint").alias("n_wins")
    )
    ng = (
        wmat.select(F.col("wi").alias("t"), F.col("lo").alias("o"), "w")
        .unionByName(
            wmat.select(
                F.col("lo").alias("t"), F.col("wi").alias("o"), "w"
            )
        )
        .groupBy("t", "o")
        .agg(F.sum("w").cast("bigint").alias("g"))
    )
    gt = ng.groupBy("t").agg(F.sum("g").cast("bigint").alias("n_games"))
    p1 = (
        gt.join(wins, "t", "left")
        .select(
            "t",
            "n_games",
            F.coalesce(F.col("n_wins"), F.lit(0)).alias("n_wins"),
            F.greatest(
                F.lit(1),
                F.expr(
                    "(coalesce(n_wins, 0) * 2 * 1000000000) div n_games"
                ),
            ).alias("qp1"),
        )
        .localCheckpoint(eager=True)
    )
    d2 = (
        ng.alias("n")
        .join(F.broadcast(p1.alias("a")), F.col("n.t") == F.col("a.t"))
        .join(F.broadcast(p1.alias("b")), F.col("n.o") == F.col("b.t"))
        .groupBy(F.col("n.t").alias("t"))
        .agg(
            F.sum(
                F.expr(
                    "(g * 1000000000000) div"
                    " greatest(1, (a.qp1 + b.qp1) div 1000000)"
                )
            )
            .cast("bigint")
            .alias("d2i")
        )
    )
    p2 = (
        p1.join(d2, "t")
        .select(
            "t",
            "n_wins",
            "n_games",
            "qp1",
            F.greatest(
                F.lit(1),
                F.expr(
                    "(n_wins * 1000000000000) div"
                    " greatest(1, d2i div 1000000)"
                ),
            ).alias("qp2"),
        )
        .localCheckpoint(eager=True)
    )
    term = lambda qc: F.floor(  # noqa: E731
        F.lit(1e9)
        * F.col("m.w")
        * (
            F.log(F.col(f"a.{qc}").cast("double"))
            - F.log((F.col(f"a.{qc}") + F.col(f"b.{qc}")).cast("double"))
        )
    )
    ll = (
        wmat.alias("m")
        .join(F.broadcast(p2.alias("a")), F.col("m.wi") == F.col("a.t"))
        .join(F.broadcast(p2.alias("b")), F.col("m.lo") == F.col("b.t"))
        .agg(
            F.sum(term("qp1")).cast("bigint").alias("ll1"),
            F.sum(term("qp2")).cast("bigint").alias("ll2"),
        )
    )
    return p2.crossJoin(F.broadcast(ll)).select(
        F.col("t").alias("event_type"),
        F.col("n_wins").cast("bigint").alias("n_wins"),
        F.col("n_games").cast("bigint").alias("n_games"),
        (F.col("qp1").cast("double") / F.lit(1e9)).alias("p_round1"),
        (F.col("qp2").cast("double") / F.lit(1e9)).alias("p_round2"),
        F.col("ll1").alias("ll1_num"),
        F.col("ll2").alias("ll2_num"),
        (F.col("ll2") >= F.col("ll1")).alias("ll_improved"),
    )


@query("stream_bt_strengths", oracle=_BT_ORACLE)
def q_stream_bt_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of event_type_bt_strengths — the reward-model
    data pipeline's live form: pairwise comparisons arrive as
    micro-batches (an upstream labeler emitting (winner, loser)
    pairs) and fold into WIN-MATRIX integer partials per trigger,
    written bid-keyed and replay-safe
    (streaming/pipeline.py::run_stream_bt_comparisons); the two
    quantized MM rounds + likelihood receipt run at drain on the
    MERGED matrix (`_bt_fit_from_wmat`, the exact code path the batch
    query runs).  Win counts are additive integers, so the result is
    batch-identical under any batching, ordering, or at-least-once
    replay — the BATCH oracle is the ground truth the streamed fold
    must hash-match (the stream_conformal_coverage discipline).

    Scale shape: per trigger one map-side-combined (wi, lo) count
    bounded by types²; drain-side state is the types²-row matrix —
    model fitting never touches the event stream again."""
    from ..streaming.pipeline import run_stream_bt_comparisons

    wmat = run_stream_bt_comparisons(spark, sf_dir).localCheckpoint(
        eager=True
    )
    return _bt_fit_from_wmat(wmat)


# ---------------------------------------------------------------------------
# Shapley-value attribution — exact coalition enumeration over the
# 4-channel exposure lattice (completes linear / time-decay / Shapley)
# ---------------------------------------------------------------------------

# channel bit assignment (purchase is the conversion, not a channel)
_SHAP_BITS = {"click": 1, "view": 2, "error": 4, "signup": 8}
_SHAP_N = 4
# Shapley weight NUMERATORS over denominator 4! = 24, by |S|:
# |S|!(n-|S|-1)! for n=4
_SHAP_WNUM = {0: 6, 1: 2, 2: 2, 3: 6}

_SHAP_CASE = (
    "CASE event_type "
    + " ".join(
        f"WHEN '{t}' THEN {b}" for t, b in sorted(_SHAP_BITS.items())
    )
    + " ELSE 0 END"
)

_SHAP_ORACLE = f"""
WITH e AS (
  SELECT user_id, ts, event_type FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
conv AS (
  SELECT user_id, CAST(ts AS DATE) AS d, MIN(ts) AS cts FROM e
  WHERE event_type = 'purchase' GROUP BY 1, 2
),
expo AS (
  SELECT e.user_id, CAST(e.ts AS DATE) AS d,
    COALESCE(BIT_OR({_SHAP_CASE}), 0) AS mask,
    MAX(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS converted
  FROM e
  LEFT JOIN conv c ON c.user_id = e.user_id AND c.d = CAST(e.ts AS DATE)
  WHERE c.user_id IS NULL OR e.ts < c.cts
  GROUP BY 1, 2
),
lattice AS (SELECT CAST(s AS BIGINT) AS s FROM range(0, 16) t(s)),
stats AS (
  SELECT l.s,
    COALESCE(u.n_users, 0) AS n_users,
    COALESCE(u.n_conv, 0) AS n_conv,
    CASE WHEN COALESCE(u.n_users, 0) = 0 THEN 0
         ELSE CAST((u.n_conv * 1000000000) // u.n_users AS BIGINT)
    END AS qv
  FROM lattice l LEFT JOIN (
    SELECT mask AS s, CAST(COUNT(*) AS BIGINT) AS n_users,
      CAST(SUM(converted) AS BIGINT) AS n_conv
    FROM expo GROUP BY mask) u ON u.s = l.s
),
channels AS (
  {' UNION ALL '.join(f"SELECT '{t}' AS channel, {b} AS cb" for t, b in sorted(_SHAP_BITS.items()))}
),
terms AS (
  SELECT c.channel,
    (CASE bit_count(CAST(st0.s AS BIT)) {' '.join(f'WHEN {k} THEN {v}' for k, v in _SHAP_WNUM.items())} END)
      * (st1.qv - st0.qv) AS term
  FROM channels c
  JOIN stats st0 ON (st0.s & c.cb) = 0
  JOIN stats st1 ON st1.s = st0.s + c.cb
),
phi AS (
  SELECT channel, CAST(SUM(term) AS BIGINT) AS phi_q
  FROM terms GROUP BY channel
),
eff AS (
  SELECT CAST(SUM(phi_q) AS BIGINT) AS sphi,
    (SELECT 24 * (MAX(CASE WHEN s = 15 THEN qv END)
                  - MAX(CASE WHEN s = 0 THEN qv END)) FROM stats) AS rhs
  FROM phi
),
chstats AS (
  SELECT c.channel,
    CAST(SUM(x.n_users) AS BIGINT) AS n_exposed_units,
    CAST(SUM(x.n_conv) AS BIGINT) AS n_exposed_conversions
  FROM channels c JOIN stats x ON (x.s & c.cb) != 0
  GROUP BY c.channel
)
SELECT p.channel,
  cs.n_exposed_units,
  cs.n_exposed_conversions,
  p.phi_q,
  CAST(p.phi_q AS DOUBLE) / 24.0 / 1000000000.0 AS shapley_credit,
  (SELECT sphi = rhs FROM eff) AS efficiency_ok
FROM phi p JOIN chstats cs ON cs.channel = p.channel
"""


@query("purchase_shapley_attribution", oracle=_SHAP_ORACLE)
def q_purchase_shapley_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SHAPLEY-VALUE attribution — the coalition-game credit model
    (Shapley 1953; Zhao et al. 2018 for marketing attribution) that
    completes the attribution family beside linear_attribution_credits
    and time_decay_attribution: each (user, day) unit's EXPOSURE SET
    over the 4 non-purchase channels (events before that day's first
    purchase, or the whole day when none) becomes a 4-bit mask; a
    unit converts if the day carried a purchase; the
    characteristic function v(S) is the exact-exposure conversion
    rate, quantized to a 1e-9-grain integer by integer division
    (absent coalitions → 0, documented); Shapley values are computed
    by EXACT ENUMERATION over the 16-subset lattice — n=4 weights
    |S|!(n−|S|−1)!/4! carried as integer numerators over the common
    denominator 24, so φ accumulates as exact integers and divides to
    double once.

    The EFFICIENCY receipt rides along: Σ_c φ(c) = v(full) − v(∅) is
    an algebraic identity of the Shapley formula that survives ANY v
    assignment — including the quantized one — so efficiency_ok is
    computed on both engines over exact integers and must be TRUE by
    mathematics, not by luck (a drifted weight or a missed coalition
    breaks it, which is the point).

    Scale shape: the exposure pass is one user-keyed aggregate
    (BIT_OR mask + converted flag) after a broadcast first-purchase
    lookup; everything downstream lives on the 16-row lattice × 4
    channels — model state is 2^n, not users, which is why exact
    Shapley is deployable for small channel counts (larger n swaps in
    permutation sampling over the same exposure census)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.min("ts").alias("cts"))
    )
    expo = (
        e.alias("e")
        .join(
            F.broadcast(conv.alias("c")),
            (F.col("e.user_id") == F.col("c.user_id"))
            & (F.to_date(F.col("e.ts")) == F.col("c.d")),
            "left",
        )
        .filter(F.col("c.cts").isNull() | (F.col("e.ts") < F.col("c.cts")))
        .groupBy(F.col("e.user_id"), F.to_date(F.col("e.ts")).alias("d"))
        .agg(
            F.coalesce(F.expr(f"bit_or({_SHAP_CASE})"), F.lit(0)).alias(
                "mask"
            ),
            F.max(
                F.when(F.col("c.cts").isNotNull(), 1).otherwise(0)
            ).alias("converted"),
        )
    )
    lattice = spark.range(16).select(F.col("id").cast("bigint").alias("s"))
    observed = expo.groupBy(F.col("mask").alias("s")).agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_conv"),
    )
    stats = (
        lattice.join(F.broadcast(observed), "s", "left")
        .select(
            "s",
            F.coalesce(F.col("n_users"), F.lit(0)).alias("n_users"),
            F.coalesce(F.col("n_conv"), F.lit(0)).alias("n_conv"),
            F.when(F.coalesce(F.col("n_users"), F.lit(0)) == 0, F.lit(0))
            .otherwise(F.expr("(n_conv * 1000000000) div n_users"))
            .cast("bigint")
            .alias("qv"),
        )
        .localCheckpoint(eager=True)
    )
    channels = spark.createDataFrame(
        sorted(_SHAP_BITS.items()), "channel string, cb bigint"
    )
    wnum = F.create_map(
        *[F.lit(x) for kv in _SHAP_WNUM.items() for x in kv]
    )
    terms = (
        channels.alias("c")
        .join(
            F.broadcast(stats.alias("st0")),
            F.expr("(st0.s & c.cb) = 0"),
        )
        .join(
            F.broadcast(stats.alias("st1")),
            F.expr("st1.s = st0.s + c.cb"),
        )
        .select(
            "c.channel",
            (
                wnum[F.bit_count(F.col("st0.s"))]
                * (F.col("st1.qv") - F.col("st0.qv"))
            ).alias("term"),
        )
    )
    phi = terms.groupBy("channel").agg(
        F.sum("term").cast("bigint").alias("phi_q")
    )
    eff = (
        phi.agg(F.sum("phi_q").cast("bigint").alias("sphi"))
        .crossJoin(
            F.broadcast(
                stats.agg(
                    (
                        F.lit(24)
                        * (
                            F.max(F.when(F.col("s") == 15, F.col("qv")))
                            - F.max(F.when(F.col("s") == 0, F.col("qv")))
                        )
                    ).alias("rhs")
                )
            )
        )
        .select((F.col("sphi") == F.col("rhs")).alias("efficiency_ok"))
    )
    chstats = (
        channels.alias("c")
        .join(
            F.broadcast(stats.alias("x")), F.expr("(x.s & c.cb) != 0")
        )
        .groupBy("c.channel")
        .agg(
            F.sum("x.n_users").cast("bigint").alias("n_exposed_units"),
            F.sum("x.n_conv")
            .cast("bigint")
            .alias("n_exposed_conversions"),
        )
    )
    return (
        phi.join(chstats, "channel")
        .crossJoin(F.broadcast(eff))
        .select(
            "channel",
            "n_exposed_units",
            "n_exposed_conversions",
            "phi_q",
            (F.col("phi_q").cast("double") / F.lit(24.0) / F.lit(1e9))
            .alias("shapley_credit"),
            "efficiency_ok",
        )
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test — the significance companion to Theil-Sen's
# slope estimate (the pair every monitoring runbook quotes together)
# ---------------------------------------------------------------------------

_MK_ORACLE = f"""
WITH e AS (
  SELECT event_type, ts, event_id,
    CAST(ROUND(value * 10000) AS BIGINT) AS vi
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
pts AS (
  SELECT event_type, vi,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
  FROM e
),
k AS (SELECT * FROM pts WHERE rn <= {{k}}),
n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM k GROUP BY 1),
s AS (
  SELECT a.event_type,
    CAST(SUM(CASE WHEN a.vi > b.vi THEN 1
                  WHEN a.vi < b.vi THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM k a JOIN k b
    ON a.event_type = b.event_type AND a.rn < b.rn
  GROUP BY 1
),
ties AS (
  SELECT event_type,
    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
  FROM (SELECT event_type, vi, CAST(COUNT(*) AS BIGINT) AS t
        FROM k GROUP BY 1, 2)
  GROUP BY 1
),
v AS (
  SELECT n.event_type, n.n,
    CAST(n.n * (n.n - 1) * (2 * n.n + 5) - COALESCE(t.tsum, 0)
         AS BIGINT) AS var18
  FROM n LEFT JOIN ties t ON t.event_type = n.event_type
)
SELECT v.event_type, v.n, s.s_stat, v.var18,
  CASE WHEN v.var18 = 0 THEN CAST(0.0 AS DOUBLE)
       WHEN s.s_stat > 0
         THEN (CAST(s.s_stat AS DOUBLE) - 1.0)
              / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
       WHEN s.s_stat < 0
         THEN (CAST(s.s_stat AS DOUBLE) + 1.0)
              / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
       ELSE CAST(0.0 AS DOUBLE) END AS z,
  CASE WHEN v.var18 = 0 THEN 'no_trend'
       WHEN s.s_stat > 0 AND (CAST(s.s_stat AS DOUBLE) - 1.0)
              / sqrt(CAST(v.var18 AS DOUBLE) / 18.0) > 1.96
         THEN 'increasing'
       WHEN s.s_stat < 0 AND (CAST(s.s_stat AS DOUBLE) + 1.0)
              / sqrt(CAST(v.var18 AS DOUBLE) / 18.0) < -1.96
         THEN 'decreasing'
       ELSE 'no_trend' END AS trend
FROM v JOIN s ON s.event_type = v.event_type
""".format(k=_TS_K)


@query("events_mann_kendall", oracle=_MK_ORACLE)
def q_events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL trend test over the SAME last-{{k}}-point series
    Theil-Sen estimates its slope on — the companion every monitoring
    runbook quotes as a pair (Theil-Sen answers "how steep", MK
    answers "is there a trend at all", distribution-free): S is the
    exact integer sum of pairwise value signs over the deterministic
    (ts, event_id)-ranked sequence (rank is the time index, so time
    ties cannot occur by construction); Var(S) carries the VALUE-tie
    correction exactly as the integer numerator
    var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5); the continuity-corrected
    z = (S∓1)/sqrt(var18/18) is one identical closed-form double
    expression on both engines (exact ints → sqrt → divide, each
    correctly rounded — no quantization needed), and the ±1.96
    verdict string rides the identical doubles.

    Scale shape: identical to events_theil_sen — one per-type rank
    window, a bounded k(k−1)/2 pair fan-out per type, everything
    after per-type local.  Together the pair form the robust-trend
    kit: MK gates, Theil-Sen sizes."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    pts = (
        e.select(
            "event_type",
            "ts",
            "event_id",
            F.round(F.col("value") * 10000).cast("bigint").alias("vi"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TS_K)
        .select("event_type", "vi", "rn")
        .localCheckpoint(eager=True)
    )
    return _mk_stats(pts)


def _mk_stats(pts: DataFrame) -> DataFrame:
    """Mann-Kendall S / tie-corrected variance / z / verdict from a
    ranked (event_type, vi, rn) point frame — shared by the batch test
    and its streaming twin (which rebuilds pts from merged per-batch
    top-k partials)."""
    n = pts.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    s = (
        pts.alias("a")
        .join(
            pts.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.rn") < F.col("b.rn")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("a.vi") > F.col("b.vi"), 1)
                .when(F.col("a.vi") < F.col("b.vi"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    ties = (
        pts.groupBy("event_type", "vi")
        .agg(F.count("*").cast("bigint").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("bigint")
            .alias("tsum")
        )
    )
    v = n.join(ties, "event_type", "left").select(
        "event_type",
        "n",
        (
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.coalesce(F.col("tsum"), F.lit(0))
        )
        .cast("bigint")
        .alias("var18"),
    )
    sd = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("var18") == 0, F.lit(0.0))
        .when(
            F.col("s_stat") > 0,
            (F.col("s_stat").cast("double") - F.lit(1.0)) / sd,
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat").cast("double") + F.lit(1.0)) / sd,
        )
        .otherwise(F.lit(0.0))
    )
    trend = (
        F.when(F.col("var18") == 0, F.lit("no_trend"))
        .when(
            (F.col("s_stat") > 0)
            & ((F.col("s_stat").cast("double") - F.lit(1.0)) / sd > 1.96),
            F.lit("increasing"),
        )
        .when(
            (F.col("s_stat") < 0)
            & (
                (F.col("s_stat").cast("double") + F.lit(1.0)) / sd
                < -1.96
            ),
            F.lit("decreasing"),
        )
        .otherwise(F.lit("no_trend"))
    )
    return v.join(s, "event_type").select(
        "event_type",
        "n",
        "s_stat",
        "var18",
        z.alias("z"),
        trend.alias("trend"),
    )


@query("stream_mann_kendall", oracle=_MK_ORACLE)
def q_stream_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of events_mann_kendall — the trend monitor
    deployed the way monitors actually run: each micro-batch keeps its
    own last-{k} points per type (batch-local rank window, k·types
    state) written as replay-safe bid-keyed partials
    (streaming/pipeline.py::run_stream_topk_points); at drain the
    union re-ranks to the global last-{k} — EXACT by the
    order-statistic merge law (the global top-k under a total order is
    contained in the union of per-batch top-ks; the
    priority_sample_merge_audit law applied to a time-ordered window)
    — and the same MK statistics (_mk_stats) run on the merged
    window.  Batch-identical for any batching, ordering, or
    at-least-once replay, so the batch oracle is the ground truth.

    Completes the streaming-twin family's ORDER-STATISTIC member
    beside the additive folds (counts, sums, sketches, histograms):
    top-k windows fold by union + re-rank."""
    from ..streaming.pipeline import run_stream_topk_points

    cand = run_stream_topk_points(spark, sf_dir).localCheckpoint(
        eager=True
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    pts = (
        cand.dropDuplicates(["event_type", "ts", "event_id"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TS_K)
        .select("event_type", "vi", "rn")
    )
    return _mk_stats(pts)


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test — the randomness gate beside the trend pair
# ---------------------------------------------------------------------------

_RUNS_ORACLE = f"""
WITH e AS (
  SELECT event_type, ts, event_id,
    CAST(ROUND(value * 10000) AS BIGINT) AS vi
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
pts AS (
  SELECT event_type, vi,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
  FROM e
),
k AS (SELECT * FROM pts WHERE rn <= {_TS_K}),
med AS (
  -- exact lower median of the window (rank (n+1) div 2 under (vi, rn))
  SELECT event_type, vi AS m FROM (
    SELECT event_type, vi,
      row_number() OVER (PARTITION BY event_type ORDER BY vi, rn) AS r,
      COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM k) WHERE r = (n + 1) // 2
),
signs AS (
  -- above/below the median; exact-median points drop (standard form)
  SELECT k.event_type, k.rn,
    CASE WHEN k.vi > med.m THEN 1 ELSE 0 END AS s
  FROM k JOIN med ON med.event_type = k.event_type
  WHERE k.vi != med.m
),
runs AS (
  SELECT event_type,
    CAST(SUM(CASE WHEN prev IS NULL OR s != prev THEN 1 ELSE 0 END)
         AS BIGINT) AS r,
    CAST(SUM(s) AS BIGINT) AS n1,
    CAST(SUM(1 - s) AS BIGINT) AS n2
  FROM (
    SELECT event_type, s,
      LAG(s) OVER (PARTITION BY event_type ORDER BY rn DESC) AS prev
    FROM signs)
  GROUP BY event_type
)
SELECT event_type, r AS n_runs, n1, n2,
  CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 = 1 THEN CAST(0.0 AS DOUBLE)
       ELSE (CAST(r AS DOUBLE)
             - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
            / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                   / ((CAST(n1 + n2 AS DOUBLE))
                      * (CAST(n1 + n2 AS DOUBLE))
                      * (n1 + n2 - 1.0)))
  END AS z
FROM runs
"""


@query("events_runs_test", oracle=_RUNS_ORACLE)
def q_events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD-WOLFOWITZ runs test over the same last-{k} window the
    trend pair reads — the randomness gate that completes the kit
    (MK asks "is there a trend", Theil-Sen "how steep", the runs test
    "is the sequence even random": too FEW runs = clustering/trend,
    too MANY = oscillation, both invisible to a mean check): the
    window binarizes against its exact lower median (exact-median
    points drop, the standard form), the run count R is an exact
    integer from a lag window over the deterministic chronological
    order, and z = (R − μ)/σ with μ = 2n₁n₂/n + 1 and the closed-form
    σ — one identical double expression per type on both engines
    (exact ints → arithmetic → sqrt → divide), degenerate one-sided
    windows guarded to z = 0.

    Scale shape: identical to the trend pair — per-type rank window,
    then everything per-type local over ≤ {k} rows."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    pts = (
        e.select(
            "event_type",
            "ts",
            "event_id",
            F.round(F.col("value") * 10000).cast("bigint").alias("vi"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TS_K)
        .select("event_type", "vi", "rn")
        .localCheckpoint(eager=True)
    )
    w_med = Window.partitionBy("event_type").orderBy("vi", "rn")
    med = (
        pts.select(
            "event_type",
            "vi",
            F.row_number().over(w_med).alias("r"),
            F.count("*")
            .over(Window.partitionBy("event_type"))
            .alias("n"),
        )
        .filter(F.col("r") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("vi").alias("m"))
    )
    signs = (
        pts.join(F.broadcast(med), "event_type")
        .filter(F.col("vi") != F.col("m"))
        .select(
            "event_type",
            "rn",
            F.when(F.col("vi") > F.col("m"), 1).otherwise(0).alias("s"),
        )
    )
    w_lag = Window.partitionBy("event_type").orderBy(F.col("rn").desc())
    runs = (
        signs.withColumn("prev", F.lag("s").over(w_lag))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    F.col("prev").isNull()
                    | (F.col("s") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_runs"),
            F.sum("s").cast("bigint").alias("n1"),
            F.sum(1 - F.col("s")).cast("bigint").alias("n2"),
        )
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    mu = 2.0 * n1d * n2d / nd + F.lit(1.0)
    sig = F.sqrt(
        2.0
        * n1d
        * n2d
        * (2.0 * n1d * n2d - n1d - n2d)
        / (nd * nd * (nd - F.lit(1.0)))
    )
    z = (
        F.when(
            (F.col("n1") == 0)
            | (F.col("n2") == 0)
            | (F.col("n1") + F.col("n2") == 1),
            F.lit(0.0),
        )
        .otherwise((F.col("n_runs").cast("double") - mu) / sig)
    )
    return runs.select("event_type", "n_runs", "n1", "n2", z.alias("z"))


# ---------------------------------------------------------------------------
# Wald SPRT — sequential probability-ratio test over the event stream,
# the always-valid experimentation gate (beside the fixed-n z-test)
# ---------------------------------------------------------------------------

# H0: P(value > train median) = 9/20 vs H1: 11/20; alpha = beta = 0.05.
# All LLR increments and boundaries are FLOOR(1e9·ln(rational)) — exact
# ints from ln of small-integer doubles, identical in both engines.

_SPRT_ORACLE = f"""
WITH e AS (
  SELECT event_id, event_type, ts,
    CAST(ROUND(value * 100.0) AS BIGINT) AS vi,
    {_CONF_BUCKET} AS b
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
med AS (
  SELECT event_type, vi AS med_i FROM (
    SELECT event_type, vi,
      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vi, event_id)
        AS rn,
      COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM e WHERE b < 50)
  WHERE rn = (n + 1) // 2
),
consts AS (
  SELECT
    CAST(FLOOR(1000000000.0 * (ln(11.0) - ln(9.0))) AS BIGINT) AS c1,
    CAST(FLOOR(1000000000.0 * (ln(9.0) - ln(11.0))) AS BIGINT) AS c0,
    CAST(FLOOR(1000000000.0 * ln(19.0)) AS BIGINT) AS qa,
    CAST(FLOOR(-1000000000.0 * ln(19.0)) AS BIGINT) AS qb
),
walk AS (
  SELECT t.event_type, t.rn,
    SUM(CASE WHEN t.x = 1 THEN (SELECT c1 FROM consts)
             ELSE (SELECT c0 FROM consts) END)
      OVER (PARTITION BY t.event_type ORDER BY t.rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr,
    SUM(t.x) OVER (PARTITION BY t.event_type ORDER BY t.rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k,
    COUNT(*) OVER (PARTITION BY t.event_type) AS n_test
  FROM (
    SELECT e.event_type,
      ROW_NUMBER() OVER (PARTITION BY e.event_type
                         ORDER BY e.ts, e.event_id) AS rn,
      CASE WHEN e.vi > m.med_i THEN 1 ELSE 0 END AS x
    FROM e JOIN med m ON m.event_type = e.event_type
    WHERE e.b >= 50) t
),
dec AS (
  SELECT event_type,
    MAX(n_test) AS n_test,
    MAX(CASE WHEN rn = n_test THEN llr END) AS llr_final,
    MAX(CASE WHEN rn = n_test THEN k END) AS k_total,
    MIN(CASE WHEN llr >= (SELECT qa FROM consts)
              OR llr <= (SELECT qb FROM consts) THEN rn END)
      AS n_at_decision
  FROM walk GROUP BY event_type
)
SELECT d.event_type,
  CAST(d.n_test AS BIGINT) AS n_test,
  CAST(d.k_total AS BIGINT) AS k_total,
  CAST(d.llr_final AS BIGINT) AS llr_final,
  CAST(d.n_at_decision AS BIGINT) AS n_at_decision,
  CAST(w.llr AS BIGINT) AS llr_at_decision,
  CASE WHEN d.n_at_decision IS NULL THEN 'continue'
       WHEN w.llr >= (SELECT qa FROM consts) THEN 'accept_h1'
       ELSE 'accept_h0' END AS decision,
  CAST((SELECT qa FROM consts) AS BIGINT) AS boundary_qa
FROM dec d
LEFT JOIN walk w
  ON w.event_type = d.event_type AND w.rn = d.n_at_decision
"""


@query("events_sprt_monitor", oracle=_SPRT_ORACLE)
def q_events_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD SPRT — the sequential probability-ratio test walked over
    the event stream in arrival order, the always-valid A/B gate
    beside the fixed-n z-test (events_value_ztest): per event type,
    H0: P(value > train median) = 0.45 vs H1: 0.55 at
    alpha = beta = 0.05; the log-likelihood ratio climbs by
    ln(11/9) per success and ln(9/11) per failure and the FIRST
    crossing of ±ln(19) decides — Wald's theorem makes the error
    rates valid at the RANDOM stopping time, which is exactly what
    peeking at a fixed-n test destroys.

    Exactness: the train median is the conformal split's exact
    per-type rank median (leak-proof md5 buckets, shared convention);
    increments and boundaries are FLOOR(1e9·ln(small-rational))
    integers so the whole walk is an exact-integer cumsum over the
    deterministic (ts, event_id) order; the decision row is the
    min-rn boundary crossing.  Emits per type the test size, success
    census, final LLR, decision point, LLR at decision, and the
    decision — so a drift in ANY step of the walk breaks the hash.

    Scale shape: one train-slice rank window fits the model; the walk
    rides ONE per-type window shuffle of the test slice (state: two
    running integers); the decision fold is per-type scalars.  As a
    stream this is a running cumsum + first-crossing flag — the
    stateful-counter shape ST4 already serves."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_id",
            "event_type",
            "ts",
            F.round(F.col("value") * 100).cast("bigint").alias("vi"),
            (_shnd(F.col("event_id").cast("string")) % 100).alias("b"),
        )
    )
    w_med = Window.partitionBy("event_type").orderBy("vi", "event_id")
    med = (
        e.filter(F.col("b") < 50)
        .select(
            "event_type",
            "vi",
            F.row_number().over(w_med).alias("rn"),
            F.count("*")
            .over(Window.partitionBy("event_type"))
            .alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("vi").alias("med_i"))
    )
    c1 = F.floor(F.lit(1e9) * (F.log(F.lit(11.0)) - F.log(F.lit(9.0)))).cast(
        "bigint"
    )
    c0 = F.floor(F.lit(1e9) * (F.log(F.lit(9.0)) - F.log(F.lit(11.0)))).cast(
        "bigint"
    )
    qa = F.floor(F.lit(1e9) * F.log(F.lit(19.0))).cast("bigint")
    qb = F.floor(F.lit(-1e9) * F.log(F.lit(19.0))).cast("bigint")
    w_seq = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w_cum = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_t = Window.partitionBy("event_type")
    walk = (
        e.filter(F.col("b") >= 50)
        .join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.row_number().over(w_seq).alias("rn"),
            F.when(F.col("vi") > F.col("med_i"), 1)
            .otherwise(0)
            .alias("x"),
        )
        .select(
            "event_type",
            "rn",
            F.sum(F.when(F.col("x") == 1, c1).otherwise(c0))
            .over(
                Window.partitionBy("event_type")
                .orderBy("rn")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .alias("llr"),
            F.sum("x")
            .over(
                Window.partitionBy("event_type")
                .orderBy("rn")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .alias("k"),
            F.count("*").over(w_t).alias("n_test"),
        )
        .localCheckpoint(eager=True)
    )
    dec = walk.groupBy("event_type").agg(
        F.max("n_test").alias("n_test"),
        F.max(
            F.when(F.col("rn") == F.col("n_test"), F.col("llr"))
        ).alias("llr_final"),
        F.max(F.when(F.col("rn") == F.col("n_test"), F.col("k"))).alias(
            "k_total"
        ),
        F.min(
            F.when(
                (F.col("llr") >= qa) | (F.col("llr") <= qb), F.col("rn")
            )
        ).alias("n_at_decision"),
    )
    return (
        dec.alias("d")
        .join(
            walk.alias("w"),
            (F.col("w.event_type") == F.col("d.event_type"))
            & (F.col("w.rn") == F.col("d.n_at_decision")),
            "left",
        )
        .select(
            F.col("d.event_type").alias("event_type"),
            F.col("d.n_test").cast("bigint").alias("n_test"),
            F.col("d.k_total").cast("bigint").alias("k_total"),
            F.col("d.llr_final").cast("bigint").alias("llr_final"),
            F.col("d.n_at_decision").cast("bigint").alias("n_at_decision"),
            F.col("w.llr").cast("bigint").alias("llr_at_decision"),
            F.when(F.col("d.n_at_decision").isNull(), F.lit("continue"))
            .when(F.col("w.llr") >= qa, F.lit("accept_h1"))
            .otherwise(F.lit("accept_h0"))
            .alias("decision"),
            qa.alias("boundary_qa"),
        )
    )
