"""Temporal join helpers: generic as-of join + bucketized interval join.

SURVEY §2.2 maps the reference-absent "as-of / range / interval" join
row to Spark compositions; the suite's ``asof_join`` query pins one
instance.  This module generalizes it into a reusable API:

* :func:`asof_join` — **union + running-last trick** (default): tag both
  inputs, union, one window pass per key carries the latest right-side
  row forward (backward as-of) or the next one backward (forward).
  Scales like a sort within key-partitions: ONE shuffle, no pandas, no
  state; the right strategy for large-large temporal joins.
* :func:`asof_join_pandas` — per-key ``cogroup().applyInPandas`` running
  ``pandas.merge_asof``.  Simpler semantics surface (tolerance,
  nearest); whole key-groups must fit in executor memory — use for
  moderate per-key cardinalities.

Both return the same rows (equivalence-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tol_expr(tolerance):
    """Tolerance spec → Column: interval string ("30 minutes") for
    timestamp ``on`` columns, a plain number for numeric ones — the same
    duality ``pandas.merge_asof(tolerance=...)`` has (Timedelta vs int)."""
    if isinstance(tolerance, str):
        return F.expr(f"INTERVAL {tolerance}")
    return F.lit(tolerance)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    right_cols: list[str],
    direction: str = "backward",
    suffix: str = "_right",
    tolerance=None,
) -> DataFrame:
    """As-of join: for each left row, the temporally closest right row at
    or before (``backward``) / at or after (``forward``) its ``on`` time,
    within the same ``by`` key; ``nearest`` picks whichever side is
    closer (ties → backward, like pandas).  ``tolerance`` (interval spec
    like ``"30 minutes"`` for timestamps, a number for numeric times)
    rejects matches farther than that from the left row's time — the
    match columns become NULL, exactly like
    ``pandas.merge_asof(tolerance=...)``; under ``nearest`` the tolerance
    is applied to EACH direction's candidate before choosing, so an
    out-of-tolerance nearer match falls back to the other side's
    in-tolerance match (merge_asof parity).

    All carried columns ride in ONE struct per right row (match time
    included), so every output field comes from the same matched row —
    a NULL in one right column can never fall back to an older row.
    Duplicate right rows at the same (by, on) time are broken
    deterministically by input row order (backward → last duplicate,
    forward → first, pandas' stable-searchsorted behavior)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward, forward or nearest")
    by = [by] if isinstance(by, str) else list(by)

    # one struct per right row: match time + every carried column — the
    # window then moves whole rows, never per-column values
    r_proj = right.select(
        *by,
        F.col(on),
        F.struct(
            F.col(on).alias("__match_on"),
            *[F.col(c).alias(c) for c in right_cols],
        ).alias("__r"),
        F.lit(0).alias("__side"),
        # deterministic duplicate-time tie-break: input row order (stable
        # given a fixed source partitioning, e.g. a parquet read)
        F.monotonically_increasing_id().alias("__rid"),
    )
    struct_type = r_proj.schema["__r"].dataType
    l_tagged = left.select(
        "*",
        F.lit(None).cast(struct_type).alias("__r"),
        F.lit(1).alias("__side"),
        F.monotonically_increasing_id().alias("__rid"),
    )
    for c in left.columns:
        if c not in r_proj.columns:
            r_proj = r_proj.withColumn(c, F.lit(None))
    unioned = l_tagged.unionByName(r_proj.select(l_tagged.columns))

    def unpack(struct_col, with_tol_dir: str | None):
        """Struct → output columns; optionally null the WHOLE match when
        its time is outside tolerance in the given direction."""
        if tolerance is not None and with_tol_dir is not None:
            struct_col = F.when(
                _in_tol(struct_col, F.col(on), with_tol_dir, tolerance), struct_col
            )
        return [
            struct_col.getField(c).alias(f"{c}{suffix}") for c in right_cols
        ]

    if direction == "nearest":
        # ONE sort order, TWO frames over it — still a single shuffle.
        # Right rows sort before left rows at equal time, so a distance-0
        # match is captured by the backward frame (and backward wins the
        # tie anyway, matching pandas).
        order = [F.col(on).asc(), F.col("__side").asc(), F.col("__rid").asc()]
        wb = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        b = F.last(F.col("__r"), ignorenulls=True).over(wb)
        f_ = F.first(F.col("__r"), ignorenulls=True).over(wf)
        if tolerance is not None:
            # merge_asof parity: each direction's candidate is tolerance-
            # filtered BEFORE the nearest choice, so the other side's
            # in-tolerance match survives an out-of-tolerance nearer one
            b = F.when(_in_tol(b, F.col(on), "backward", tolerance), b)
            f_ = F.when(_in_tol(f_, F.col(on), "forward", tolerance), f_)
        stage = unioned.select("*", b.alias("__b"), f_.alias("__f"))
        bt = F.col("__b").getField("__match_on")
        ft = F.col("__f").getField("__match_on")
        use_back = ft.isNull() | (
            bt.isNotNull() & ((F.col(on) - bt) <= (ft - F.col(on)))
        )
        chosen = F.when(use_back, F.col("__b")).otherwise(F.col("__f"))
        return (
            stage.filter(F.col("__side") == 1)
            .select(
                *left.columns,
                *[chosen.getField(c).alias(f"{c}{suffix}") for c in right_cols],
            )
        )

    if direction == "backward":
        # right rows sort before left rows at equal time → visible to
        # them; among duplicates last() takes the highest __rid (pandas
        # keeps the last duplicate)
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").asc(), F.col("__rid").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last(F.col("__r"), ignorenulls=True).over(w)
    else:
        # left rows sort before right rows at equal time → equal-time
        # matches are in the forward frame; first() takes the lowest
        # __rid (pandas' stable searchsorted keeps the first duplicate)
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").desc(), F.col("__rid").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first(F.col("__r"), ignorenulls=True).over(w)

    return (
        unioned.select("*", carried.alias("__m"))
        .filter(F.col("__side") == 1)
        .select(*left.columns, *unpack(F.col("__m"), direction))
    )


def _in_tol(struct_col, on_col, direction: str, tolerance):
    """Is the matched row's time within tolerance of the left time?"""
    m = struct_col.getField("__match_on")
    t = _tol_expr(tolerance)
    if direction == "backward":
        return m >= on_col - t
    return m <= on_col + t


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by: list[str] | str,
    lower,
    upper,
    bucket: str = "1 hour",
) -> DataFrame:
    """Interval (range) join at scale: ``right_ts ∈ [left_ts+lower,
    left_ts+upper]`` within ``by`` keys — WITHOUT a nested-loop join.

    Naive non-equi joins on time degenerate to per-key cross products.
    The scalable shape: quantize time into buckets at least as wide as
    the interval, equi-join on (key, bucket) with the right side
    exploded into each bucket its interval can touch, then apply the
    exact range predicate.  The shuffle is keyed on (by, bucket) —
    uniform, bounded fan-out of ceil(span/bucket)+1 copies.
    """
    by = [by] if isinstance(by, str) else list(by)
    span_expr = f"CAST(ceil((CAST({_iv(upper)} AS DOUBLE) - {_iv(lower)}) / {_iv(bucket)}) AS INT)"
    l_b = left.withColumn(
        "__bucket", F.expr(f"CAST(floor(unix_micros({left_ts}) / {_iv(bucket)}) AS LONG)")
    )
    r_b = right.withColumn(
        "__b0",
        F.expr(
            f"CAST(floor((unix_micros({right_ts}) - {_iv(upper)}) / {_iv(bucket)}) AS LONG)"
        ),
    ).withColumn(
        "__bucket", F.explode(F.expr(f"sequence(__b0, __b0 + {span_expr} + 1)"))
    ).drop("__b0")
    cond = (
        (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return l_b.join(r_b, [*by, "__bucket"]).filter(cond).drop("__bucket")


def _iv(spec) -> str:
    """Interval spec like '1 hour' / '-2 hours' → microseconds literal."""
    units = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
        "day": 86_400_000_000,
        "days": 86_400_000_000,
    }
    n, unit = str(spec).split()
    return str(int(float(n) * units[unit]))


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """pandas.merge_asof per key via cogrouped applyInPandas — Arrow-
    batched, whole key-group in memory (guard per-key cardinality)."""
    import pandas as pd

    out_fields = [f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields]
    right_types = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    out_fields += [f"{c}{suffix}:{right_types[c]}" for c in right_cols]
    out_schema = ", ".join(f.replace(":", " ") for f in out_fields)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(on)
        rpdf = rpdf.sort_values(on)[[by, on, *right_cols]].rename(
            columns={c: f"{c}{suffix}" for c in right_cols}
        )
        if rpdf.empty:
            for c in right_cols:
                lpdf[f"{c}{suffix}"] = None
            return lpdf
        return pd.merge_asof(
            lpdf,
            rpdf.drop(columns=[by]),
            on=on,
            direction=direction,
            tolerance=tolerance,
        )

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(merge, out_schema)
    )


# ---------------------------------------------------------------------------
# oracle-checked suite entries for the join helpers
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from ..session import load_tables  # noqa: E402
from ..suite import query  # noqa: E402


@query(
    "interval_join_bucketed",
    """
SELECT p.event_id AS purchase_id, s.event_id AS signup_id, p.user_id
FROM events p JOIN events s
  ON p.user_id = s.user_id
 AND p.event_type = 'purchase' AND s.event_type = 'signup'
 AND s.ts BETWEEN p.ts - INTERVAL '2 hours' AND p.ts
""",
)
def interval_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketized interval join as a suite entry — identical rows to
    the naive range join the oracle spells out, via a keyed (user,
    time-bucket) equi-join instead of a per-key cross product."""
    ev = load_tables(spark, sf_dir)["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id"), F.col("ts").alias("pts")
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id"),
        F.col("ts").alias("sts"),
    )
    return interval_join(
        p, s, "pts", "sts", by="user_id", lower="-2 hours", upper="0 seconds"
    ).select("purchase_id", "signup_id", "user_id")


@query(
    "asof_join_forward",
    """
SELECT event_id, user_id, ts, next_purchase_ts FROM (
  SELECT event_id, user_id, ts, event_type,
         first_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_ts
  FROM events
) WHERE event_type = 'signup'
""",
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each signup's next purchase (the conversion-lag
    primitive), via the generic forward-direction helper."""
    ev = load_tables(spark, sf_dir)["events"]
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("purchase_ts")
    )
    return asof_join(
        signups,
        purchases,
        on="ts",
        by="user_id",
        right_cols=["purchase_ts"],
        direction="forward",
        suffix="",
    ).select(
        "event_id", "user_id", "ts", F.col("purchase_ts").alias("next_purchase_ts")
    )


@query(
    "asof_join_tolerance",
    """
SELECT event_id, user_id, ts,
       CASE WHEN last_view_ts >= ts - INTERVAL '30 minutes' THEN last_view_ts END
         AS recent_view_ts
FROM (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ts
  FROM events
) WHERE event_type = 'purchase'
""",
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a tolerance window: each purchase's most
    recent view, but only if it happened within the last 30 minutes
    (staler matches → NULL, ``pandas.merge_asof(tolerance=...)``
    semantics).  Exercises the generic helper's tolerance path — same
    single user-keyed window shuffle as the plain as-of; the cutoff is a
    map-side post-filter, so tolerance adds zero exchanges."""
    ev = load_tables(spark, sf_dir)["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("ts").alias("view_ts")
    )
    return asof_join(
        purchases,
        views,
        on="ts",
        by="user_id",
        right_cols=["view_ts"],
        direction="backward",
        suffix="",
        tolerance="30 minutes",
    ).select("event_id", "user_id", "ts", F.col("view_ts").alias("recent_view_ts"))


@query(
    "asof_join_nearest",
    """
SELECT event_id, user_id, ts,
       CASE WHEN next_ts IS NULL THEN prev_ts
            WHEN prev_ts IS NULL THEN next_ts
            WHEN ts - prev_ts <= next_ts - ts THEN prev_ts
            ELSE next_ts END AS nearest_view_ts
FROM (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
         first_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
  FROM events
) WHERE event_type = 'purchase'
""",
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of (merge_asof(direction='nearest')): each
    purchase's temporally closest view, before OR after, ties →
    backward.  One sort order, two window frames over it — the whole
    operator is still a single user-keyed shuffle."""
    ev = load_tables(spark, sf_dir)["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("ts").alias("view_ts")
    )
    return asof_join(
        purchases,
        views,
        on="ts",
        by="user_id",
        right_cols=["view_ts"],
        direction="nearest",
        suffix="",
    ).select("event_id", "user_id", "ts", F.col("view_ts").alias("nearest_view_ts"))
