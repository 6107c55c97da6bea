"""Time-series completion operators over ``events`` — forward-fill and
grid gap-fill, the standard dense-time-series preparation steps
(neither exists as a single operator in the reference's engine or in
Spark; both compose from windows + sequence generation).

Scale notes: forward-fill is one window per key (state = last non-null,
O(1) per row); gap-fill's grid explode generates rows proportional to
key-count x grid-length — at 100 TB you bound the grid per key (here:
the key's own active range), never a global min/max span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from http_datafusion_spark.functions.pinning import pin
from http_datafusion_spark.plans.registry import query
from http_datafusion_spark.plans.tables import load_tables

GRID_SEC = 3600  # 1-hour gap-fill grid


@query(
    "ts_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
           round(last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value_ffill
    FROM events
    """,
    doc="forward-fill: carry last valid reading over masked (error) rows per user (time-series extension)",
    tags=("events", "window", "timeseries"),
)
def ts_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    masked = F.when(F.col("event_type") != "error", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_sec"),
        F.round(F.last(masked, ignorenulls=True).over(w), 6).alias("value_ffill"),
    )


@query(
    "ts_gapfill_grid",
    oracle=f"""
    WITH hourly AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / {GRID_SEC}) AS BIGINT) AS slot,
             round(sum(value), 4) AS v
      FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, min(slot) AS lo, max(slot) AS hi FROM hourly GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(lo, hi)) AS slot FROM spans
    )
    SELECT g.user_id, g.slot,
           coalesce(h.v, 0.0)      AS v_filled,
           h.v IS NULL             AS was_gap
    FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.slot = h.slot
    """,
    doc=f"gap-fill: dense {GRID_SEC // 3600}-hour grid per user's active span, zero-filled missing slots (time-series extension)",
    tags=("events", "timeseries"),
)
def ts_gapfill_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    # r18 sf5 probe (the r17 measured-negative family's "may cross over
    # at sf5" carry): fact_scale persist of the user x slot aggregate —
    # sf5 1.236 -> 1.219 s (flat), sf0.1 0.571 -> 0.862 s (+51%).
    # REVERTED: the columnar cache build costs more than the grid
    # branch's re-aggregation at every measured scale.
    hourly = (
        e.withColumn("slot", F.floor(F.unix_timestamp("ts") / GRID_SEC).cast("bigint"))
        .groupBy("user_id", "slot")
        .agg(F.round(F.sum("value"), 4).alias("v"))
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("slot").alias("lo"), F.max("slot").alias("hi"))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("slot"))
    )
    return (
        grid.join(hourly, ["user_id", "slot"], "left")
        .select(
            "user_id",
            "slot",
            F.coalesce("v", F.lit(0.0)).alias("v_filled"),
            F.col("v").isNull().alias("was_gap"),
        )
    )


@query(
    "ts_rollup_cascade",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(round(value, 6) AS DECIMAL(18,6))), 4) AS DOUBLE) AS total,
           round(max(value), 6) AS peak
    FROM events
    GROUP BY 1, 2
    """,
    doc="hypertable-style rollup cascade: events -> per-minute -> per-hour -> per-day partials, each level RE-AGGREGATING the one below (count-sum/sum-sum/max-max over exact decimals) — hash-checked against the oracle's single-pass daily aggregate, proving the cascade is lossless (time-series extension)",
    tags=("events", "timeseries"),
)
def ts_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-aggregate pattern a 100 TB metric store runs:
    ingest materializes minute partials once, coarser resolutions are
    built FROM the finer ones (never rescanning raw events), which is
    only correct because every measure re-aggregates associatively —
    counts sum, decimal sums sum (exact, order-independent), maxes max.
    The oracle aggregates raw events straight to days in one pass; a
    value-hash match proves the three-level cascade loses nothing."""
    e = load_tables(spark, sf_dir, "events")["events"]
    v6 = F.round("value", 6).cast("decimal(18,6)")  # per-row quantize: all sums exact
    minute = (
        e.withColumn("m", F.date_trunc("minute", "ts"))
        .groupBy("m", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v6).alias("total"),
            F.max("value").alias("peak"),
        )
    )
    hour = (
        minute.withColumn("h", F.date_trunc("hour", "m"))
        .groupBy("h", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"), F.max("peak").alias("peak"))
    )
    return (
        hour.withColumn("day", F.date_format("h", "yyyy-MM-dd"))
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("total"), 4).cast("double").alias("total"),
            F.round(F.max("peak"), 6).alias("peak"),
        )
    )


Z_OUTLIER = 3.0  # |z| above this = anomalous reading


@query(
    "ts_zscore_outliers",
    oracle=f"""
    WITH q AS (
      SELECT event_type, CAST(round(value, 6) AS DECIMAL(18,6)) AS v FROM events
    ), stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS DOUBLE) AS s,
             CAST(sum(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS ss
      FROM q GROUP BY event_type
    ), enriched AS (
      SELECT q.event_type, q.v, stats.n, stats.s, stats.ss,
             stats.s / stats.n AS mean,
             sqrt((stats.ss - stats.s * stats.s / stats.n) / (stats.n - 1)) AS std
      FROM q JOIN stats USING (event_type)
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(sum(CASE WHEN abs((CAST(v AS DOUBLE) - mean) / std) > CAST({Z_OUTLIER} AS DOUBLE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(max(mean), 6) AS mean_value,
           round(max(std), 6)  AS std_value
    FROM enriched GROUP BY event_type
    """,
    doc=f"anomaly detection: per-type z-score outlier count (|z| > {Z_OUTLIER}); sums go through exact decimals so mean/std (and every per-row z) are engine-identical — two-pass (agg + broadcast join back), no window shuffle (time-series extension)",
    tags=("events", "timeseries"),
)
def ts_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    v = F.round("value", 6).cast("decimal(18,6)")
    q = e.select("event_type", v.alias("v"))
    stats = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)")).cast("double").alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    std = F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1))
    z = (F.col("v").cast("double") - mean) / std
    return (
        q.join(F.broadcast(stats), "event_type")
        .select("event_type", "n", F.when(F.abs(z) > Z_OUTLIER, 1).otherwise(0).alias("is_out"),
                mean.alias("mean"), std.alias("std"))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.sum("is_out").cast("bigint").alias("n_outliers"),
            F.round(F.max("mean"), 6).alias("mean_value"),
            F.round(F.max("std"), 6).alias("std_value"),
        )
    )


# EWMA over the K most recent events per user. The weights
# (1-alpha)^j are baked in as repr'd double literals so BOTH engines
# parse the exact same binary64 constants — no pow() in either plan —
# and the weighted sum is written as one fixed-order expression, so
# partial-sum order can't differ between engines.
EWMA_ALPHA = 0.3
EWMA_K = 8
_EWMA_W = [(1 - EWMA_ALPHA) ** j for j in range(EWMA_K)]


def _ewma_oracle() -> str:
    lag_defs = ",\n             ".join(
        f"lag(value, {j}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x{j}"
        for j in range(1, EWMA_K)
    )
    num = " + ".join(
        (f"({w!r} * coalesce(x{j}, 0.0))" if j else f"({w!r} * value)")
        for j, w in enumerate(_EWMA_W)
    )
    den = " + ".join(
        (f"(CASE WHEN x{j} IS NULL THEN 0.0 ELSE {w!r} END)" if j else f"{_EWMA_W[0]!r}")
        for j, w in enumerate(_EWMA_W)
    )
    return f"""
    WITH lagged AS (
      SELECT user_id, event_id, value,
             {lag_defs}
      FROM events
    )
    SELECT CAST(user_id AS BIGINT)  AS user_id,
           CAST(event_id AS BIGINT) AS event_id,
           round(({num}) / ({den}), 6) AS ewma
    FROM lagged
    """


@query(
    "ts_ewma",
    oracle=_ewma_oracle(),
    doc=f"exponentially-weighted moving average (alpha={EWMA_ALPHA}, last {EWMA_K} "
    f"events) per user, ordered by (ts, event_id): K-1 lag columns over ONE window "
    f"spec (a single per-key sort), numerator and denominator written as fixed-order "
    f"sums of literal-weighted lags with null-masked weights at series start — "
    f"engine-exact, no pow() at runtime. One shuffle on user_id; state is K lags "
    f"per row, never the series (north-star time-series smoothing)",
    tags=("timeseries", "bench"),
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lags = {j: F.lag("value", j).over(w) for j in range(1, EWMA_K)}
    num = F.lit(_EWMA_W[0]) * F.col("value")
    den = F.lit(_EWMA_W[0])
    for j in range(1, EWMA_K):
        num = num + F.lit(_EWMA_W[j]) * F.coalesce(F.col(f"x{j}"), F.lit(0.0))
        den = den + F.when(F.col(f"x{j}").isNull(), 0.0).otherwise(F.lit(_EWMA_W[j]))
    lagged = e.select(
        "user_id", "event_id", "value", *[lags[j].alias(f"x{j}") for j in range(1, EWMA_K)]
    )
    return lagged.select(
        "user_id",
        "event_id",
        F.round(num / den, 6).alias("ewma"),
    )


OHLC_BUCKET_SEC = 3600  # hourly bars


@query(
    "ts_resample_ohlc",
    oracle=f"""
    SELECT CAST(floor(epoch(ts) / {OHLC_BUCKET_SEC}) AS BIGINT) AS bucket_h,
           event_type,
           round(arg_min(value, concat(lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0'),
                                       lpad(CAST(event_id AS VARCHAR), 10, '0'))), 4) AS open,
           round(max(value), 4)                                       AS high,
           round(min(value), 4)                                       AS low,
           round(arg_max(value, concat(lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0'),
                                       lpad(CAST(event_id AS VARCHAR), 10, '0'))), 4) AS close,
           CAST(count(*) AS BIGINT)                                   AS n_ticks,
           round(sum(value), 4)                                       AS volume
    FROM events
    GROUP BY 1, 2
    """,
    doc=f"OHLC resampling ({OHLC_BUCKET_SEC}s bars per event_type): open/close are "
    f"arg-extrema over a zero-padded (epoch_us, event_id) string tick — a composite "
    f"both engines order identically, so first/last tick is total-ordered "
    f"without a window. One partial-agg shuffle keyed by (bucket, type); min/max/"
    f"arg_min/arg_max are all mergeable, so the bar build is two-phase at any scale "
    f"(north-star time-series downsampling)",
    tags=("timeseries",),
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    tick = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
    ).alias("tick")
    base = e.select(
        F.floor(F.unix_timestamp("ts") / OHLC_BUCKET_SEC).cast("bigint").alias("bucket_h"),
        "event_type",
        "value",
        tick,
    )
    return base.groupBy("bucket_h", "event_type").agg(
        F.round(F.min_by("value", "tick"), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.max_by("value", "tick"), 4).alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
        F.round(F.sum("value"), 4).alias("volume"),
    )


MAD_K = 3.0  # |x - median| > K * MAD flags an outlier


@query(
    "ts_mad_outliers",
    oracle=f"""
    WITH med AS (
      SELECT event_type, median(value) AS med
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.value, m.med,
             median(abs(e.value - m.med)) OVER (PARTITION BY e.event_type) AS mad
      FROM events e JOIN med m USING (event_type)
    )
    SELECT event_type,
           round(max(med), 4) AS med,
           round(max(mad), 4) AS mad,
           CAST(sum(CASE WHEN abs(value - med) > {MAD_K} * mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM dev GROUP BY event_type
    """,
    doc=f"robust anomaly detection: median-absolute-deviation outliers per event_type "
    f"(|x-med| > {MAD_K}*MAD). Two exact medians (value, then absolute deviation) — "
    f"both engines compute exact interpolated medians on identical doubles — then one "
    f"counting pass. Complements ts_zscore_outliers: MAD is unmoved by the very "
    f"outliers it flags. Per-type medians are a keyed aggregation (exact median at "
    f"100 TB is the one genuinely hard op here — the approx path is q_agg_approx's "
    f"percentile sketch; this row is the exact small-keyspace form)",
    tags=("timeseries", "bench"),
    # Proxy-bench formulation (fair-baseline policy, see BASELINE.md):
    # the window-median in the ANSI oracle re-sorts each partition per
    # row group and grew x9 on x5 data in DuckDB; the keyed GROUP BY
    # median + join is the plan DuckDB would want (2.4 s vs 5.6 s at
    # sf5, result-identical — asserted with the other bench_oracle
    # variants in tests/test_approx_and_misc.py).
    bench_oracle=f"""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    ), mad AS (
      SELECT e.event_type, median(abs(e.value - m.med)) AS mad
      FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
    )
    SELECT e.event_type,
           round(max(m.med), 4) AS med,
           round(max(d.mad), 4) AS mad,
           CAST(sum(CASE WHEN abs(e.value - m.med) > {MAD_K} * d.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM events e JOIN med m USING (event_type) JOIN mad d ON d.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def ts_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    # dev fed both the MAD median and the scoring pass, so the r14
    # scan audit counted 4 events scans. Checkpointing the per-type
    # scalar tables (<= |event types| rows each) — NOT the events-sized
    # dev frame — pins the plan at the three passes two exact medians +
    # one count inherently need, with no fact-scale materialization.
    med = (
        e.groupBy("event_type")
        .agg(F.median("value").alias("med"))
        .transform(pin)
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = (
        dev.groupBy("event_type")
        .agg(F.median("adev").alias("mad"))
        .transform(pin)
    )
    scored = dev.join(F.broadcast(mad), "event_type")
    return scored.groupBy("event_type").agg(
        F.round(F.max("med"), 4).alias("med"),
        F.round(F.max("mad"), 4).alias("mad"),
        F.sum(F.when(F.abs(F.col("value") - F.col("med")) > MAD_K * F.col("mad"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_outliers"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


# ----------------------------------------------- CUSUM change-point estimate


@query(
    "ts_cusum_changepoints",
    oracle="""
    WITH base AS (
      SELECT event_type, event_id, ts, value,
             round(CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
                        OVER (PARTITION BY event_type) AS DOUBLE)
                   / count(*) OVER (PARTITION BY event_type), 6) AS mean_v
      FROM events
    ),
    dev AS (
      SELECT event_type, event_id, ts,
             CAST(round(value - mean_v, 6) AS DECIMAL(18,6)) AS d
      FROM base
    ),
    cusum AS (
      SELECT event_type, event_id, ts,
             sum(d) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS c
      FROM dev
    ),
    ranked AS (
      SELECT event_type, event_id, c,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(c) DESC, ts, event_id) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM cusum
    )
    SELECT event_type,
           CAST(n AS BIGINT)              AS n_events,
           CAST(event_id AS BIGINT)       AS changepoint_event,
           CAST(round(c, 6) AS DOUBLE)    AS max_abs_cusum
    FROM ranked WHERE rk = 1
    """,
    doc="offline CUSUM change-point estimate per event type: deviations from the "
    "per-type mean accumulate in event-time order (6dp-quantized decimal cumsum "
    "— exact and order-independent given the (ts, event_id) total order), and "
    "the argmax of |CUSUM| is the classic single-change-point location "
    "estimator (Page's statistic read offline). Event type is a LOW-"
    "cardinality key, so a per-type window would funnel each type's whole "
    "history through one task at 100 TB; instead the prefix sum is SEGMENTED "
    "two-phase (the scan-parallel prefix-sum algorithm, relationally): local "
    "cumsum within (type, month) partitions, month totals telescoped into "
    "per-month offsets by a months-bounded window, offsets joined back "
    "broadcast — exact, because decimal addition is associative, so the "
    "oracle's naive one-window cumsum agrees bit-for-bit. The argmax is "
    "likewise per-(type, month) winners re-ranked across the months-bounded "
    "winner set (north-star time-series / monitoring)",
    tags=("events", "window"),
)
def ts_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    # per-type mean: ordinary partial-agg shuffle (types-bounded), broadcast back
    means = e.groupBy("event_type").agg(
        F.round(
            F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_v"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    chunk = (F.year("ts") * 12 + F.month("ts")).cast("bigint")
    dev = e.join(F.broadcast(means), "event_type").select(
        "event_type",
        "event_id",
        "ts",
        chunk.alias("chunk"),
        F.round(F.col("value") - F.col("mean_v"), 6).cast("decimal(18,6)").alias("d"),
        "n_events",
    )
    # phase 1: local cumsum within (type, month) — parallel across months
    wl = W.partitionBy("event_type", "chunk").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    local = dev.withColumn("lc", F.sum("d").over(wl))
    # phase 2: month totals -> exclusive per-month offsets (months-bounded window)
    totals = dev.groupBy("event_type", "chunk").agg(F.sum("d").alias("tot"))
    wo = W.partitionBy("event_type").orderBy("chunk").rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = totals.withColumn("off", F.coalesce(F.sum("tot").over(wo), F.lit(0))).select(
        "event_type", "chunk", "off"
    )
    cusum = local.join(F.broadcast(offsets), ["event_type", "chunk"]).withColumn(
        "c", F.col("lc") + F.col("off")
    )
    # argmax |c|: per-(type, month) winner, then across the bounded winner set
    wm = W.partitionBy("event_type", "chunk").orderBy(
        F.abs(F.col("c")).desc(), "ts", "event_id"
    )
    winners = cusum.withColumn("mrk", F.row_number().over(wm)).filter(F.col("mrk") == 1)
    wg = W.partitionBy("event_type").orderBy(F.abs(F.col("c")).desc(), "ts", "event_id")
    return (
        winners.withColumn("rk", F.row_number().over(wg))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "n_events",
            F.col("event_id").cast("bigint").alias("changepoint_event"),
            F.round("c", 6).cast("double").alias("max_abs_cusum"),
        )
    )


# --------------------------------------------------- debounce (burst dedup)

DEBOUNCE_GAP_SEC = 300


@query(
    "events_debounce",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_type, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id, event_type
                                                       ORDER BY ts, event_id))
                       >= {DEBOUNCE_GAP_SEC}
                  THEN 1 ELSE 0 END AS keep
      FROM events
    )
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT)  AS n_events,
           CAST(sum(keep) AS BIGINT) AS n_kept
    FROM g GROUP BY 1, 2
    """,
    doc=f"debounce / burst dedup: within each (user, event type) stream, an event "
    f"is kept only if >= {DEBOUNCE_GAP_SEC}s passed since the previous one — the "
    "time-proximity dedup a telemetry pipeline runs on retry/double-click bursts "
    "(dropDuplicates can't express it: the key is TIME ADJACENCY, not equality; "
    "the streaming twin is dropDuplicatesWithinWatermark's gap semantics). One "
    "lag over the per-key event-time order, then a per-key count — a single "
    "shuffle on (user, type), state bounded by the partition sort "
    "(north-star events / SURVEY §2.5 lag family)",
    tags=("events", "window"),
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag(F.unix_timestamp("ts")).over(w)
    keep = (
        prev.isNull() | ((F.unix_timestamp("ts") - prev) >= DEBOUNCE_GAP_SEC)
    ).cast("int")
    return (
        e.select("user_id", "event_type", keep.alias("keep"))
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("keep").cast("bigint").alias("n_kept"),
        )
    )


# ------------------------------------------- seasonal-naive forecast backtest

BACKTEST_LAG_MONTHS = 12


@query(
    "orders_seasonal_backtest",
    oracle=f"""
    WITH m AS (
      SELECT o_orderpriority AS priority,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS month_idx,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS actual
      FROM orders GROUP BY 1, 2
    ),
    f AS (
      SELECT priority, month_idx, actual,
             lag(actual, {BACKTEST_LAG_MONTHS})
               OVER (PARTITION BY priority ORDER BY month_idx) AS forecast
      FROM m
    ),
    scored AS (
      SELECT priority,
             CAST(round(abs(CAST(actual AS DOUBLE) - CAST(forecast AS DOUBLE))
                        / CAST(actual AS DOUBLE), 6) AS DECIMAL(18,6)) AS ape,
             CAST(round((CAST(forecast AS DOUBLE) - CAST(actual AS DOUBLE))
                        / CAST(actual AS DOUBLE), 6) AS DECIMAL(18,6)) AS pe
      FROM f WHERE forecast IS NOT NULL
    )
    SELECT priority,
           CAST(count(*) AS BIGINT)                         AS n_months,
           round(CAST(sum(ape) AS DOUBLE) / count(*), 6)    AS mape,
           round(CAST(sum(pe) AS DOUBLE) / count(*), 6)     AS mean_bias
    FROM scored GROUP BY priority
    """,
    doc=f"seasonal-naive forecast backtest: forecast(month m) = actual(m - "
    f"{BACKTEST_LAG_MONTHS}) per order priority — the baseline every forecasting "
    "model must beat, evaluated in-engine with MAPE and mean bias over the "
    "months where the lag exists. Monthly actuals are exact decimal money sums; "
    "per-month errors are 6dp-quantized then decimal-averaged "
    "(order-independent). Plan: one partial-agg shuffle to (priority, month) — "
    "months-bounded — then a lag window inside each priority partition; the "
    "backtest cost is independent of row count beyond the first rollup "
    "(north-star time-series / evaluation)",
    tags=("events", "window", "agg"),
)
def orders_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from http_datafusion_spark.functions.fixedpoint import i100

    o = load_tables(spark, sf_dir, "orders")["orders"]
    m = (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("month_idx"),
        )
        .agg(
            (F.sum(i100("o_totalprice")).cast("decimal(38,0)")
             / F.lit(100).cast("decimal(8,0)")).cast("decimal(38,2)").alias("actual")
        )
    )
    w = W.partitionBy("priority").orderBy("month_idx")
    f = m.withColumn("forecast", F.lag("actual", BACKTEST_LAG_MONTHS).over(w)).filter(
        F.col("forecast").isNotNull()
    )
    act = F.col("actual").cast("double")
    fc = F.col("forecast").cast("double")
    scored = f.select(
        "priority",
        F.round(F.abs(act - fc) / act, 6).cast("decimal(18,6)").alias("ape"),
        F.round((fc - act) / act, 6).cast("decimal(18,6)").alias("pe"),
    )
    return scored.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.round(F.sum("ape").cast("double") / F.count(F.lit(1)), 6).alias("mape"),
        F.round(F.sum("pe").cast("double") / F.count(F.lit(1)), 6).alias("mean_bias"),
    )


# --------------------------------------------- fulfillment latency profile


@query(
    "order_fulfillment_latency",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority AS priority,
             CAST((epoch(l.l_shipdate) - epoch(o.o_orderdate)) / 86400 AS BIGINT) AS days
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT priority,
           CAST(count(*) AS BIGINT)                   AS n_lines,
           round(avg(days), 4)                        AS avg_days,
           round(median(days), 4)                     AS p50_days,
           round(quantile_cont(days, 0.90), 4)        AS p90_days,
           CAST(max(days) AS BIGINT)                  AS max_days
    FROM lat GROUP BY priority
    """,
    doc="order-fulfillment latency profile: ship-date minus order-date in whole "
    "days per priority class, with mean/median/p90/max — the SLA report an "
    "operations dashboard refreshes hourly (and the regression target "
    "orders_seasonal_backtest forecasts against). Integer day deltas make "
    "avg/median interpolation engine-exact (the q_agg_percentiles discipline). "
    "One co-keyed fact-fact join on orderkey + a priority-bounded agg — at "
    "100 TB both facts shuffle once on the join key, percentiles are grouped "
    "aggregates, never windows (north-star time-series / operations)",
    tags=("events", "agg", "join"),
)
def order_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    lat = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            (
                (F.unix_timestamp("l_shipdate") - F.unix_timestamp("o_orderdate")) / 86400
            ).cast("bigint").alias("days"),
        )
    )
    return lat.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(F.avg("days"), 4).alias("avg_days"),
        F.round(F.median("days"), 4).alias("p50_days"),
        F.round(F.percentile("days", F.lit(0.90)), 4).alias("p90_days"),
        F.max("days").cast("bigint").alias("max_days"),
    )


# ------------------------------------------- difference-in-differences

DID_SPLIT_FRAC = 0.5  # event-time midpoint splits pre/post


@query(
    "events_impact_did",
    oracle="""
    WITH span AS (
      SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS lo,
             CAST(floor(epoch(max(ts))) AS BIGINT) AS hi
      FROM events
    ),
    labeled AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'treat' ELSE 'control' END AS grp,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) * 2 >= lo + hi
                  THEN 'post' ELSE 'pre' END AS period,
             CAST(round(value, 6) AS DECIMAL(18,6)) AS v
      FROM events CROSS JOIN span
    ),
    cells AS (
      SELECT grp, period,
             CAST(count(*) AS BIGINT) AS n,
             round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_v
      FROM labeled GROUP BY grp, period
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_events,
           round(max(CASE WHEN grp = 'treat' AND period = 'post' THEN mean_v END)
               - max(CASE WHEN grp = 'treat' AND period = 'pre' THEN mean_v END)
               - (max(CASE WHEN grp = 'control' AND period = 'post' THEN mean_v END)
                - max(CASE WHEN grp = 'control' AND period = 'pre' THEN mean_v END)), 6)
             AS did_estimate,
           round(max(CASE WHEN grp = 'treat' AND period = 'post' THEN mean_v END), 6)
             AS treat_post_mean,
           round(max(CASE WHEN grp = 'control' AND period = 'post' THEN mean_v END), 6)
             AS control_post_mean
    FROM cells
    """,
    doc="difference-in-differences impact estimate: users split into treatment/"
    "control by id parity (the harness stand-in for an assignment table), the "
    "event-time span's midpoint splits pre/post, and the DiD estimator "
    "(T_post - T_pre) - (C_post - C_pre) removes both the group baseline and "
    "the common time trend — the causal readout A/B lift (events_ab_lift) "
    "cannot give when treatment predates randomization. Cell means come from "
    "exact decimal sums; the 2x2 cell table is all that shuffles past the "
    "first scan; the span is a 1-row broadcast (north-star statistics / "
    "causal inference)",
    tags=("events", "agg"),
)
def events_impact_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    span = e.agg(
        F.min(F.unix_timestamp("ts")).cast("bigint").alias("lo"),
        F.max(F.unix_timestamp("ts")).cast("bigint").alias("hi"),
    )
    labeled = e.crossJoin(F.broadcast(span)).select(
        F.when(F.col("user_id") % 2 == 0, "treat").otherwise("control").alias("grp"),
        F.when(
            F.unix_timestamp("ts").cast("bigint") * 2 >= F.col("lo") + F.col("hi"), "post"
        ).otherwise("pre").alias("period"),
        F.round("value", 6).cast("decimal(18,6)").alias("v"),
    )
    cells = labeled.groupBy("grp", "period").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 6).alias("mean_v"),
    )
    cell = lambda g, p: F.max(  # noqa: E731
        F.when((F.col("grp") == g) & (F.col("period") == p), F.col("mean_v"))
    )
    return cells.agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.round(
            cell("treat", "post")
            - cell("treat", "pre")
            - (cell("control", "post") - cell("control", "pre")),
            6,
        ).alias("did_estimate"),
        F.round(cell("treat", "post"), 6).alias("treat_post_mean"),
        F.round(cell("control", "post"), 6).alias("control_post_mean"),
    )


# ------------------------------------------------- autocorrelation (ACF)

ACF_MAX_LAG = 24  # hourly lags


@query(
    "ts_autocorrelation",
    oracle=f"""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS slot,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS mean_n
      FROM hourly
    ),
    lags AS (SELECT CAST(k AS BIGINT) AS lag FROM range(1, {ACF_MAX_LAG} + 1) t(k)),
    prods AS (
      SELECT l.lag,
             CAST(round((a.n - s.mean_n) * (b.n - s.mean_n), 6) AS DECIMAL(28,6)) AS p
      FROM hourly a
      JOIN lags l ON true
      JOIN hourly b ON b.slot = a.slot + l.lag
      CROSS JOIN stats s
    ),
    denom AS (
      SELECT CAST(sum(CAST(round((h.n - s.mean_n) * (h.n - s.mean_n), 6)
                           AS DECIMAL(28,6))) AS DOUBLE) AS d
      FROM hourly h CROSS JOIN stats s
    )
    SELECT p.lag,
           CAST(count(*) AS BIGINT)                      AS n_pairs,
           round(CAST(sum(p.p) AS DOUBLE) / max(d.d), 6) AS acf
    FROM prods p CROSS JOIN denom d
    GROUP BY p.lag
    """,
    doc=f"autocorrelation function of the hourly event-count series, lags 1.."
    f"{ACF_MAX_LAG}: the seasonality detector (a daily cycle shows as an ACF "
    "peak at lag 24) that decides window sizes for ts_seasonal ops and "
    "forecast baselines (orders_seasonal_backtest's lag-12 is the monthly "
    "analogue). The series is hours-bounded after one rollup shuffle, so the "
    "lag self-join is bounded x bounded; products quantize to decimals "
    "(order-independent) and the denominator is a 1-row broadcast "
    "(north-star time-series / diagnostics)",
    tags=("events", "agg"),
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    # The |hours|-bounded count series feeds FIVE consumers (stats, both
    # lag-join sides, the denominator, the final agg); unpinned, each
    # re-derived the events scan (the r15 scan audit's 5x class). One
    # rollup shuffle, everything after runs on the pinned hours-grain
    # table.
    hourly = (
        e.groupBy(F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("slot"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .transform(pin)
    )
    stats = hourly.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.round(F.sum("n").cast("double") / F.count(F.lit(1)), 6).alias("mean_n"),
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").cast("bigint").alias("lag"))
    a, b = hourly.alias("a"), hourly.alias("b")
    prods = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.slot") == F.col("a.slot") + F.col("lag"))
        .crossJoin(F.broadcast(stats))
        .select(
            "lag",
            F.round(
                (F.col("a.n") - F.col("mean_n")) * (F.col("b.n") - F.col("mean_n")), 6
            ).cast("decimal(28,6)").alias("p"),
        )
    )
    denom = hourly.crossJoin(F.broadcast(stats)).agg(
        F.sum(
            F.round((F.col("n") - F.col("mean_n")) * (F.col("n") - F.col("mean_n")), 6)
            .cast("decimal(28,6)")
        ).cast("double").alias("d")
    )
    return (
        prods.crossJoin(F.broadcast(denom))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.sum("p").cast("double") / F.max("d"), 6).alias("acf"),
        )
    )


# ------------------------------------------------------ backlog (running balance)


@query(
    "orders_backlog_timeseries",
    oracle="""
    WITH opened AS (
      SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS delta
      FROM orders GROUP BY 1
    ),
    closed AS (
      SELECT CAST(floor(epoch(mx) / 86400) AS BIGINT) AS day,
             CAST(-count(*) AS BIGINT) AS delta
      FROM (SELECT l_orderkey, max(l_shipdate) AS mx FROM lineitem GROUP BY 1)
      GROUP BY 1
    ),
    daily AS (
      SELECT day, CAST(sum(delta) AS BIGINT) AS net
      FROM (SELECT * FROM opened UNION ALL SELECT * FROM closed)
      GROUP BY day
    ),
    run AS (
      SELECT day, net,
             CAST(sum(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS backlog
      FROM daily
    )
    SELECT CAST(count(*) AS BIGINT)      AS n_days,
           CAST(max(backlog) AS BIGINT)  AS peak_backlog,
           CAST(min(CASE WHEN backlog = mb THEN day END) AS BIGINT) AS peak_day,
           CAST(max(CASE WHEN day = md THEN backlog END) AS BIGINT) AS final_backlog
    FROM run CROSS JOIN (SELECT max(backlog) AS mb, max(day) AS md FROM run)
    """,
    doc="order-backlog running balance — the event-sourcing ledger shape: "
    "orders open at o_orderdate (+1) and close when their last line ships "
    "(-1, max l_shipdate per order), the two deltas union into a per-day net "
    "and the running sum is the open-order backlog over time; emitted: peak "
    "backlog, its day, and the final balance. The cumsum runs over the "
    "DAYS-bounded daily series (two partial-agg shuffles reduce both fact "
    "tables to it), so the window is calendar-bounded at any corpus size — "
    "the same reduce-then-scan discipline as ts_cusum_changepoints "
    "(north-star time-series / operations ledger)",
    tags=("events", "agg", "window"),
)
def orders_backlog_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    opened = (
        t["orders"]
        .groupBy(F.floor(F.unix_timestamp("o_orderdate") / 86400).cast("bigint").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("delta"))
    )
    closed = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("mx"))
        .groupBy(F.floor(F.unix_timestamp("mx") / 86400).cast("bigint").alias("day"))
        .agg((-F.count(F.lit(1))).cast("bigint").alias("delta"))
    )
    daily = (
        opened.unionByName(closed)
        .groupBy("day")
        .agg(F.sum("delta").cast("bigint").alias("net"))
    )
    wrun = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    run = daily.withColumn("backlog", F.sum("net").over(wrun).cast("bigint"))
    ends = run.agg(F.max("backlog").alias("mb"), F.max("day").alias("md"))
    return (
        run.crossJoin(F.broadcast(ends))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.max("backlog").cast("bigint").alias("peak_backlog"),
            F.min(F.when(F.col("backlog") == F.col("mb"), F.col("day")))
            .cast("bigint")
            .alias("peak_day"),
            F.max(F.when(F.col("day") == F.col("md"), F.col("backlog")))
            .cast("bigint")
            .alias("final_backlog"),
        )
    )


# --------------------------------------------- seasonal decomposition


@query(
    "orders_seasonality_decompose",
    oracle="""
    WITH monthly AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS midx,
             CAST(month(o_orderdate) AS BIGINT)                          AS month_of_year,
             CAST(count(*) AS BIGINT)                                    AS n
      FROM orders GROUP BY 1, 2
    ),
    trended AS (
      SELECT midx, month_of_year, n,
             round(avg(n) OVER (ORDER BY midx ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING), 6)
               AS trend,
             count(*) OVER (ORDER BY midx ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
               AS w
      FROM monthly
    ),
    detrended AS (
      SELECT month_of_year,
             CAST(round(n - trend, 6) AS DECIMAL(18,6)) AS resid
      FROM trended WHERE w = 13
    )
    SELECT month_of_year,
           CAST(count(*) AS BIGINT)                         AS n_months,
           round(CAST(sum(resid) AS DOUBLE) / count(*), 6)  AS seasonal_index
    FROM detrended GROUP BY month_of_year
    """,
    doc="classical seasonal decomposition of the monthly order-count series: a "
    "centered 13-month moving average estimates the trend, full-window months "
    "are detrended, and residuals average per calendar month into the additive "
    "seasonal index — the decomposition behind every 'is December always like "
    "this' question, and the structural version of what ts_autocorrelation "
    "detects. The windows run over the MONTHS-bounded rollup (the series, "
    "never the fact rows); residuals quantize to decimals "
    "(north-star time-series / decomposition)",
    tags=("events", "window", "agg"),
)
def orders_seasonality_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    monthly = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint").alias("midx"),
        F.month("o_orderdate").cast("bigint").alias("month_of_year"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wt = W.orderBy("midx").rowsBetween(-6, 6)
    trended = monthly.select(
        "month_of_year",
        "n",
        F.round(F.avg("n").over(wt), 6).alias("trend"),
        F.count(F.lit(1)).over(wt).alias("w"),
    )
    detrended = trended.filter(F.col("w") == 13).select(
        "month_of_year",
        F.round(F.col("n") - F.col("trend"), 6).cast("decimal(18,6)").alias("resid"),
    )
    return detrended.groupBy("month_of_year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.round(F.sum("resid").cast("double") / F.count(F.lit(1)), 6).alias("seasonal_index"),
    )


# ------------------------------------------------- DAU / WAU / stickiness

WAU_DAYS = 7


@query(
    "events_dau_wau",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (
      SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ),
    wau AS (
      SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
      FROM days d JOIN ud u
        ON u.day BETWEEN d.day - {WAU_DAYS - 1} AND d.day
      GROUP BY d.day
    )
    SELECT d.day, a.dau, w.wau,
           round(a.dau * 1.0 / w.wau, 6) AS stickiness
    FROM days d JOIN dau a ON d.day = a.day JOIN wau w ON d.day = w.day
    """,
    doc=f"DAU / WAU({WAU_DAYS}d) / stickiness per day — the product-analytics "
    "headline metrics: daily distinct actives, trailing-week distinct actives, "
    "and their ratio (how much of the weekly audience shows up daily). The "
    "event stream first reduces to DISTINCT (user, day) pairs — the only "
    "relation the rolling distinct ever touches — and the trailing window is "
    "a days-grid range join over those pairs: cost is user-days x window, "
    "never events x window, and per-day counts are exact (no HLL needed at "
    "this reduction; swap in hll_sketch_union for multi-year horizons) "
    "(north-star events / product analytics)",
    tags=("events", "agg", "join", "bench_extra"),
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    # Two events passes (was 4, r16 4x-class triage): the day list is
    # read off the pinned days-grain DAU table (one row per distinct
    # day — grouping the user-day frame by day IS the distinct-day
    # set) instead of a third user-day derivation, and the final join
    # reads the same pin. A fact_scale persist of the whole user-day
    # frame was A/B-measured SLOWER at sf0.1 AND sf1 (0.95->1.22 s
    # sf1): the cache build/read overhead exceeds re-running the
    # pushed 2-column scan + map-side-combined distinct, so only the
    # bounded aggregate is pinned and the user-day frame is derived
    # twice (DAU pass + WAU pass). r18 sf5 re-probe (the verdict's
    # crossover question): persist 1.73 -> 1.48 s at sf5 (-14%,
    # overlapping bands) but 0.82 -> 1.46 s at sf0.1 (+78%) — still a
    # net negative; REVERTED again.
    ud = e.select(
        "user_id", F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    ).transform(pin)
    days = dau.select("day")
    u = ud.select(F.col("user_id").alias("u_user"), F.col("day").alias("u_day"))
    wau = (
        days.join(
            u,
            (F.col("u_day") >= F.col("day") - (WAU_DAYS - 1))
            & (F.col("u_day") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("u_user").cast("bigint").alias("wau"))
    )
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            "day", "dau", "wau", F.round(F.col("dau") * 1.0 / F.col("wau"), 6).alias("stickiness")
        )
    )


# --------------------------------------------- SLO error-budget burn rate

SLO_TARGET = 0.20  # error-rate objective (synthetic corpus runs hot)
BURN_ALERT = 1.5  # page when short-window burn exceeds this multiple


@query(
    "events_error_budget_burn",
    oracle=f"""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errs
      FROM events GROUP BY 1
    ),
    win AS (
      SELECT h, n, errs,
             CAST(sum(errs) OVER w1 AS BIGINT) AS e1,
             CAST(sum(n)    OVER w1 AS BIGINT) AS n1,
             CAST(sum(errs) OVER w6 AS BIGINT) AS e6,
             CAST(sum(n)    OVER w6 AS BIGINT) AS n6
      FROM hourly
      WINDOW w1 AS (ORDER BY h ROWS BETWEEN 0 PRECEDING AND CURRENT ROW),
             w6 AS (ORDER BY h ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
    )
    SELECT h AS hour,
           round(e1 * 1.0 / n1 / {SLO_TARGET}, 6) AS burn_1h,
           round(e6 * 1.0 / n6 / {SLO_TARGET}, 6) AS burn_6h,
           (e1 * 1.0 / n1 / {SLO_TARGET} > {BURN_ALERT}
            AND e6 * 1.0 / n6 / {SLO_TARGET} > {BURN_ALERT}) AS page
    FROM win
    """,
    doc=f"SLO error-budget burn-rate alerting (the Google SRE multiwindow "
    f"policy): per hour, the error-rate-over-objective burn multiple in a "
    "short (1h) and long (6h) window; a page fires only when BOTH exceed "
    f"{BURN_ALERT}x — the short window gives fast detection, the long window "
    "suppresses blips, which single-threshold alerting (stream_error_alert's "
    "shape) cannot do. Windows run over the hours-bounded rollup; rates "
    "divide identical integers on both engines "
    "(north-star time-series / SRE operations)",
    tags=("events", "window", "agg"),
)
def events_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    hourly = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("event_type") == "error").cast("int")).cast("bigint").alias("errs"),
    )
    w1 = W.orderBy("h").rowsBetween(0, 0)
    w6 = W.orderBy("h").rowsBetween(-5, 0)
    win = hourly.select(
        "h",
        F.sum("errs").over(w1).cast("bigint").alias("e1"),
        F.sum("n").over(w1).cast("bigint").alias("n1"),
        F.sum("errs").over(w6).cast("bigint").alias("e6"),
        F.sum("n").over(w6).cast("bigint").alias("n6"),
    )
    b1 = F.col("e1") * 1.0 / F.col("n1") / SLO_TARGET
    b6 = F.col("e6") * 1.0 / F.col("n6") / SLO_TARGET
    return win.select(
        F.col("h").alias("hour"),
        F.round(b1, 6).alias("burn_1h"),
        F.round(b6, 6).alias("burn_6h"),
        ((b1 > BURN_ALERT) & (b6 > BURN_ALERT)).alias("page"),
    )


# ------------------------------------------------- Little's Law check


@query(
    "orders_littles_law_check",
    oracle="""
    WITH life AS (
      SELECT o.o_orderkey,
             CAST(floor(epoch(o.o_orderdate) / 86400) AS BIGINT) AS d_open,
             CAST(floor(epoch(mx.close_ts) / 86400) AS BIGINT)   AS d_close
      FROM orders o
      JOIN (SELECT l_orderkey, max(l_shipdate) AS close_ts
            FROM lineitem GROUP BY 1) mx
        ON o.o_orderkey = mx.l_orderkey
    ),
    span AS (
      SELECT CAST(min(d_open) AS BIGINT) AS lo, CAST(max(d_close) AS BIGINT) AS hi
      FROM life
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           round(count(*) * 1.0 / (max(s.hi) - min(s.lo) + 1), 6)  AS lambda_per_day,
           round(CAST(sum(CAST(d_close - d_open + 1 AS DECIMAL(18,0))) AS DOUBLE)
                 / count(*), 6)                                    AS w_days,
           round(CAST(sum(CAST(d_close - d_open + 1 AS DECIMAL(18,0))) AS DOUBLE)
                 / (max(s.hi) - min(s.lo) + 1), 6)                 AS l_avg_open,
           round((count(*) * 1.0 / (max(s.hi) - min(s.lo) + 1))
                 * (CAST(sum(CAST(d_close - d_open + 1 AS DECIMAL(18,0))) AS DOUBLE)
                    / count(*))
                 / (CAST(sum(CAST(d_close - d_open + 1 AS DECIMAL(18,0))) AS DOUBLE)
                    / (max(s.hi) - min(s.lo) + 1)), 6)             AS littles_ratio
    FROM life CROSS JOIN span s
    """,
    doc="Little's Law validation on the order system: L = lambda * W, with "
    "lambda = arrival rate (orders/day over the observed span), W = mean "
    "time-in-system (open->last-ship days, inclusive), and L = time-averaged "
    "open orders computed INDEPENDENTLY as total order-days / span — the "
    "ratio lambda*W / L must be exactly 1 by the law's accounting identity "
    "(both numerators are the same order-day sum), which the emitted "
    "littles_ratio verifies in-engine: the sanity invariant an ops pipeline "
    "asserts over its own backlog metrics (orders_backlog_timeseries / "
    "order_fulfillment_latency are its two factors). One co-keyed fact join "
    "+ exact integer day sums (north-star operations / queueing theory)",
    tags=("events", "agg", "join"),
)
def orders_littles_law_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    close = t["lineitem"].groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_ts"))
    life = (
        t["orders"]
        .join(close, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.floor(F.unix_timestamp("o_orderdate") / 86400).cast("bigint").alias("d_open"),
            F.floor(F.unix_timestamp("close_ts") / 86400).cast("bigint").alias("d_close"),
        )
    )
    span = life.agg(
        F.min("d_open").cast("bigint").alias("lo"), F.max("d_close").cast("bigint").alias("hi")
    )
    days = F.max("hi") - F.min("lo") + 1
    order_days = F.sum((F.col("d_close") - F.col("d_open") + 1).cast("decimal(18,0)")).cast(
        "double"
    )
    n = F.count(F.lit(1))
    lam = n * 1.0 / days
    w = order_days / n
    l_avg = order_days / days
    return life.crossJoin(F.broadcast(span)).agg(
        n.cast("bigint").alias("n_orders"),
        F.round(lam, 6).alias("lambda_per_day"),
        F.round(w, 6).alias("w_days"),
        F.round(l_avg, 6).alias("l_avg_open"),
        F.round(lam * w / l_avg, 6).alias("littles_ratio"),
    )


# -------------------------------------------- session concurrency histogram

CONC_GAP_SEC = 1800  # session gap (matches sessionize)


@query(
    "events_concurrency_histogram",
    oracle=f"""
    WITH marks AS (
      SELECT user_id, epoch_s,
             CASE WHEN epoch_s - lag(epoch_s) OVER w >= {CONC_GAP_SEC}
                    OR lag(epoch_s) OVER w IS NULL THEN 1 ELSE 0 END AS starts
      FROM (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
                   event_id
            FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s, event_id)
    ),
    sessions AS (
      SELECT user_id, sid,
             CAST(min(epoch_s) AS BIGINT) AS s_start,
             CAST(max(epoch_s) AS BIGINT) AS s_end
      FROM (SELECT user_id, epoch_s,
                   sum(starts) OVER (PARTITION BY user_id ORDER BY epoch_s
                                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM marks)
      GROUP BY user_id, sid
    ),
    deltas AS (
      SELECT s_start AS t, 1 AS d FROM sessions
      UNION ALL
      SELECT s_end + 1 AS t, -1 AS d FROM sessions
    ),
    sweep AS (
      SELECT t, CAST(sum(sum(d)) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS concurrency
      FROM deltas GROUP BY t
    ),
    levels AS (
      SELECT concurrency,
             CAST(lead(t) OVER (ORDER BY t) - t AS BIGINT) AS dur
      FROM sweep
    )
    SELECT concurrency,
           CAST(sum(dur) AS BIGINT) AS seconds_at_level
    FROM levels WHERE dur IS NOT NULL AND dur > 0
    GROUP BY concurrency
    """,
    doc="concurrent-session histogram — the capacity-sizing readout: user "
    f"sessions (gap {CONC_GAP_SEC}s, the sessionize rule) become +1/-1 "
    "boundary deltas, the sweep-line running sum is the instantaneous "
    "concurrency, and level durations aggregate into seconds-at-each-level — "
    "peak concurrency and its dwell time fall straight out (the "
    "orders_backlog ledger discipline applied to sessions, at second "
    "granularity). The sweep runs over the boundary events (2 per session), "
    "never raw events; at 100 TB the cumsum two-phases like "
    "ts_cusum_changepoints (north-star events / capacity planning)",
    tags=("events", "window", "agg"),
)
def events_concurrency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    wseq = W.partitionBy("user_id").orderBy("epoch_s", "event_id")
    marks = e.select(
        "user_id", F.unix_timestamp("ts").cast("bigint").alias("epoch_s"), "event_id"
    ).withColumn(
        "starts",
        F.when(
            F.lag("epoch_s").over(wseq).isNull()
            | ((F.col("epoch_s") - F.lag("epoch_s").over(wseq)) >= CONC_GAP_SEC),
            1,
        ).otherwise(0),
    )
    wcum = wseq.rowsBetween(W.unboundedPreceding, 0)
    sessions = (
        marks.withColumn("sid", F.sum("starts").over(wcum))
        .groupBy("user_id", "sid")
        .agg(
            F.min("epoch_s").cast("bigint").alias("s_start"),
            F.max("epoch_s").cast("bigint").alias("s_end"),
        )
    )
    deltas = sessions.select(F.col("s_start").alias("t"), F.lit(1).alias("d")).unionByName(
        sessions.select((F.col("s_end") + 1).alias("t"), F.lit(-1).alias("d"))
    )
    per_t = deltas.groupBy("t").agg(F.sum("d").alias("nd"))
    wsweep = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    sweep = per_t.select("t", F.sum("nd").over(wsweep).cast("bigint").alias("concurrency"))
    levels = sweep.select(
        "concurrency", (F.lead("t").over(W.orderBy("t")) - F.col("t")).cast("bigint").alias("dur")
    )
    return (
        levels.filter(F.col("dur").isNotNull() & (F.col("dur") > 0))
        .groupBy("concurrency")
        .agg(F.sum("dur").cast("bigint").alias("seconds_at_level"))
    )


# ------------------------------------------------- velocity rules (fraud)

VELOCITY_WINDOW_SEC = 60
VELOCITY_K = 3  # >= K events inside the window trips the rule


@query(
    "events_velocity_flags",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events
    ),
    windowed AS (
      SELECT user_id, event_id,
             CAST(count(*) OVER (PARTITION BY user_id ORDER BY t
                                 RANGE BETWEEN {VELOCITY_WINDOW_SEC} PRECEDING
                                           AND CURRENT ROW) AS BIGINT) AS n_in_window
      FROM e
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN n_in_window >= {VELOCITY_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_tripped,
           CAST(max(n_in_window) AS BIGINT) AS peak_velocity,
           (max(n_in_window) >= {VELOCITY_K}) AS flagged
    FROM windowed GROUP BY user_id
    """,
    doc=f"velocity-rule screening — the fraud/rate-abuse primitive: for every "
    f"event, the count of the same user's events in the trailing "
    f"{VELOCITY_WINDOW_SEC}s (a RANGE frame on event time — same-timestamp "
    f"peers group together, as a velocity rule wants), users tripping >= "
    f"{VELOCITY_K} flagged with their peak velocity. One per-user range-frame "
    "window + one per-user agg — no self-join, state bounded by the window "
    "span per key; the streaming deployment is the same rule inside "
    "applyInPandasWithState (stream_debounce's machinery, inverted) "
    "(north-star events / fraud ops)",
    tags=("events", "window", "agg"),
)
def events_velocity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts").cast("bigint"))
        .rangeBetween(-VELOCITY_WINDOW_SEC, 0)
    )
    windowed = e.select(
        "user_id", F.count(F.lit(1)).over(w).cast("bigint").alias("n_in_window")
    )
    return windowed.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum((F.col("n_in_window") >= VELOCITY_K).cast("int"))
        .cast("bigint")
        .alias("n_tripped"),
        F.max("n_in_window").cast("bigint").alias("peak_velocity"),
        (F.max("n_in_window") >= VELOCITY_K).alias("flagged"),
    )


# --------------------------------------------- arrival-process dispersion


@query(
    "events_arrival_dispersion",
    oracle="""
    WITH minutes AS (
      SELECT CAST(floor(epoch(ts) / 60) AS BIGINT) AS m,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    span AS (
      SELECT CAST(min(m) AS BIGINT) AS lo, CAST(max(m) AS BIGINT) AS hi FROM minutes
    ),
    stats AS (
      SELECT CAST(max(s.hi) - min(s.lo) + 1 AS BIGINT)       AS n_slots,
             CAST(sum(n) AS BIGINT)                          AS total,
             CAST(sum(CAST(n * n AS DECIMAL(28,0))) AS DOUBLE) AS ssq
      FROM minutes CROSS JOIN span s
    )
    SELECT n_slots, total,
           round(total * 1.0 / n_slots, 6)             AS mean_per_min,
           round((ssq / n_slots
                  - (total * 1.0 / n_slots) * (total * 1.0 / n_slots))
                 * n_slots / (n_slots - 1)
                 / (total * 1.0 / n_slots), 6)          AS index_of_dispersion
    FROM stats
    """,
    doc="arrival-process dispersion test: index of dispersion (variance/mean) "
    "of per-minute event counts over the full span — 1 means Poisson arrivals "
    "(the assumption capacity models like orders_littles_law_check lean on), "
    "well above 1 means bursty/clustered arrivals (size for peaks, not "
    "means), well below 1 means throttled/scheduled traffic. Empty minutes "
    "enter through the span denominator, so no dense grid materializes; "
    "moments are exact-integer sums over the minutes-bounded rollup "
    "(north-star time-series / queueing diagnostics)",
    tags=("events", "agg"),
)
def events_arrival_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    minutes = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 60).cast("bigint").alias("m")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    span = minutes.agg(
        F.min("m").cast("bigint").alias("lo"), F.max("m").cast("bigint").alias("hi")
    )
    j = minutes.crossJoin(F.broadcast(span))
    n_slots = (F.max("hi") - F.min("lo") + 1).cast("bigint")
    total = F.sum("n").cast("bigint")
    ssq = F.sum((F.col("n") * F.col("n")).cast("decimal(28,0)")).cast("double")
    stats = j.agg(n_slots.alias("n_slots"), total.alias("total"), ssq.alias("ssq"))
    mean = F.col("total") * 1.0 / F.col("n_slots")
    return stats.select(
        "n_slots",
        "total",
        F.round(mean, 6).alias("mean_per_min"),
        F.round(
            (F.col("ssq") / F.col("n_slots") - mean * mean)
            * F.col("n_slots")
            / (F.col("n_slots") - 1)
            / mean,
            6,
        ).alias("index_of_dispersion"),
    )


# ---------------------------------------------- cross-correlation (CCF)

CCF_MAX_LAG = 6


@query(
    "events_crosscorrelation",
    oracle=f"""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS slot,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)  AS x,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT round(CAST(sum(x) AS DOUBLE) / count(*), 6) AS mx,
             round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS my
      FROM hourly
    ),
    lags AS (SELECT CAST(k AS BIGINT) AS lag FROM range(0, {CCF_MAX_LAG} + 1) t(k)),
    prods AS (
      SELECT l.lag,
             CAST(round((a.x - s.mx) * (b.y - s.my), 6) AS DECIMAL(28,6)) AS p
      FROM hourly a
      JOIN lags l ON true
      JOIN hourly b ON b.slot = a.slot + l.lag
      CROSS JOIN stats s
    ),
    denoms AS (
      SELECT sqrt(CAST(sum(CAST(round((h.x - s.mx) * (h.x - s.mx), 6) AS DECIMAL(28,6)))
                       AS DOUBLE)
                  * CAST(sum(CAST(round((h.y - s.my) * (h.y - s.my), 6) AS DECIMAL(28,6)))
                         AS DOUBLE)) AS d
      FROM hourly h CROSS JOIN stats s
    )
    SELECT p.lag,
           CAST(count(*) AS BIGINT)                      AS n_pairs,
           round(CAST(sum(p.p) AS DOUBLE) / max(d.d), 6) AS ccf
    FROM prods p CROSS JOIN denoms d
    GROUP BY p.lag
    """,
    doc=f"cross-correlation of hourly view and error counts at lags 0..{CCF_MAX_LAG} "
    "— the lead/lag diagnostic ACF (ts_autocorrelation) can't give: a CCF peak "
    "at lag k > 0 says error load FOLLOWS traffic by k hours (capacity-driven "
    "failures), at lag 0 says they co-occur (deploy/incident), nowhere says "
    "they're unrelated. Same bounded machinery as the ACF: hours-bounded "
    "series, bounded lag self-join, quantized-decimal products, scalar "
    "denominator broadcast (north-star time-series / incident diagnostics)",
    tags=("events", "agg"),
)
def events_crosscorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    # Same 5x fix as ts_autocorrelation: the hours-bounded two-series
    # table feeds stats, both lag-join sides, and the denominator —
    # pin it so the plan scans events once (r15 scan audit, 5x class).
    hourly = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("slot")
    ).agg(
        F.sum((F.col("event_type") == "view").cast("int")).cast("bigint").alias("x"),
        F.sum((F.col("event_type") == "error").cast("int")).cast("bigint").alias("y"),
    ).transform(pin)
    stats = hourly.agg(
        F.round(F.sum("x").cast("double") / F.count(F.lit(1)), 6).alias("mx"),
        F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias("my"),
    )
    lags = spark.range(0, CCF_MAX_LAG + 1).select(F.col("id").cast("bigint").alias("lag"))
    a, b = hourly.alias("a"), hourly.alias("b")
    prods = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.slot") == F.col("a.slot") + F.col("lag"))
        .crossJoin(F.broadcast(stats))
        .select(
            "lag",
            F.round((F.col("a.x") - F.col("mx")) * (F.col("b.y") - F.col("my")), 6)
            .cast("decimal(28,6)")
            .alias("p"),
        )
    )
    denoms = hourly.crossJoin(F.broadcast(stats)).agg(
        F.sqrt(
            F.sum(
                F.round((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx")), 6)
                .cast("decimal(28,6)")
            ).cast("double")
            * F.sum(
                F.round((F.col("y") - F.col("my")) * (F.col("y") - F.col("my")), 6)
                .cast("decimal(28,6)")
            ).cast("double")
        ).alias("d")
    )
    return (
        prods.crossJoin(F.broadcast(denoms))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.sum("p").cast("double") / F.max("d"), 6).alias("ccf"),
        )
    )


# --------------------------------------------- Theil-Sen robust trend


@query(
    "orders_theil_sen_trend",
    oracle="""
    WITH monthly AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS midx,
             CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    ), slopes AS (
      SELECT (b.rev - a.rev) / (b.midx - a.midx) AS s
      FROM monthly a JOIN monthly b ON a.midx < b.midx
    ), ts AS (
      SELECT round(median(s), 6) AS slope,
             (SELECT CAST(count(*) AS BIGINT) FROM slopes) AS n_pairs,
             (SELECT CAST(count(*) AS BIGINT) FROM monthly) AS n_months
      FROM slopes
    )
    SELECT ts.n_months, ts.n_pairs, ts.slope,
           round(median(m.rev - ts.slope * m.midx), 6) AS intercept
    FROM monthly m CROSS JOIN ts
    GROUP BY ts.n_months, ts.n_pairs, ts.slope
    """,
    doc="Theil-Sen robust trend of monthly revenue: slope = median of all "
    "pairwise month-to-month slopes (breakdown point ~29% — one crazy month "
    "cannot move it, unlike least squares), intercept = median residual at "
    "the fitted slope. The pairwise self-join runs on the MONTHS-bounded "
    "rollup (calendar-bounded: ~n_months^2/2 pairs regardless of corpus "
    "size), never on fact rows; the fact table contributes one partial-agg "
    "shuffle. Medians interpolate identically in both engines on the exact "
    "2dp-rounded inputs (north-star time-series / robust statistics)",
    tags=("events", "agg"),
)
def orders_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    # months-bounded revenue series feeds FOUR consumers (both slope
    # self-join sides, the month count, the residual pass); unpinned,
    # each re-derived the orders scan (r16 4x-class triage) — the
    # ts_autocorrelation pattern verbatim.
    monthly = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint").alias("midx")
    ).agg(F.round(F.sum("o_totalprice"), 2).cast("double").alias("rev")).transform(pin)
    a, b = monthly.alias("a"), monthly.alias("b")
    slopes = a.join(b, F.col("a.midx") < F.col("b.midx")).select(
        ((F.col("b.rev") - F.col("a.rev")) / (F.col("b.midx") - F.col("a.midx"))).alias("s")
    )
    ts = slopes.agg(
        F.round(F.expr("percentile(s, 0.5)"), 6).alias("slope"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    ).crossJoin(F.broadcast(monthly.agg(F.count(F.lit(1)).cast("bigint").alias("n_months"))))
    resid = monthly.crossJoin(F.broadcast(ts)).select(
        "n_months", "n_pairs", "slope", (F.col("rev") - F.col("slope") * F.col("midx")).alias("r")
    )
    return resid.groupBy("n_months", "n_pairs", "slope").agg(
        F.round(F.expr("percentile(r, 0.5)"), 6).alias("intercept")
    )


# --------------------------------------- two-sample KS distribution test

# Binned two-sample Kolmogorov-Smirnov: D = max over bins of
# |ECDF_a - ECDF_b| computed on a 256-bin equi-width grid over the
# combined range. Binning makes the statistic a LOWER BOUND on the
# exact sup-norm D (documented approximation — the exact statistic
# needs per-distinct-value cumulative ranks, a data-sized global
# order), and bounds every post-scan relation at 256 rows, which is
# what makes the op safe at any corpus size.
KS_BINS = 256
KS_GROUP_A = "purchase"
KS_GROUP_B = "click"
KS_CRIT_COEF = 1.358  # c(alpha) at alpha = 0.05 (classic KS table, public)


@query(
    "events_ks_two_sample",
    oracle=f"""
    WITH s AS (
      SELECT value, CASE WHEN event_type = '{KS_GROUP_A}' THEN 1 ELSE 0 END AS ga
      FROM events WHERE event_type IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
    ), rng AS (
      SELECT min(value) AS mn, max(value) AS mx FROM s
    ), binned AS (
      SELECT CASE WHEN rng.mx = rng.mn THEN 0
                  ELSE least(CAST(floor((s.value - rng.mn) * {KS_BINS}.0
                                        / (rng.mx - rng.mn)) AS BIGINT),
                             {KS_BINS - 1}) END AS bin,
             CAST(sum(CASE WHEN ga = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN ga = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM s, rng GROUP BY 1
    ), cum AS (
      SELECT bin,
             sum(ca) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cca,
             sum(cb) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS ccb
      FROM binned
    ), tot AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
      FROM binned
    ), diffs AS (
      SELECT bin, abs(cca * 1.0 / tot.na - ccb * 1.0 / tot.nb) AS d
      FROM cum, tot
    ), best AS (
      SELECT bin AS ks_bin, d FROM diffs ORDER BY d DESC, bin LIMIT 1
    )
    SELECT tot.na AS n_a, tot.nb AS n_b,
           round(best.d, 6) AS ks_stat,
           CAST(best.ks_bin AS BIGINT) AS ks_bin,
           round({KS_CRIT_COEF} * sqrt((tot.na + tot.nb) * 1.0 / (tot.na * tot.nb)), 6)
             AS crit_05,
           CAST(CASE WHEN best.d > {KS_CRIT_COEF}
                          * sqrt((tot.na + tot.nb) * 1.0 / (tot.na * tot.nb))
                THEN 1 ELSE 0 END AS BIGINT) AS reject_05
    FROM best, tot
    """,
    doc=f"two-sample Kolmogorov-Smirnov test ({KS_GROUP_A!r} vs {KS_GROUP_B!r} "
    f"value distributions): binned ECDFs on a {KS_BINS}-bin equi-width grid, "
    "D = max |F_a - F_b| with the alpha=0.05 critical value and reject flag — "
    "the distribution-drift test that catches shape changes mean-based A/B "
    "(events_ab_lift) misses. Binning makes D a documented lower bound on the "
    "exact sup-norm and bounds every post-scan relation at 256 rows: one "
    "conditional-agg scan, a 256-row cumulative window (constant-sized "
    "single partition — the documented-bounded shape), 1-row totals "
    "(SURVEY §2.4 extension / statistics)",
    tags=("events", "agg", "timeseries"),
)
def events_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    # The two-column sample frame feeds the range pre-pass AND the
    # binning pass, and the 256-row bin table feeds the cumulative and
    # total branches; unpinned, the re-derivations compounded to 6
    # events scans (r14 scan audit). This frame is FACT-SCALE (every
    # row of two event types), so it is pinned fact_scale — a
    # lineage-recoverable MEMORY_AND_DISK persist, never an
    # unreplicated executor-local checkpoint (r15 ADVICE: an executor
    # loss must recompute the sample, not kill the job). The two
    # passes the equi-width grid inherently needs run over the persist.
    s = (
        e.filter(F.col("event_type").isin(KS_GROUP_A, KS_GROUP_B))
        .select("value", (F.col("event_type") == KS_GROUP_A).cast("int").alias("ga"))
        .transform(pin, fact_scale=True)
    )
    rng = s.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = (
        s.crossJoin(F.broadcast(rng))
        .select(
            F.when(F.col("mx") == F.col("mn"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor(
                        (F.col("value") - F.col("mn"))
                        * float(KS_BINS)
                        / (F.col("mx") - F.col("mn"))
                    ).cast("bigint"),
                    F.lit(KS_BINS - 1),
                )
            )
            .alias("bin"),
            "ga",
        )
        .groupBy("bin")
        .agg(
            F.sum(F.col("ga")).cast("bigint").alias("ca"),
            F.sum(F.lit(1) - F.col("ga")).cast("bigint").alias("cb"),
        )
        .transform(pin)  # <= KS_BINS rows; 2 consumers
    )
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    cum = binned.select(
        "bin", F.sum("ca").over(w).alias("cca"), F.sum("cb").over(w).alias("ccb")
    )
    tot = binned.agg(
        F.sum("ca").cast("bigint").alias("na"), F.sum("cb").cast("bigint").alias("nb")
    )
    diffs = cum.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.abs(F.col("cca") * 1.0 / F.col("na") - F.col("ccb") * 1.0 / F.col("nb")).alias(
            "d"
        ),
    )
    best = diffs.orderBy(F.desc("d"), F.asc("bin")).limit(1).select(
        F.col("bin").alias("ks_bin"), "d"
    )
    crit = F.lit(KS_CRIT_COEF) * F.sqrt(
        (F.col("na") + F.col("nb")) * 1.0 / (F.col("na") * F.col("nb"))
    )
    return best.crossJoin(F.broadcast(tot)).select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round("d", 6).alias("ks_stat"),
        F.col("ks_bin").cast("bigint").alias("ks_bin"),
        F.round(crit, 6).alias("crit_05"),
        (F.col("d") > crit).cast("bigint").alias("reject_05"),
    )


# ------------------------------------- Mann-Whitney U rank-sum test

# Location-shift twin of events_ks_two_sample: same two samples, but
# the test statistic is the tie-corrected rank-sum U with a normal
# approximation z (standard Mann-Whitney-Wilcoxon, public). The
# tie-averaged rank sum is computed EXACTLY: everything stays integer
# (2*R1 instead of R1) until the final z division, and the global
# cumulative count over the distinct-value table runs through the
# bucketed two-phase prefix sum — no data-sized single-partition sort.
MW_GROUP_A = "purchase"
MW_GROUP_B = "click"


@query(
    "events_mannwhitney_u",
    oracle=f"""
    WITH s AS (
      SELECT value, CASE WHEN event_type = '{MW_GROUP_A}' THEN 1 ELSE 0 END AS ga
      FROM events WHERE event_type IN ('{MW_GROUP_A}', '{MW_GROUP_B}')
    ), cnt AS (
      SELECT value,
             CAST(sum(ga) AS BIGINT) AS c1,
             CAST(sum(1 - ga) AS BIGINT) AS c2,
             CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY value
    ), cum AS (
      SELECT c1, c2, c,
             sum(c) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS gcum
      FROM cnt
    ), agg AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2,
             CAST(sum(c1 * (2 * gcum - c + 1)) AS BIGINT) AS r2x,
             CAST(sum(c * c * c - c) AS BIGINT) AS tsum
      FROM cum
    )
    SELECT n1 AS n_a, n2 AS n_b,
           round((2 * n1 * n2 + n1 * (n1 + 1) - r2x) / 2.0, 1) AS u_stat,
           round((2 * n1 * n2 + n1 * (n1 + 1) - r2x - n1 * n2)
                 / (2.0 * sqrt(n1 * n2 * 1.0 * (n1 + n2 + 1) / 12.0
                               - n1 * n2 * 1.0 * tsum
                                 / (12.0 * (n1 + n2) * (n1 + n2 - 1)))), 4) AS z_score,
           CAST(CASE WHEN abs((2 * n1 * n2 + n1 * (n1 + 1) - r2x - n1 * n2)
                 / (2.0 * sqrt(n1 * n2 * 1.0 * (n1 + n2 + 1) / 12.0
                               - n1 * n2 * 1.0 * tsum
                                 / (12.0 * (n1 + n2) * (n1 + n2 - 1))))) > 1.96
                THEN 1 ELSE 0 END AS BIGINT) AS reject_05
    FROM agg
    """,
    doc=f"Mann-Whitney U rank-sum test ({MW_GROUP_A!r} vs {MW_GROUP_B!r}): "
    "tie-corrected U with normal-approximation z and alpha=0.05 reject flag — "
    "the robust location test next to the mean-based events_ab_lift and the "
    "shape-based events_ks_two_sample. CONVENTION (ADVICE r8): u_stat is "
    "U2 = n1*n2 + n1*(n1+1)/2 - R1 and z is signed accordingly; "
    "scipy.stats.mannwhitneyu reports U1 = n1*n2 - U2, so a scipy "
    "cross-check sees a mirrored U and a flipped z sign — same |z|, same "
    "reject decision, not a bug. Rank sums stay exact integers (2R1 "
    "form) over the distinct-value count table; the global cumulative count "
    "runs through the bucketed two-phase prefix sum (functions/ordstats), so "
    "no data-sized relation ever crosses an Exchange SinglePartition "
    "(SURVEY §2.4 extension / statistics)",
    tags=("events", "agg", "timeseries"),
)
def events_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    from http_datafusion_spark.functions.ordstats import bucketed_global_rank

    e = load_tables(spark, sf_dir, "events")["events"]
    s = e.filter(F.col("event_type").isin(MW_GROUP_A, MW_GROUP_B)).select(
        "value", (F.col("event_type") == MW_GROUP_A).cast("int").alias("ga")
    )
    cnt = s.groupBy("value").agg(
        F.sum("ga").cast("bigint").alias("c1"),
        F.sum(F.lit(1) - F.col("ga")).cast("bigint").alias("c2"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    cum = bucketed_global_rank(
        cnt, "value", [], rank_name="grk", cumsum_of="c", cumsum_name="gcum"
    )
    agg = cum.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("gcum") - F.col("c") + 1))
        .cast("bigint")
        .alias("r2x"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("bigint")
        .alias("tsum"),
    )
    n1, n2, r2x, tsum = F.col("n1"), F.col("n2"), F.col("r2x"), F.col("tsum")
    u2 = 2 * n1 * n2 + n1 * (n1 + 1) - r2x
    sigma2 = (n1 * n2 * 1.0 * (n1 + n2 + 1) / 12.0) - (
        n1 * n2 * 1.0 * tsum / (12.0 * (n1 + n2) * (n1 + n2 - 1))
    )
    z = (u2 - n1 * n2) / (2.0 * F.sqrt(sigma2))
    return agg.select(
        n1.alias("n_a"),
        n2.alias("n_b"),
        F.round(u2 / 2.0, 1).alias("u_stat"),
        F.round(z, 4).alias("z_score"),
        (F.abs(z) > 1.96).cast("bigint").alias("reject_05"),
    )


# --------------------------------------- watermark lateness audit

# Allowed-lateness sizing for the streaming tier: per user stream
# (arrival order = event_id), an event is DROPPED under watermark
# slack W iff its event time sits more than W behind the stream's
# running max at arrival. The audit sweeps a literal W grid and
# reports the drop fraction per W — the number that sizes
# withWatermark() before a streaming job ships (same decision the 16
# streaming queries' watermarks encode, measured from the batch data).
WATERMARK_SLACKS_SEC = (0, 60, 300, 3600)


@query(
    "events_watermark_lateness_audit",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
    ), r AS (
      SELECT user_id, event_id, tus,
             max(tus) OVER (PARTITION BY user_id ORDER BY event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS runmax_prev
      FROM e
    ), w AS (SELECT CAST(unnest({list(WATERMARK_SLACKS_SEC)}) AS BIGINT) AS slack_sec)
    SELECT CAST(w.slack_sec AS BIGINT) AS slack_sec,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN r.runmax_prev IS NOT NULL
                          AND r.tus < r.runmax_prev - w.slack_sec * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           round(sum(CASE WHEN r.runmax_prev IS NOT NULL
                          AND r.tus < r.runmax_prev - w.slack_sec * 1000000
                     THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS frac_dropped
    FROM r CROSS JOIN w
    GROUP BY w.slack_sec
    ORDER BY slack_sec
    """,
    doc=f"watermark allowed-lateness audit: per user stream (arrival order "
    f"= event_id) the running event-time max is compared with each "
    f"arriving event; for every slack W in {WATERMARK_SLACKS_SEC} seconds "
    f"the audit counts events a withWatermark(W) stream would DROP — the "
    f"out-of-orderness profile that sizes the streaming tier's watermark "
    f"from batch history. One per-user keyed window (microsecond-integer "
    f"running max, contents = one user's stream) + a broadcast "
    f"{len(WATERMARK_SLACKS_SEC)}-row slack grid + a partial agg "
    f"(SURVEY §2.9 support / streaming ops)",
    tags=("events", "timeseries", "window"),
)
def events_watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    tus = F.unix_micros(F.col("ts"))
    r = e.select("user_id", "event_id", tus.alias("tus")).withColumn(
        "runmax_prev",
        F.max("tus").over(
            W.partitionBy("user_id")
            .orderBy("event_id")
            .rowsBetween(W.unboundedPreceding, -1)
        ),
    )
    w = spark.createDataFrame(
        [(s,) for s in WATERMARK_SLACKS_SEC], "slack_sec bigint"
    )
    dropped = (
        F.col("runmax_prev").isNotNull()
        & (F.col("tus") < F.col("runmax_prev") - F.col("slack_sec") * 1_000_000)
    ).cast("long")
    return (
        r.crossJoin(F.broadcast(w))
        .groupBy("slack_sec")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(dropped).cast("bigint").alias("n_dropped"),
            F.round(F.sum(dropped) * 1.0 / F.count(F.lit(1)), 6).alias("frac_dropped"),
        )
        .orderBy("slack_sec")
    )


# ------------------------------------------------ CUPED variance reduction

@query(
    "events_uplift_cuped",
    oracle="""
    WITH span AS (
      -- floor() before comparing: Spark's unix_timestamp() truncates to
      -- whole seconds while DuckDB's epoch() keeps fractional seconds;
      -- an event in the sub-second window around the midpoint would
      -- otherwise flip pre/post on one engine only (same hazard
      -- events_impact_did already guards; r10 ADVICE item 1).
      SELECT CAST(floor(min(epoch(ts))) AS BIGINT) AS lo,
             CAST(floor(max(epoch(ts))) AS BIGINT) AS hi
      FROM events
    ), per_user AS (
      SELECT user_id,
             sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) * 2 < span.lo + span.hi
                      THEN CAST(round(value, 6) AS DECIMAL(18,6))
                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS x,
             sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) * 2 >= span.lo + span.hi
                      THEN CAST(round(value, 6) AS DECIMAL(18,6))
                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS y
      FROM events, span
      GROUP BY user_id
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             covar_pop(CAST(x AS DOUBLE), CAST(y AS DOUBLE)) AS cxy,
             var_pop(CAST(x AS DOUBLE)) AS vx,
             var_pop(CAST(y AS DOUBLE)) AS vy
      FROM per_user
    )
    SELECT n_users,
           round(cxy / vx, 6)                    AS theta,
           round(vy, 4)                          AS var_y,
           round(vy - cxy * cxy / vx, 4)         AS var_y_cuped,
           round((cxy * cxy / vx) / vy, 6)       AS var_reduction
    FROM m
    """,
    doc="CUPED variance reduction (Deng et al. 2013, public — the standard "
    "experimentation-platform technique): per-user pre-period activity X "
    "(first half of the event span, the covariate known before treatment) "
    "and post-period metric Y; theta = cov(X,Y)/var(X) and "
    "var(Y_cuped) = var(Y) - cov^2/var(X) via the closed form (no second "
    "pass over the adjusted column). Reports theta, raw vs adjusted "
    "variance, and the achieved reduction — the sample-size savings an "
    "A/B platform quotes before running the experiment. Per-user sums go "
    "through exact decimals (deterministic inputs to the co-moment "
    "aggregates); one user-keyed shuffle, then 1-row moments "
    "(north-star statistics / experimentation)",
    tags=("events", "agg"),
)
def events_uplift_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    span = e.agg(
        F.min(F.unix_timestamp("ts")).cast("bigint").alias("lo"),
        F.max(F.unix_timestamp("ts")).cast("bigint").alias("hi"),
    )
    v = F.round("value", 6).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    pre = F.unix_timestamp("ts").cast("bigint") * 2 < F.col("lo") + F.col("hi")
    per_user = (
        e.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(pre, v).otherwise(zero)).alias("x"),
            F.sum(F.when(~pre, v).otherwise(zero)).alias("y"),
        )
        .select(F.col("x").cast("double").alias("x"), F.col("y").cast("double").alias("y"))
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.covar_pop("x", "y").alias("cxy"),
        F.var_pop("x").alias("vx"),
        F.var_pop("y").alias("vy"),
    )
    return m.select(
        "n_users",
        F.round(F.col("cxy") / F.col("vx"), 6).alias("theta"),
        F.round(F.col("vy"), 4).alias("var_y"),
        F.round(F.col("vy") - F.col("cxy") * F.col("cxy") / F.col("vx"), 4).alias(
            "var_y_cuped"
        ),
        F.round((F.col("cxy") * F.col("cxy") / F.col("vx")) / F.col("vy"), 6).alias(
            "var_reduction"
        ),
    )


# ----------------------------------------------- Hampel filter

HAMPEL_HALF_WINDOW = 5  # rolling window = 5 preceding + self + 5 following
HAMPEL_K_SCALED = 4.4478  # 3 * 1.4826 (Gaussian MAD consistency), ONE literal
# so both engines compare against the identical double — a 3.0*1.4826
# constant-fold could round differently per engine


@query(
    "ts_hampel_filter",
    oracle=f"""
    WITH win AS (
      SELECT event_type, value,
             list_sort(list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {HAMPEL_HALF_WINDOW} PRECEDING
                        AND {HAMPEL_HALF_WINDOW} FOLLOWING)) AS s
      FROM events
    ), med AS (
      SELECT event_type, value, s, len(s) AS n,
             CASE WHEN len(s) % 2 = 1 THEN s[(len(s) + 1) // 2]
                  ELSE (s[len(s) // 2] + s[len(s) // 2 + 1]) / 2 END AS m
      FROM win
    ), dev AS (
      SELECT event_type, value, m,
             list_sort(list_transform(s, x -> abs(x - m))) AS ds, n
      FROM med
    ), scored AS (
      SELECT event_type,
             CASE WHEN abs(value - m) >
               {HAMPEL_K_SCALED} * (CASE WHEN n % 2 = 1 THEN ds[(n + 1) // 2]
                    ELSE (ds[n // 2] + ds[n // 2 + 1]) / 2 END)
             THEN 1 ELSE 0 END AS flagged
      FROM dev
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)      AS n_points,
           CAST(sum(flagged) AS BIGINT)  AS n_outliers,
           round(sum(flagged) * 1.0 / count(*), 6) AS frac_outliers
    FROM scored GROUP BY event_type ORDER BY event_type
    """,
    doc=f"Hampel filter (rolling robust outlier detection, public): per "
    f"user stream in (ts, event_id) order, each point is compared to "
    f"the exact MEDIAN of its +-{HAMPEL_HALF_WINDOW}-row window, "
    f"flagged when |x - med| > 3 * 1.4826 * rolling MAD — the windowed "
    f"complement of ts_mad_outliers (a level shift poisons a global "
    f"MAD; the rolling window adapts). Both rolling medians are EXACT: "
    f"the window collects into a <= {2 * HAMPEL_HALF_WINDOW + 1}-"
    f"element array (a LITERAL rows-frame bound, so state is O(window) "
    f"per task), sorted and indexed identically on both engines; the "
    f"3*1.4826 threshold ships as one literal so no constant-fold "
    f"rounding can differ. One user-keyed window shuffle, then a "
    f"map-side counting agg (north-star timeseries / cleaning)",
    tags=("timeseries", "window"),
)
def ts_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-HAMPEL_HALF_WINDOW, HAMPEL_HALF_WINDOW)
    )
    s = F.sort_array(F.collect_list("value").over(w))
    n = F.size(F.col("s"))
    med = F.when(
        n % 2 == 1, F.element_at(F.col("s"), ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(F.col("s"), (n / 2).cast("int"))
            + F.element_at(F.col("s"), (n / 2 + 1).cast("int"))
        )
        / 2
    )
    base = e.select("event_type", "value", s.alias("s")).withColumn("m", med)
    ds = F.sort_array(F.transform(F.col("s"), lambda x: F.abs(x - F.col("m"))))
    base = base.withColumn("ds", ds)
    nd = F.size(F.col("ds"))
    mad = F.when(
        nd % 2 == 1, F.element_at(F.col("ds"), ((nd + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(F.col("ds"), (nd / 2).cast("int"))
            + F.element_at(F.col("ds"), (nd / 2 + 1).cast("int"))
        )
        / 2
    )
    flagged = (
        F.abs(F.col("value") - F.col("m")) > F.lit(HAMPEL_K_SCALED) * mad
    ).cast("long")
    return (
        base.select("event_type", flagged.alias("flagged"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum("flagged").cast("bigint").alias("n_outliers"),
            F.round(F.sum("flagged") * 1.0 / F.count(F.lit(1)), 6).alias(
                "frac_outliers"
            ),
        )
        .orderBy("event_type")
    )


HOLT_ALPHA = 0.5  # level smoothing
HOLT_BETA = 0.3  # trend smoothing
HOLT_HOLDOUT = 3  # backtest horizon (months)

# The Holt update in the algebraically-expanded no-reuse form
# (b_t = B*(A*(y - l) + (1-A)*b) + (1-B)*b, so l' never appears inside
# the b expression): identical operation order on both engines gives
# bit-identical doubles. The DuckDB fold carries state as a 2-element
# DOUBLE[] — NOT a struct — because DuckDB's list_reduce evaluates
# struct result fields sequentially against a MUTATED accumulator (the
# 'b' field sees the already-updated 'l'; verified on a toy series),
# while the list form evaluates against the old state like Spark's
# F.aggregate does.


@query(
    "orders_holt_backtest",
    oracle=f"""
    WITH g AS (
      SELECT n.n_name,
             CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT) AS mi,
             CAST(sum(CAST(round(CAST(o.o_totalprice AS DOUBLE), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    bounds AS (SELECT min(mi) AS mn, max(mi) AS mx FROM g),
    grid AS (
      SELECT n_name, m AS mi
      FROM (SELECT DISTINCT n_name FROM g)
      CROSS JOIN (SELECT unnest(generate_series(b.mn, b.mx)) AS m FROM bounds b)
    ),
    fil AS (
      SELECT grid.n_name, grid.mi, coalesce(g.y, CAST(0.0 AS DOUBLE)) AS y
      FROM grid LEFT JOIN g ON g.n_name = grid.n_name AND g.mi = grid.mi
    ),
    ser AS (
      SELECT n_name,
             list_transform(list_sort(list({{'m': mi, 'y': y}})), s -> s.y) AS ys
      FROM fil GROUP BY n_name
    ),
    fitted AS (
      SELECT n_name,
             CAST(len(ys) AS BIGINT) AS n_months,
             ys[len(ys) - {HOLT_HOLDOUT} + 1 : len(ys)] AS actual,
             list_reduce(
               list_transform(ys[1 : len(ys) - {HOLT_HOLDOUT}],
                              v -> [v, CAST(0.0 AS DOUBLE)]),
               (acc, x) -> [
                 {HOLT_ALPHA} * x[1] + (1.0 - {HOLT_ALPHA}) * (acc[1] + acc[2]),
                 {HOLT_BETA} * ({HOLT_ALPHA} * (x[1] - acc[1])
                                + (1.0 - {HOLT_ALPHA}) * acc[2])
                   + (1.0 - {HOLT_BETA}) * acc[2]
               ]
             ) AS st
      FROM ser
    ),
    scored AS (
      SELECT n_name, n_months, st[1] AS level_end, st[2] AS trend_end,
             list_transform(range(1, {HOLT_HOLDOUT} + 1),
               h -> CASE WHEN actual[h] <> 0.0
                         THEN CAST(round(abs((st[1] + h * st[2]) - actual[h])
                                         / abs(actual[h]), 6) AS DECIMAL(18,6))
                    END) AS apes
      FROM fitted
    )
    SELECT n_name, n_months,
           round(level_end, 6) AS level_end,
           round(trend_end, 6) AS trend_end,
           round(CAST(list_sum(list_filter(apes, a -> a IS NOT NULL)) AS DOUBLE)
                 / nullif(len(list_filter(apes, a -> a IS NOT NULL)), 0), 6)
             AS mape_holdout
    FROM scored ORDER BY n_name
    """,
    doc=f"Holt double-exponential-smoothing backtest (Holt 1957/2004; "
    f"Hyndman & Athanasopoulos FPP §8.2) per nation: monthly revenue "
    f"zero-filled onto the global month grid, level+trend recursion "
    f"(alpha={HOLT_ALPHA}, beta={HOLT_BETA}, l0=y1, b0=0) folded over the "
    f"training prefix, last {HOLT_HOLDOUT} months held out, MAPE of the "
    f"h-step forecasts l+h*b — the trend-aware forecasting tier between "
    f"ts_ewma (level only) and orders_seasonal_backtest (seasonal-naive). "
    f"The recursion is INHERENTLY sequential, so it runs as a bounded "
    f"in-plan fold: per-nation month arrays are calendar-bounded (~80 "
    f"elements), built by one grouped collect after the (nation, month) "
    f"aggregate — the same shape both engines fold left-to-right with an "
    f"identical expression tree, so doubles match bit-for-bit. At 100 TB "
    f"the fact scan is the only corpus-sized stage; everything after the "
    f"(25 x months)-row aggregate is constant-bounded (north-star "
    f"timeseries)",
    tags=("timeseries", "relational", "bench_extra"),
)
def orders_holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer", "nation")
    g = (
        t["orders"]
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["nation"], F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("mi"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice").cast("double"), 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("y")
        )
        # nation x month cells: the bounds agg, the zero-fill grid's
        # nation list, and the series left join all consumed it;
        # unpinned each re-derived the 2-join orders aggregation
        # (3 executed scans, r16 3x-class triage). One pass now.
        .transform(pin)
    )
    bounds = g.agg(F.min("mi").alias("mn"), F.max("mi").alias("mx"))
    grid = (
        g.select("n_name")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("n_name", F.explode(F.sequence("mn", "mx")).alias("mi"))
    )
    fil = grid.join(g, ["n_name", "mi"], "left").select(
        "n_name", "mi", F.coalesce("y", F.lit(0.0)).alias("y")
    )
    ser = fil.groupBy("n_name").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("mi", "y"))), lambda s: s["y"]
        ).alias("ys")
    )
    n = F.size("ys")
    train = F.slice(F.col("ys"), 1, n - HOLT_HOLDOUT)
    actual = F.slice(F.col("ys"), n - HOLT_HOLDOUT + 1, HOLT_HOLDOUT)
    A, B = F.lit(HOLT_ALPHA), F.lit(HOLT_BETA)
    st = F.aggregate(
        F.slice(train, 2, F.size(train) - 1),
        F.struct(
            F.element_at(train, 1).alias("l"), F.lit(0.0).alias("b")
        ),
        lambda acc, v: F.struct(
            (A * v + (F.lit(1.0) - A) * (acc["l"] + acc["b"])).alias("l"),
            (
                B * (A * (v - acc["l"]) + (F.lit(1.0) - A) * acc["b"])
                + (F.lit(1.0) - B) * acc["b"]
            ).alias("b"),
        ),
    )
    fitted = ser.select(
        "n_name",
        n.cast("bigint").alias("n_months"),
        actual.alias("actual"),
        st.alias("st"),
    )
    apes = F.transform(
        F.sequence(F.lit(1), F.lit(HOLT_HOLDOUT)),
        lambda h: F.when(
            F.element_at(F.col("actual"), h.cast("int")) != 0.0,
            F.round(
                F.abs(
                    (F.col("st.l") + h * F.col("st.b"))
                    - F.element_at(F.col("actual"), h.cast("int"))
                )
                / F.abs(F.element_at(F.col("actual"), h.cast("int"))),
                6,
            ).cast("decimal(18,6)"),
        ),
    )
    scored = fitted.select(
        "n_name",
        "n_months",
        F.col("st.l").alias("level_end"),
        F.col("st.b").alias("trend_end"),
        F.filter(apes, lambda a: a.isNotNull()).alias("apes_ok"),
    )
    return scored.select(
        "n_name",
        "n_months",
        F.round("level_end", 6).alias("level_end"),
        F.round("trend_end", 6).alias("trend_end"),
        F.round(
            F.aggregate(
                "apes_ok",
                F.lit(0.0).cast("decimal(18,6)"),
                # re-cast each partial: Spark widens DECIMAL(18,6)+ to
                # (19,6) which breaks the accumulator type; the values
                # are sub-1e3 APEs so the narrowing is lossless
                lambda a, x: (a + x).cast("decimal(18,6)"),
            ).cast("double")
            / F.nullif(F.size("apes_ok"), F.lit(0)),
            6,
        ).alias("mape_holdout"),
    ).orderBy("n_name")


# ------------------------------------------- Croston intermittent demand

CROSTON_ALPHA = 0.2  # classic smoothing constant (Croston 1972)
CROSTON_MIN_DEMANDS = 2  # need >= 2 demand weeks to update both EWMAs
CROSTON_TOP = 20


@query(
    "orders_croston_intermittent",
    oracle=f"""
    WITH wk AS (
      SELECT l_partkey,
             CAST(floor(epoch(l_shipdate) / 604800) AS BIGINT) AS w,
             CAST(sum(CAST(round(CAST(l_quantity AS DOUBLE), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) AS d
      FROM lineitem GROUP BY 1, 2
    ),
    mn AS (SELECT min(w) AS w0 FROM wk),
    nz AS (
      SELECT l_partkey, w - w0 + 1 AS pos, d
      FROM wk CROSS JOIN mn WHERE d > 0
    ),
    ser AS (
      SELECT l_partkey,
             list_sort(list({{'p': pos, 'd': d}})) AS s
      FROM nz GROUP BY l_partkey
    ),
    folded AS (
      SELECT l_partkey, CAST(len(s) AS BIGINT) AS n_demand_weeks,
             list_reduce(
               list_prepend([s[1].d, CAST(s[1].p AS DOUBLE)],
                 list_transform(range(2, len(s) + 1),
                   i -> [s[i].d, CAST(s[i].p - s[i-1].p AS DOUBLE)])),
               (acc, x) -> [
                 {CROSTON_ALPHA} * x[1] + (1.0 - {CROSTON_ALPHA}) * acc[1],
                 {CROSTON_ALPHA} * x[2] + (1.0 - {CROSTON_ALPHA}) * acc[2]
               ]
             ) AS st
      FROM ser WHERE len(s) >= {CROSTON_MIN_DEMANDS}
    )
    SELECT l_partkey, n_demand_weeks,
           round(st[1], 6) AS z_hat,
           round(st[2], 6) AS p_hat,
           round(st[1] / st[2], 6) AS croston_fc,
           round((1.0 - {CROSTON_ALPHA} / 2.0) * st[1] / st[2], 6) AS sbc_fc
    FROM folded
    ORDER BY n_demand_weeks DESC, l_partkey ASC
    LIMIT {CROSTON_TOP}
    """,
    doc=f"Croston intermittent-demand forecast (Croston 1972) with the "
    f"Syntetos-Boylan bias correction (SBC 2005, (1-alpha/2) z/p) per "
    f"part: weekly demand from lineitem shipments, then for weeks WITH "
    f"demand two EWMAs — demand size z and inter-demand interval p "
    f"(first interval = weeks since series start) — folded left-to-"
    f"right at alpha={CROSTON_ALPHA}; forecast per week = z/p. The "
    f"supply-chain forecaster for sparse series where Holt/EWMA on the "
    f"zero-filled grid collapses toward 0 between demands (orders_"
    f"holt_backtest's blind spot). Same scale shape as the Holt fold: "
    f"the (part, week) aggregate is the only corpus-sized stage; per-"
    f"part nonzero-week arrays are calendar-bounded (<= |weeks|), the "
    f"fold is one in-plan F.aggregate with the identical expression "
    f"tree both engines evaluate bit-for-bit (doubles; intervals are "
    f"integers), and the top-{CROSTON_TOP} is a "
    f"TakeOrderedAndProject. DuckDB state rides a DOUBLE[2] list, NOT "
    f"a struct — the list_reduce struct-accumulator mutation quirk "
    f"documented at orders_holt_backtest",
    tags=("timeseries", "relational"),
)
def orders_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    wk = li.groupBy(
        "l_partkey",
        F.floor(F.unix_timestamp("l_shipdate") / 604800).cast("bigint").alias("w"),
    ).agg(
        F.sum(F.round(F.col("l_quantity").cast("double"), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("d")
    )
    mn = wk.agg(F.min("w").alias("w0"))
    nz = wk.crossJoin(F.broadcast(mn)).filter(F.col("d") > 0).select(
        "l_partkey", (F.col("w") - F.col("w0") + 1).alias("pos"), "d"
    )
    ser = nz.groupBy("l_partkey").agg(
        F.sort_array(F.collect_list(F.struct("pos", "d"))).alias("s")
    )
    k = F.size("s")
    items = F.transform(
        F.sequence(F.lit(2), k),
        lambda i: F.struct(
            F.element_at(F.col("s"), i.cast("int"))["d"].alias("x"),
            (
                F.element_at(F.col("s"), i.cast("int"))["pos"]
                - F.element_at(F.col("s"), (i - 1).cast("int"))["pos"]
            )
            .cast("double")
            .alias("q"),
        ),
    )
    A = F.lit(CROSTON_ALPHA)
    st = F.aggregate(
        items,
        F.struct(
            F.element_at(F.col("s"), 1)["d"].alias("z"),
            F.element_at(F.col("s"), 1)["pos"].cast("double").alias("p"),
        ),
        lambda acc, x: F.struct(
            (A * x["x"] + (F.lit(1.0) - A) * acc["z"]).alias("z"),
            (A * x["q"] + (F.lit(1.0) - A) * acc["p"]).alias("p"),
        ),
    )
    folded = ser.filter(k >= CROSTON_MIN_DEMANDS).select(
        "l_partkey", k.cast("bigint").alias("n_demand_weeks"), st.alias("st")
    )
    return (
        folded.select(
            "l_partkey",
            "n_demand_weeks",
            F.round(F.col("st.z"), 6).alias("z_hat"),
            F.round(F.col("st.p"), 6).alias("p_hat"),
            F.round(F.col("st.z") / F.col("st.p"), 6).alias("croston_fc"),
            F.round(
                (F.lit(1.0) - A / 2) * F.col("st.z") / F.col("st.p"), 6
            ).alias("sbc_fc"),
        )
        .orderBy(F.col("n_demand_weeks").desc(), F.col("l_partkey").asc())
        .limit(CROSTON_TOP)
    )


# ------------------------------------------- SAX motif discovery

SAX_SEG_DAYS = 7  # PAA segment width (calendar days)
SAX_MOTIF_LEN = 3  # motif = this many consecutive symbols
SAX_TOP = 15
# Gaussian breakpoints for alphabet size 4 (Lin et al. 2003, table 3)
SAX_BP = (-0.6745, 0.0, 0.6745)


@query(
    "ts_sax_motifs",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    ),
    mn AS (SELECT min(day) AS d0 FROM daily),
    paa AS (
      SELECT CAST(floor(datediff('day', mn.d0, daily.day) / {SAX_SEG_DAYS})
                  AS BIGINT) AS seg,
             CAST(sum(CAST(round(rev, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / count(*) AS v
      FROM daily CROSS JOIN mn GROUP BY 1
    ),
    mom AS (
      -- v is segment-mean revenue (~1e6 at sf1); v*v overflows
      -- DECIMAL(18,6), so the moment sums quantize at (38,6)
      SELECT CAST(sum(CAST(round(v, 6) AS DECIMAL(38,6))) AS DOUBLE)
               / count(*) AS mu,
             CAST(sum(CAST(round(v * v, 6) AS DECIMAL(38,6))) AS DOUBLE)
               / count(*) AS m2
      FROM paa
    ),
    sym AS (
      SELECT seg,
             CASE WHEN z < {SAX_BP[0]} THEN 'a'
                  WHEN z < {SAX_BP[1]} THEN 'b'
                  WHEN z < {SAX_BP[2]} THEN 'c'
                  ELSE 'd' END AS c
      FROM (
        SELECT seg, round((v - mu) / sqrt(m2 - mu * mu), 6) AS z
        FROM paa CROSS JOIN mom
      )
    ),
    tri AS (
      SELECT c
             || lead(c, 1) OVER (ORDER BY seg)
             || lead(c, 2) OVER (ORDER BY seg) AS motif
      FROM sym
    )
    SELECT motif, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM tri WHERE motif IS NOT NULL
    GROUP BY motif HAVING count(*) >= 2
    ORDER BY n_occurrences DESC, motif ASC
    LIMIT {SAX_TOP}
    """,
    doc=f"SAX motif discovery (Lin, Keogh et al. 2003 'A Symbolic "
    f"Representation of Time Series'): daily order revenue -> "
    f"{SAX_SEG_DAYS}-day PAA segments -> z-normalized at the segment "
    f"grain -> 4-letter alphabet via the N(0,1) breakpoints "
    f"{SAX_BP} -> counts of recurring {SAX_MOTIF_LEN}-symbol motifs. "
    f"The classic cheap motif/novelty screen that makes cross-series "
    f"pattern search tractable (symbols are join/group keys where raw "
    f"doubles are not) — the discretization front-end ts_cusum_"
    f"changepoints and ts_hampel_filter lack. Everything after the "
    f"day-grain aggregate runs on the |days|/{SAX_SEG_DAYS}-bounded "
    f"segment grain (~340 rows over the 6.5-year span — calendar-"
    f"bounded at any corpus size); z is 6dp-rounded BEFORE the "
    f"breakpoint compare so both engines bucket identically; lead() "
    f"is an offset window (not ranking) on that bounded grain",
    tags=("timeseries", "text", "bench_extra"),
)
def ts_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    q6 = lambda c: F.round(c, 6).cast("decimal(18,6)")  # noqa: E731
    # days-grain series: the min-day agg and the PAA segmenting both
    # consumed it, and paa's two consumers (moments + symbolization)
    # compounded the re-derivation to 4 executed orders scans (r16
    # 4x-class triage). One pass after the pin.
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(q6(F.col("o_totalprice").cast("double"))).cast("double").alias("rev")
    ).transform(pin)
    mn = daily.agg(F.min("day").alias("d0"))
    paa = (
        daily.crossJoin(F.broadcast(mn))
        .groupBy(
            F.floor(F.datediff("day", "d0") / SAX_SEG_DAYS)
            .cast("bigint")
            .alias("seg")
        )
        .agg((F.sum(q6(F.col("rev"))).cast("double") / F.count(F.lit(1))).alias("v"))
    )
    # v*v overflows decimal(18,6) (segment-mean revenue squared), so
    # the moment sums quantize at (38,6) — same note in the oracle
    q38 = lambda c: F.round(c, 6).cast("decimal(38,6)")  # noqa: E731
    mom = paa.agg(
        (F.sum(q38(F.col("v"))).cast("double") / F.count(F.lit(1))).alias("mu"),
        (F.sum(q38(F.col("v") * F.col("v"))).cast("double") / F.count(F.lit(1))).alias(
            "m2"
        ),
    )
    z = F.round(
        (F.col("v") - F.col("mu")) / F.sqrt(F.col("m2") - F.col("mu") * F.col("mu")),
        6,
    )
    sym = paa.crossJoin(F.broadcast(mom)).select(
        "seg",
        F.when(z < SAX_BP[0], "a")
        .when(z < SAX_BP[1], "b")
        .when(z < SAX_BP[2], "c")
        .otherwise("d")
        .alias("c"),
    )
    w = W.orderBy("seg")  # segment grain: calendar-bounded, offset window
    tri = sym.select(
        F.concat(
            F.col("c"), F.lead("c", 1).over(w), F.lead("c", 2).over(w)
        ).alias("motif")
    )
    return (
        tri.filter(F.col("motif").isNotNull())
        .groupBy("motif")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= 2)
        .orderBy(F.col("n_occurrences").desc(), F.col("motif").asc())
        .limit(SAX_TOP)
    )


# --------------------------------------------- cohort LTV curve

_Q6LTV = "CAST(round({x}, 6) AS DECIMAL(18,6))"


@query(
    "orders_cohort_ltv",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mi,
             CAST(o_totalprice AS DOUBLE) AS rev
      FROM orders
    ),
    first AS (
      SELECT o_custkey, CAST(min(mi) AS BIGINT) AS mi0 FROM o GROUP BY o_custkey
    ),
    sizes AS (
      SELECT mi0, CAST(count(*) AS BIGINT) AS n_users FROM first GROUP BY mi0
    ),
    cell AS (
      SELECT f.mi0, o.mi - f.mi0 AS offs,
             CAST(sum({_Q6LTV.format(x='o.rev')}) AS DOUBLE) AS rev
      FROM o JOIN first f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT mi0, offs,
             sum({_Q6LTV.format(x='rev')}) OVER (PARTITION BY mi0 ORDER BY offs
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
      FROM cell
    )
    SELECT concat(CAST((c.mi0 - 1) // 12 AS VARCHAR), '-',
                  lpad(CAST(c.mi0 - ((c.mi0 - 1) // 12) * 12 AS VARCHAR), 2, '0'))
             AS cohort_month,
           CAST(c.offs AS BIGINT) AS month_offset,
           s.n_users,
           round(CAST(c.cum_rev AS DOUBLE) / s.n_users, 6)
             AS cum_revenue_per_user
    FROM cum c JOIN sizes s ON c.mi0 = s.mi0
    ORDER BY cohort_month, month_offset
    """,
    doc="cohort LTV curve (the cumulative-revenue-per-user matrix behind "
    "every lifetime-value model — Fader & Hardie's empirical starting "
    "point): customers grouped by first-order month (engine-neutral "
    "integer month key year*12+month, the orders_holt_backtest "
    "convention), revenue accumulated per (cohort, month-offset) cell "
    "and divided by cohort size — read along a row for a cohort's "
    "payback trajectory, down a column for cohort-quality drift "
    "(events_retention counts PRESENCE, this weighs it by money). Two "
    "customer-keyed aggregates on the fact scan, then every window "
    "runs on the |months|^2-bounded cohort x offset grain; revenue "
    "sums 6dp-decimal at both the cell and the cumulative step so the "
    "running sums are engine-identical",
    tags=("orders", "timeseries", "bench_extra"),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")["orders"]

    def q6(c):
        return F.round(c, 6).cast("decimal(18,6)")

    o = t.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("mi"),
        F.col("o_totalprice").cast("double").alias("rev"),
    )
    # customer-grain first-order frame (the RFM pin precedent): the
    # cohort-size agg and the revenue-cell join both consumed it;
    # unpinned each re-derived the orders scan (3 executed scans, r16
    # 3x-class triage). The remaining 2 passes (first-order + revenue
    # cells) are the cohort shape's floor.
    first = o.groupBy("o_custkey").agg(
        F.min("mi").cast("bigint").alias("mi0")
    ).transform(pin)
    sizes = first.groupBy("mi0").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    cell = (
        o.join(first, "o_custkey")
        .groupBy("mi0", (F.col("mi") - F.col("mi0")).alias("offs"))
        .agg(F.sum(q6(F.col("rev"))).cast("double").alias("rev"))
    )
    w = W.partitionBy("mi0").orderBy("offs").rowsBetween(W.unboundedPreceding, 0)
    cum = cell.select("mi0", "offs", F.sum(q6(F.col("rev"))).over(w).alias("cum_rev"))
    yr = F.floor((F.col("mi0") - 1) / 12)
    return (
        cum.join(sizes, "mi0")
        .select(
            F.concat(
                yr.cast("bigint").cast("string"),
                F.lit("-"),
                F.lpad((F.col("mi0") - yr * 12).cast("bigint").cast("string"), 2, "0"),
            ).alias("cohort_month"),
            F.col("offs").cast("bigint").alias("month_offset"),
            "n_users",
            F.round(F.col("cum_rev").cast("double") / F.col("n_users"), 6).alias(
                "cum_revenue_per_user"
            ),
        )
        .orderBy("cohort_month", "month_offset")
    )


# --------------------------------------- burstiness profile (Goh-Barabasi)

BURST_MIN_GAPS = 8  # users with fewer inter-event gaps are not scored
BURST_FLAG = 0.1  # B above this reads as bursty (B=0 is Poisson)

_Q6B = "CAST(round({x}, 6) AS DECIMAL(18,6))"
_Q6BW = "CAST(round({x}, 6) AS DECIMAL(38,6))"  # squared-seconds sums


@query(
    "events_burstiness_profile",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             round((epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
               / 1000000.0, 6) AS g
      FROM events
    ),
    gaps AS (SELECT user_id, g FROM seq WHERE g IS NOT NULL),
    pu AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_Q6B.format(x='g')}) AS DOUBLE) AS s,
             CAST(sum({_Q6BW.format(x='g * g')}) AS DOUBLE) AS t
      FROM gaps GROUP BY user_id
    ),
    scored AS (
      SELECT n,
             round((sqrt(t / n - (s / n) * (s / n)) - s / n)
                   / (sqrt(t / n - (s / n) * (s / n)) + s / n), 6) AS b
      FROM pu
      WHERE n >= {BURST_MIN_GAPS}
        AND sqrt(t / n - (s / n) * (s / n)) + s / n > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users_scored,
           round(CAST(sum({_Q6B.format(x='b')}) AS DOUBLE) / count(*), 6)
             AS mean_burstiness,
           round(CAST(sum(CASE WHEN b > {BURST_FLAG} THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS frac_bursty
    FROM scored
    """,
    doc=f"per-user burstiness of inter-event times (Goh & Barabasi 2008 "
    f"EPL: B = (sigma - mu)/(sigma + mu) over a user's gap sequence — "
    f"B=0 is Poisson arrivals, B->1 is heavy bursts, B<0 is "
    f"pacemaker-regular), averaged over users with >= {BURST_MIN_GAPS} "
    f"gaps plus the fraction above {BURST_FLAG} — the temporal-pattern "
    f"complement of events_arrival_dispersion (that one measures "
    f"count-per-minute dispersion CORPUS-wide; this measures each "
    f"user's own rhythm, the signal behind bot-vs-human and "
    f"session-boundary heuristics). Gaps come from one user-keyed lag "
    f"window (natural per-entity key — group size tracks user "
    f"activity, not corpus size), 6dp-rounded in SECONDS so the "
    f"squared sums fit DECIMAL(38,6) (day-scale gaps in microseconds "
    f"would overflow (18,6) squares — the ts_sax_motifs lesson); "
    f"per-user moments then a 1-row reduce, everything else "
    f"map-side-combinable",
    tags=("events", "timeseries"),
)
def events_burstiness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    tus = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy(tus, F.col("event_id"))
    seq = e.select(
        "user_id",
        F.round((tus - F.lag(tus).over(w)) / F.lit(1000000.0), 6).alias("g"),
    )
    gaps = seq.filter(F.col("g").isNotNull())
    pu = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("g"), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("s"),
        F.sum(F.round(F.col("g") * F.col("g"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("t"),
    )
    mu = F.col("s") / F.col("n")
    sd = F.sqrt(F.col("t") / F.col("n") - mu * mu)
    scored = pu.filter(
        (F.col("n") >= BURST_MIN_GAPS) & (sd + mu > 0)
    ).select(F.round((sd - mu) / (sd + mu), 6).alias("b"))
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users_scored"),
        F.round(
            F.sum(F.round(F.col("b"), 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_burstiness"),
        F.round(
            F.sum(F.when(F.col("b") > BURST_FLAG, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("frac_bursty"),
    )


# --------------------------------------- CUSUM drift detection (Page)

CUSUM_H_SIGMA = 5.0  # alarm threshold in daily-count sigmas
CUSUM_K_SIGMA = 0.5  # slack (reference drift) in sigmas

_Q6C = "CAST(round({x}, 6) AS DECIMAL(18,6))"

# Batch/stream-shared CUSUM-over-daily-counts SQL: everything AFTER the
# daily count table, so the streaming twin can reuse it verbatim as its
# oracle (its micro-batched complete-mode aggregate produces the same
# daily table the batch scan does).
_CUSUM_FROM_DAILY_SQL = f"""
    params AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS DOUBLE) / count(*) AS mu,
             sqrt(CAST(sum(x * x) AS DOUBLE) / count(*)
                  - (CAST(sum(x) AS DOUBLE) / count(*))
                    * (CAST(sum(x) AS DOUBLE) / count(*))) AS sd
      FROM daily GROUP BY 1
    ),
    dev AS (
      SELECT d.event_type, d.day, p.n_days, p.mu, p.sd,
             CAST(d.x AS DECIMAL(18,6))
               - {_Q6C.format(x='p.mu')}
               - {_Q6C.format(x=f'{CUSUM_K_SIGMA} * p.sd')} AS dv
      FROM daily d JOIN params p USING (event_type)
    ),
    cum AS (
      SELECT event_type, day, n_days, mu, sd,
             sum(dv) OVER (PARTITION BY event_type ORDER BY day
                           ROWS UNBOUNDED PRECEDING) AS s_t
      FROM dev
    ),
    stat AS (
      SELECT event_type, day, n_days, mu, sd,
             round({CUSUM_H_SIGMA} * sd, 6) AS h,
             CAST(s_t - least(CAST(0 AS DECIMAL(18,6)),
                              min(s_t) OVER (PARTITION BY event_type
                                             ORDER BY day
                                             ROWS UNBOUNDED PRECEDING))
                  AS DOUBLE) AS g
      FROM cum
    )
    SELECT event_type,
           CAST(max(n_days) AS BIGINT) AS n_days,
           round(max(mu), 6) AS mean_daily,
           round(max(sd), 6) AS sigma_daily,
           round(max(h), 6) AS threshold,
           round(max(g), 6) AS max_stat,
           CAST(sum(CASE WHEN g > h THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarm_days,
           min(CASE WHEN g > h THEN CAST(day AS VARCHAR) END)
             AS first_alarm_day
    FROM stat GROUP BY event_type ORDER BY event_type
"""

_CUSUM_ORACLE_SQL = f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
{_CUSUM_FROM_DAILY_SQL}
"""


def cusum_from_daily(daily: DataFrame) -> DataFrame:
    """Page (1954) one-sided CUSUM over a per-(event_type, day) count
    table — the scan both the batch query and the streaming monitor
    share. ``daily`` has columns (event_type, day DATE, x BIGINT); its
    size is |event_type| x |days|, calendar-bounded at any corpus
    scale, so every window here runs over a tiny table."""
    dec6 = "decimal(18,6)"
    # Per-type mu/sd as UNBOUNDED windows over the day-grain table
    # instead of a groupBy + broadcast-join-back: the join form made
    # Spark derive `daily` twice (two full fact scans in the physical
    # plan — the r14 .explain audit); the window form is ONE scan, one
    # event_type shuffle, and the partition contents are |days|-bounded
    # at any corpus size. Same arithmetic, same doubles, oracle
    # untouched. (This also retires the rename workaround the join
    # needed against streaming memory-sink self-join attribute clashes.)
    wfull = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    n_days = F.count(F.lit(1)).over(wfull).cast("bigint")
    mu = F.sum("x").over(wfull).cast("double") / n_days
    sd = F.sqrt(
        F.sum(F.col("x") * F.col("x")).over(wfull).cast("double") / n_days
        - mu * mu
    )
    dev = daily.select(
        "event_type",
        "day",
        n_days.alias("n_days"),
        mu.alias("mu"),
        sd.alias("sd"),
        (
            F.col("x").cast(dec6)
            - F.round(mu, 6).cast(dec6)
            - F.round(F.lit(CUSUM_K_SIGMA) * sd, 6).cast(dec6)
        ).alias("dv"),
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = dev.select(
        "event_type", "day", "n_days", "mu", "sd",
        F.sum("dv").over(wcum).alias("s_t"),
    )
    stat = cum.select(
        "event_type", "day", "n_days", "mu", "sd",
        F.round(F.lit(CUSUM_H_SIGMA) * F.col("sd"), 6).alias("h"),
        (
            F.col("s_t")
            - F.least(F.lit(0).cast(dec6), F.min("s_t").over(wcum))
        ).cast("double").alias("g"),
    )
    alarm = F.col("g") > F.col("h")
    return (
        stat.groupBy("event_type")
        .agg(
            F.max("n_days").cast("bigint").alias("n_days"),
            F.round(F.max("mu"), 6).alias("mean_daily"),
            F.round(F.max("sd"), 6).alias("sigma_daily"),
            F.round(F.max("h"), 6).alias("threshold"),
            F.round(F.max("g"), 6).alias("max_stat"),
            F.sum(F.when(alarm, 1).otherwise(0)).cast("bigint").alias("n_alarm_days"),
            # ISO string, not DATE: a NULL date surfaces as pandas NaT on
            # one engine and None on the other — renders apart. ISO
            # strings min lexicographically = chronologically.
            F.min(F.when(alarm, F.col("day").cast("string"))).alias(
                "first_alarm_day"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "events_cusum_drift",
    oracle=_CUSUM_ORACLE_SQL,
    doc=f"one-sided CUSUM drift detector (Page 1954 Biometrika) over each "
    f"event_type's DAILY arrival counts: g_t = max(0, g_t-1 + x_t - mu - "
    f"k*sigma) via the scan identity g_t = S_t - min(0, min_prefix S) with "
    f"S the cumulative slack-adjusted deviation, alarming when g exceeds "
    f"h = {CUSUM_H_SIGMA} sigma with slack k = {CUSUM_K_SIGMA} sigma — the "
    f"classic sequential change-point monitor a pipeline points at its "
    f"ingest volumes (ts_cusum_changepoints is the OFFLINE single-"
    f"change-point LOCATION estimator — argmax |CUSUM| over per-event "
    f"deviations; this is the day-grain sequential ALARM with slack and "
    f"threshold, plus stream_cusum_monitor as its live twin; "
    f"events_burstiness_profile scores per-user rhythm, "
    f"quality_drift_psi distribution shift). Day-grain per type: "
    f"the windows run over |event_type| x |days| rows — calendar-bounded "
    f"at ANY corpus size after one map-side-combinable count agg. "
    f"Deviations are exact DECIMAL(18,6) (integer counts minus "
    f"6dp-quantized mu and slack), so the cumulative sum and running min "
    f"are order-exact on both engines; doubles appear only in the final "
    f"rounded readouts",
    tags=("events", "timeseries"),
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    return cusum_from_daily(daily)
