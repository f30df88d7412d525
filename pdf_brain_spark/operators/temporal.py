"""Temporal join operators (beyond-reference: SURVEY §2.3 notes the
reference has no as-of/interval joins). Spark has no ASOF JOIN; the
standard formulations are:

  * asof_backward_join — union-and-window: tag both inputs, sort once per
    key by (ts, side), carry the most recent right-side row forward with
    last(..., ignorenulls). ONE shuffle on the key, no join operator at
    all, output size = |left|. The alternative (range join on a time
    band) explodes on wide bands and silently misses matches beyond the
    band; this form is exact for unbounded lookback.

  * bucketized range joins live in queries.events_range_join: equi-join
    on (key, time-bucket) with bounded fan-out, for bounded intervals.

At 100 TB both sides co-partition by the key and the window is a single
pass; skewed keys (one user with millions of events) are the only
hotspot, mitigated upstream by salting once the per-key row count breaks
executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_backward_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, the most recent right row with
    right_ts <= left_ts and the same key (ties: the right row at exactly
    left_ts counts — "at or before"). Returns all left columns plus
    `{prefix}ts` and `{prefix}<payload>` columns (NULL when no right row
    precedes the left row)."""
    from pyspark.sql import Window

    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l2 = left.select(
        F.col(key_col).alias("_key"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        l_struct.alias("_lrow"),
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("_rts"),
        *[
            F.lit(None).cast(dict(right.dtypes)[p]).alias(f"_p_{p}")
            for p in payload_cols
        ],
    )
    r2 = right.select(
        F.col(key_col).alias("_key"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l2.schema["_lrow"].dataType).alias("_lrow"),
        F.col(right_ts).alias("_rts"),
        *[F.col(p).alias(f"_p_{p}") for p in payload_cols],
    )
    # right rows sort before left rows at equal ts so "at or before"
    # includes the tie
    w = (
        Window.partitionBy("_key")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        l2.unionByName(r2)
        .withColumn(f"{prefix}ts", F.last("_rts", ignorenulls=True).over(w))
        .withColumn(
            "_payload_struct",
            F.last(
                F.when(
                    F.col("_side") == 0,
                    F.struct(*[F.col(f"_p_{p}").alias(p) for p in payload_cols]),
                ),
                ignorenulls=True,
            ).over(w),
        )
    )
    return carried.filter(F.col("_side") == 1).select(
        "_lrow.*",
        f"{prefix}ts",
        *[F.col(f"_payload_struct.{p}").alias(f"{prefix}{p}") for p in payload_cols],
    )


def tiered_time_rollup(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    value_col: str,
    tiers: list[tuple[str, str]] = (("1h", "1 hour"), ("1d", "1 day")),
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the finest tier
    aggregates the raw rows ONCE; every coarser tier re-aggregates the
    previous tier's partials instead of rescanning the facts — at 100 TB
    the daily tier reads hours (×24 reduction), not raw events. Emits the
    union of tiers tagged by a `tier` column with columns
    (…group_cols, tier, window_start, n_events, total_value); total_value
    is rounded to 4 decimals at emission, partials stay exact."""
    finest_label, finest_span = tiers[0]
    cur = (
        df.groupBy(*group_cols, F.window(ts_col, finest_span).alias("w"))
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(value_col).alias("_sv"))
        .select(*group_cols, F.col("w.start").alias("window_start"), "_n", "_sv")
    )
    if len(tiers) > 1:
        # without this, each coarser tier's union branch re-scans the FACTS
        # and recomputes the finest aggregate (Catalyst's ReuseExchange
        # can't match the branches) — pinning the finest partials means
        # coarser tiers genuinely read them. localCheckpoint, not cache():
        # cache() entries live in the CacheManager until someone calls
        # unpersist, which a lazy operator can't do safely (the caller
        # collects after we return) — so repeated invocations in a
        # long-lived session would accumulate. Checkpoint blocks are
        # reclaimed by the ContextCleaner when the DataFrame goes out of
        # scope. In production the finest tier is a materialized
        # continuous-aggregate table; this is its in-plan stand-in.
        cur = cur.localCheckpoint(eager=True)
    out = cur.select(
        *group_cols,
        F.lit(finest_label).alias("tier"),
        "window_start",
        F.col("_n").alias("n_events"),
        F.round("_sv", 4).alias("total_value"),
    )
    for label, span in tiers[1:]:
        cur = (
            cur.groupBy(*group_cols, F.window("window_start", span).alias("w"))
            .agg(F.sum("_n").alias("_n"), F.sum("_sv").alias("_sv"))
            .select(*group_cols, F.col("w.start").alias("window_start"), "_n", "_sv")
        )
        out = out.unionByName(
            cur.select(
                *group_cols,
                F.lit(label).alias("tier"),
                "window_start",
                F.col("_n").alias("n_events"),
                F.round("_sv", 4).alias("total_value"),
            )
        )
    return out


def asof_backward_join_salted(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
    bucket_span: str = "1 hour",
) -> DataFrame:
    """Skew-hardened as-of: identical semantics to asof_backward_join,
    but the per-key window is SALTED BY TIME BUCKET so a hot key (one
    user with millions of events) never lands in a single task.

    Two exact passes instead of one skewed one:
      1. within-bucket as-of — the same union-and-window carry, with the
         window partitioned by (key, bucket): per-task input is bounded
         by the bucket's row count, not the key's.
      2. boundary carry-in — per (key, bucket) the LAST right row is a
         one-row summary; a window over the per-key bucket axis (rows =
         buckets, not events) carries the most recent summary from
         STRICTLY EARLIER buckets into each bucket; a left row whose
         bucket had no preceding right row coalesces to that carry-in.

    The bucket axis is the union of both sides' buckets, so a left
    bucket with no right rows still receives carry-in. Tune bucket_span
    so the hottest (key, bucket) fits a task — the same knob as any
    salt count."""
    from pyspark.sql import Window

    r_ts_type = dict(right.dtypes)[right_ts]
    p_types = dict(right.dtypes)

    bkt = lambda c: F.window(F.col(c), bucket_span)["start"]  # noqa: E731

    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l2 = left.select(
        F.col(key_col).alias("_key"),
        bkt(left_ts).alias("_bkt"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        l_struct.alias("_lrow"),
        F.lit(None).cast(r_ts_type).alias("_rts"),
        *[F.lit(None).cast(p_types[p]).alias(f"_p_{p}") for p in payload_cols],
    )
    r2 = right.select(
        F.col(key_col).alias("_key"),
        bkt(right_ts).alias("_bkt"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l2.schema["_lrow"].dataType).alias("_lrow"),
        F.col(right_ts).alias("_rts"),
        *[F.col(p).alias(f"_p_{p}") for p in payload_cols],
    )
    # pass 1: carry within (key, bucket) — bounded per-task input
    w = (
        Window.partitionBy("_key", "_bkt")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rstruct = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_rts").alias("_rts"),
            *[F.col(f"_p_{p}").alias(p) for p in payload_cols],
        ),
    )
    within = (
        l2.unionByName(r2)
        .withColumn("_in_bkt", F.last(rstruct, ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select("_key", "_bkt", "_lrow", "_in_bkt")
    )

    # pass 2: per-(key, bucket) last right row — one summary row per bucket
    summaries = (
        r2.groupBy("_key", "_bkt")
        .agg(F.max_by(rstruct, F.col("_ts")).alias("_last"))
    )
    axis = (
        l2.select("_key", "_bkt")
        .unionByName(r2.select("_key", "_bkt"))
        .distinct()
        .join(summaries, ["_key", "_bkt"], "left")
    )
    # window over BUCKETS per key (tiny), strictly-earlier carry
    wb = (
        Window.partitionBy("_key")
        .orderBy(F.col("_bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = axis.select(
        "_key", "_bkt", F.last("_last", ignorenulls=True).over(wb).alias("_carry")
    )

    eff = F.coalesce(F.col("_in_bkt"), F.col("_carry"))
    return (
        within.join(carry, ["_key", "_bkt"], "left")
        .withColumn("_eff", eff)
        .select(
            "_lrow.*",
            F.col("_eff._rts").alias(f"{prefix}ts"),
            *[F.col(f"_eff.{p}").alias(f"{prefix}{p}") for p in payload_cols],
        )
    )
