"""Structured Streaming extensions (SURVEY §2.10: the reference has no
streaming; these are flagged beyond-reference, built on the events table
shape). Two pipelines:

  * windowed_event_counts: readStream → watermark → tumbling window agg.
    The batch twin (queries.events_tumbling_window) is the oracle; the
    streaming test runs Trigger.AvailableNow over the same files and
    asserts equality — late rows beyond the watermark would be dropped in
    continuous mode.

  * streaming_ingest: file-source stream of document files → foreachBatch
    running the batch chunk/embed pipeline (operators/ingest.py). This is
    the reference's incremental `ingest` command (J7 dedup included) as a
    continuously-running job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    schema = schema or (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts with late-data bound. In append mode a window
    closes once the watermark passes; AvailableNow processing of a static
    directory yields the batch-equivalent result."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select("event_type", F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def run_available_now(stream_df: DataFrame, checkpoint_dir: str, out_dir: str) -> None:
    """Drain everything currently in the source (Trigger.AvailableNow),
    write parquet, stop. The batch-parity harness for streaming tests."""
    q = (
        stream_df.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()


SESSION_GAP_MINUTES = 30


def streaming_sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES):
    """Custom stateful streaming operator via applyInPandasWithState
    (SURVEY §2.11: the route for operators Spark lacks natively): per-user
    sessionization with explicit state.

    State per user = the currently-open session (start, last_ts, count).
    Each micro-batch sorts the user's new events, closes sessions whenever
    a gap ≥ gap_minutes is observed, EMITS the closed sessions, and parks
    the trailing open session back in state. On a bounded AvailableNow run
    the emitted set is therefore exactly 'every session except each user's
    last' — deterministic, so the batch lag-gap SQL minus last-session is
    its oracle. Scale: state is one tuple per active user, partitioned by
    the groupBy key; no executor holds more than its hash-share of users."""
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def _sessionize(key, pdf_iter, state):
        rows = pd.concat(list(pdf_iter))
        if rows.empty:
            return
        rows = rows.sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000  # datetime64[ns] → micros

        if state.exists:
            s_start, s_last, s_count = state.get
        else:
            s_start, s_last, s_count = None, None, 0

        out = []
        for t in ts_us:
            if s_start is None:
                s_start, s_last, s_count = int(t), int(t), 1
            elif t - s_last >= gap_us:
                out.append((key[0], s_start, s_last, s_count))
                s_start, s_last, s_count = int(t), int(t), 1
            else:
                s_last, s_count = int(t), s_count + 1
        state.update((s_start, s_last, s_count))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": pd.to_datetime([o[1] for o in out], unit="us"),
                    "session_end": pd.to_datetime([o[2] for o in out], unit="us"),
                    "n_events": [o[3] for o in out],
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=(
                "user_id long, session_start timestamp, "
                "session_end timestamp, n_events long"
            ),
            stateStructType="session_start long, last_ts long, n_events long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_ingest(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    markdown: bool = False,
):
    """File-source stream → foreachBatch batch-ingest. Each micro-batch
    reuses the full batch pipeline, so dedup/id/chunk semantics are
    identical to one-shot ingest."""
    from pdf_brain_spark.operators.ingest import ingest

    files = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .load(watch_dir)
        .select(F.input_file_name().alias("path"), F.col("value").alias("content"))
    )

    def _each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            ingest(spark, batch_df, out_dir, markdown=markdown)

    return (
        files.writeStream.foreachBatch(_each_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream
    broadcast-joins a STATIC dimension (user profile / segment table).
    This is the standard streaming enrichment shape — the static side is
    re-read per batch if its underlying files change, no state store is
    involved (unlike stream-stream joins), and with a broadcastable dim
    the per-batch plan is a map-side hash join: no shuffle of the stream.
    At 100 TB the dim is a compacted table maintained by the batch tier;
    left join keeps unmatched events (late dim arrival tolerated)."""
    return events.join(F.broadcast(dim), key, "left")


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: left events match right
    events of the same key whose timestamp falls within [left.ts,
    left.ts + within]. Both sides carry watermarks so the state store
    evicts rows once they can no longer match (state is bounded by
    watermark + join window, the only way a stream-stream join survives
    unbounded input). The time-bound predicate is what lets Spark derive
    the state cleanup condition — an unconstrained stream-stream join
    would keep both sides forever."""
    l = left.withWatermark("ts", left_watermark).alias("l")
    r = right.withWatermark("ts", right_watermark).alias("r")
    return l.join(
        r,
        F.expr(
            f"l.{key} = r.{key} AND r.ts >= l.ts AND r.ts <= l.ts + interval {within}"
        ),
    ).select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_event_id"),
        F.col("r.event_id").alias("right_event_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
    )


def make_incremental_dedup_batch_fn(
    spark: SparkSession, index_dir: str, candidates_dir: str
):
    """The per-micro-batch body of streaming_incremental_dedup, exposed so
    replay behavior is directly testable: calling it twice with the same
    (batch_df, batch_id) must produce byte-identical candidates/index
    state (tests/test_ingest_and_streaming.py)."""

    def _each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pdf_brain_spark.operators.dedup import (
            incremental_lsh_candidates,
            minhash_banded_index,
        )
        from pdf_brain_spark.streaming.generations import (
            coverage,
            generation_ids,
            live_generation_ids,
        )

        new_banded = minhash_banded_index(batch_df).localCheckpoint(eager=True)
        # Probe only band rows from STRICTLY EARLIER batches, resolved
        # through the generation protocol (streaming/generations.py): the
        # kept-rows selection excludes dirs superseded by a compacted
        # generation AND rows tombstoned by delete_documents, so the
        # probe is correct mid-compaction, after a compactor crash, and
        # after deletions. Coverage < batch_id keeps the replay
        # guarantee — on a replay of batch N after a crash between the
        # subdir write and the checkpoint commit, batch N's own
        # (possibly partial) rows are excluded, making the probe set
        # identical to the first attempt. Selecting explicit generation
        # dirs prunes at the driver, the same effect as the former
        # batch_id < N PartitionFilter.
        probe_gens = [
            g
            for g in live_generation_ids(generation_ids(spark, index_dir))
            if coverage(g) < batch_id
        ]
        if probe_gens:
            from pdf_brain_spark.streaming.generations import kept_index_rows

            index_banded = kept_index_rows(
                spark, index_dir, ["doc_id"], upto=batch_id - 1
            ).drop("batch_id")
            cands = incremental_lsh_candidates(index_banded, new_banded)
        else:
            # first batch: no index yet — dedup within the batch only
            cands = incremental_lsh_candidates(new_banded.limit(0), new_banded)
        # Idempotent replay: each batch OVERWRITES its own batch_id=N
        # subdirectory, so re-running a micro-batch after a crash cannot
        # duplicate candidate pairs or band rows — the at-least-once
        # foreachBatch contract composes to effectively-once output
        # without a transactional table format.
        from pdf_brain_spark.streaming.generations import stamp_protocol

        stamp_protocol(spark, candidates_dir)
        stamp_protocol(spark, index_dir)
        cands.write.mode("overwrite").parquet(
            f"{candidates_dir}/batch_id={batch_id}"
        )
        new_banded.write.mode("overwrite").parquet(
            f"{index_dir}/batch_id={batch_id}"
        )

    return _each_batch


def compact_band_index(
    spark: SparkSession, index_dir: str, upto_batch_id: int, n_files: int = 8
) -> int:
    """Compact the incremental-dedup band index: merge every live
    generation covering ≤ upto_batch_id into ONE compacted generation. A
    continuous crawl accrues one small directory per micro-batch — at
    100 TB that is the classic small-files problem (file listing and
    footer reads come to dominate the probe); consolidation preserves
    every future batch's probe set exactly because the compacted
    generation covers precisely the batches it replaced.

    READER-SAFE: the consolidated data is written aside, renamed into a
    NEGATIVE `batch_id=-(m+1)` generation in one atomic directory move, and
    only then are the superseded dirs deleted — a concurrent reader
    resolving generations through streaming/generations.py sees the
    pre- or post-compaction set, never a partial mixture (asserted by
    the mid-compaction read test). Only compact batches the stream's
    checkpoint has committed: a replay can only re-run the LAST
    uncommitted batch, so `upto_batch_id` should be below it. Returns
    the number of generations merged.

    TOMBSTONE-AWARE: deletions (delete_documents) with floor ≤
    upto_batch_id are materialized and their dirs retired.

    All filesystem access goes through the Hadoop FileSystem API, so the
    same code compacts local-disk, HDFS, and object-store indexes."""
    from pdf_brain_spark.streaming.generations import compact_index_rows

    def _write_kept(kept, tmp: str) -> None:
        kept.coalesce(max(1, n_files)).write.mode("overwrite").parquet(tmp)

    return compact_index_rows(
        spark, index_dir, upto_batch_id, ["doc_id"], _write_kept
    )


def delete_documents(
    spark: SparkSession,
    index_dir: str,
    doc_ids: DataFrame,
    floor_batch_id: int,
) -> None:
    """Delete documents from the persisted LSH band index — the takedown
    operation (revoked licence, opted-out content) on the append-only
    dedup store: a tombstone generation records the doc ids, every probe
    immediately excludes their band rows (a deleted document stops
    generating candidate pairs), and the next compaction materializes
    the removal. A document re-ingested after the floor is a fresh
    insert and participates again."""
    from pdf_brain_spark.streaming.generations import write_tombstones

    write_tombstones(
        spark, index_dir, doc_ids.select("doc_id"), floor_batch_id
    )


def streaming_incremental_dedup(
    spark: SparkSession,
    new_docs_stream: DataFrame,
    index_dir: str,
    candidates_dir: str,
    checkpoint_dir: str,
):
    """Continuous-crawl dedup driver: a stream of arriving documents is
    deduplicated against the PERSISTED banded LSH index via foreachBatch —
    each micro-batch (1) bands its documents, (2) probes index ∪ batch for
    candidate pairs involving a batch document, (3) writes its candidates
    and bands under batch_id=N subdirectories so later batches dedup
    against the accumulated index. Per-batch work scales with the batch
    (operators/dedup.py::incremental_lsh_candidates); the index grows by
    exactly the batch's band rows — the streaming composition of the
    batch-gated dedup_incremental_minhash semantics.

    Replay-idempotent: each batch overwrites its own batch_id=N subdir and
    probes only batch_id < N, so a foreachBatch replay after a crash
    reproduces the first attempt exactly (see
    make_incremental_dedup_batch_fn). Consumers read candidates_dir as
    one partitioned table; a document re-delivered across batches can
    re-emit a pair under two batch_ids — distinct (doc_a, doc_b) on read
    if the upstream is at-least-once."""
    return (
        new_docs_stream.writeStream.foreachBatch(
            make_incremental_dedup_batch_fn(spark, index_dir, candidates_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def make_rollup_batch_fn(rollup_dir: str):
    """Per-micro-batch body for incremental rollup maintenance: each
    batch writes its OWN hourly partial aggregates (event_type, hour,
    n, sum) under `batch_id=N` — never touching other generations, so a
    foreachBatch replay overwrites its own subdir and the at-least-once
    contract composes to effectively-once, exactly like the LSH band
    index and the ANN ingest. The persisted table is PARTIALS; reading
    the rollup re-aggregates them (read_rollup), which is sound because
    count and sum are associative — the same "coarser tiers read finer
    partials, never facts" principle as tiered_time_rollup, extended in
    the time dimension: per-batch work is one aggregate over the BATCH,
    however large the rollup history grows. Late-arriving events simply
    contribute another partial for an old hour; no read-modify-write of
    existing buckets ever happens."""

    def _each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Partials carry a CENT-SCALED INTEGER sum, not a float sum:
        # read_rollup re-sums partials in arbitrary order, and float
        # addition order across engines is exactly the 6-decimal
        # rounding-boundary flake class gapfill_locf already hit and
        # fixed (operators/temporal.py:392-399). Integer addition is
        # exact and associative, so the served total is bit-identical
        # however the generations merge; value is summed at 2-decimal
        # (cent) input precision.
        partial = batch_df.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("window_start")
        ).agg(
            F.count(F.lit(1)).alias("n_partial"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents_partial"),
        )
        from pdf_brain_spark.streaming.generations import (
            record_wseq,
            stamp_protocol,
        )

        stamp_protocol(batch_df.sparkSession, rollup_dir)
        partial.write.mode("overwrite").parquet(f"{rollup_dir}/batch_id={batch_id}")
        record_wseq(batch_df.sparkSession, rollup_dir, f"batch_id={batch_id}")

    return _each_batch


def streaming_incremental_rollup(
    spark: SparkSession,
    events_stream: DataFrame,
    rollup_dir: str,
    checkpoint_dir: str,
):
    """Drive incremental hourly-rollup maintenance as a Structured
    Streaming query (AvailableNow in tests/gate; continuous in
    production). Unlike the watermarked streaming_tumbling_window (which
    must decide when a window CLOSES to emit append-mode rows), the
    partials design needs no watermark at all for correctness — an
    arbitrarily late event lands as one more partial row — making it the
    right shape when the rollup must stay exactly consistent with
    whatever has arrived, and the window variant the right shape when
    bounded state and final-on-emit rows matter more."""
    return (
        events_stream.writeStream.foreachBatch(make_rollup_batch_fn(rollup_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(
    spark: SparkSession,
    rollup_dir: str,
    asof_batch_id: int | None = None,
    temporal: str = "coverage",
) -> DataFrame:
    """Serve the incremental rollup: re-aggregate the persisted partials
    across the LIVE batch generations (generation protocol — safe to
    read mid-compaction), honoring any BACKFILL generations
    (backfill_rollup): a backfilled bucket takes its corrected partials
    from the newest applicable backfill plus only the additive
    generations newer than that backfill's floor. |rows| = Σ per-batch
    distinct buckets — bucket grain × generation count, compacted by
    compact_rollup when generations accumulate.

    `asof_batch_id` is TIME TRAVEL, in one of two temporalities served
    from the SAME store (the bitemporal pair, r8 — VERDICT r7 item 6):

      * temporal="coverage" (default): serve from exactly the
        generations and backfill floors covering ≤ N, in the store's
        CURRENT state. A backfill written LATER with floor ≤ N
        participates, so after a repair this is the CORRECTED history
        as of batch N — the audit view.
      * temporal="write": serve what batch N's READER actually saw —
        the reproduce-a-training-run's-input view. Resolved through the
        per-dir write-sequence markers (generations.record_wseq): the
        raw dir set is restricted to dirs recorded at or before batch
        N's own write, and the normal precedence/backfill selection
        runs on that subset, so a repair or compaction written after
        batch N is invisible exactly as it was to that reader.

    A compaction RETIRES the snapshots it merges in BOTH temporalities
    (coverage: below its coverage; write: before its write) — the
    documented retention trade of compacting; both raise a specific
    'retired' error rather than serving a wrong reconstruction."""
    if temporal not in ("coverage", "write"):
        raise ValueError(f"temporal must be 'coverage' or 'write', got {temporal!r}")
    if temporal == "write" and asof_batch_id is not None:
        from pdf_brain_spark.streaming.generations import write_seqs

        seqs = write_seqs(spark, rollup_dir)
        name = f"batch_id={asof_batch_id}"
        if name not in seqs:
            raise ValueError(
                f"write-time snapshot at batch {asof_batch_id} is "
                "unavailable: its generation directory has no write-"
                "sequence marker (retired by compaction, or never written)."
            )
        kept = _rollup_kept_rows(spark, rollup_dir, asof_wseq=seqs[name])
    else:
        kept = _rollup_kept_rows(spark, rollup_dir, upto=asof_batch_id)
    return kept.groupBy("event_type", "window_start").agg(
        F.sum("n_partial").alias("n_events"),
        F.round(
            F.sum("sum_cents_partial").cast("double") / F.lit(100.0), 4
        ).alias("total_value"),
    )


def _rollup_kept_rows(
    spark: SparkSession,
    rollup_dir: str,
    upto: int | None = None,
    asof_wseq: int | None = None,
):
    """Rollup instantiation of the generic mergeable-partials selection
    (streaming/generations.py::kept_partial_rows) — one selection shared
    by the reader and the compactor so they can never disagree."""
    from pdf_brain_spark.streaming.generations import kept_partial_rows

    return kept_partial_rows(
        spark,
        rollup_dir,
        ["event_type", "window_start"],
        ["n_partial", "sum_cents_partial"],
        upto=upto,
        asof_wseq=asof_wseq,
    )


def backfill_rollup(
    spark: SparkSession,
    rollup_dir: str,
    corrected_events: DataFrame,
    floor_batch_id: int,
    buckets: DataFrame | None = None,
    overwrite: bool = False,
) -> None:
    """REPLACEMENT semantics on the append-only rollup store — the
    production repair the additive partials model cannot express: when a
    slice of history turns out to be WRONG (bad sensor, bug-era double
    counting), late additive partials can only add, never retract. A
    backfill generation carries the CORRECTED full partials for its
    buckets, recomputed from the corrected fact slice, and declares (via
    its floor) that for those buckets every additive generation covering
    <= floor is superseded; additive batches newer than the floor still
    apply on top, so the stream never pauses.

    Reader-safe by the same namespace precedence as compaction: the dir
    appears atomically (single overwrite into its own
    `backfill_floor=K` dir — idempotent on retry, like a micro-batch),
    readers either see it or not, and a later compaction materializes
    the resolution and retires the dir. Floor contract: must exceed the
    newest compacted coverage (otherwise the backfill would be dead on
    arrival), must only cover stream batches that are committed, and a
    floor can be used once (generations.backfill_partials — pass
    overwrite=True only to retry the SAME logical repair after a crash).

    Replacement is row-presence-based, so a bucket the correction leaves
    EMPTY (every event of that hour was bogus) needs an explicit marker:
    pass `buckets` = the (event_type, window_start) frame of ALL buckets
    this repair covers, and absent buckets get a (0, 0) partial that
    supersedes their stale additive history; without it, only buckets
    with surviving corrected events are replaced."""
    from pdf_brain_spark.streaming.generations import backfill_partials

    partial = corrected_events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("window_start")
    ).agg(
        F.count(F.lit(1)).alias("n_partial"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents_partial"),
    )
    if buckets is not None:
        partial = (
            buckets.select("event_type", "window_start")
            .distinct()
            .join(partial, ["event_type", "window_start"], "left")
            .select(
                "event_type",
                "window_start",
                F.coalesce(F.col("n_partial"), F.lit(0)).cast("long").alias("n_partial"),
                F.coalesce(F.col("sum_cents_partial"), F.lit(0))
                .cast("long")
                .alias("sum_cents_partial"),
            )
        )
    backfill_partials(spark, rollup_dir, partial, floor_batch_id, overwrite=overwrite)


def compact_rollup(spark: SparkSession, rollup_dir: str, upto_batch_id: int) -> int:
    """Floor-aware rollup compaction: merge every live additive
    generation covering ≤ upto_batch_id AND every applicable backfill
    generation (floor in (m*, upto]) into one compacted generation
    holding the bucket-grain RESOLVED partials — the serve semantics
    materialized (corrected buckets keep backfill + post-floor additive
    rows only), computed by the same `_rollup_kept_rows` the reader
    uses, so compaction can never disagree with serving. The compacted
    id is compacted_id(max(coverage, floors)), so the new generation supersedes both
    the consumed additive dirs AND the consumed backfill dirs
    (precedence: -m kills floors ≤ m); deletes happen after the atomic
    rename, and dead dirs from either namespace are swept. Returns the
    number of generations (additive + backfill) merged."""
    from pdf_brain_spark.streaming.generations import compact_partials

    return compact_partials(
        spark,
        rollup_dir,
        upto_batch_id,
        ["event_type", "window_start"],
        ["n_partial", "sum_cents_partial"],
    )


def make_value_histogram_batch_fn(hist_dir: str):
    """Per-micro-batch body for incremental PERCENTILE maintenance.
    Exact percentiles normally resist incrementality (they need the full
    sorted stream), but a fixed-resolution histogram is a mergeable
    sketch with a deterministic error contract: bucket `value` at CENT
    resolution (the same integer grain as the rollup/gap-fill sums) and
    per-batch partials (event_type, bucket, n) merge by integer
    addition — so any quantile of the CENT-ROUNDED distribution is
    served EXACTLY, incrementally, with no watermark and no
    read-modify-write, and the whole state is |types| × |distinct
    cents| rows. The t-digest idea with the approximation made exact by
    fixing the grid up front. Same replay-idempotent batch_id=N
    overwrite protocol as the rollup partials."""

    def _each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partial = batch_df.groupBy(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("bucket"),
        ).agg(F.count(F.lit(1)).alias("n"))
        from pdf_brain_spark.streaming.generations import (
            record_wseq,
            stamp_protocol,
        )

        stamp_protocol(batch_df.sparkSession, hist_dir)
        partial.write.mode("overwrite").parquet(f"{hist_dir}/batch_id={batch_id}")
        record_wseq(batch_df.sparkSession, hist_dir, f"batch_id={batch_id}")

    return _each_batch


def streaming_incremental_percentiles(
    spark: SparkSession,
    events_stream: DataFrame,
    hist_dir: str,
    checkpoint_dir: str,
):
    """Drive incremental histogram maintenance as a Structured Streaming
    query (AvailableNow in tests/gate; continuous in production)."""
    return (
        events_stream.writeStream.foreachBatch(make_value_histogram_batch_fn(hist_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_histogram_percentiles(
    spark: SparkSession, hist_dir: str, quantiles_pct: tuple[int, ...] = (50, 95, 99)
) -> DataFrame:
    """Serve exact cent-resolution percentiles from the persisted
    histogram partials (live generations — safe mid-compaction): merge
    partials by integer addition, cumulative-sum the buckets per type,
    and pick, for each quantile q%, the smallest bucket whose cumulative
    count reaches rank ceil(q·n/100) — the classic type-1 quantile, with
    the rank computed in INTEGER arithmetic ((q·n + 99) div 100) so no
    float ceil boundary can differ across engines. Reads through the
    generic partials selection (generations.py::kept_partial_rows), so
    backfill generations (backfill_value_histogram) are honored and
    mid-compaction reads are safe. Returns (event_type, quantile,
    value) with value = bucket/100."""
    from pyspark.sql.window import Window

    from pdf_brain_spark.streaming.generations import kept_partial_rows

    # floor grain = event_type: a histogram correction moves events
    # between value cells, so a backfill replaces the TYPE's whole
    # distribution up to its floor (see backfill_value_histogram)
    parts = kept_partial_rows(
        spark, hist_dir, ["event_type", "bucket"], ["n"], floor_cols=["event_type"]
    )
    hist = parts.groupBy("event_type", "bucket").agg(F.sum("n").alias("n"))
    w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("c", F.sum("n").over(w))
    tot = hist.groupBy("event_type").agg(F.sum("n").alias("total"))
    qs = F.explode(
        F.array(*[F.lit(int(q)) for q in quantiles_pct])
    ).alias("q_pct")
    with_q = cum.join(tot, "event_type").select("*", qs)
    rank = F.floor((F.col("q_pct") * F.col("total") + F.lit(99)) / F.lit(100))
    return (
        with_q.filter(F.col("c") >= rank)
        .groupBy("event_type", "q_pct")
        .agg(F.min("bucket").alias("bucket"))
        .select(
            "event_type",
            (F.col("q_pct") / F.lit(100.0)).alias("quantile"),
            F.round(F.col("bucket").cast("double") / F.lit(100.0), 2).alias("value"),
        )
    )


def backfill_value_histogram(
    spark: SparkSession,
    hist_dir: str,
    corrected_events: DataFrame,
    floor_batch_id: int,
    overwrite: bool = False,
) -> None:
    """Replacement semantics for the histogram store (the rollup's
    backfill_rollup, at cent-bucket grain): corrected FULL histogram
    partials supersede additive generations covering <= floor at
    EVENT_TYPE grain — not cell grain, because a correction moves events
    between value cells and a cell-grain replacement would leave the
    vacated stale cells standing. Consequence of the type-grain floor:
    `corrected_events` must be each affected type's COMPLETE corrected
    history up to the floor (a value distribution cannot be patched from
    a sub-slice), and this helper recomputes that full per-type
    histogram from the corrected facts."""
    from pdf_brain_spark.streaming.generations import backfill_partials

    partial = corrected_events.groupBy(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    backfill_partials(spark, hist_dir, partial, floor_batch_id, overwrite=overwrite)


def compact_value_histogram(spark: SparkSession, hist_dir: str, upto_batch_id: int) -> int:
    """Compact histogram partials: merge live generations covering
    ≤ upto_batch_id (and applicable backfill generations) into one
    compacted generation holding the bucket-grain RESOLVED histogram
    (integer addition — exact), via the generic floor-aware compactor
    that shares the reader's selection."""
    from pdf_brain_spark.streaming.generations import compact_partials

    return compact_partials(
        spark, hist_dir, upto_batch_id, ["event_type", "bucket"], ["n"],
        floor_cols=["event_type"],
    )


# ---------------------------------------------------------------------------
# Streaming incremental TERM COUNTS (top-k heavy hitters): the corpus-
# vocabulary twin of the hourly rollup — per-batch (term, count) partials
# on the generic mergeable-partials store. Counts are integers, so partials
# merge exactly and associatively whatever order generations land or
# compact in, and the served top-k is always exactly consistent with every
# document that has arrived (no sketch error: this is the EXACT heavy-
# hitter design — per-batch map-side combine keeps each generation at
# vocabulary grain, not token grain, which is the memory story a CMS
# would otherwise buy approximately).
# ---------------------------------------------------------------------------


def make_term_counts_batch_fn(store_dir: str, text_col: str = "text", min_len: int = 1):
    """Per-micro-batch term-count partials, replay-idempotent (the
    batch_id=N overwrite protocol). Tokenization is the engine-wide
    whitespace rule (functions/text.py::tokenize)."""
    from pdf_brain_spark.functions.text import tokenize

    def _each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partial = (
            batch_df.select(F.explode(tokenize(text_col)).alias("term"))
            .filter(F.length("term") >= min_len)
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("n_partial"))
        )
        from pdf_brain_spark.streaming.generations import (
            record_wseq,
            stamp_protocol,
        )

        stamp_protocol(batch_df.sparkSession, store_dir)
        partial.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")
        record_wseq(batch_df.sparkSession, store_dir, f"batch_id={batch_id}")

    return _each_batch


def streaming_incremental_term_counts(
    spark: SparkSession,
    docs_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """Drive incremental vocabulary maintenance as a Structured Streaming
    query (AvailableNow in tests/gate; continuous in production). No
    watermark needed — counts are additive, late documents just land as
    one more partial generation."""
    return (
        docs_stream.writeStream.foreachBatch(
            make_term_counts_batch_fn(store_dir, text_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_top_terms(spark: SparkSession, store_dir: str, k: int = 25) -> DataFrame:
    """Serve the exact top-k terms from the persisted partials (live
    generations, mid-compaction-safe): re-sum integer partials per term,
    TakeOrdered k by (n desc, term asc). The re-aggregate is one shuffle
    at vocabulary grain — independent of how many documents ever
    streamed in."""
    from pdf_brain_spark.streaming.generations import kept_partial_rows

    merged = (
        kept_partial_rows(spark, store_dir, ["term"], ["n_partial"])
        .groupBy("term")
        .agg(F.sum("n_partial").alias("n"))
    )
    return merged.orderBy(F.col("n").desc(), F.col("term").asc()).limit(k)


def compact_term_counts(spark: SparkSession, store_dir: str, upto_batch_id: int) -> int:
    """Merge committed term-count generations into one vocabulary-grain
    compacted generation (reader-safe generation protocol)."""
    from pdf_brain_spark.streaming.generations import compact_partials

    return compact_partials(
        spark, store_dir, upto_batch_id, ["term"], ["n_partial"]
    )


# ---------------------------------------------------------------------------
# Streaming incremental FTS index: per-batch POSTINGS generations
# (doc_id, term, tf, doc_len) on the row-store generation protocol — the
# continuous-crawl answer for the TEXT-search side, completing the trio
# (band index for dedup, IVF index for vectors, postings for FTS). New
# documents become searchable at the next micro-batch commit; corpus
# statistics (N, avgdl, df) derive from the SAME persisted postings at
# serve time, so served BM25 always reflects exactly the corpus indexed
# so far. Being a row store keyed by doc_id, the index inherits the whole
# lifecycle for free: replay-idempotent batch overwrite, reader-safe
# compaction, and tombstone DELETION (a taken-down document vanishes from
# results immediately and physically at the next compaction).
# ---------------------------------------------------------------------------


def make_fts_postings_batch_fn(index_dir: str, id_col: str = "doc_id", text_col: str = "text"):
    """Per-micro-batch postings build (operators/fts.py::build_postings —
    tokenize once, (doc, term) aggregate with map-side combine),
    replay-idempotent via the batch_id=N overwrite.

    TERM-PARTITIONED LAYOUT (the ANN index's list_id play carried to the
    text side): every generation lands as `batch_id=N/term_bucket=B`
    hive partitions with B = portable_term_bucket(term), so a serve's
    query-term filter is a PartitionFilter — unqueried buckets prune at
    planning time across the whole store, positive generations and
    compacted alike. The bucket hash is the repo's content-free portable
    md5 (replicable driver-side and in DuckDB), NOT xxhash64, so the
    serve can compute the probe set without a Spark job.

    Zero-token documents (empty/whitespace/NULL text) get a doc-grain
    MARKER row (term NULL, tf 0, doc_len 0) in bucket 0: build_postings
    naturally emits nothing for them, but the served corpus statistics
    (N, avgdl) must count every ingested document or BM25 from the index
    would drift from the one-shot path exactly when such docs exist."""
    from pdf_brain_spark.functions.text import tokenize
    from pdf_brain_spark.operators.fts import build_postings

    def _each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        postings = build_postings(batch_df, id_col=id_col, text_col=text_col)
        empties = (
            batch_df.select(id_col, tokenize(text_col).alias("_t"))
            .filter(F.coalesce(F.size("_t"), F.lit(0)) <= 0)
            .select(
                F.col(id_col),
                F.lit(None).cast("string").alias("term"),
                F.lit(0).alias("doc_len"),
                F.lit(0).cast("long").alias("tf"),
            )
        )
        from pdf_brain_spark.streaming.generations import stamp_protocol

        stamp_protocol(batch_df.sparkSession, index_dir)
        n_buckets = _stamp_fts_buckets(
            batch_df.sparkSession, index_dir, FTS_TERM_BUCKETS
        )
        rows = postings.unionByName(empties).localCheckpoint(eager=True)
        # DOC-GRAIN stats generation (VERDICT r8 item 5): one
        # (doc_id, doc_len) row per ingested document, on the same
        # row-store protocol in a sibling store. The serve's corpus
        # statistics (N, avgdl) and the one-live-generation-per-doc
        # assert read THIS store — one row per doc — instead of scanning
        # the term-grain postings of every live generation. Written
        # BEFORE the postings dir (ADVICE r9): a crash between the two
        # writes then leaves docs-without-postings — the batch's docs
        # are invisible to term probes and merely counted in N — instead
        # of live postings scored with stats that exclude them (silently
        # wrong BM25) and a uniqueness assert blind to a double-ingest.
        # Either partial state is also caught LOUDLY at serve time by
        # fts_assert_stores_consistent; the foreachBatch replay of the
        # same batch_id rewrites both (idempotent overwrite), so the
        # window self-heals.
        docs_store = fts_docs_dir(index_dir)
        stamp_protocol(batch_df.sparkSession, docs_store)
        rows.groupBy(id_col).agg(
            F.first("doc_len").alias("doc_len")
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{docs_store}/batch_id={batch_id}"
        )
        rows.withColumn(
            "term_bucket", _term_bucket_col(F.col("term"), n_buckets)
        ).write.partitionBy("term_bucket").mode("overwrite").parquet(
            f"{index_dir}/batch_id={batch_id}"
        )

    return _each_batch


def fts_docs_dir(index_dir: str) -> str:
    """The FTS index's doc-grain stats store (sibling of the postings
    store, same generation protocol): one (doc_id, doc_len) row per doc
    per generation. Serves N/avgdl and the uniqueness assert at doc
    grain — ~avgdl-times fewer bytes than the postings' term grain, and
    independent of how many terms a serve probes."""
    return index_dir.rstrip("/") + "_docs"


def delete_fts_documents(
    spark: SparkSession,
    index_dir: str,
    doc_ids: DataFrame,
    floor_batch_id: int,
) -> None:
    """Takedown on the FTS index: tombstone the doc ids in BOTH the
    doc-grain stats store (so N/avgdl immediately reflect the removal —
    BM25 idf/length normalization must not keep counting deleted
    documents) and the postings store (so probes stop matching their
    rows). DOCS STORE FIRST (ADVICE r9): a crash between the two writes
    then leaves the deleted docs still visible in results but already
    excluded from the corpus stats — a visible, re-runnable partial
    delete — instead of invisible docs silently inflating N/avgdl; the
    serve's fts_assert_stores_consistent also flags the mismatched
    tombstone state loudly. Compaction of each store materializes its
    removal.

    The floor is validated against BOTH stores' compaction frontiers
    BEFORE either tombstone is written (r10 review): the stores compact
    independently, so a floor valid for the docs store but at/below the
    postings store's frontier would otherwise tombstone the docs side
    and then raise on the postings side — a torn delete sitting exactly
    AT the shared frontier, where the consistency assert's
    above-frontier comparison cannot see it. Failing the whole call
    up front keeps 'one-sided tombstone' synonymous with 'crash',
    which is the case the assert + re-run protocol does heal."""
    from pdf_brain_spark.streaming.generations import (
        coverage,
        generation_ids,
        write_tombstones,
    )

    for store in (fts_docs_dir(index_dir), index_dir):
        m_star = max(
            [coverage(g) for g in generation_ids(spark, store) if g < 0],
            default=-1,
        )
        if floor_batch_id <= m_star:
            raise ValueError(
                f"tombstone floor {floor_batch_id} is at or below store "
                f"{store}'s compacted coverage {m_star}; the two FTS "
                "stores compact independently, so the delete must clear "
                "BOTH frontiers — re-run with a floor above "
                "max(frontiers), or compact the lagging store first. "
                "Nothing was written."
            )
    ids = doc_ids.select("doc_id").localCheckpoint(eager=True)
    write_tombstones(spark, fts_docs_dir(index_dir), ids, floor_batch_id)
    write_tombstones(spark, index_dir, ids, floor_batch_id)


# Number of term-hash partitions per FTS generation for NEW stores. At
# this test scale 8 keeps directory counts sane; at 100 TB the same layout
# runs at 256-1024 buckets so one bucket's live postings stay
# executor-sized. The count is part of the STORE layout, not the query, so
# it is PERSISTED per store as a `_TERM_BUCKETS.<B>` marker (the protocol-
# marker play): the writer stamps it on first write and honors an existing
# store's value thereafter; the serve computes its probe set from the
# store's marker, never the constant — changing the constant can therefore
# never silently mis-probe an existing store's hive dirs.
FTS_TERM_BUCKETS = 8

_TERM_BUCKETS_PREFIX = "_TERM_BUCKETS."


def fts_store_buckets(spark: SparkSession, index_dir: str) -> int | None:
    """The persisted term-bucket count of an FTS store (None if the
    store doesn't exist yet / has no layout marker)."""
    from pdf_brain_spark.streaming.generations import _fs

    HPath, fs = _fs(spark, index_dir)
    if not fs.exists(HPath(index_dir)):
        return None
    for st in fs.listStatus(HPath(index_dir)):
        name = st.getPath().getName()
        if name.startswith(_TERM_BUCKETS_PREFIX):
            try:
                return int(name[len(_TERM_BUCKETS_PREFIX):])
            except ValueError:
                continue
    return None


def _stamp_fts_buckets(spark: SparkSession, index_dir: str, n_buckets: int) -> int:
    """Record (or read back) the store's bucket count. First writer
    stamps; later writers use the stamped value — a caller demanding a
    DIFFERENT count than the store's is an error, not a re-layout."""
    from pdf_brain_spark.streaming.generations import _fs

    existing = fts_store_buckets(spark, index_dir)
    if existing is not None:
        if existing != n_buckets:
            raise ValueError(
                f"FTS store {index_dir} is laid out at {existing} term "
                f"buckets; cannot write batches at {n_buckets}. Rebuild "
                "the store to change its bucket count."
            )
        return existing
    HPath, fs = _fs(spark, index_dir)
    fs.create(
        HPath(f"{index_dir}/{_TERM_BUCKETS_PREFIX}{n_buckets}"), True
    ).close()
    return n_buckets


def portable_term_bucket(term: str, n_buckets: int = FTS_TERM_BUCKETS) -> int:
    """Driver-side twin of _term_bucket_col: bucket = first 4 md5 hex
    digits mod n_buckets — the repo's engine-independent content hash
    (same construction as the split/AQP portable hashes), identical in
    python, Spark SQL, and DuckDB. NULL-marker rows live in bucket 0."""
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:4], 16) % n_buckets


def _term_bucket_col(term_col, n_buckets: int = FTS_TERM_BUCKETS):
    """Spark expression computing portable_term_bucket(term)."""
    return F.when(term_col.isNull(), F.lit(0)).otherwise(
        F.conv(F.substring(F.md5(term_col), 1, 4), 16, 10).cast("int")
        % F.lit(n_buckets)
    )


def streaming_fts_ingest(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Drive incremental FTS index maintenance as a Structured Streaming
    query (AvailableNow in tests/gate; continuous in production)."""
    return (
        docs_stream.writeStream.foreachBatch(
            make_fts_postings_batch_fn(index_dir, id_col, text_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def fts_assert_stores_consistent(spark: SparkSession, index_dir: str) -> None:
    """Fail LOUDLY when the postings store and its doc-grain stats store
    disagree about which batches / takedowns they account for (ADVICE
    r9: a crash between the two per-batch writes, or between a delete's
    two tombstone writes, would otherwise serve BM25 with N/avgdl that
    silently exclude or include the torn batch's documents).

    Checks, cheapest first:

      * covered-batch sets equal (driver-side listing) — the set of
        stream batches each store's live generations account for
        ({0..m*} ∪ positives > m*; compaction never changes coverage, so
        independently-timed compactions cannot false-positive);
      * applicable-tombstone floor SETS equal above the SHARED compaction
        frontier (driver-side listing) — delete_fts_documents writes one
        tombstone dir per store at the same floor, and floors at or below
        either store's compacted coverage were materialized there
        (excluded on both sides), so a floor present on one side only is
        exactly a torn delete. SETS, not dir counts (r10 review):
        re-running a torn delete lands a serial-suffixed SECOND dir on
        the side that already had one, and same-floor tombstones union
        idempotently — a count comparison would brand the healed state
        inconsistent forever.
      * unioned tombstone KEY sets equal per floor (ADVICE r10): floor
        presence alone cannot detect CONTENT divergence when a torn
        delete's floor is reused by a later delete with DIFFERENT
        doc_ids — both stores then expose the same floor set while the
        postings store never received the first delete's keys, and
        compaction would grandfather the divergence permanently. Each
        store's above-frontier tombstone dirs are one bounded parquet
        read; the key sets compare via a per-floor
        (distinct-count, bit_xor(xxhash64)) digest — distributed, no
        keys collected to the driver, and idempotent-union-stable so
        the healed serial-suffixed state still passes.

    Self-heal: a torn batch heals when the streaming checkpoint replays
    it (idempotent batch_id overwrite); a torn delete heals by re-running
    delete_fts_documents with the same ids (pytest walks the full
    tear→refuse→re-run→serve cycle, including the reused-floor
    divergence)."""
    from pdf_brain_spark.streaming.generations import (
        _tombstone_dirs,
        coverage,
        generation_ids,
        live_generation_ids,
    )

    docs_store = fts_docs_dir(index_dir)

    def _state(store: str) -> tuple[set[int], int]:
        ids = live_generation_ids(generation_ids(spark, store))
        m_star = max([coverage(g) for g in ids if g < 0], default=-1)
        covered = set(range(m_star + 1)) | {g for g in ids if g >= 0}
        return covered, m_star

    cov_p, m_p = _state(index_dir)
    cov_d, m_d = _state(docs_store)
    if cov_p != cov_d:
        raise ValueError(
            f"FTS index {index_dir} and its doc-grain stats store disagree "
            f"about which batches they cover (postings: {sorted(cov_p)}, "
            f"stats: {sorted(cov_d)}) — a crash tore a batch's two writes "
            "apart. Replay the torn batch (the streaming checkpoint "
            "re-runs it idempotently) before serving."
        )
    frontier = max(m_p, m_d)

    def _floors(store: str) -> set[int]:
        return {k for k, _ in _tombstone_dirs(spark, store) if k > frontier}

    t_p, t_d = _floors(index_dir), _floors(docs_store)
    if t_p != t_d:
        raise ValueError(
            f"FTS index {index_dir} and its doc-grain stats store disagree "
            f"about takedowns (postings tombstone floors: {t_p}, stats: "
            f"{t_d}) — a crash tore a delete's two tombstone writes apart. "
            "Re-run delete_fts_documents with the same ids before serving."
        )

    def _floor_key_digests(store: str) -> dict[int, tuple[int, int]]:
        """{floor: (n_distinct_keys, bit_xor(xxhash64(key)))} for the
        unioned tombstone keys per above-frontier floor. One union read
        + one aggregate per store; the collect is one row per floor."""
        parts = [
            spark.read.parquet(f"{store}/{name}").select(
                F.lit(k).alias("_floor"), F.col("doc_id")
            )
            for k, name in _tombstone_dirs(spark, store)
            if k > frontier
        ]
        if not parts:
            return {}
        from functools import reduce

        rows = (
            reduce(lambda a, b: a.unionByName(b), parts)
            .distinct()
            .groupBy("_floor")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.expr("bit_xor(xxhash64(doc_id))").alias("_x"),
            )
            .collect()
        )
        return {r["_floor"]: (r["_n"], r["_x"]) for r in rows}

    if t_p:
        d_p, d_d = _floor_key_digests(index_dir), _floor_key_digests(docs_store)
        if d_p != d_d:
            bad = sorted(k for k in t_p if d_p.get(k) != d_d.get(k))
            raise ValueError(
                f"FTS index {index_dir} and its doc-grain stats store "
                f"disagree about WHICH documents are taken down at floors "
                f"{bad} (same floors, different unioned tombstone key "
                "sets) — a torn delete's floor was reused by a later "
                "delete with different ids. Re-run the torn "
                "delete_fts_documents with its original ids before "
                "serving."
            )


def fts_corpus_stats(
    spark: SparkSession,
    index_dir: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus statistics (N, avgdl) for BM25 serving, computed from the
    doc-grain stats store ONLY — one row per live doc per generation,
    never the postings' term grain (pytest pins that this frame's scans
    touch no postings path). Also carries the
    one-live-generation-per-doc invariant (max_gen) so the serve's
    double-ingest assert costs a doc-grain aggregate, not a postings
    scan. Raises with a re-ingest instruction on a pre-stats-store
    layout (the protocol-marker fail-fast play), and raises by name when
    the two stores' covered batches or tombstones disagree — a torn
    batch/delete must not serve silently-wrong N/avgdl
    (fts_assert_stores_consistent; ADVICE r9)."""
    from pdf_brain_spark.streaming.generations import kept_index_rows

    docs_store = fts_docs_dir(index_dir)
    try:
        dg = kept_index_rows(spark, docs_store, [id_col])
    except ValueError as e:
        raise ValueError(
            f"FTS index {index_dir} has no doc-grain stats store "
            f"({docs_store}): it was built by a pre-r9 writer. Rebuild "
            "the index (re-ingest) so corpus statistics serve from doc "
            f"grain. Underlying: {e}"
        ) from e
    fts_assert_stores_consistent(spark, index_dir)
    return (
        dg.groupBy(id_col)
        .agg(
            F.first("doc_len").alias("doc_len"),
            F.countDistinct("batch_id").alias("_ngen"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("doc_len").alias("avgdl"),
            F.max("_ngen").alias("max_gen"),
        )
    )


def fts_search_persisted(
    spark: SparkSession,
    index_dir: str,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k served from the PERSISTED postings index (live
    generations minus tombstoned documents — safe mid-compaction and
    after takedowns). Identical Okapi scoring to operators/fts.py::
    bm25_scores, so serving from the index reproduces the one-shot path
    over the same corpus exactly (pytest-pinned).

    UPDATE CONTRACT: a document UPDATE must be tombstone-then-reinsert
    (delete_documents on the postings index, then ingest the new text
    in a later batch) —
    the kept-rows selection then drops the stale generation's postings.
    Re-ingesting a doc_id WITHOUT a tombstone leaves both generations'
    postings live, double-counting tf; the serve path ASSERTS each doc
    appears in exactly one live generation and raises rather than serve
    silently-wrong scores.

    Plan shape: corpus stats (N, avgdl, the uniqueness assert) are ONE
    small aggregate over the DOC-GRAIN stats store (fts_docs_dir — one
    row per doc per generation; VERDICT r8 item 5: the serve no longer
    scans any postings generation's term grain for stats); per-term df
    comes from the probed postings only. The query-term filter prunes
    the postings scan to the queried terms — under the term_bucket
    layout it is a PartitionFilter, so unqueried buckets prune at
    planning time. One bounded TakeOrdered ends the plan."""
    import math

    from pdf_brain_spark.operators.fts import BM25_B, BM25_K1
    from pdf_brain_spark.streaming.generations import kept_index_rows

    rows = kept_index_rows(spark, index_dir, [id_col]).drop("batch_id")
    terms = [t.lower() for t in query_terms]
    stats = fts_corpus_stats(spark, index_dir, id_col=id_col).collect()[0]
    if stats["n"] and stats["max_gen"] > 1:
        raise ValueError(
            "FTS index has documents with live postings in more than one "
            "generation — a doc_id was re-ingested without a tombstone. "
            "Updates must be tombstone-then-reinsert "
            "(delete_documents, then ingest the new text); serving "
            "this state would double-count tf."
        )
    if not stats["n"]:
        # every document tombstoned (a takedown-heavy index reaches this
        # state in normal operation): an empty result, not a crash
        return (
            rows.select(id_col)
            .withColumn("bm25", F.lit(0.0))
            .withColumn("terms_matched", F.lit(0).cast("long"))
            .limit(0)
        )
    n_docs, avgdl = float(stats["n"]), float(stats["avgdl"])
    # the probe: term_bucket is a hive partition column on EVERY
    # generation (batch and compacted), so this isin is a PartitionFilter
    # — unqueried buckets are pruned at planning time (pytest-pinned in
    # tests/test_ingest_and_streaming.py); the residual term filter
    # selects within the probed buckets
    store_b = fts_store_buckets(spark, index_dir) or FTS_TERM_BUCKETS
    probe_buckets = sorted({portable_term_bucket(t, store_b) for t in terms})
    matched = rows.filter(
        F.col("term_bucket").isin(probe_buckets) & F.col("term").isin(terms)
    )
    dfs = {
        r["term"]: float(r["df"])
        for r in matched.groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
        .collect()
    }
    idf = {
        t: math.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)
        for t, dfv in dfs.items()
    }
    idf_map = F.create_map(
        *[x for t in idf for x in (F.lit(t), F.lit(idf[t]))]
    )
    tf = F.col("tf").cast("double")
    term_score = idf_map[F.col("term")] * (tf * (BM25_K1 + 1)) / (
        tf + BM25_K1 * (1 - BM25_B + BM25_B * F.col("doc_len") / F.lit(avgdl))
    )
    return (
        matched.withColumn("_ts", term_score)
        .groupBy(id_col)
        .agg(
            F.sum("_ts").alias("bm25"),
            F.count(F.lit(1)).alias("terms_matched"),
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Streaming incremental OHLC bars: the first NON-SUM instantiation of the
# mergeable-partials store — proof the generation protocol carries any
# commutative monoid, not just integer addition. Per-batch partials hold
# each bar's (open-ordering-struct, high, low, close-ordering-struct, n);
# open/close merge by min/max over (us, event_id, cents) structs, which is
# associative and exact, so partials from any number of batch generations
# (or a compaction of them) resolve to the identical bar the one-shot
# operator computes. Late data needs no watermark: a late event is one
# more partial row whose struct simply wins or loses the min/max.
# ---------------------------------------------------------------------------

_OHLC_BUCKETS = ["event_type", "window_start"]
_OHLC_VALUES = ["open_ord", "high_c", "low_c", "close_ord", "n_partial"]


def _ohlc_merge_exprs():
    return [
        F.min("open_ord").alias("open_ord"),
        F.max("high_c").alias("high_c"),
        F.min("low_c").alias("low_c"),
        F.max("close_ord").alias("close_ord"),
        F.sum("n_partial").alias("n_partial"),
    ]


def _ohlc_partial(events_df: DataFrame) -> DataFrame:
    """Bar-grain OHLC partials from a raw event slice — shared by the
    per-batch writer and the backfill path so a correction's partials
    can never disagree in shape with the stream's. Cents +
    exact-microsecond ordering structs (the cross-engine integer
    discipline)."""
    cents = F.round(F.col("value") * 100).cast("long")
    ordc = F.struct(
        F.unix_micros(F.col("ts")).alias("us"),
        F.col("event_id").alias("eid"),
        cents.alias("c"),
    )
    return (
        events_df.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            ordc.alias("_ord"),
            cents.alias("_c"),
        )
        .groupBy(*_OHLC_BUCKETS)
        .agg(
            F.min("_ord").alias("open_ord"),
            F.max("_c").alias("high_c"),
            F.min("_c").alias("low_c"),
            F.max("_ord").alias("close_ord"),
            F.count(F.lit(1)).alias("n_partial"),
        )
    )


def make_ohlc_batch_fn(store_dir: str):
    """Per-micro-batch OHLC partials at bar grain, replay-idempotent
    (batch_id=N overwrite)."""

    def _each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pdf_brain_spark.streaming.generations import (
            record_wseq,
            stamp_protocol,
        )

        stamp_protocol(batch_df.sparkSession, store_dir)
        _ohlc_partial(batch_df).write.mode("overwrite").parquet(
            f"{store_dir}/batch_id={batch_id}"
        )
        record_wseq(batch_df.sparkSession, store_dir, f"batch_id={batch_id}")

    return _each_batch


def backfill_ohlc(
    spark: SparkSession,
    store_dir: str,
    corrected_events: DataFrame,
    floor_batch_id: int,
    overwrite: bool = False,
) -> None:
    """Replacement semantics on the OHLC store (the rollup backfill,
    carried to the non-sum monoid): the corrected event slice recomputes
    FULL partials for its bars, superseding every additive generation at
    or below the floor for those bars; later additive batches still
    merge on top via the same min/max monoid. Floor contract and
    once-per-floor rule: generations.backfill_partials."""
    from pdf_brain_spark.streaming.generations import backfill_partials

    backfill_partials(
        spark, store_dir, _ohlc_partial(corrected_events), floor_batch_id, overwrite
    )


def streaming_incremental_ohlc(
    spark: SparkSession,
    events_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
):
    """Drive incremental OHLC-bar maintenance as a Structured Streaming
    query (AvailableNow in tests/gate; continuous in production)."""
    return (
        events_stream.writeStream.foreachBatch(make_ohlc_batch_fn(store_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_ohlc(spark: SparkSession, store_dir: str) -> DataFrame:
    """Serve the bars from the persisted partials (live generations,
    mid-compaction-safe): one re-merge at bar grain, then the money
    projection — identical output contract to operators/temporal.py::
    ohlc_bars over the same events."""
    from pdf_brain_spark.streaming.generations import kept_partial_rows

    money = lambda c: F.round(c.cast("double") / 100.0, 2)  # noqa: E731
    merged = (
        kept_partial_rows(spark, store_dir, _OHLC_BUCKETS, _OHLC_VALUES)
        .groupBy(*_OHLC_BUCKETS)
        .agg(*_ohlc_merge_exprs())
    )
    return merged.select(
        "event_type",
        F.col("window_start").alias("bar_start"),
        money(F.col("open_ord.c")).alias("open"),
        money(F.col("high_c")).alias("high"),
        money(F.col("low_c")).alias("low"),
        money(F.col("close_ord.c")).alias("close"),
        F.col("n_partial").alias("n_events"),
    )


def compact_ohlc(spark: SparkSession, store_dir: str, upto_batch_id: int) -> int:
    """Merge committed OHLC partial generations with the store's own
    min/max monoid (reader-safe generation protocol)."""
    from pdf_brain_spark.streaming.generations import compact_partials

    return compact_partials(
        spark,
        store_dir,
        upto_batch_id,
        _OHLC_BUCKETS,
        _OHLC_VALUES,
        merge_exprs=_ohlc_merge_exprs(),
    )


# ---------------------------------------------------------------------------
# Streaming incremental KMV distinct sketch: the third NON-SUM monoid on the
# mergeable-partials store (after OHLC's min/max structs) — and the first
# SET-VALUED one. Each batch's partial is, per event_type, the bottom-K
# sorted distinct portable hashes of the key; partials merge by
# union-distinct-sort-truncate, which is associative, commutative, and
# idempotent (bottomK(bottomK(A)∪bottomK(B)) = bottomK(A∪B) because any
# hash evicted from a partial bottom-K is ≥ K survivors and can never
# re-enter the merged bottom-K). Distinct counts therefore maintain
# incrementally — the thing exact countDistinct fundamentally cannot do —
# with a deterministic, engine-portable estimate (see
# queries.kmv_distinct_estimate for the estimator's oracle-ability
# argument vs engine-private HLL).
# ---------------------------------------------------------------------------

KMV_K = 64
_KMV_M = 1152921504606846976.0  # 2^60: md5_long's hash-space size


def _kmv_merge_exprs():
    return [
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("hashes")))),
            1,
            KMV_K,
        ).alias("hashes")
    ]


def make_kmv_batch_fn(store_dir: str, key_col: str = "user_id", type_col: str = "event_type"):
    """Per-micro-batch KMV partial: bottom-K sorted distinct hashes of
    the key per group, replay-idempotent (batch_id=N overwrite)."""
    from pdf_brain_spark.functions.text import md5_long

    def _each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partial = (
            batch_df.select(
                F.col(type_col).alias("event_type"),
                md5_long(F.col(key_col).cast("string")).alias("h"),
            )
            .groupBy("event_type")
            .agg(
                F.slice(F.array_sort(F.collect_set("h")), 1, KMV_K).alias("hashes")
            )
        )
        from pdf_brain_spark.streaming.generations import (
            record_wseq,
            stamp_protocol,
        )

        stamp_protocol(batch_df.sparkSession, store_dir)
        partial.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")
        record_wseq(batch_df.sparkSession, store_dir, f"batch_id={batch_id}")

    return _each_batch


def streaming_incremental_kmv(
    spark: SparkSession,
    events_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
):
    """Drive incremental distinct-sketch maintenance as a Structured
    Streaming query (AvailableNow in tests/gate; continuous in
    production). Per-batch work is one aggregate over the BATCH; the
    persisted state is K longs per (group, live generation)."""
    return (
        events_stream.writeStream.foreachBatch(make_kmv_batch_fn(store_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_kmv(spark: SparkSession, store_dir: str) -> DataFrame:
    """Serve distinct-count estimates from the persisted sketch (live
    generations, mid-compaction-safe): one set-union re-merge per group,
    then the KMV estimator (k-1)/(h_k / 2^60) — identical formula and
    IEEE operations to the one-shot kmv_distinct_estimate, so a real
    streamed store reproduces the batch gate's numbers exactly."""
    from pdf_brain_spark.streaming.generations import kept_partial_rows

    merged = (
        kept_partial_rows(spark, store_dir, ["event_type"], ["hashes"])
        .groupBy("event_type")
        .agg(*_kmv_merge_exprs())
    )
    n_in = F.size("hashes")
    h_k = F.element_at("hashes", n_in)
    est = F.when(n_in < KMV_K, n_in.cast("long")).otherwise(
        F.round(F.lit(float(KMV_K - 1)) * (F.lit(_KMV_M) / h_k)).cast("long")
    )
    return merged.select(
        "event_type",
        n_in.cast("long").alias("n_in_sketch"),
        est.alias("kmv_estimate"),
    )


def compact_kmv(spark: SparkSession, store_dir: str, upto_batch_id: int) -> int:
    """Merge committed KMV partial generations with the store's own
    set-union monoid (reader-safe generation protocol)."""
    from pdf_brain_spark.streaming.generations import compact_partials

    return compact_partials(
        spark,
        store_dir,
        upto_batch_id,
        ["event_type"],
        ["hashes"],
        merge_exprs=_kmv_merge_exprs(),
    )


def compact_fts_index(spark: SparkSession, index_dir: str, upto_batch_id: int, n_files: int = 8) -> int:
    """Merge committed postings generations into one compacted
    generation, materializing document deletions (reader-safe
    generation protocol, same story as the band/ANN compactors).

    The compacted generation KEEPS the term_bucket hive partitioning
    (make_fts_postings_batch_fn): the store's dominant mass lives in its
    compacted generation, so preserving the layout there is what makes
    a serve's probe prune at 100 TB — the exact play compact_ann_index
    runs for list_id. The pre-write repartition on term_bucket puts each
    bucket's rows in few tasks, so the dir gets ~one file per bucket
    instead of n_files x buckets fragments.

    The serve-path invariant (one live generation per doc — updates are
    tombstone-then-reinsert) is ALSO asserted here, before merging:
    compaction would otherwise fold a double-ingested doc's two
    generations into one, after which the serve's own check can no
    longer see the violation and BM25 silently double-counts tf.

    The two-store consistency assert ALSO runs first (r10 review):
    fts_assert_stores_consistent only compares tombstones ABOVE the
    shared compaction frontier, so compacting past a torn delete's
    floor without checking would grandfather the torn state into
    permanent invisibility — the postings store serving deleted docs
    that the stats store excludes, forever. Asserting before the
    frontier moves turns that into a named pre-compaction error while
    the re-run protocol can still heal it."""
    from pdf_brain_spark.streaming.generations import (
        compact_index_rows,
        kept_index_rows,
    )

    fts_assert_stores_consistent(spark, index_dir)

    # the uniqueness assert runs on the DOC-GRAIN stats store (one row
    # per doc per generation) — same invariant as before r9, a fraction
    # of the bytes
    dup = (
        kept_index_rows(spark, fts_docs_dir(index_dir), ["doc_id"], upto=upto_batch_id)
        .groupBy("doc_id")
        .agg(F.countDistinct("batch_id").alias("_ngen"))
        .filter(F.col("_ngen") > 1)
        .limit(1)
    )
    if dup.count() > 0:
        raise ValueError(
            "FTS index has documents with live postings in more than one "
            "generation — a doc_id was re-ingested without a tombstone. "
            "Compacting would merge the duplicates and make the double-"
            "counted tf undetectable; tombstone the stale copy first."
        )

    def _write_kept(kept, tmp: str) -> None:
        kept.repartition(max(1, n_files), "term_bucket").write.partitionBy(
            "term_bucket"
        ).mode("overwrite").parquet(tmp)

    def _write_docs_kept(kept, tmp: str) -> None:
        kept.coalesce(1).write.mode("overwrite").parquet(tmp)

    # compact the doc-grain stats store FIRST (mirrors the writer's
    # postings-then-stats order inverted: a crash between the two
    # compactions leaves the stats store compacted and the postings
    # store not — both remain correct to serve, since each store's
    # protocol is independently reader-safe)
    compact_index_rows(
        spark, fts_docs_dir(index_dir), upto_batch_id, ["doc_id"], _write_docs_kept
    )
    return compact_index_rows(
        spark, index_dir, upto_batch_id, ["doc_id"], _write_kept
    )


# ---------------------------------------------------------------------------
# Incremental OLS regression — the partials store's first MOMENT-VECTOR
# monoid. The five raw moments (n, Σx, Σy, Σxy, Σx²) are plain integer
# sums, so per-batch partials merge by elementwise addition — associative
# and commutative, and EXACT: x is the integer hour offset from a fixed
# anchor and y is integer cents, so however the stream (or a compaction)
# carved the data, the merged moments — and the slope/intercept derived
# from them by one final float expression — are bit-identical to a
# one-shot scan. Streaming model fitting without ever re-shuffling
# history: persisted state is 5 longs per (group, live generation).
# x anchors at 2024-01-01 UTC to keep n·Σx² far inside int64 (move to
# decimal(38) sums past ~1e9 rows/group at this grain).
# ---------------------------------------------------------------------------

REG_ANCHOR_US = 1_704_067_200_000_000  # epoch micros of 2024-01-01 UTC
_REG_SUMS = ["n", "sx", "sy", "sxy", "sxx"]


def _reg_merge_exprs():
    return [F.sum(c).cast("long").alias(c) for c in _REG_SUMS]


def _reg_partial(df: DataFrame, type_col: str, ts_col: str, val_col: str) -> DataFrame:
    x = F.expr(
        f"(unix_micros(cast({ts_col} as timestamp)) - {REG_ANCHOR_US}) div 3600000000"
    ).cast("long")
    y = F.round(F.col(val_col) * 100).cast("long")
    return (
        df.select(F.col(type_col).alias("event_type"), x.alias("x"), y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        )
    )


def make_regression_batch_fn(
    store_dir: str,
    type_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
):
    """Per-micro-batch OLS moment partial, replay-idempotent
    (batch_id=N overwrite, same protocol as every store here)."""

    def _each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pdf_brain_spark.streaming.generations import (
            record_wseq,
            stamp_protocol,
        )

        partial = _reg_partial(batch_df, type_col, ts_col, val_col)
        stamp_protocol(batch_df.sparkSession, store_dir)
        partial.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")
        record_wseq(batch_df.sparkSession, store_dir, f"batch_id={batch_id}")

    return _each_batch


def streaming_incremental_regression(
    spark: SparkSession,
    events_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
):
    """Drive incremental regression-moment maintenance as a Structured
    Streaming query (AvailableNow in tests/gate; continuous in
    production). Per-batch work is one aggregate over the BATCH."""
    return (
        events_stream.writeStream.foreachBatch(make_regression_batch_fn(store_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ols_num_den_exprs():
    """The OLS slope's raw numerator/denominator expressions over the
    exact integer moment columns (n, sx, sy, sxy, sxx) — shared by
    regression_fit_exprs AND consumers needing the UNROUNDED slope
    (retention_decay_fit's half-life), so the float op order lives in
    exactly one place."""
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return num, den


def regression_fit_exprs(
    slope_alias: str = "slope_cents_per_hour",
    intercept_alias: str = "intercept_cents",
):
    """slope/intercept column expressions from exact integer moment
    columns — ONE shared definition so the streaming serve, the batch
    oracle gate, and every other OLS consumer (zipf_fit_report,
    heaps_law_fit, retention_decay_fit) cannot drift (the KMV-constant
    lesson, pass 2 finding 2 of round 8's self-review). Final float
    math is two divisions and one multiply in a fixed order, rounded
    to 6dp."""
    num, den = ols_num_den_exprs()
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return F.round(slope, 6).alias(slope_alias), F.round(intercept, 6).alias(
        intercept_alias
    )


def read_regression(spark: SparkSession, store_dir: str) -> DataFrame:
    """Serve per-group OLS fits from the persisted moments (live
    generations, mid-compaction-safe): one integer re-merge per group,
    then the shared closed form."""
    from pdf_brain_spark.streaming.generations import kept_partial_rows

    merged = (
        kept_partial_rows(spark, store_dir, ["event_type"], _REG_SUMS)
        .groupBy("event_type")
        .agg(*_reg_merge_exprs())
    )
    slope, intercept = regression_fit_exprs()
    return merged.select("event_type", *_REG_SUMS, slope, intercept)


def compact_regression(spark: SparkSession, store_dir: str, upto_batch_id: int) -> int:
    """Merge committed regression-moment generations by elementwise
    integer addition (reader-safe generation protocol)."""
    from pdf_brain_spark.streaming.generations import compact_partials

    return compact_partials(
        spark,
        store_dir,
        upto_batch_id,
        ["event_type"],
        _REG_SUMS,
        merge_exprs=_reg_merge_exprs(),
    )


# ---------------------------------------------------------------------------
# Incremental EXACT distinct counting — the bitmap complement of the KMV
# sketch (approximate, bounded state) above: when the key domain is dense
# integers (user ids), a 64-bit word bitmap IS a mergeable monoid under
# bitwise OR — associative, commutative, idempotent — and serves the
# EXACT distinct count as Σ bit_count(word). Persisted state scales with
# occupied id-range/64 per group (roaring-style containerization is the
# 100 TB growth path; the word grain here is its dense container).
# ---------------------------------------------------------------------------

_BITMAP_KEYS = ["event_type", "word_idx"]


def _bitmap_merge_exprs():
    return [F.expr("bit_or(bits)").cast("long").alias("bits")]


def make_bitmap_batch_fn(store_dir: str, key_col: str = "user_id", type_col: str = "event_type"):
    """Per-micro-batch bitmap partial: OR of 1<<(id%64) per
    (group, id//64) word, replay-idempotent (batch_id=N overwrite)."""

    def _each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pdf_brain_spark.streaming.generations import (
            record_wseq,
            stamp_protocol,
        )

        partial = (
            batch_df.select(
                F.col(type_col).alias("event_type"),
                F.expr(f"{key_col} div 64").cast("long").alias("word_idx"),
                F.expr(f"shiftleft(1L, cast({key_col} % 64 as int))").alias("b"),
            )
            .groupBy(*_BITMAP_KEYS)
            .agg(F.expr("bit_or(b)").cast("long").alias("bits"))
        )
        stamp_protocol(batch_df.sparkSession, store_dir)
        partial.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")
        record_wseq(batch_df.sparkSession, store_dir, f"batch_id={batch_id}")

    return _each_batch


def streaming_incremental_bitmap(
    spark: SparkSession,
    events_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
):
    """Drive exact incremental distinct-count maintenance as a
    Structured Streaming query."""
    return (
        events_stream.writeStream.foreachBatch(make_bitmap_batch_fn(store_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_bitmap_distinct(spark: SparkSession, store_dir: str) -> DataFrame:
    """Serve EXACT per-group distinct counts from the persisted bitmap
    (live generations, mid-compaction-safe): one word-grain OR re-merge,
    then Σ bit_count."""
    from pdf_brain_spark.streaming.generations import kept_partial_rows

    merged = (
        kept_partial_rows(spark, store_dir, _BITMAP_KEYS, ["bits"])
        .groupBy(*_BITMAP_KEYS)
        .agg(*_bitmap_merge_exprs())
    )
    return (
        merged.groupBy("event_type")
        .agg(
            F.sum(F.bit_count("bits")).cast("long").alias("n_distinct"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
    )


def compact_bitmap(spark: SparkSession, store_dir: str, upto_batch_id: int) -> int:
    """Merge committed bitmap generations with bitwise OR (reader-safe
    generation protocol)."""
    from pdf_brain_spark.streaming.generations import compact_partials

    return compact_partials(
        spark,
        store_dir,
        upto_batch_id,
        _BITMAP_KEYS,
        ["bits"],
        merge_exprs=_bitmap_merge_exprs(),
    )


# ---------------------------------------------------------------------------
# Incremental Count-Min Sketch — the bounded-state HEAVY-HITTER monoid
# (Cormode & Muthukrishnan 2005): per-batch (row, col, cnt) cell partials
# merge by plain integer addition (associative, commutative), the classic
# streaming frequency sketch whose estimate min_r cms[r][h_r(x)] is an
# upper bound on the true count with bounded overestimate. Because the
# cells are EXACT integer sums of a DETERMINISTIC hash placement, the
# merged sketch — unlike engine-private approx_count structs — is
# bit-identical to a one-shot build, so a SQL twin can replay it.
# Persisted state: ≤ CMS_ROWS × CMS_COLS longs per live generation,
# independent of corpus size — the property that matters at 100 TB.
# exact top-k (make_term_counts_batch_fn) keeps the true counts; CMS is
# the answer when even the term dictionary doesn't fit.
# ---------------------------------------------------------------------------

CMS_ROWS = 4
CMS_COLS = 512


def cms_col_expr(term_col: str, row_idx: int):
    """Portable CMS column index: md5_long(term '#' row) % CMS_COLS —
    the twin SQL is the same concat/substr/CAST chain every other
    portable-hash gate uses."""
    from pdf_brain_spark.functions.text import md5_long

    return (
        md5_long(F.concat(F.col(term_col), F.lit(f"#{row_idx}"))) % CMS_COLS
    )


def make_cms_batch_fn(store_dir: str, text_col: str = "text"):
    """Per-micro-batch CMS partial over the batch's token stream,
    replay-idempotent (batch_id=N overwrite)."""
    from pdf_brain_spark.functions.text import tokenize

    def _each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pdf_brain_spark.streaming.generations import (
            record_wseq,
            stamp_protocol,
        )

        toks = batch_df.select(F.explode(tokenize(text_col)).alias("term"))
        # ONE tokenize/explode pass: each term fans out to its CMS_ROWS
        # cells through a single array-of-structs explode, then one
        # combinable aggregate — not CMS_ROWS unioned re-scans of the
        # batch (self-review finding: the loop shape re-tokenized the
        # hot path 4x)
        cells = F.array(
            *[
                F.struct(
                    F.lit(r).alias("row_idx"),
                    cms_col_expr("term", r).alias("col_idx"),
                )
                for r in range(CMS_ROWS)
            ]
        )
        partial = (
            toks.select(F.explode(cells).alias("cell"))
            .groupBy(
                F.col("cell.row_idx").alias("row_idx"),
                F.col("cell.col_idx").alias("col_idx"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        stamp_protocol(batch_df.sparkSession, store_dir)
        partial.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")
        record_wseq(batch_df.sparkSession, store_dir, f"batch_id={batch_id}")

    return _each_batch


def streaming_incremental_cms(
    spark: SparkSession,
    docs_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
):
    """Drive incremental CMS maintenance as a Structured Streaming
    query. Per-batch work: CMS_ROWS aggregates over the batch's tokens."""
    return (
        docs_stream.writeStream.foreachBatch(make_cms_batch_fn(store_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cms_estimates(spark: SparkSession, store_dir: str, terms_df: DataFrame) -> DataFrame:
    """Serve CMS frequency estimates for the given (term) frame: re-merge
    live cell generations by integer sum, look up each term's CMS_ROWS
    cells, take the min. Work ∝ sketch size × live generations + the
    probe list — never the token stream."""
    from pdf_brain_spark.streaming.generations import kept_partial_rows

    cells = (
        kept_partial_rows(spark, store_dir, ["row_idx", "col_idx"], ["cnt"])
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    probes = None
    for r in range(CMS_ROWS):
        p = terms_df.select(
            "term",
            F.lit(r).alias("row_idx"),
            cms_col_expr("term", r).alias("col_idx"),
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(F.broadcast(cells), ["row_idx", "col_idx"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_estimate"))
    )


def compact_cms(spark: SparkSession, store_dir: str, upto_batch_id: int) -> int:
    """Merge committed CMS generations by cell-wise integer addition
    (reader-safe generation protocol)."""
    from pdf_brain_spark.streaming.generations import compact_partials

    return compact_partials(
        spark,
        store_dir,
        upto_batch_id,
        ["row_idx", "col_idx"],
        ["cnt"],
        merge_exprs=[F.sum("cnt").cast("long").alias("cnt")],
    )


# ---------------------------------------------------------------------------
# Incremental corpus MinHash signatures — the MIN-monoid (associative,
# commutative, idempotent: the lattice meet) on the partials store: each
# (group, hash-index) cell keeps the minimum portable hash over all
# shingles seen, so per-batch partials merge by elementwise MIN and the
# streamed signature is bit-identical to a one-shot build regardless of
# batching — the corpus-level complement of the per-doc MinHash the dedup
# family uses, served as pairwise group-similarity estimates
# (matching-coordinate fraction estimates Jaccard; Broder 1997).
# Persisted state: MINHASH_SIG_K longs per (group, live generation).
# ---------------------------------------------------------------------------

MINHASH_SIG_K = 16


def _minhash_partial(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    from pdf_brain_spark.functions.text import md5_long, shingles, tokenize_sql

    sh = df.select(
        F.col(group_col).alias("grp"),
        F.explode(shingles(tokenize_sql(text_col), 3)).alias("shingle"),
    )
    ks = F.array(*[F.lit(k) for k in range(MINHASH_SIG_K)])
    return (
        sh.select("grp", "shingle", F.explode(ks).alias("k"))
        .select(
            "grp",
            "k",
            md5_long(
                F.concat(F.col("k").cast("string"), F.lit("#"), F.col("shingle"))
            ).alias("h"),
        )
        .groupBy("grp", "k")
        .agg(F.min("h").cast("long").alias("sig"))
    )


def make_minhash_batch_fn(store_dir: str, group_col: str = "source", text_col: str = "text"):
    """Per-micro-batch MinHash signature partial, replay-idempotent
    (batch_id=N overwrite)."""

    def _each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pdf_brain_spark.streaming.generations import (
            record_wseq,
            stamp_protocol,
        )

        partial = _minhash_partial(batch_df, group_col, text_col)
        stamp_protocol(batch_df.sparkSession, store_dir)
        partial.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")
        record_wseq(batch_df.sparkSession, store_dir, f"batch_id={batch_id}")

    return _each_batch


def streaming_incremental_minhash(
    spark: SparkSession,
    docs_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
):
    """Drive incremental corpus-signature maintenance as a Structured
    Streaming query."""
    return (
        docs_stream.writeStream.foreachBatch(make_minhash_batch_fn(store_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_minhash_similarity(spark: SparkSession, store_dir: str) -> DataFrame:
    """Serve pairwise group-Jaccard estimates from the persisted
    signatures: re-merge live generations by MIN, then count matching
    coordinates per pair. Work ∝ groups² × K — never the corpus."""
    from pdf_brain_spark.streaming.generations import kept_partial_rows

    merged = (
        kept_partial_rows(spark, store_dir, ["grp", "k"], ["sig"])
        .groupBy("grp", "k")
        .agg(F.min("sig").cast("long").alias("sig"))
        .localCheckpoint(eager=True)  # both pair arms reuse it
    )
    a = merged.select(F.col("grp").alias("src_a"), "k", F.col("sig").alias("sig_a"))
    b = merged.select(
        F.col("grp").alias("src_b"), F.col("k").alias("kb"), F.col("sig").alias("sig_b")
    )
    return (
        a.join(b, (F.col("kb") == F.col("k")) & (F.col("src_a") < F.col("src_b")))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(F.when(F.col("sig_a") == F.col("sig_b"), 1).otherwise(0))
            .cast("long")
            .alias("matches")
        )
        .withColumn(
            "jaccard_est_ppm",
            F.expr(f"(matches * 1000000) div {MINHASH_SIG_K}"),
        )
    )


def compact_minhash(spark: SparkSession, store_dir: str, upto_batch_id: int) -> int:
    """Merge committed signature generations with the MIN monoid
    (reader-safe generation protocol)."""
    from pdf_brain_spark.streaming.generations import compact_partials

    return compact_partials(
        spark,
        store_dir,
        upto_batch_id,
        ["grp", "k"],
        ["sig"],
        merge_exprs=[F.min("sig").cast("long").alias("sig")],
    )


# ---------------------------------------------------------------------------
# Streaming incremental NOVELTY store (round 11): first-seen tracking for
# n-gram types across crawl increments. The partial is (ng, fb, fd) — the
# batch and min doc_id where the type first appeared IN THAT BATCH — and
# the merge monoid is min(struct(fb, fd)): associative, commutative, AND
# idempotent, so replays, re-batched streams, and compaction all serve the
# identical first-seen table. This is ngram_novelty_curve's question asked
# the streaming way: "how much of THIS increment is new text", answered
# per batch without ever re-scanning history (the one-shot gate re-reads
# the corpus; the store reads one increment + the type-grain partials).
# ---------------------------------------------------------------------------

NOVELTY_NGRAM_K = 4


def _novelty_merge_exprs():
    first = F.min(F.struct(F.col("fb"), F.col("fd")))
    return [
        first.getField("fb").alias("fb"),
        first.getField("fd").alias("fd"),
    ]


def make_novelty_batch_fn(
    store_dir: str, id_col: str = "doc_id", text_col: str = "text"
):
    """Per-micro-batch first-seen partial: each 4-gram type in the batch
    with the batch id and the min doc id that carried it, replay-
    idempotent (batch_id=N overwrite)."""
    from pdf_brain_spark.functions.text import shingles, tokenize, tokenize_sql

    def _each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partial = (
            batch_df.select(
                F.col(id_col).alias("_id"),
                F.explode(
                    shingles(tokenize(F.col(text_col)), NOVELTY_NGRAM_K)
                ).alias("ng"),
            )
            .groupBy("ng")
            .agg(F.min("_id").cast("long").alias("fd"))
            .select("ng", F.lit(int(batch_id)).cast("long").alias("fb"), "fd")
        )
        from pdf_brain_spark.streaming.generations import (
            record_wseq,
            stamp_protocol,
        )

        stamp_protocol(batch_df.sparkSession, store_dir)
        partial.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")
        record_wseq(batch_df.sparkSession, store_dir, f"batch_id={batch_id}")

    return _each_batch


def streaming_incremental_novelty(
    spark: SparkSession,
    docs_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
):
    """Drive incremental first-seen maintenance as a Structured Streaming
    query (AvailableNow in tests/gate; continuous in production).
    Per-batch work is one type-grain aggregate over the BATCH only."""
    return (
        docs_stream.writeStream.foreachBatch(make_novelty_batch_fn(store_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_novelty(spark: SparkSession, store_dir: str) -> DataFrame:
    """Serve the per-batch novelty report from the persisted store (live
    generations, mid-compaction-safe): merge first-seen per type with
    the store's own min-struct monoid, then one bounded per-batch
    rollup — (first_batch, n_new_types, share ppm of all types)."""
    from pdf_brain_spark.streaming.generations import kept_partial_rows

    merged = (
        kept_partial_rows(spark, store_dir, ["ng"], ["fb", "fd"])
        .groupBy("ng")
        .agg(*_novelty_merge_exprs())
    )
    per_batch = merged.groupBy(F.col("fb").alias("first_batch")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new_types")
    )
    tot = per_batch.agg(F.sum("n_new_types").cast("long").alias("_t"))
    return (
        per_batch.crossJoin(F.broadcast(tot))  # broadcast 1-row total
        .select(
            "first_batch",
            "n_new_types",
            F.expr("(n_new_types * 1000000) div _t").alias("share_ppm"),
        )
        .orderBy("first_batch")
    )


def compact_novelty(spark: SparkSession, store_dir: str, upto_batch_id: int) -> int:
    """Merge committed first-seen partial generations with the store's
    own min-struct monoid (reader-safe generation protocol)."""
    from pdf_brain_spark.streaming.generations import compact_partials

    return compact_partials(
        spark,
        store_dir,
        upto_batch_id,
        ["ng"],
        ["fb", "fd"],
        merge_exprs=_novelty_merge_exprs(),
    )
