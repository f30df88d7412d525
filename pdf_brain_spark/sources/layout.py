"""Physical file-layout optimization — the storage-side lever SURVEY §4
names beyond partitioning and bucketing: range-cluster hot sort keys so
parquet footer min/max statistics prune FILES (and row groups) before a
single byte of data is read.

At 100 TB this is the difference between "the filter is pushed down"
(row-group decode still touches every file) and "the scan plans 0.4% of
the files": a time-range query against an events table range-clustered
on `ts` opens only the files whose [min,max] span intersects the
predicate. Spark applies this automatically from parquet footers; the
operator's job is just to WRITE data so the spans are narrow and
disjoint instead of every file spanning the whole domain (which is what
a hash-shuffled write produces).

`file_stats` / `pruning_ratio` read the footer statistics back via
pyarrow, so tests assert prunability as a measured property of the
layout, not as a hope.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def cluster_by_range(df: DataFrame, n_files: int, *cols: str) -> DataFrame:
    """Rewrite-shape for range clustering: global range partition on the
    leading column(s) (one sampling pass + one shuffle, the same cost any
    sorted write pays), then sort within each output file so row-group
    stats are monotone too. The result written to parquet yields files
    with narrow, mutually disjoint [min,max] spans on `cols`."""
    _require_stats_bearing_timestamps(df, cols)
    return df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)


def _require_stats_bearing_timestamps(df: DataFrame, cols) -> None:
    """INT96 timestamp columns carry no parquet footer statistics, so a
    clustering rewrite on a timestamp key would produce files that cannot
    prune. Spark has no per-write option for the physical timestamp type
    (ParquetOptions exposes only compression/mergeSchema/rebase), and
    silently mutating the shared session conf from inside an operator is
    a hidden side effect on every other write in the session — so this is
    a loud contract instead: raise if a cluster column is a timestamp and
    the session would write INT96. The repo's own sessions set
    TIMESTAMP_MICROS at build time (session.py)."""
    ts_cols = {f.name for f in df.schema.fields if f.dataType.typeName().startswith("timestamp")}
    if not ts_cols.intersection(cols):
        return
    conf = df.sparkSession.conf.get("spark.sql.parquet.outputTimestampType", "INT96")
    if conf == "INT96":
        raise ValueError(
            "clustering on a timestamp column requires footer stats: set "
            "spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS (or _MILLIS) "
            "on the writing session (INT96 timestamps carry no parquet min/max)"
        )


def write_ivf_partitioned(indexed: DataFrame, path: str, list_col: str = "list_id") -> None:
    """Persist an IVF-indexed corpus with `list_col` as a PARTITION column —
    the storage half of the 100 TB ANN story (operators/ann.py probes the
    n_probes nearest lists; with this layout the unprobed lists are pruned
    at planning time and never read at all). A probe query's scan shows the
    probe set under PartitionFilters instead of a data filter, and file
    listing is restricted to the probed directories.

    At real scale you'd additionally range-cluster within each list (see
    cluster_by_range) so footer stats prune row groups inside the probed
    lists too."""
    indexed.write.partitionBy(list_col).mode("overwrite").parquet(path)


def partition_dirs_read(path: str, probe_ids: list[int], list_col: str = "list_id") -> tuple[int, int]:
    """(probed_dirs, total_dirs) for a probe set against a partitioned
    layout — the file-system-level pruning bound a partition-filtered scan
    cannot exceed."""
    def _pid(d: str) -> int | None:
        # NULL keys land in list_id=__HIVE_DEFAULT_PARTITION__ and values
        # can be URL-escaped — anything non-integer is simply never probed
        try:
            return int(d.split("=", 1)[1])
        except ValueError:
            return None

    dirs = [d for d in os.listdir(path) if d.startswith(f"{list_col}=")]
    probed = [d for d in dirs if _pid(d) in set(probe_ids)]
    return len(probed), len(dirs)


def file_stats(path: str, col: str) -> list[tuple[str, object, object]]:
    """(file, min, max) of `col` from each parquet footer under `path` —
    the exact statistics a scan's file-level pruning consults."""
    import datetime

    import pyarrow.parquet as pq

    def _naive(v):
        # pyarrow returns tz-aware (UTC) datetimes; Spark collects naive
        # session-UTC ones — normalize so callers can compare directly
        if isinstance(v, datetime.datetime) and v.tzinfo is not None:
            return v.replace(tzinfo=None)
        return v

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        f = pq.ParquetFile(os.path.join(path, name))
        idx = f.schema_arrow.get_field_index(col)
        lo, hi = None, None
        for rg in range(f.metadata.num_row_groups):
            st = f.metadata.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None or st.min < lo else lo
            hi = st.max if hi is None or st.max > hi else hi
        out.append((name, _naive(lo), _naive(hi)))
    return out


def pruning_ratio(path: str, col: str, lo, hi) -> float:
    """Fraction of files a [lo, hi] predicate on `col` must open, judged
    purely on footer min/max — 1.0 means the layout prunes nothing."""
    stats = file_stats(path, col)
    if not stats:
        return 1.0
    touched = sum(
        1
        for _, fmin, fmax in stats
        if fmin is None or fmax is None or (fmax >= lo and fmin <= hi)
    )
    return touched / len(stats)


def cluster_by_zorder(
    df: DataFrame, n_files: int, *cols: str, bits: int = 12, bucket: str = "minmax"
) -> DataFrame:
    """Multi-column interleaved-bit (Morton / Z-order) clustering: the
    rewrite shape for tables queried by MORE THAN ONE filter dimension,
    where `cluster_by_range` can only serve its leading column. Each
    column is min-max-normalized to a `bits`-bit integer bucket (one
    scalar aggregate to the driver — 2 values per column), the buckets'
    bits are interleaved into a single z-value with a statically unrolled
    chain of native shift/mask expressions (no UDF; whole-stage codegen
    keeps it JVM-side), and the write range-partitions + sorts on z.

    Files then cover compact axis-aligned rectangles of the key space
    instead of full-width stripes: a box predicate on (c1, c2) touches
    O(box area + perimeter) files rather than min(1, box side) of the
    whole table. The claim is measured, not hoped — see
    tests/test_scale_layout.py, which counts footer-stat file hits for a
    2-D box against this layout vs a linear sort.

    At 100 TB: the normalization bounds should come from table metadata
    (or a fixed domain contract) rather than the extra scan; the z
    computation and write shape are unchanged.

    `bucket="quantile"` swaps the min-max bucket map for an equi-DEPTH
    one (approxQuantile boundaries, one bounded-error pass; lookup via
    MLlib's JVM-side Bucketizer): min-max cells collapse on
    value-skewed dimensions — a log-distributed key packs most rows
    into the lowest few cells, so a predicate over the dense region
    touches almost every file — while quantile cells hold equal row
    counts by construction, keeping the Z-tiling balanced whatever the
    value distribution (measured in tests/test_scale_layout.py). The
    interleave and write shape are identical; quantile mode caps bits
    at 8 (255 boundaries) since finer equi-depth cuts exceed
    approxQuantile's usefulness."""
    from pyspark.sql import functions as F

    _require_stats_bearing_timestamps(df, cols)
    n = len(cols)
    if n < 2:
        raise ValueError("cluster_by_zorder needs >= 2 columns; use cluster_by_range for one")
    if bucket not in ("minmax", "quantile"):
        raise ValueError(f"unknown bucket mode {bucket!r}")
    # 63-bit budget for the interleave (bit positions b*n+i must stay
    # below the long sign bit): with many columns the per-column depth
    # shrinks — bits=12 at 6 columns would push positions past 63 and
    # silently corrupt the z-value, so clamp to what fits
    if 63 // n < 1:
        raise ValueError(f"cluster_by_zorder supports at most 63 columns, got {n}")
    bits = min(bits, 63 // n)
    as_num = [F.col(c).cast("double") for c in cols]

    if bucket == "quantile":
        from pyspark.ml.feature import Bucketizer

        bits = min(bits, 8)
        n_buckets = 1 << bits
        work = df.select(
            "*", *[c.alias(f"_num{i}") for i, c in enumerate(as_num)]
        )
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bucket_cols = []
        for i in range(n):
            qs = work.approxQuantile(f"_num{i}", probs, 0.001)
            splits = [float("-inf")] + sorted(set(qs)) + [float("inf")]
            b = Bucketizer(
                splits=splits, inputCol=f"_num{i}", outputCol=f"_b{i}"
            )
            work = b.transform(work)
            bucket_cols.append(F.col(f"_b{i}").cast("long"))
        src = work
    else:
        bounds = df.agg(
            *[f(c).alias(f"{tag}{i}") for i, c in enumerate(as_num) for tag, f in (("lo", F.min), ("hi", F.max))]
        ).first()
        top = (1 << bits) - 1
        bucket_cols = []
        for i, c in enumerate(as_num):
            lo, hi = float(bounds[f"lo{i}"]), float(bounds[f"hi{i}"])
            span = (hi - lo) or 1.0
            bucket_cols.append(
                F.least(
                    F.lit(top),
                    F.greatest(
                        F.lit(0), F.floor((c - F.lit(lo)) / F.lit(span) * F.lit(top + 0.0))
                    ),
                ).cast("long")
            )
        src = df

    z = F.lit(0).cast("long")
    for i, bc in enumerate(bucket_cols):
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(bc, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return (
        src.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[c for c in src.columns if c.startswith("_num") or c.startswith("_b")])
    )


def files_touched_2d(path: str, pred1: tuple, pred2: tuple) -> tuple[int, int]:
    """(touched, total) file counts for a conjunctive 2-D box predicate
    judged purely on footer min/max of both columns — what a scan's
    file-level pruning achieves on this layout. Each pred is
    (col, lo, hi)."""
    c1, lo1, hi1 = pred1
    c2, lo2, hi2 = pred2
    s1 = dict((f, (a, b)) for f, a, b in file_stats(path, c1))
    s2 = dict((f, (a, b)) for f, a, b in file_stats(path, c2))
    touched = 0
    for f in s1:
        a1, b1 = s1[f]
        a2, b2 = s2.get(f, (None, None))
        hit1 = a1 is None or b1 is None or (b1 >= lo1 and a1 <= hi1)
        hit2 = a2 is None or b2 is None or (b2 >= lo2 and a2 <= hi2)
        if hit1 and hit2:
            touched += 1
    return touched, len(s1)
