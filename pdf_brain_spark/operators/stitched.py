"""Partition-and-stitch prefix sums: the distributed form of
``sum(x) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)``.

The repo's rank/CDF statistics (Mann-Whitney mid-ranks, KS cumulative
counts, AUC sweeps, lift curves …) all reduce to running sums over a
DISTINCT-VALUE histogram axis. The single-file form is one
``Window.orderBy(v)`` — exact, but single-partition, so every site
carries a ``bounded_axis`` guard that fails loudly when the value
domain outgrows one task. This module is the guard's documented
``safe_alternative`` made reusable (the two-level scan — Blelloch 1990;
the same shape ``sessions_little_law_audit`` ships for its time axis):

  1. bucket the axis with a monotone integer map (``v div width``);
  2. intra-bucket running sums in a PARTITIONED window (distributed);
  3. one bucket-grain frame: each bucket's total, cumulated over
     buckets (the only remaining single-partition window — its axis is
     ``domain/width``, guarded by name);
  4. broadcast-join the carry back and add.

Exactness: integer sums are associative, the bucket map is monotone
non-decreasing, and rows are unique per axis value, so
``carry(bucket(v)) + intra(v) == global_prefix(v)`` row for row — no
approximation anywhere. Proven against the global window on randomized
histograms (negative axes, bucket-boundary values, single-bucket and
empty frames) in tests/test_stitched.py, and cross-engine by every
consuming gate's DuckDB oracle, which keeps the textbook global-window
SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pdf_brain_spark.functions.guards import bounded_axis

DEFAULT_BUCKET_WIDTH = 4096


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer floor division for non-negative integer columns:
    (a - a%b) is a multiple of b, and multiple/b is exact in double for
    values < 2^53, so no float-rounding edge can off-by-one the floor
    (a bare floor(a/b) could round a .999… quotient up)."""
    return ((a - a % b) / b).cast("long")


def ntile_from_rank(rn: Column, n: Column, k: int) -> Column:
    """Exact SQL-standard NTILE(k) from a 1-based global rank and the
    frame size — the first ``n mod k`` buckets take ``n div k + 1``
    rows, the rest ``n div k`` (Spark's and DuckDB's shared semantics;
    pinned against F.ntile in tests/test_stitched.py). With ``rn`` a
    stitched running count this replaces a single-partition ntile
    window with the distributed scan. Non-negative integer columns
    only; all arithmetic is exact-integer (see _idiv)."""
    kk = F.lit(k)
    s = _idiv(n, kk)          # small bucket size
    m = n % kk                # number of size-(s+1) buckets
    big = m * (s + 1)         # rows living in the big buckets
    return F.when(rn <= big, _idiv(rn + s, s + 1)).otherwise(
        m + _idiv(rn - big + s - 1, s)
    )


def stitched_prefix_sums(
    df: DataFrame,
    order_col: str,
    sum_cols: list[str],
    what: str,
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
    suffix: str = "_cum",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Append INCLUSIVE running sums over the global ``order_col`` order.

    For each ``c`` in ``sum_cols`` adds ``c + suffix`` =
    ``sum(c) OVER (ORDER BY order_col[, tiebreaks] ROWS UNBOUNDED
    PRECEDING)``, computed partition-and-stitch. The EXCLUSIVE form
    every mid-rank identity wants is ``c_cum - c`` — derive it at the
    call site rather than paying a second window. A running COUNT
    (row_number over the same order) is the prefix sum of a literal 1.

    Contract: ``(order_col, *tiebreak_cols)`` is unique per row, with
    ``order_col`` integer. Without tiebreaks that means a histogram
    axis (at most one row per value); WITH tiebreaks the axis may
    repeat — ties share a bucket (the bucket map depends only on
    ``order_col``), so the intra-bucket window resolves them in the
    same lexicographic order the global window would, and the carry is
    tie-free by construction. Descending primary order = negate the
    axis at the call site. ``v div width`` truncates toward zero, which
    is still monotone non-decreasing over negatives (bucket 0 just
    spans ``(-width, width)``) — order, not bucket uniformity, is what
    exactness needs.
    """
    bucket = F.expr(f"{order_col} div {int(bucket_width)}")
    b = df.withColumn("__bucket", bucket)
    wi = (
        Window.partitionBy("__bucket")
        .orderBy(order_col, *(tiebreak_cols or []))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = b.select(
        "*", *[F.sum(c).over(wi).alias(f"__intra_{c}") for c in sum_cols]
    )
    wb = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )

    # The guard is welded into EVERY carry column (ADVICE r12): guard
    # survival must not depend on which cum columns the caller keeps —
    # Catalyst prunes unconsumed expressions, so a single guarded column
    # would vanish if a call site dropped it downstream. All guards
    # share one row_number over the same window spec (one WindowExec),
    # so N columns still cost one pass.
    def _guarded_carry(c: str) -> Column:
        return bounded_axis(
            F.coalesce(F.sum(f"__tot_{c}").over(wb), F.lit(0)),
            ["__bucket"],
            f"{what} bucket-carry axis",
            safe_alternative="widen bucket_width (the carry frame holds "
            "domain/width rows), or recursively stitch the carry itself",
        )

    carry = (
        b.groupBy("__bucket")
        .agg(*[F.sum(c).alias(f"__tot_{c}") for c in sum_cols])
        .select(
            "__bucket",
            *[_guarded_carry(c).alias(f"__carry_{c}") for c in sum_cols],
        )
    )
    out = intra.join(F.broadcast(carry), "__bucket")
    proj = [F.col(c) for c in df.columns] + [
        (F.col(f"__carry_{c}") + F.col(f"__intra_{c}")).alias(c + suffix)
        for c in sum_cols
    ]
    return out.select(*proj)


def stitched_prefix_min(
    df: DataFrame,
    order_col: str,
    val_col: str,
    what: str,
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
    tiebreak_cols: list[str] | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Append ``val_col + "_pmin"`` = the running MIN of ``val_col``
    over the global ``order_col`` order (same two-level stitch as
    stitched_prefix_sums — min is associative, so carry-min of earlier
    buckets combined with the intra-bucket running min via ``least``
    is exact). Unlike sums, min has no inverse, so the EXCLUSIVE form
    (strictly-earlier rows — the skyline frontier shape) is computed
    directly with a 1-PRECEDING intra frame and an exclusive bucket
    carry; the global-first row's prefix is NULL, exactly as the
    global window's empty frame would give, and ``least`` skips NULLs
    on the stitch. Same uniqueness contract as stitched_prefix_sums.
    """
    bucket = F.expr(f"{order_col} div {int(bucket_width)}")
    b = df.withColumn("__bucket", bucket)
    hi = Window.currentRow if inclusive else -1
    wi = (
        Window.partitionBy("__bucket")
        .orderBy(order_col, *(tiebreak_cols or []))
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    intra = b.select("*", F.min(val_col).over(wi).alias("__intra"))
    wb = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = (
        b.groupBy("__bucket")
        .agg(F.min(val_col).alias("__bmin"))
        .select(
            "__bucket",
            bounded_axis(
                F.min("__bmin").over(wb),
                ["__bucket"],
                f"{what} bucket-carry axis",
                safe_alternative="widen bucket_width (the carry frame "
                "holds domain/width rows), or recursively stitch the "
                "carry itself",
            ).alias("__carry"),
        )
    )
    out = intra.join(F.broadcast(carry), "__bucket")
    proj = [F.col(c) for c in df.columns] + [
        F.least(F.col("__carry"), F.col("__intra")).alias(val_col + "_pmin")
    ]
    return out.select(*proj)
