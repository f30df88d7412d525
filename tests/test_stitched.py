"""stitched_prefix_sums == the global-window running sum, exactly —
randomized and adversarial-shape proofs for the reusable two-level scan
(operators/stitched.py), the bounded_axis family's implemented
safe_alternative."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_brain_spark.operators.stitched import stitched_prefix_sums


def _global_form(df, order_col, sum_cols):
    w = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.select(
        "*", *[F.sum(c).over(w).alias(c + "_cum") for c in sum_cols]
    )


def _assert_equal(spark, rows, bucket_width):
    df = spark.createDataFrame(rows, "v long, ca long, cb long")
    got = sorted(
        map(
            tuple,
            stitched_prefix_sums(
                df, "v", ["ca", "cb"], what="test axis",
                bucket_width=bucket_width,
            ).collect(),
        )
    )
    want = sorted(map(tuple, _global_form(df, "v", ["ca", "cb"]).collect()))
    assert got == want and len(got) == len(rows)


def test_stitched_prefix_sums_randomized_vs_global(spark):
    """Random histograms across hostile shapes: negative axis values
    (div truncates toward zero — bucket 0 spans (-w, w), still
    monotone), values exactly ON bucket boundaries, a single bucket,
    width 1 (every value its own bucket), and sparse domains with empty
    buckets between occupied ones."""
    rng = random.Random(7)
    for width in (1, 5, 4096):
        for _ in range(4):
            n = rng.randrange(1, 120)
            vs = rng.sample(range(-50_000, 50_000), n)
            # force boundary hits and the zero straddle
            vs = list(set(vs + [0, width, -width, 2 * width - 1, -1]))
            rows = [
                (v, rng.randrange(0, 9), rng.randrange(0, 9)) for v in vs
            ]
            _assert_equal(spark, rows, width)


def test_stitched_prefix_sums_single_row_and_single_bucket(spark):
    _assert_equal(spark, [(42, 3, 1)], 4096)
    _assert_equal(spark, [(1, 1, 0), (2, 0, 2), (3, 5, 5)], 1_000_000)


def test_stitched_exclusive_form_is_cum_minus_current(spark):
    """The mid-rank device wants the EXCLUSIVE prefix (rows strictly
    before v); the documented derivation cum - current must equal a
    1-PRECEDING global window."""
    rows = [(v, v % 7, (v * 3) % 5) for v in range(-20, 25, 3)]
    df = spark.createDataFrame(rows, "v long, ca long, cb long")
    st = stitched_prefix_sums(df, "v", ["ca"], what="excl test",
                              bucket_width=16)
    got = {
        r["v"]: r["ca_cum"] - r["ca"] for r in st.collect()
    }
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["v"]: r["cprev"]
        for r in df.select(
            "v", F.coalesce(F.sum("ca").over(w), F.lit(0)).alias("cprev")
        ).collect()
    }
    assert got == want


def test_stitched_with_tiebreaks_matches_global_composite_order(spark):
    """Duplicate axis values with unique tiebreaks: ties share a bucket,
    so the intra-bucket window resolves them exactly as the global
    composite-order window would (the Pareto/ABC row-grain shape —
    running revenue + running row count over (rev DESC, key ASC) via
    the negated axis)."""
    import random

    rng = random.Random(99)
    rows = []
    k = 0
    for _ in range(400):
        v = rng.randrange(-30, 30)  # heavy ties
        rows.append((-v, k, rng.randrange(0, 1000), 1))
        k += 1
    df = spark.createDataFrame(rows, "neg long, key long, cents long, one long")
    st = stitched_prefix_sums(
        df, "neg", ["cents", "one"], what="tiebreak test",
        bucket_width=7, tiebreak_cols=["key"],
    )
    got = sorted((r["neg"], r["key"], r["cents_cum"], r["one_cum"]) for r in st.collect())
    w = Window.orderBy("neg", "key").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = sorted(
        (r["neg"], r["key"], r["cc"], r["rn"])
        for r in df.select(
            "neg", "key",
            F.sum("cents").over(w).alias("cc"),
            F.sum("one").over(w).alias("rn"),
        ).collect()
    )
    assert got == want and len(got) == 400
    # the running count really is row_number over the same order
    rn = {
        (r["neg"], r["key"]): r["one_cum"] for r in st.collect()
    }
    wrn = Window.orderBy("neg", "key")
    for r in df.select("neg", "key", F.row_number().over(wrn).alias("x")).collect():
        assert rn[(r["neg"], r["key"])] == r["x"]


def test_ntile_from_rank_matches_spark_ntile(spark):
    """ntile_from_rank == F.ntile(k) for every frame size mod k shape,
    including n < k (some buckets empty) and the exact boundary rows."""
    from pdf_brain_spark.operators.stitched import ntile_from_rank

    for n in [1, 2, 3, 4, 5, 7, 8, 9, 100, 101, 102, 103]:
        df = spark.range(1, n + 1).select(F.col("id").alias("v"))
        w = Window.orderBy("v")
        got = df.select(
            "v",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(
                Window.partitionBy()
            ).alias("n"),
            F.ntile(4).over(w).cast("long").alias("want"),
        ).select(
            "v", "want",
            ntile_from_rank(F.col("rn"), F.col("n"), 4).alias("got"),
        )
        rows = got.collect()
        assert all(r["got"] == r["want"] for r in rows), (n, [
            (r["v"], r["want"], r["got"]) for r in rows if r["got"] != r["want"]
        ][:5])


def test_stitched_prefix_min_matches_global(spark):
    """Running MIN, inclusive and exclusive, against the global window —
    including the NULL first-prefix of the exclusive form and negative
    axes (the skyline frontier shape)."""
    import random

    from pdf_brain_spark.operators.stitched import stitched_prefix_min

    rng = random.Random(41)
    vs = rng.sample(range(-2000, 2000), 300)
    rows = [(v, rng.randrange(-50, 50)) for v in vs]
    df = spark.createDataFrame(rows, "v long, m long")
    for inclusive in (True, False):
        st = stitched_prefix_min(
            df, "v", "m", what="pmin test", bucket_width=37,
            inclusive=inclusive,
        )
        got = {r["v"]: r["m_pmin"] for r in st.collect()}
        hi = Window.currentRow if inclusive else -1
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, hi)
        want = {
            r["v"]: r["x"]
            for r in df.select("v", F.min("m").over(w).alias("x")).collect()
        }
        assert got == want, inclusive
    assert want[min(vs)] is None  # exclusive: global-first prefix is NULL


def test_carry_guard_welded_into_every_cum_column(spark):
    """ADVICE r12: the bounded_axis guard must survive Catalyst pruning
    regardless of WHICH cum column a call site keeps. assert_true
    compiles to raise_error in the physical plan; each single-column
    projection must retain one."""
    from pdf_brain_spark.operators.stitched import stitched_prefix_sums

    df = spark.range(500).select(
        F.col("id").alias("v"), F.lit(1).alias("a"), F.lit(2).alias("b")
    )
    out = stitched_prefix_sums(df, "v", ["a", "b"], what="weld test")
    for keep in (["v", "a_cum"], ["v", "b_cum"]):
        plan = (
            out.select(*keep)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("raise_error") >= 1, keep
