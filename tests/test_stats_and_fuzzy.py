"""Planted-answer and pure-python second-opinion tests for the
sweep-line concurrency, fuzzy-domain, PMI, A/B z-test, and Benford
operators. The python references re-derive each statistic from the
textbook definition (not from SQL), so a common-mode formula bug in the
Spark/DuckDB twins cannot match green here."""

from __future__ import annotations

import datetime
import math
import random
from collections import Counter

import duckdb
from pyspark.sql import functions as F

from pdf_brain_spark.operators.analytics import pmi_pairs
from pdf_brain_spark.operators.dedup import fuzzy_domain_pairs
from pdf_brain_spark.operators.temporal import peak_concurrency

SF_DIR = "/root/testdata/sf0.001"


def _ts(h):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=h)


def _iv_df(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(s), _ts(e)) for k, s, e in rows],
        "k string, start_ts timestamp_ntz, end_ts timestamp_ntz",
    )


def test_peak_concurrency_planted_half_open(spark):
    # [0,10) [5,15) [10,20): the end at 10 nets against the start at 10,
    # so concurrency is 1,2,2,1 - peak 2 first reached at hour 5.
    out = peak_concurrency(
        _iv_df(spark, [("a", 0, 10), ("a", 5, 15), ("a", 10, 20)]),
        "k", "start_ts", "end_ts",
    ).collect()
    assert len(out) == 1
    assert out[0]["peak"] == 2 and out[0]["peak_ts"] == _ts(5)


def test_peak_concurrency_back_to_back_never_overlaps(spark):
    out = peak_concurrency(
        _iv_df(spark, [("a", 0, 5), ("a", 5, 10), ("a", 10, 15)]),
        "k", "start_ts", "end_ts",
    ).collect()
    assert out[0]["peak"] == 1 and out[0]["peak_ts"] == _ts(0)


def test_peak_concurrency_randomized_vs_sweep(spark):
    rng = random.Random(77)
    rows = []
    for k in ("k1", "k2", "k3"):
        for _ in range(rng.randrange(5, 25)):
            s = rng.randrange(0, 50)
            rows.append((k, s, s + rng.randrange(1, 12)))
    want = {}
    for k in ("k1", "k2", "k3"):
        deltas = Counter()
        for kk, s, e in rows:
            if kk == k:
                deltas[s] += 1
                deltas[e] -= 1
        run, peak, peak_at = 0, -(10**9), None
        for t in sorted(deltas):
            run += deltas[t]
            if run > peak:
                peak, peak_at = run, t
        want[k] = (peak, _ts(peak_at))
    got = {
        r["k"]: (r["peak"], r["peak_ts"])
        for r in peak_concurrency(
            _iv_df(spark, rows), "k", "start_ts", "end_ts"
        ).collect()
    }
    assert got == want


def _lev(a, b):
    # textbook Wagner-Fischer
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_domain_pairs_planted(spark):
    df = spark.createDataFrame(
        [("red widget",)] * 3 + [("rad widget",)] * 2 + [("blue bolt",)],
        "name string",
    )
    got = fuzzy_domain_pairs(df, "name", max_dist=2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["name_a"], r["name_b"], r["dist"]) == ("rad widget", "red widget", 1)
    assert (r["rows_a"], r["rows_b"]) == (2, 3)


def test_fuzzy_domain_pairs_randomized_vs_dp(spark):
    rng = random.Random(13)
    alphabet = "abcd"
    names = list({
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(3, 8)))
        for _ in range(30)
    })
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in fuzzy_domain_pairs(df, "name", max_dist=3).collect()
    }
    want = {}
    for i, a in enumerate(sorted(names)):
        for b in sorted(names)[i + 1:]:
            d = _lev(a, b)
            if d <= 3:
                want[(a, b)] = d
    assert got == want


def test_fuzzy_domain_pairs_refuses_unbounded_domain(spark):
    df = spark.createDataFrame([(str(i),) for i in range(40)], "name string")
    try:
        fuzzy_domain_pairs(df, "name", max_dist=1, domain_cap=10)
        raise AssertionError("expected ValueError for domain over cap")
    except ValueError as e:
        assert "cap" in str(e)


def test_pmi_pairs_planted_collocation(spark):
    # "new york" always adjacent; "foo"/"bar" never adjacent to anything
    # but themselves. Corpus: 8x "new york" + filler tokens.
    docs = spark.createDataFrame(
        [("new york " * 8,), ("foo bar " * 8,)],
        "text string",
    )
    got = {
        (r["term_a"], r["term_b"]): r
        for r in pmi_pairs(docs, min_pair=5).collect()
    }
    # T=32, B=30. n(new)=n(york)=8, n_ab(new->york)=8:
    # pmi = ln(8*32*32/(30*8*8)) = ln(1024/1920*8/8*...) -> ln(4.266...)
    r = got[("new", "york")]
    want = round(math.log((8 * 32 * 32) / (30 * 8 * 8)) * 1e6)
    assert r["pmi_micro_nats"] == want
    assert r["n_ab"] == 8 and r["n_a"] == 8 and r["n_b"] == 8
    # york->new occurs 7x within the first doc (wraparound-free)
    assert ("york", "new") in got and got[("york", "new")]["n_ab"] == 7


def test_ab_test_python_reference(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_type FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    users: dict[int, int] = {}
    for uid, et in rows:
        users[uid] = max(users.get(uid, 0), 1 if et == "purchase" else 0)
    ua = sum(1 for u in users if u % 2 == 0)
    ca = sum(c for u, c in users.items() if u % 2 == 0)
    ub = sum(1 for u in users if u % 2 == 1)
    cb = sum(c for u, c in users.items() if u % 2 == 1)
    pooled = (ca + cb) / (ua + ub)
    se = math.sqrt(pooled * (1 - pooled) * (1 / ua + 1 / ub))
    from pdf_brain_spark.queries import get_queries, lookup_query

    row = lookup_query("events_ab_test")(spark, SF_DIR).collect()[0]
    assert (row["users_a"], row["conv_a"], row["users_b"], row["conv_b"]) == (
        ua, ca, ub, cb,
    )
    if se == 0:
        assert row["z_score"] is None
    else:
        z = (ca / ua - cb / ub) / se
        assert abs(row["z_score"] - round(z, 6)) < 1e-9


def test_benford_python_reference(spark):
    con = duckdb.connect()
    prices = [
        p[0]
        for p in con.execute(
            f"SELECT o_totalprice FROM '{SF_DIR}/orders.parquet'"
        ).fetchall()
    ]
    counts = Counter(int(str(round(p * 100))[0]) for p in prices)
    total = sum(counts.values())
    from pdf_brain_spark.queries import get_queries, lookup_query

    got = {
        r["digit"]: r
        for r in lookup_query("benford_digit_audit")(spark, SF_DIR).collect()
    }
    assert set(got) == set(counts)
    for d, n in counts.items():
        r = got[d]
        assert r["observed"] == n
        assert r["observed_ppm"] == (n * 1_000_000) // total
        assert r["expected_ppm"] == round(math.log10(1 + 1 / d) * 1e6)
        assert r["deviation_ppm"] == r["observed_ppm"] - r["expected_ppm"]


def test_decision_stump_finds_planted_split(spark):
    """On data with a real threshold (y = 1 iff x <= 30, with 10%
    label noise), the stump trainer must recover a threshold in the
    planted band and beat the baseline."""
    import random

    from pdf_brain_spark.queries import get_queries  # noqa: F401  (registry import path)
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    rng = random.Random(3)
    rows = []
    for i in range(400):
        x = rng.randint(1, 100)
        y = 1 if x <= 30 else 0
        if rng.random() < 0.1:
            y = 1 - y
        rows.append((x, y))
    d = spark.createDataFrame(rows, "x long, y long")
    vals = d.groupBy("x").agg(F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos"))
    tot = vals.agg(F.sum("cnt").alias("n"), F.sum("pos").alias("p"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = vals.select("x", F.sum("cnt").over(w).alias("n_t"), F.sum("pos").over(w).alias("p_t"))
    best = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "x",
            F.greatest(
                F.col("p_t") + ((F.col("n") - F.col("n_t")) - (F.col("p") - F.col("p_t"))),
                (F.col("n_t") - F.col("p_t")) + (F.col("p") - F.col("p_t")),
            ).alias("n_correct"),
            "n",
        )
        .orderBy(F.col("n_correct").desc(), F.col("x").asc())
        .first()
    )
    # noise-tolerant: threshold within a few values of 30, accuracy ~90%
    assert 27 <= best["x"] <= 33, best
    assert best["n_correct"] / best["n"] > 0.85, best
