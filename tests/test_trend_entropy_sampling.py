"""Planted-answer and pure-python second-opinion tests for EWMA
smoothing, grouped OLS, token entropy, and Neyman stratified sampling.
The python references implement the textbook recursions/formulas
directly, so a formula bug shared by the Spark/DuckDB twins cannot pass
here."""

from __future__ import annotations

import datetime
import hashlib
import math
import random
from collections import Counter, defaultdict

import duckdb
from pyspark.sql import functions as F

from pdf_brain_spark.operators.analytics import grouped_ols, token_entropy
from pdf_brain_spark.operators.temporal import ewma_smooth

SF_DIR = "/root/testdata/sf0.001"


def _ts(h):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=h)


def _series_df(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(i), int(x)) for k, i, x in rows],
        "k string, bucket timestamp_ntz, x long",
    )


def test_ewma_constant_series_is_fixed_point(spark):
    rows = [("a", i, 40) for i in range(6)]
    out = ewma_smooth(_series_df(spark, rows), "k", "bucket", "x").collect()
    assert all(r["ewma_scaled"] == 320 and r["ewma"] == 40.0 for r in out)


def test_ewma_randomized_vs_python_recursion(spark):
    rng = random.Random(5150)
    rows = []
    for k in ("a", "b", "c"):
        for i in range(rng.randrange(4, 30)):
            rows.append((k, i, rng.randrange(0, 200)))
    # textbook scaled-integer recursion; python >> is arithmetic (floor),
    # matching Spark shiftright and DuckDB >>
    want = {}
    series = defaultdict(list)
    for k, i, x in rows:
        series[k].append((i, x))
    for k, pts in series.items():
        s = None
        for i, x in sorted(pts):
            s = x * 8 if s is None else s + ((x * 8 - s) >> 3)
            want[(k, i)] = s
    got = {
        (r["k"], (r["bucket"] - _ts(0)) // datetime.timedelta(hours=1)): r[
            "ewma_scaled"
        ]
        for r in ewma_smooth(_series_df(spark, rows), "k", "bucket", "x").collect()
    }
    assert got == want


def test_ols_planted_perfect_line_and_degenerate(spark):
    rows = [("lin", x, 3 * x + 7) for x in range(10)] + [
        ("flat", 4, y) for y in (1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    got = {r["k"]: r for r in grouped_ols(df, "k", "x", "y").collect()}
    assert got["lin"]["slope"] == 3.0 and got["lin"]["intercept"] == 7.0
    assert got["flat"]["slope"] is None and got["flat"]["intercept"] is None
    assert got["flat"]["n_points"] == 3


def test_ols_randomized_vs_closed_form(spark):
    rng = random.Random(99)
    rows = []
    want = {}
    for k in ("g0", "g1"):
        pts = [
            (rng.randrange(0, 1000), rng.randrange(-500, 500))
            for _ in range(rng.randrange(5, 40))
        ]
        if len({p[0] for p in pts}) < 2:
            pts.append((1001, 0))
        rows += [(k, x, y) for x, y in pts]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        want[k] = (slope, (sy - slope * sx) / n)
    df = spark.createDataFrame(rows, "k string, x long, y long")
    got = {r["k"]: r for r in grouped_ols(df, "k", "x", "y").collect()}
    for k, (sl, ic) in want.items():
        assert abs(got[k]["slope"] - sl) < 1e-5, k
        assert abs(got[k]["intercept"] - ic) < 1e-5, k


def test_entropy_uniform_and_singleton(spark):
    docs = spark.createDataFrame(
        [("u", "a b c d " * 5), ("s", "zzz " * 9)],
        "g string, text string",
    )
    got = {r["g"]: r for r in token_entropy(docs, "g").collect()}
    # uniform over 4 terms: H = ln 4; floor-div loses at most 1 micro-nat
    want = round(math.log(4) * 1e6)
    assert abs(got["u"]["entropy_micro_nats"] - want) <= 2
    assert got["u"]["n_terms"] == 4 and got["u"]["total_tokens"] == 20
    assert got["s"]["entropy_micro_nats"] == 0


def test_entropy_python_reference_on_fixture(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    counts: dict[str, Counter] = defaultdict(Counter)
    for src, text in rows:
        counts[src].update(t for t in text.lower().strip().split() if t)
    from pdf_brain_spark.queries import get_queries, lookup_query

    got = {
        r["source"]: r
        for r in lookup_query("source_token_entropy")(spark, SF_DIR).collect()
    }
    assert set(got) == set(counts)
    for src, c in counts.items():
        T = sum(c.values())
        s = sum(n * round(math.log(n) * 1e6) for n in c.values())
        want = round(math.log(T) * 1e6) - s // T
        assert got[src]["entropy_micro_nats"] == want, src
        assert got[src]["total_tokens"] == T


def test_neyman_python_reference_on_fixture(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, source, n_chars FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    strata: dict[str, list] = defaultdict(list)
    for did, src, nc in rows:
        strata[src].append((did, nc))
    score = {}
    for src, docs in strata.items():
        n = len(docs)
        sx = sum(nc for _, nc in docs)
        sxx = sum(nc * nc for _, nc in docs)
        score[src] = round(math.sqrt(n * sxx - sx * sx))
    tot, n_docs = sum(score.values()), len(rows)
    alloc = {
        src: ((n_docs // 10) * sc) // tot for src, sc in score.items()
    }
    want = set()
    for src, docs in strata.items():
        ordered = sorted(
            docs, key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest(), d[0])
        )
        want.update((d[0], src) for d in ordered[: alloc[src]])
    from pdf_brain_spark.queries import get_queries, lookup_query

    got = {
        (r["doc_id"], r["source"])
        for r in lookup_query("stratified_neyman_sample")(
            spark, SF_DIR
        ).collect()
    }
    assert got == want
