"""Planted-answer and pure-python second-opinion tests for cohort LTV,
PSI drift, JSD divergence, and fuzzy merge groups."""

from __future__ import annotations

import datetime
import math
from collections import Counter, defaultdict

import duckdb

from pdf_brain_spark.operators.dedup import (
    connected_components,
    fuzzy_domain_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def test_cohort_ltv_planted(spark):
    rows = [
        # cust 1: first order 2024-01 (idx 24289), buys again in 2024-03
        (1, datetime.datetime(2024, 1, 5), 10.0),
        (1, datetime.datetime(2024, 3, 20), 20.0),
        # cust 2: same cohort, one order
        (2, datetime.datetime(2024, 1, 15), 30.0),
        # cust 3: cohort 2024-02
        (3, datetime.datetime(2024, 2, 1), 40.0),
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp_ntz, o_totalprice double"
    )
    import pdf_brain_spark.queries as q

    # patch the loader in the gate's OWN module globals (post-split,
    # gates live in pdf_brain_spark/gates/* — patching the queries
    # facade would no longer reach the gate's load_table binding)
    fn = q.lookup_query("cohort_ltv_curves")
    orig = fn.__globals__["load_table"]
    try:
        fn.__globals__["load_table"] = lambda s, name, d: df
        out = {
            (r["cohort_idx"], r["age_month"]): r
            for r in fn(spark, SF_DIR).collect()
        }
    finally:
        fn.__globals__["load_table"] = orig
    c24_1 = 2024 * 12 + 1
    c24_2 = 2024 * 12 + 2
    assert out[(c24_1, 0)]["cum_cents"] == 4000 and out[(c24_1, 0)]["customers"] == 2
    assert out[(c24_1, 2)]["cum_cents"] == 6000
    assert out[(c24_1, 2)]["ltv_cents_per_customer"] == 3000
    assert out[(c24_2, 0)]["cum_cents"] == 4000 and out[(c24_2, 0)]["customers"] == 1


def test_psi_python_reference(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, n_chars FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    a = Counter(nc // 64 for did, nc in rows if did % 2 == 0)
    b = Counter(nc // 64 for did, nc in rows if did % 2 == 1)
    ta, tb = sum(a.values()), sum(b.values())
    from pdf_brain_spark.queries import get_queries, lookup_query

    got = {
        r["bin"]: r
        for r in lookup_query("psi_drift_report")(spark, SF_DIR).collect()
    }
    assert set(got) == set(a) | set(b)
    for bin_, r in got.items():
        na, nb = a.get(bin_, 0), b.get(bin_, 0)
        assert (r["na"], r["nb"]) == (na, nb)
        if na > 0 and nb > 0:
            want = round((na / ta - nb / tb) * math.log((na * tb) / (nb * ta)) * 1e6)
            assert r["psi_term_micro"] == want, bin_
            assert not r["disjoint_bin"]
        else:
            assert r["psi_term_micro"] is None and r["disjoint_bin"]


def test_jsd_python_reference_and_bounds(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    np_ = defaultdict(Counter)
    nq = Counter()
    for src, text in rows:
        toks = [t for t in text.lower().strip().split() if t]
        np_[src].update(toks)
        nq.update(toks)
    t = sum(nq.values())
    from pdf_brain_spark.queries import get_queries, lookup_query

    got = {
        r["source"]: r
        for r in lookup_query("source_term_jsd")(spark, SF_DIR).collect()
    }
    assert set(got) == set(np_)
    for src, c in np_.items():
        t_s = sum(c.values())
        kp = kq = 0
        for term, n_corpus in nq.items():
            p = c.get(term, 0) / t_s
            q = n_corpus / t
            m = (p + q) / 2.0
            if p > 0:
                kp += round(p * math.log(p / m) * 1e6)
            kq += round(q * math.log(q / m) * 1e6)
        assert got[src]["klp_micro"] == kp, src
        assert got[src]["klq_micro"] == kq, src
        jsd = got[src]["jsd_micro_nats"]
        assert (kp + kq) // 2 == jsd if (kp + kq) >= 0 else True
        # JSD is bounded by ln 2 (plus micro-rounding slack)
        assert -50 <= jsd <= round(math.log(2) * 1e6) + 50, src


def test_merge_groups_transitive_closure(spark):
    names = [
        "red widget", "rad widget", "red gadget", "blue bolt", "blu bolt",
        "quartz lamp",
    ]
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    pairs = fuzzy_domain_pairs(df, "p_name", max_dist=3)
    comp = {
        r["node"]: r["component"]
        for r in connected_components(pairs, "name_a", "name_b").collect()
    }
    # rad widget <-> red widget (1) <-> red gadget (3): one group via
    # transitivity even though rad/gadget are 4 apart
    assert comp["red widget"] == comp["rad widget"] == comp["red gadget"]
    assert comp["blue bolt"] == comp["blu bolt"]
    assert comp["blue bolt"] != comp["red widget"]
    # isolated names don't appear in the component map
    assert "quartz lamp" not in comp
    # group label is the lexicographic minimum member
    assert comp["red widget"] == "rad widget"
    assert comp["blue bolt"] == "blu bolt"
