"""Suite-gate machinery (round 9 consolidation): registry invariants,
lookup resolution, and the union-canonicalization's structural
guarantees. Oracle parity itself is attested by tests/oracle_harness.py
at three scales (the driver-mirror path); these tests pin the plumbing."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_registry_invariants():
    from pdf_brain_spark.queries import (
        CONSOLIDATED,
        GATE_WINDOW,
        ORACLES,
        QUERIES,
        lookup_oracle,
        lookup_query,
    )
    from pdf_brain_spark.suites import SUITE_PLAN

    # window is the first 50 registered, exactly
    assert list(QUERIES)[:50] == GATE_WINDOW and len(GATE_WINDOW) == 50
    # every suite is registered with an oracle; every member consolidated
    members = [m for ms in SUITE_PLAN.values() for m in ms]
    assert len(members) == len(set(members)) == len(CONSOLIDATED)
    for s in SUITE_PLAN:
        assert s in QUERIES and s in ORACLES
    for m in members:
        assert m not in QUERIES and m not in ORACLES
        assert callable(lookup_query(m))
        assert isinstance(lookup_oracle(m), str)
        fn, sql, suite = CONSOLIDATED[m]
        assert suite in SUITE_PLAN and m in SUITE_PLAN[suite]
        # the member's full oracle text is embedded in its suite's oracle
        assert sql.strip() in ORACLES[suite]


def test_lookup_query_unknown_name_raises():
    from pdf_brain_spark.queries import lookup_query

    with pytest.raises(KeyError):
        lookup_query("no_such_gate_anywhere")


def test_suite_rows_equal_member_rows(spark):
    """A suite emits exactly one canonicalized row per member result row
    (nothing dropped, nothing duplicated), tagged by member name, with
    rn a 1..n_member permutation."""
    from pdf_brain_spark.queries import CONSOLIDATED, get_queries
    from pdf_brain_spark.suites import SUITE_PLAN

    suite = "suite_rank_stats"
    out = get_queries()[suite](spark, SF).collect()
    by_gate = {}
    for r in out:
        by_gate.setdefault(r["gate"], []).append(r["rn"])
    assert set(by_gate) == set(SUITE_PLAN[suite])
    for m in SUITE_PLAN[suite]:
        n = CONSOLIDATED[m][0](spark, SF).count()
        assert sorted(by_gate[m]) == list(range(1, n + 1)), m


def test_suite_canonical_schema_is_all_strings(spark):
    from pdf_brain_spark.queries import get_queries
    from pdf_brain_spark.suites import SUITE_PLAN, suite_width

    suite = "suite_bi_concentration"
    df = get_queries()[suite](spark, SF)
    w = suite_width(suite)
    assert df.columns == ["gate", "rn"] + [f"c{i + 1}" for i in range(w)]
    types = dict(df.dtypes)
    assert types["gate"] == "string" and types["rn"] == "bigint"
    assert all(types[f"c{i + 1}"] == "string" for i in range(w))


def test_bench_headline_keys_all_resolve():
    import bench
    from pdf_brain_spark.queries import lookup_query

    for n in bench.HEADLINE:
        assert callable(lookup_query(n)), n
