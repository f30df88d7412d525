"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the load-bearing paths. Anything not listed here still runs
# in the correctness gate; bench keeps to representative operators so the
# number is comparable round over round.
HEADLINE = [
    "vector_topk",
    "vector_topk_threshold",
    "vector_similarity_join",
    "pricing_summary",
    "top_revenue_customers",
    "regional_volume",
    "fts_bm25",
    "hybrid_search",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "events_sessionize",
    "events_tumbling_window",
    "transitive_closure",
    "context_expansion",
    "kmeans_clusters",
    "search_pipeline",
    "multiscale_retrieval",
    "events_session_window",
    "vector_search_with_docs",
    "dedup_minhash_verified",
    "events_asof_join",
    "corpus_clean_pipeline",
]


def main() -> None:
    from pdf_brain_spark.queries import get_queries
    from pdf_brain_spark.session import get_spark

    spark = get_spark("pdf_brain_spark_bench")
    queries = get_queries()
    names = [n for n in HEADLINE if n in queries]
    # include any registered query marked as headline via registry growth
    timings: dict[str, float] = {}
    # one warm-up pass of the smallest query to absorb JVM/codegen startup
    queries[names[0]](spark, SF_DIR).collect()
    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).collect()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
