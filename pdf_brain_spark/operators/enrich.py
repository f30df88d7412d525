"""LLM document enrichment (reference M8, AutoTagger.ts:282-313,1158-1325)
re-expressed as a Spark pipeline with a swappable LLM seam.

Shape: documents -> [mapInPandas: build prompt, call LLM, return raw
response text] -> native repair/parse/validate chain -> typed columns.
The mapInPandas stage is the ONLY place a model endpoint is touched; the
deterministic test double below stands in for it (same contract: one raw
response string per document, messy in exactly the ways real LLM output
is messy — fenced, single-quoted, bare keys, trailing commas). Swapping
in a real endpoint means replacing `_canned_response` with an HTTP call;
everything downstream (repair, schema parse, concept-id validation) is
shared, JVM-side, and oracle-checked.

Batching/backpressure at 100 TB: mapInPandas processes Arrow batches per
partition, so concurrent in-flight LLM calls = active tasks — the
executor/task knobs are the rate limiter, mirroring the reference's
pLimit-gated enrichment queue (AutoTagger.ts:1209).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_brain_spark.functions.llm_json import (
    repair_llm_json,
    validate_concept_ids,
)

ENRICH_RESPONSE_SCHEMA = (
    "doc_id long, lang string, source string, llm_response string"
)


def _clean(s: str) -> str:
    """Whitespace-collapse + strip to the JSON-safe charset the canned
    double embeds in its response (mirrored literally in the oracle)."""
    import re

    return re.sub(r"[^A-Za-z0-9 ]", "", re.sub(r"\s+", " ", s.strip()))


def _canned_response(doc_id: int, text: str, lang: str, source: str) -> str:
    """Deterministic LLM double. Emits the EnrichmentSchema JSON
    (AutoTagger.ts:282-313) wrapped in every defect the repair chain
    handles: markdown fence, single-quoted strings, a bare key, trailing
    commas — so the end-to-end pipeline exercises repair for real."""
    cleaned = _clean(text)
    toks = cleaned.split(" ")
    title = " ".join(toks[:4])
    summary = cleaned[:120].strip() + "..."
    return (
        "Sure! Here is the enrichment you asked for:\n"
        "```json\n"
        "{\n"
        f"  'title': '{title}',\n"
        f'  summary: "{summary}",\n'
        '  "documentType": "article",\n'
        f"  'category': '{source}',\n"
        f'  "tags": ["{lang}", "{source}", "corpus",],\n'
        f'  "concepts": ["programming/{lang}", "New/Concept", '
        '"design/a b", "meta/notes",],\n'
        "}\n"
        "```\n"
    )


def _llm_call_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if pdf.empty:
            continue
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "source": pdf["source"],
                "llm_response": [
                    _canned_response(r.doc_id, r.text, r.lang, r.source)
                    for r in pdf.itertuples()
                ],
            }
        )


def enrich_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source) -> one enrichment row per doc:
    title, summary, doc_type, category, n_tags, valid_concepts_csv,
    n_rejected. Raw LLM text never leaves this operator — it is repaired
    and parsed in the same stage that produced it."""
    raw = docs.select("doc_id", "text", "lang", "source").mapInPandas(
        _llm_call_batches, schema=ENRICH_RESPONSE_SCHEMA
    )
    repaired = raw.withColumn("_json", repair_llm_json("llm_response"))
    concepts = F.from_json(
        F.get_json_object("_json", "$.concepts"), "array<string>"
    )
    valid = validate_concept_ids(concepts)
    return repaired.select(
        "doc_id",
        F.get_json_object("_json", "$.title").alias("title"),
        F.get_json_object("_json", "$.summary").alias("summary"),
        F.get_json_object("_json", "$.documentType").alias("doc_type"),
        F.get_json_object("_json", "$.category").alias("category"),
        F.json_array_length(F.get_json_object("_json", "$.tags"))
        .cast("long")
        .alias("n_tags"),
        F.array_join(valid, ",").alias("valid_concepts_csv"),
        (F.size(concepts) - F.size(valid)).cast("long").alias("n_rejected"),
    )
