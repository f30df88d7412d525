"""LLM-output hygiene scalars: repair-chain edge cases and concept-id
validation parity with the reference's isValidConceptId/parseJSONFromText
(AutoTagger.ts:530-568, 977-1036)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).first()["v"]


def test_repair_handles_each_defect(spark):
    from pdf_brain_spark.functions.llm_json import repair_llm_json

    cases = {
        # fence with language tag
        '```json\n{"a": 1}\n```': '{"a": 1}',
        # fence without tag
        '```\n{"a": 1}\n```': '{"a": 1}',
        # prose around a raw object
        'Sure thing! {"a": 1} Hope that helps.': '{"a": 1}',
        # trailing commas in object and array
        '{"a": [1, 2,],}': '{"a": [1, 2]}',
        # single quotes
        "{'a': 'x'}": '{"a": "x"}',
        # bare keys (the reference's replacement consumes the separator
        # whitespace: '$1"$2":' — parity preserved)
        '{a: 1, b_2: 2}': '{"a": 1,"b_2": 2}',
        # no JSON at all -> empty string (reference throws)
        "no json here": "",
    }
    rows = [(raw,) for raw in cases]
    df = spark.createDataFrame(rows, "raw string").withColumn(
        "fixed", repair_llm_json("raw")
    )
    got = {r["raw"]: r["fixed"] for r in df.collect()}
    for raw, want in cases.items():
        assert got[raw] == want, f"{raw!r}: {got[raw]!r} != {want!r}"


def test_tags_fallback_extraction(spark):
    from pdf_brain_spark.functions.llm_json import extract_tags_fallback

    raw = '{"title": broken!!, "tags": ["rust", \'spark\', unquoted ]}'
    got = _one(spark, extract_tags_fallback(F.lit(raw)))
    assert got == ["rust", "spark", "unquoted"]


def test_concept_id_validation_matrix(spark):
    from pdf_brain_spark.functions.llm_json import validate_concept_ids

    cases = [
        ("programming/rust", True),
        ("meta/notes", True),
        ("design/two-word-name", True),
        ("writing/a-b-c-d", True),  # 4 hyphen-words allowed
        ("writing/a-b-c-d-e", False),  # 5 rejected
        ("unknown/rust", False),  # parent not in vocabulary
        ("programming", False),  # no slash
        ("programming/rust/extra", False),  # two slashes
        ("programming/has space", False),
        ("programming/New", False),  # not lowercase
        ("programming/new", False),  # generic placeholder
        ("programming/concept", False),
        ("programming/" + "x" * 31, False),  # > 30 chars
    ]
    arr = F.array(*[F.lit(c) for c, _ in cases])
    got = set(_one(spark, validate_concept_ids(arr)))
    want = {c for c, ok in cases if ok}
    assert got == want


def test_enrich_pipeline_shapes(spark):
    from pdf_brain_spark.operators.enrich import enrich_documents

    docs = spark.createDataFrame(
        [(1, "Hello   world, this is a doc! " * 10, "en", "srcX")],
        "doc_id long, text string, lang string, source string",
    )
    row = enrich_documents(docs).first()
    assert row["title"] == "Hello world this is"
    assert row["summary"].endswith("...")
    assert row["doc_type"] == "article"
    assert row["category"] == "srcX"
    assert row["n_tags"] == 3
    assert row["valid_concepts_csv"] == "programming/en,meta/notes"
    assert row["n_rejected"] == 2
