"""LLM-output hygiene scalars: JSON repair and concept-id validation.

Reference behaviors re-expressed (not ported):
  * parseJSONFromText (AutoTagger.ts:530-568): extract JSON from a markdown
    code fence or raw text, then fix the common LLM JSON defects — trailing
    commas, single quotes, unquoted keys — before parsing; last-resort
    extraction of just the tags array.
  * isValidConceptId / validateProposedConcepts (AutoTagger.ts:977-1036):
    reject proposed concept ids that aren't "parent/child" with a known
    parent, lowercase, space-free, <= 30 chars, <= 4 hyphen-words, and not
    the generic placeholders "new"/"concept".

Everything here is a codegen'd native expression chain (regexp_replace /
get_json_object / higher-order filter) — the repair runs inside the scan
projection at full JVM speed, no Python in the hot path. Each Spark
expression has a DuckDB twin generator kept adjacent so the oracle can
never drift from the implementation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- JSON repair ----------------------------------------------------------

_FENCE_RE = r"```(?:json)?\s*([\s\S]*?)```"
_OBJ_RE = r"\{[\s\S]*\}"
_TRAILING_COMMA_RE = r",\s*([}\]])"
_UNQUOTED_KEY_RE = r"(\{|,)\s*([a-zA-Z_][a-zA-Z0-9_]*)\s*:"
# positional single->double quote rules: only a quote adjacent to JSON
# structure ({ [ : , on the opening side; : , ] } on the closing side) is
# rewritten, so apostrophes inside double-quoted values survive repair
_SQUOTE_OPEN_RE = r"([{\[:,]\s*)'"
_SQUOTE_CLOSE_RE = r"'(\s*[:,\]}])"


def repair_llm_json(col: Column | str) -> Column:
    """Reference parseJSONFromText repair chain as native expressions:
    fence-extract -> object-extract, then (like the reference, which tries
    JSON.parse FIRST and only repairs on failure) the repair rules — strip
    trailing commas, positional single->double quotes, quote bare keys —
    apply only when the extracted object is not already strict JSON.
    Valid JSON whose string values contain apostrophes or ', word:'
    sequences passes through byte-identical. Returns the JSON text
    ('' when no object is found, mirroring the reference's throw)."""
    c = _c(col)
    fenced = F.regexp_extract(c, _FENCE_RE, 1)
    base = F.when(F.length(fenced) > 0, fenced).otherwise(c)
    obj = F.regexp_extract(base, _OBJ_RE, 0)
    cleaned = F.regexp_replace(obj, _TRAILING_COMMA_RE, "$1")
    cleaned = F.regexp_replace(cleaned, _SQUOTE_OPEN_RE, '$1"')
    cleaned = F.regexp_replace(cleaned, _SQUOTE_CLOSE_RE, '"$1')
    repaired = F.regexp_replace(cleaned, _UNQUOTED_KEY_RE, '$1"$2":')
    # try_parse_json is strict (rejects single quotes, trailing commas,
    # bare keys — same acceptance set as ECMA JSON.parse), unlike
    # get_json_object which tolerates single quotes
    return F.when(F.try_parse_json(obj).isNotNull(), obj).otherwise(repaired)


def duck_repair_llm_json(expr: str) -> str:
    """DuckDB twin of repair_llm_json over the SQL expression `expr`.

    DuckDB's json_valid is lenient about trailing commas (Spark's
    try_parse_json is not), so the strictness gate ANDs in a no-trailing-
    comma regex to keep the two engines' accept sets identical on the
    gated fixtures."""
    fenced = f"regexp_extract({expr}, '{_FENCE_RE}', 1)"
    base = f"(CASE WHEN length({fenced}) > 0 THEN {fenced} ELSE {expr} END)"
    obj = f"regexp_extract({base}, '{_OBJ_RE}', 0)"
    cleaned = f"regexp_replace({obj}, '{_TRAILING_COMMA_RE}', '\\1', 'g')"
    cleaned = f"regexp_replace({cleaned}, '([{{\\[:,]\\s*)''', '\\1\"', 'g')"
    cleaned = f"regexp_replace({cleaned}, '''(\\s*[:,\\]}}])', '\"\\1', 'g')"
    repaired = (
        f"regexp_replace({cleaned}, '{_UNQUOTED_KEY_RE}', '\\1\"\\2\":', 'g')"
    )
    strict = (
        f"(json_valid({obj}) AND NOT regexp_matches({obj}, ',\\s*[}}\\]]'))"
    )
    return f"(CASE WHEN {strict} THEN {obj} ELSE {repaired} END)"


def extract_tags_fallback(col: Column | str) -> Column:
    """Reference last-resort path: when full parsing fails, pull just the
    `tags` array body and split it (AutoTagger.ts:556-566). Returns
    array<string> (empty when no tags block)."""
    c = _c(col)
    body = F.regexp_extract(c, r'"tags"\s*:\s*\[([\s\S]*?)\]', 1)
    return F.filter(
        F.transform(
            F.split(body, ","),
            lambda t: F.regexp_replace(F.trim(t), r"^[\"']|[\"']$", ""),
        ),
        lambda t: F.length(t) > 0,
    )


# --- Concept-id validation ------------------------------------------------

# AutoTagger.ts:984-992 — the closed parent vocabulary
VALID_CONCEPT_PARENTS = [
    "programming",
    "education",
    "design",
    "business",
    "meta",
    "psychology",
    "research",
    "writing",
]


def is_valid_concept_id(x: Column) -> Column:
    """Boolean twin of isValidConceptId (AutoTagger.ts:977-1010), written
    to be usable both on a plain column and inside F.filter lambdas."""
    parts = F.split(x, "/", -1)
    parent = F.element_at(parts, 1)
    child = F.element_at(parts, 2)
    return (
        (F.size(parts) == 2)
        & parent.isin(*VALID_CONCEPT_PARENTS)
        & ~child.contains(" ")
        & (F.length(child) <= 30)
        & (child != F.lit("concept"))
        & (child != F.lit("new"))
        & (x == F.lower(x))
        & (F.size(F.split(child, "-", -1)) <= 4)
    )


def duck_is_valid_concept_id(expr: str) -> str:
    """DuckDB twin predicate over the SQL expression `expr`."""
    parents = ", ".join(f"'{p}'" for p in VALID_CONCEPT_PARENTS)
    parts = f"string_split({expr}, '/')"
    parent = f"list_extract({parts}, 1)"
    child = f"list_extract({parts}, 2)"
    return (
        f"(len({parts}) = 2"
        f" AND {parent} IN ({parents})"
        f" AND NOT contains({child}, ' ')"
        f" AND length({child}) <= 30"
        f" AND {child} <> 'concept' AND {child} <> 'new'"
        f" AND {expr} = lower({expr})"
        f" AND len(string_split({child}, '-')) <= 4)"
    )


def validate_concept_ids(arr: Column | str) -> Column:
    """array<string> -> array<string> keeping only valid concept ids
    (validateProposedConcepts filter, AutoTagger.ts:1015-1036)."""
    return F.filter(_c(arr), is_valid_concept_id)
