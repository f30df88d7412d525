"""Deterministic text chunkers — behavior-faithful re-implementations of the
reference's splitting rules (studied from
/root/reference/src/services/PDFExtractor.ts:70-145 and
MarkdownExtractor.ts:240-472), written fresh for the Spark pipeline:

  * plain chunker: sanitize → whitespace collapse → paragraph pack →
    sentence regex split → hard split with overlap → >20-char filter.
  * markdown chunker: additionally pre-splits oversized fenced code blocks
    (per line, re-fenced) and tables (per row, header kept), then protects
    code spans with placeholders during text chunking and restores after.

These are pure functions (easy to golden-test) exposed to Spark as
Arrow-batched pandas UDFs returning array<string>, consumed with explode —
the UDTF shape of the reference's extract-and-chunk stage (S2/S3).
"""

from __future__ import annotations

import re

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it

DEFAULT_CHUNK_SIZE = 512  # types.ts:129
DEFAULT_OVERLAP = 50  # types.ts:130
MIN_CHUNK_CHARS = 20  # PDFExtractor.ts:144


def sanitize_text(text: str) -> str:
    """Strip null bytes (PDFExtractor.ts:70-73)."""
    return text.replace("\x00", "")


def _sentence_split(para: str) -> list[str]:
    """Reference sentence regex: /[^.!?]+[.!?]+/g with whole-para fallback."""
    found = re.findall(r"[^.!?]+[.!?]+", para)
    return found if found else [para]


def _pack_and_split(cleaned: str, chunk_size: int, overlap: int) -> list[str]:
    """Shared paragraph→sentence→hard-split packing loop."""
    chunks: list[str] = []
    paragraphs = re.split(r"\n\n+", cleaned)
    current = ""
    for para in paragraphs:
        if len(current) + len(para) + 2 <= chunk_size:
            current = (current + "\n\n" + para) if current else para
            continue
        if current:
            chunks.append(current)
        if len(para) > chunk_size:
            current = ""
            for sentence in _sentence_split(para):
                if len(current) + len(sentence) <= chunk_size:
                    current += sentence
                else:
                    if current:
                        chunks.append(current.strip())
                    if len(sentence) > chunk_size:
                        step = chunk_size - overlap
                        for i in range(0, len(sentence), step):
                            chunks.append(sentence[i : i + chunk_size].strip())
                        current = ""
                    else:
                        current = sentence
        else:
            current = para
    if current:
        chunks.append(current)
    return chunks


def chunk_text(
    text: str, chunk_size: int = DEFAULT_CHUNK_SIZE, overlap: int = DEFAULT_OVERLAP
) -> list[str]:
    """Plain-text (PDF page) chunker."""
    cleaned = re.sub(r"\s+", " ", sanitize_text(text))
    cleaned = re.sub(r"\n{3,}", "\n\n", cleaned).strip()
    if len(cleaned) <= chunk_size:
        # the reference's tiny-chunk filter applies to EVERY chunk,
        # including a short whole-page chunk (PDFExtractor.ts:144)
        return [cleaned] if len(cleaned) > MIN_CHUNK_CHARS else []
    return [c for c in _pack_and_split(cleaned, chunk_size, overlap) if len(c) > MIN_CHUNK_CHARS]


def _split_code_block(code: str, lang: str, max_size: int) -> list[str]:
    overhead = len(lang) + 8  # ```lang\n...\n```
    effective = max_size - overhead
    out, cur, cur_len = [], [], 0
    for line in code.split("\n"):
        ll = len(line) + 1
        if cur_len + ll > effective and cur:
            out.append(f"```{lang}\n" + "\n".join(cur) + "\n```")
            cur, cur_len = [], 0
        cur.append(line)
        cur_len += ll
    if cur:
        out.append(f"```{lang}\n" + "\n".join(cur) + "\n```")
    return out


def _split_table(table: str, max_size: int) -> list[str]:
    lines = table.strip().split("\n")
    if len(lines) < 3:
        return [table]
    header, sep, rows = lines[0], lines[1], lines[2:]
    effective = max_size - (len(header) + len(sep) + 2)
    out, cur, cur_len = [], [], 0
    for row in rows:
        rl = len(row) + 1
        if cur_len + rl > effective and cur:
            out.append("\n".join([header, sep, *cur]))
            cur, cur_len = [], 0
        cur.append(row)
        cur_len += rl
    if cur:
        out.append("\n".join([header, sep, *cur]))
    return out


_CODE_FENCE_RE = re.compile(r"```(\w*)\n([\s\S]*?)```")
_TABLE_RE = re.compile(r"(\|[^\n]+\|\n\|[-:\s|]+\|\n(?:\|[^\n]+\|\n?)+)")
_CODE_OR_SPAN_RE = re.compile(r"```[\s\S]*?```|`[^`]+`")


def chunk_markdown(
    text: str, chunk_size: int = DEFAULT_CHUNK_SIZE, overlap: int = DEFAULT_OVERLAP
) -> list[str]:
    """Markdown-aware chunker: oversized code blocks split per line (fences
    kept), oversized tables per row (header kept); small code spans are
    placeholder-protected so the text splitter never cuts inside them."""
    sanitized = sanitize_text(text)
    max_element = int(chunk_size * 0.8)

    def _pre_code(m: re.Match) -> str:
        if len(m.group(0)) <= max_element:
            return m.group(0)
        return "\n\n".join(_split_code_block(m.group(2).strip(), m.group(1) or "", max_element))

    processed = _CODE_FENCE_RE.sub(_pre_code, sanitized)

    def _pre_table(m: re.Match) -> str:
        if len(m.group(0)) <= max_element:
            return m.group(0)
        return "\n\n".join(_split_table(m.group(0), max_element))

    processed = _TABLE_RE.sub(_pre_table, processed)

    code_blocks: list[tuple[str, str]] = []

    def _protect(m: re.Match) -> str:
        if len(m.group(0)) <= max_element:
            ph = f"__CODE_BLOCK_{len(code_blocks)}__"
            code_blocks.append((ph, m.group(0)))
            return ph
        return m.group(0)

    with_placeholders = _CODE_OR_SPAN_RE.sub(_protect, processed)

    cleaned = re.sub(r"[ \t]+", " ", with_placeholders)
    cleaned = re.sub(r"\n{3,}", "\n\n", cleaned).strip()

    def _restore(chunk: str) -> str:
        for ph, content in code_blocks:
            chunk = chunk.replace(ph, content, 1)
        return chunk

    if len(cleaned) <= chunk_size:
        restored = _restore(cleaned)
        # tiny-chunk filter applies to the short whole-doc path too
        # (MarkdownExtractor.ts:471)
        return [restored] if len(restored) > MIN_CHUNK_CHARS else []

    chunks = _pack_and_split(cleaned, chunk_size, overlap)
    return [c for c in (_restore(ch) for ch in chunks) if len(c) > MIN_CHUNK_CHARS]


_FRONTMATTER_RE = re.compile(r"\A---\n([\s\S]*?)\n---\n?")
_FRONTMATTER_TOML_RE = re.compile(r"\A\+\+\+\n([\s\S]*?)\n\+\+\+\n?")
_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$", re.MULTILINE)


def _strip_frontmatter(text: str) -> str:
    """Remove either frontmatter form (YAML `---` or TOML `+++`) from the
    document head; gray-matter treats exactly one leading block as
    frontmatter, so only one substitution applies."""
    if _FRONTMATTER_RE.match(text):
        return _FRONTMATTER_RE.sub("", text, count=1)
    return _FRONTMATTER_TOML_RE.sub("", text, count=1)


def extract_frontmatter(text: str) -> dict[str, str]:
    """Minimal frontmatter parser mirroring gray-matter's two delimiter
    conventions (the reference uses gray-matter, MarkdownExtractor.ts:222-237):
    `---` fences parse as top-level YAML `key: value` pairs; `+++` fences
    parse as top-level TOML `key = value` pairs. Nested structures are out
    of scope for the fast path, exactly as in the YAML case."""
    m = _FRONTMATTER_RE.match(text)
    if m:
        out: dict[str, str] = {}
        for line in m.group(1).split("\n"):
            if ":" in line and not line.startswith((" ", "\t", "-")):
                k, v = line.split(":", 1)
                out[k.strip()] = v.strip().strip("'\"")
        return out
    m = _FRONTMATTER_TOML_RE.match(text)
    if m:
        out = {}
        for line in m.group(1).split("\n"):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            # a `[table]` header ends the top-level section: every key
            # after it belongs to the table (gray-matter's TOML engine
            # nests them), so stop rather than hoist nested keys to
            # top level
            if line.startswith("["):
                break
            if "=" in line:
                k, v = line.split("=", 1)
                out[k.strip()] = v.strip().strip("'\"")
        return out
    return {}


def extract_sections(text: str) -> list[dict]:
    """Heading-delimited sections (MarkdownExtractor extract): returns
    [{section, heading, level, content}]; content before the first heading
    is section 0 with empty heading. Section number is the reference's
    markdown 'page' (MarkdownExtractor.ts:70-73)."""
    body = _strip_frontmatter(sanitize_text(text))
    matches = list(_HEADING_RE.finditer(body))
    sections: list[dict] = []
    if not matches:
        if body.strip():
            sections.append({"section": 1, "heading": "", "level": 0, "content": body.strip()})
        return sections
    if body[: matches[0].start()].strip():
        sections.append(
            {"section": 1, "heading": "", "level": 0, "content": body[: matches[0].start()].strip()}
        )
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(body)
        sections.append(
            {
                "section": len(sections) + 1,
                "heading": m.group(2).strip(),
                "level": len(m.group(1)),
                "content": body[m.end() : end].strip(),
            }
        )
    return sections


def make_chunk_udf(chunk_size: int = DEFAULT_CHUNK_SIZE, overlap: int = DEFAULT_OVERLAP, markdown: bool = False):
    """Arrow-batched pandas UDF: text column → array<string> of chunks."""
    from pyspark.sql import functions as F

    fn = chunk_markdown if markdown else chunk_text

    @F.pandas_udf("array<string>")
    def _chunk(s: pd.Series) -> pd.Series:
        return s.map(lambda t: fn(t or "", chunk_size, overlap))

    return _chunk
