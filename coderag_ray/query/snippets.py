"""Snippet extraction and result formatting — driver-side post-processing.

Mirrors the reference's in-memory snippet pipeline
(``/root/reference/packages/core/src/indexer.ts:1397-1507``
``extractSnippet``): find lines containing matched terms → expand ±3
context lines → merge overlapping blocks → rank blocks by unique
matched terms, then match density → cap at 4 blocks / ~2000 chars,
re-sort kept blocks by position, join with ``...``.  Also the SQL-path
numbered-snippet (``indexer.ts:1379-1382``) and the MCP server's
head/tail truncation (``mcp-server/src/index.ts:268-356``: 70 % head,
20 % tail at 2000 chars).

These run on the top-k rows only (driver-side Python, not a Ray stage).
"""

from __future__ import annotations

CONTEXT_LINES = 3
MAX_BLOCKS = 4
MAX_SNIPPET_CHARS = 2000


def extract_snippet(content: str, matched_terms: list[str],
                    context: int = CONTEXT_LINES,
                    max_blocks: int = MAX_BLOCKS,
                    max_chars: int = MAX_SNIPPET_CHARS) -> str:
    """Best-effort term-in-context snippet (indexer.ts:1397-1507)."""
    if not content:
        return ""
    lines = content.split("\n")
    terms = [t.lower() for t in matched_terms if t]
    if not terms:
        return "\n".join(lines[: 2 * context + 1])[:max_chars]

    # 1. matched line indices + which terms hit there
    hits: dict[int, set[str]] = {}
    for i, line in enumerate(lines):
        low = line.lower()
        found = {t for t in terms if t in low}
        if found:
            hits[i] = found
    if not hits:
        return "\n".join(lines[: 2 * context + 1])[:max_chars]

    # 2. expand ±context and merge overlapping [start, end] blocks
    spans = sorted((max(0, i - context), min(len(lines) - 1, i + context)) for i in hits)
    merged: list[list[int]] = []
    for s, e in spans:
        if merged and s <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])

    # 3. rank blocks: unique matched terms desc, then hit density desc
    def block_key(blk: list[int]):
        s, e = blk
        uniq: set[str] = set()
        n_hits = 0
        for i in range(s, e + 1):
            if i in hits:
                uniq |= hits[i]
                n_hits += 1
        density = n_hits / max(e - s + 1, 1)
        return (-len(uniq), -density)

    ranked = sorted(merged, key=block_key)[:max_blocks]
    ranked.sort()  # re-sort kept blocks by position (indexer.ts:1485-1487)

    out: list[str] = []
    total = 0
    for s, e in ranked:
        block = "\n".join(lines[s : e + 1])
        if total + len(block) > max_chars and out:
            break
        out.append(block[: max_chars - total])
        total += len(block)
        if total >= max_chars:
            break
    return "\n...\n".join(out)


def numbered_snippet(content: str, start_line: int = 0) -> str:
    """SQL-path chunk snippet with line numbers — indexer.ts:1379-1382."""
    return "\n".join(
        f"{start_line + i}: {ln}" for i, ln in enumerate(content.split("\n"))
    )


def truncate_head_tail(text: str, max_chars: int = MAX_SNIPPET_CHARS) -> str:
    """MCP result truncation: 70% head + 20% tail with an elision marker
    (mcp-server/src/index.ts:268-356)."""
    if len(text) <= max_chars:
        return text
    head = int(max_chars * 0.7)
    tail = int(max_chars * 0.2)
    omitted = len(text) - head - tail
    return f"{text[:head]}\n... [{omitted} chars omitted] ...\n{text[-tail:]}"


def format_results_markdown(result, snippets: list[str] | None = None,
                            max_chars: int = MAX_SNIPPET_CHARS) -> str:
    """Markdown result rendering in the MCP server's shape."""
    rows = result.to_pylist() if hasattr(result, "to_pylist") else result
    out = [f"Found {len(rows)} results\n"]
    for i, row in enumerate(rows):
        out.append(
            f"### {row.get('rank', i + 1)}. {row.get('path', row.get('doc_id'))} "
            f"(score {row.get('score', 0):.4f})"
        )
        if row.get("matched_terms"):
            out.append(f"matched: {', '.join(row['matched_terms'])}")
        if snippets and i < len(snippets):
            out.append("```\n" + truncate_head_tail(snippets[i], max_chars) + "\n```")
        out.append("")
    return "\n".join(out)
