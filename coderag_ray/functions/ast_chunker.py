"""Python AST chunker — semantic chunking for ``lang == "python"`` via
the stdlib ``ast`` module (closes SURVEY §2 M6 properly for one major
language with zero dependencies).

Mirrors the reference's chunk contract
(``/root/reference/packages/core/src/ast-chunking.ts:70-88``): each
chunk carries ``content``, ``type`` (first entity's type or ``chunk``),
1-based inclusive ``start_line``/``end_line``, and metadata with
``fallback``, ``scope`` ([{name, type}]) and ``entities``
([{name, type, signature}]).  Metadata is serialized as canonical JSON
(sorted keys) in ``meta`` so it survives an Arrow string column
deterministically.

Frozen layout spec (this module is the parity oracle for tests/SQL):

- chunks form an EXACT partition of the source: contiguous character
  ranges covering ``[0, len(code))`` — concatenating chunk contents in
  order reproduces the file byte-for-byte (SQL-oracle checkable and
  required for sha-verified reassembly);
- each top-level ``def``/``async def``/``class`` (with its decorators)
  is one entity chunk; statements between entities become ``chunk``
  segments; whitespace-only gaps merge into the following chunk (or the
  previous one at EOF);
- an oversized class splits into a header segment plus one segment per
  method (``scope`` = the class); any segment still longer than
  ``max_chunk_size`` splits greedily at line boundaries (single lines
  longer than the cap split at exact character offsets), parts keep the
  parent's type/entities and gain ``part`` indices;
- unparseable or non-Python input is NOT handled here — callers fall
  back to the reference's character windows (``ast-chunking.ts:59-68``).
"""

from __future__ import annotations

import ast
import json
from dataclasses import dataclass, field


@dataclass
class AstChunk:
    content: str
    type: str
    start_line: int  # 1-based inclusive
    end_line: int
    start_offset: int
    end_offset: int
    meta: str  # canonical JSON: {"fallback": false, "scope": [...], "entities": [...]}


@dataclass
class _Seg:
    start: int  # 0-based first line
    end: int  # 0-based last line (inclusive)
    type: str = "chunk"
    entities: list = field(default_factory=list)
    scope: list = field(default_factory=list)
    node: object = None  # backing ast node for entity segments


def _signature(node) -> str:
    if isinstance(node, ast.ClassDef):
        return f"class {node.name}"
    a = node.args
    parts = [x.arg for x in list(a.posonlyargs) + list(a.args)]
    if a.vararg is not None:
        parts.append("*" + a.vararg.arg)
    elif a.kwonlyargs:
        parts.append("*")
    parts += [x.arg for x in a.kwonlyargs]
    if a.kwarg is not None:
        parts.append("**" + a.kwarg.arg)
    prefix = "async def" if isinstance(node, ast.AsyncFunctionDef) else "def"
    return f"{prefix} {node.name}({', '.join(parts)})"


def _entity_of(node) -> dict:
    typ = "class" if isinstance(node, ast.ClassDef) else "function"
    return {"name": node.name, "type": typ, "signature": _signature(node)}


def _node_lines(node) -> tuple[int, int]:
    """0-based (first, last) line of a def/class including decorators."""
    start = node.lineno
    for d in node.decorator_list:
        start = min(start, d.lineno)
    return start - 1, node.end_lineno - 1


def _segments(body, n_lines: int, scope: list) -> list[_Seg]:
    """Entity + filler segments exactly covering lines [0, n_lines)."""
    segs: list[_Seg] = []
    cursor = 0
    for node in body:
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            continue
        s, e = _node_lines(node)
        if s > cursor:
            segs.append(_Seg(cursor, s - 1, "chunk", [], list(scope)))
        ent = _entity_of(node)
        segs.append(_Seg(s, e, ent["type"], [ent], list(scope), node))
        cursor = e + 1
    if cursor < n_lines:
        segs.append(_Seg(cursor, n_lines - 1, "chunk", [], list(scope)))
    return segs


def _merge_blank_fillers(segs: list[_Seg], lines: list[str]) -> list[_Seg]:
    out: list[_Seg] = []
    pending: _Seg | None = None  # whitespace-only filler awaiting a successor
    for seg in segs:
        text = "\n".join(lines[seg.start : seg.end + 1])
        if seg.type == "chunk" and not seg.entities and text.strip() == "":
            pending = seg if pending is None else _Seg(pending.start, seg.end)
            continue
        if pending is not None:
            seg = _Seg(pending.start, seg.end, seg.type, seg.entities, seg.scope, seg.node)
            pending = None
        out.append(seg)
    if pending is not None:
        if out:
            out[-1] = _Seg(out[-1].start, pending.end, out[-1].type,
                           out[-1].entities, out[-1].scope, out[-1].node)
        else:
            out.append(pending)
    return out


def line_starts(code: str, lines: list[str]) -> list[int]:
    """Char offset of each 0-based line start; sentinel = len(code)+1."""
    out = [0]
    for ln in lines:
        out.append(out[-1] + len(ln) + 1)
    return out


def emit_chunks(segs: list[_Seg], code: str, line_start: list[int],
                max_chunk_size: int) -> list[AstChunk]:
    """Shared final pass for every semantic chunker (Python AST and the
    brace/indent lexers): segments → AstChunks, greedily splitting any
    oversized segment at line boundaries (hard char split for monster
    lines), parts keeping the parent's type/entities + ``part`` index."""
    import bisect

    def char_range(s_line: int, e_line: int) -> tuple[int, int]:
        return (min(line_start[s_line], len(code)),
                min(line_start[e_line + 1], len(code)))

    out: list[AstChunk] = []
    for seg in segs:
        s_off, e_off = char_range(seg.start, seg.end)
        if e_off <= s_off:
            continue
        meta_base = {"fallback": False,
                     "scope": seg.scope,
                     "entities": seg.entities}
        if e_off - s_off <= max_chunk_size:
            out.append(AstChunk(code[s_off:e_off], seg.type,
                                seg.start + 1, seg.end + 1, s_off, e_off,
                                json.dumps(meta_base, sort_keys=True)))
            continue
        breaks = sorted({min(line_start[i + 1], e_off)
                         for i in range(seg.start, seg.end + 1)})
        pos = s_off
        part = 0
        while pos < e_off:
            cap = pos + max_chunk_size
            cands = [b for b in breaks if pos < b <= cap]
            nxt = cands[-1] if cands else min(cap, e_off)
            sl = max(seg.start, bisect.bisect_right(line_start, pos) - 1)
            el = min(seg.end, max(sl, bisect.bisect_right(line_start, nxt - 1) - 1))
            meta = dict(meta_base)
            meta["part"] = part
            out.append(AstChunk(code[pos:nxt], seg.type,
                                sl + 1, el + 1, pos, nxt,
                                json.dumps(meta, sort_keys=True)))
            part += 1
            pos = nxt
    return out


def chunk_python_ast(code: str, max_chunk_size: int = 1000) -> list[AstChunk] | None:
    """AST-chunk Python source; ``None`` means "fall back" (parse error).

    Empty / whitespace-only input returns ``[]`` (the reference emits no
    chunks for empty files, ``embeddings.ts:268-270``).
    """
    if code.strip() == "":
        return []
    try:
        tree = ast.parse(code)
    except (SyntaxError, ValueError, RecursionError, MemoryError):
        return None

    lines = code.split("\n")
    n_lines = len(lines)
    line_start = line_starts(code, lines)

    def char_range(s_line: int, e_line: int) -> tuple[int, int]:
        return (min(line_start[s_line], len(code)),
                min(line_start[e_line + 1], len(code)))

    segs = _merge_blank_fillers(_segments(tree.body, n_lines, []), lines)

    # oversize classes: split into header + per-method segments
    expanded: list[_Seg] = []
    for seg in segs:
        s_off, e_off = char_range(seg.start, seg.end)
        if (seg.type == "class" and e_off - s_off > max_chunk_size
                and seg.node is not None):
            node = seg.node
            cls_scope = [{"name": node.name, "type": "class"}]
            subs = []
            cursor = seg.start
            for m in node.body:
                if not isinstance(m, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                    continue
                ms, me = _node_lines(m)
                if ms > cursor:
                    # the header keeps the class entity; later gaps are
                    # plain fillers (so blank-only ones merge away)
                    ents = seg.entities if cursor == seg.start else []
                    subs.append(_Seg(cursor, ms - 1, "chunk", ents, list(seg.scope)))
                ent = _entity_of(m)
                subs.append(_Seg(ms, me, ent["type"], [ent], cls_scope))
                cursor = me + 1
            if cursor <= seg.end:
                subs.append(_Seg(cursor, seg.end, "chunk", [], cls_scope))
            expanded.extend(_merge_blank_fillers(subs, lines) if subs else [seg])
        else:
            expanded.append(seg)

    return emit_chunks(expanded, code, line_start, max_chunk_size)
