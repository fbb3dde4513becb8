"""Optional tree-sitter chunking backend — the real-asset hook for M6
(VERDICT r3 item 7; reference: ``chunkCodeByAST`` via the tree-sitter
``code-chunk`` stack, ``packages/core/src/ast-chunking.ts:183-225``).

Detect-and-use: when a ``tree_sitter`` runtime AND a grammar for the
language are importable, chunk boundaries come from the real parse tree
(TOP-LEVEL declarations only — a class/impl node is one segment, split
by character windows when oversized; unlike the brace lexer it does NOT
recurse into per-method chunks, so enabling the wheel changes chunk
boundaries vs the fallback).  When either asset is missing —
as in this sandbox, which has no tree_sitter wheel —
:func:`chunk_treesitter` returns ``None`` and callers fall back to the
deterministic stdlib-``ast`` / brace-lexer chunkers, so pipelines pick
up the real parser with zero code change outside the chunker factory.
The real path is covered by a pytest that skips unless importable.
"""

from __future__ import annotations

import json

# per-language grammar wheels (modern per-language packages), plus the
# tree_sitter_languages bundle as a second probe
_LANG_MODULES: dict[str, tuple[str, str]] = {
    "python": ("tree_sitter_python", "language"),
    "javascript": ("tree_sitter_javascript", "language"),
    "typescript": ("tree_sitter_typescript", "language_typescript"),
    "tsx": ("tree_sitter_typescript", "language_tsx"),
    "go": ("tree_sitter_go", "language"),
    "java": ("tree_sitter_java", "language"),
    "rust": ("tree_sitter_rust", "language"),
}

# parse-tree node types that open a semantic chunk, per grammar
_DECL_TYPES: dict[str, set[str]] = {
    "python": {"function_definition", "class_definition", "decorated_definition"},
    "javascript": {"function_declaration", "generator_function_declaration",
                   "class_declaration", "lexical_declaration", "export_statement"},
    "typescript": {"function_declaration", "class_declaration", "interface_declaration",
                   "enum_declaration", "type_alias_declaration", "lexical_declaration",
                   "export_statement"},
    "go": {"function_declaration", "method_declaration", "type_declaration"},
    "java": {"class_declaration", "interface_declaration", "enum_declaration",
             "method_declaration"},
    "rust": {"function_item", "struct_item", "enum_item", "impl_item",
             "trait_item", "mod_item"},
}
_DECL_TYPES["tsx"] = _DECL_TYPES["typescript"]

_LANG_CACHE: dict[str, object | None] = {}


def _load_language(lang: str):
    """tree_sitter.Language for ``lang`` or None when unavailable."""
    lang = (lang or "").lower()
    if lang in _LANG_CACHE:
        return _LANG_CACHE[lang]
    result = None
    try:
        import importlib

        import tree_sitter

        spec = _LANG_MODULES.get(lang)
        if spec is not None:
            try:
                mod = importlib.import_module(spec[0])
                result = tree_sitter.Language(getattr(mod, spec[1])())
            except Exception:
                result = None
        if result is None:
            try:  # bundle fallback
                from tree_sitter_languages import get_language

                result = get_language(lang)
            except Exception:
                result = None
    except ImportError:
        result = None
    _LANG_CACHE[lang] = result
    return result


def treesitter_available(lang: str) -> bool:
    return _load_language(lang) is not None


def chunk_treesitter(code: str, lang: str, max_chunk_size: int = 1000):
    """Semantic chunks from a REAL tree-sitter parse, or ``None`` when
    the runtime/grammar is unavailable (callers fall back).

    Contract matches :func:`coderag_ray.functions.ast_chunker.chunk_python_ast`:
    the returned chunks exactly partition ``code``; oversized chunks are
    split on character windows.  Returns a list of ``AstChunk``.
    """
    L = _load_language(lang)
    if L is None:
        return None
    import tree_sitter

    from coderag_ray.functions.ast_chunker import AstChunk

    if code.strip() == "":
        return []
    try:
        try:
            parser = tree_sitter.Parser(L)  # tree_sitter >= 0.22
        except TypeError:  # legacy API
            parser = tree_sitter.Parser()
            parser.set_language(L)
        src = code.encode("utf-8")
        tree = parser.parse(src)
    except Exception:
        return None  # parse failure → deterministic fallback

    decl_types = _DECL_TYPES.get((lang or "").lower(), set())
    # byte offset → char offset mapping (chunk offsets are in chars)
    b2c = {}
    b = 0
    for ci, ch in enumerate(code):
        b2c[b] = ci
        b += len(ch.encode("utf-8"))
    b2c[b] = len(code)

    segments = []  # (start_char, end_char, type, entity_name)
    cursor = 0
    for node in tree.root_node.children:
        if node.type not in decl_types:
            continue
        s, e = b2c.get(node.start_byte), b2c.get(node.end_byte)
        if s is None or e is None or s < cursor:
            continue
        if s > cursor:
            segments.append((cursor, s, "chunk", None))
        name_node = node.child_by_field_name("name")
        name = None
        if name_node is not None:
            name = src[name_node.start_byte:name_node.end_byte].decode(
                "utf-8", "replace")
        kind = "class" if "class" in node.type or node.type in (
            "struct_item", "enum_item", "impl_item", "trait_item",
            "interface_declaration") else "function"
        segments.append((s, e, kind, name))
        cursor = e
    if cursor < len(code):
        segments.append((cursor, len(code), "chunk", None))
    if not segments:
        segments = [(0, len(code), "chunk", None)]

    chunks: list[AstChunk] = []
    for s, e, typ, name in segments:
        # oversize split on character windows, preserving the partition
        starts = list(range(s, e, max_chunk_size)) or [s]
        for i, ws in enumerate(starts):
            we = min(ws + max_chunk_size, e)
            text = code[ws:we]
            sl = code.count("\n", 0, ws) + 1
            el = code.count("\n", 0, max(ws, we - 1)) + 1
            meta = json.dumps(
                {"fallback": False, "parser": "tree-sitter",
                 "scope": [name] if name else [],
                 "entities": [{"name": name, "type": typ}] if name else []},
                sort_keys=True)
            chunks.append(AstChunk(content=text, type=typ if i == 0 else "chunk",
                                   start_line=sl, end_line=el,
                                   start_offset=ws, end_offset=we, meta=meta))
    return chunks
