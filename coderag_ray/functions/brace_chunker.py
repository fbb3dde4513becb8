"""Brace-language semantic chunker — deterministic function/class
boundary chunking for TypeScript, JavaScript, Go, Java and Rust.

The reference AST-chunks these languages through tree-sitter
(``/root/reference/packages/core/src/ast-chunking.ts:47-54`` supported
languages, ``:183-225`` ``chunkCodeByAST``).  tree-sitter is not
installable in this environment, so this module reproduces the
*semantics* the reference relies on — split at top-level
function/class boundaries, attach entity/scope metadata, split
oversized class bodies per method, character-fallback elsewhere — with
a deterministic two-pass lexer:

1. :func:`_mask_code` blanks comment and string interiors (language
   aware: ``//`` ``/* */`` (nested for Rust), ``'`` ``"`` `````` with
   escapes, JS template ``${}`` re-entry, Go raw strings, Rust
   ``r#".."#`` raw strings and lifetime-vs-char-literal heuristics) so
   braces inside literals never confuse the structure pass;
2. a structure pass finds top-level declarations by regex on the
   masked text, spans each to its matching close brace (or statement
   ``;``), and reuses the shared segment machinery from
   :mod:`coderag_ray.functions.ast_chunker` (blank-filler merge,
   oversize line-boundary splitting, canonical-JSON metadata).

Same frozen layout contract as ``chunk_python_ast``: chunks exactly
partition the source (byte-concat reproduces the file), entities carry
``{name, type, signature}``, oversized class/impl bodies become header
+ per-method segments with ``scope`` set to the class.
"""

from __future__ import annotations

import re

from coderag_ray.functions.ast_chunker import (
    AstChunk,
    _merge_blank_fillers,
    _Seg,
    emit_chunks,
    line_starts,
)

BRACE_LANGUAGES = {
    "javascript": "js", "typescript": "js", "jsx": "js", "tsx": "js",
    "go": "go", "java": "java", "rust": "rust",
}

_WS = re.compile(r"\s+")


# ---------------------------------------------------------------------------
# pass 1: comment/string masking
# ---------------------------------------------------------------------------

def _mask_code(code: str, family: str) -> str:
    """Copy of ``code`` with comment and string interiors replaced by
    spaces (newlines preserved) so the structure pass sees only real
    code braces.  Deterministic single pass; unterminated constructs
    mask to end-of-input (the resilient-parse behavior the reference's
    tests allow, ``ast-chunking.test.ts:159-166``)."""
    n = len(code)
    out = list(code)
    i = 0
    # stack of JS template-literal states for ${ } re-entry
    template_stack: list[int] = []  # brace depth inside current ${ }

    def blank(j: int) -> None:
        if out[j] != "\n":
            out[j] = " "

    while i < n:
        c = code[i]
        nxt = code[i + 1] if i + 1 < n else ""
        # line comment
        if c == "/" and nxt == "/":
            while i < n and code[i] != "\n":
                blank(i)
                i += 1
            continue
        # block comment (nested for rust)
        if c == "/" and nxt == "*":
            depth = 1
            blank(i); blank(i + 1)
            i += 2
            while i < n and depth:
                if family == "rust" and code[i] == "/" and i + 1 < n and code[i + 1] == "*":
                    depth += 1
                    blank(i); blank(i + 1)
                    i += 2
                elif code[i] == "*" and i + 1 < n and code[i + 1] == "/":
                    depth -= 1
                    blank(i); blank(i + 1)
                    i += 2
                else:
                    blank(i)
                    i += 1
            continue
        # JS/TS regex literal: a '/' that can't be division (previous
        # significant char can't end an expression) starts a regex —
        # braces/quotes inside one must not derail the mask
        if family == "js" and c == "/":
            j = i - 1
            while j >= 0 and out[j] in " \t\n":
                j -= 1
            prev = out[j] if j >= 0 else ""
            is_regex = prev == "" or prev in "([{,;=:!&|?+-*%<>~^"
            if not is_regex and (prev.isalpha() or prev == "_"):
                # keyword before '/': return /.../ etc.
                k = j
                while k >= 0 and (out[k].isalnum() or out[k] == "_"):
                    k -= 1
                is_regex = "".join(out[k + 1:j + 1]) in (
                    "return", "typeof", "case", "in", "of", "new",
                    "delete", "void", "instanceof", "do", "else", "yield",
                    "await")
            if is_regex:
                blank(i)
                i += 1
                in_class = False
                while i < n and code[i] != "\n":
                    ch2 = code[i]
                    if ch2 == "\\":
                        blank(i)
                        if i + 1 < n:
                            blank(i + 1)
                        i += 2
                        continue
                    blank(i)
                    i += 1
                    if ch2 == "[":
                        in_class = True
                    elif ch2 == "]":
                        in_class = False
                    elif ch2 == "/" and not in_class:
                        break
                while i < n and code[i].isalpha():  # flags
                    blank(i)
                    i += 1
                continue
        # rust raw strings r"..." / r#"..."#
        if family == "rust" and c == "r" and nxt in "#\"" and (
                i == 0 or not (code[i - 1].isalnum() or code[i - 1] == "_")):
            j = i + 1
            hashes = 0
            while j < n and code[j] == "#":
                hashes += 1
                j += 1
            if j < n and code[j] == '"':
                close = '"' + "#" * hashes
                end = code.find(close, j + 1)
                end = n if end < 0 else end + len(close)
                for k in range(i, end):
                    blank(k)
                i = end
                continue
        # rust: lifetime vs char literal — treat ' as char literal only
        # when it closes within 2 chars (or an escape)
        if family == "rust" and c == "'":
            if nxt == "\\":
                j = code.find("'", i + 2)
                # skip past the escaped char (\n, \u{..}, ...)
                while j >= 0 and code[j - 1] == "\\" and code[max(0, j - 2)] != "\\":
                    j = code.find("'", j + 1)
                end = n if j < 0 else j + 1
                for k in range(i, end):
                    blank(k)
                i = end
                continue
            if i + 2 < n and code[i + 2] == "'":
                for k in range(i, i + 3):
                    blank(k)
                i += 3
                continue
            i += 1  # lifetime: leave as-is
            continue
        # strings (go rune literals take the generic quote path)
        if c in "'\"`":
            if c == "`" and family == "go":
                end = code.find("`", i + 1)  # raw: no escapes
                end = n if end < 0 else end + 1
                for k in range(i, end):
                    blank(k)
                i = end
                continue
            if c == "`" and family == "js":
                # template literal: blank until closing ` but re-enter
                # code at ${ ... }
                blank(i)
                i += 1
                while i < n:
                    if code[i] == "\\":
                        blank(i)
                        if i + 1 < n:
                            blank(i + 1)
                        i += 2
                        continue
                    if code[i] == "$" and i + 1 < n and code[i + 1] == "{":
                        blank(i); blank(i + 1)
                        i += 2
                        depth = 1
                        while i < n and depth:
                            # interpolation holds real code — keep it,
                            # but track nesting (strings inside are
                            # rare; accepted approximation)
                            if code[i] == "{":
                                depth += 1
                            elif code[i] == "}":
                                depth -= 1
                                if depth == 0:
                                    blank(i)
                                    i += 1
                                    break
                            i += 1
                        continue
                    if code[i] == "`":
                        blank(i)
                        i += 1
                        break
                    blank(i)
                    i += 1
                continue
            quote = c
            blank(i)
            i += 1
            while i < n:
                if code[i] == "\\":
                    blank(i)
                    if i + 1 < n:
                        blank(i + 1)
                    i += 2
                    continue
                if code[i] == quote or code[i] == "\n":
                    blank(i)
                    i += 1
                    break
                blank(i)
                i += 1
            continue
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# pass 2: top-level declarations
# ---------------------------------------------------------------------------

# Each pattern yields (type, name_group) on a masked, stripped line.
_JS_PATTERNS = [
    ("class", re.compile(
        r"^(?:export\s+(?:default\s+)?)?(?:declare\s+)?(?:abstract\s+)?class\s+([A-Za-z_$][\w$]*)")),
    ("function", re.compile(
        r"^(?:export\s+(?:default\s+)?)?(?:declare\s+)?(?:async\s+)?function\s*\*?\s*([A-Za-z_$][\w$]*)?")),
    ("interface", re.compile(r"^(?:export\s+)?(?:declare\s+)?interface\s+([A-Za-z_$][\w$]*)")),
    ("enum", re.compile(r"^(?:export\s+)?(?:declare\s+)?(?:const\s+)?enum\s+([A-Za-z_$][\w$]*)")),
    ("namespace", re.compile(r"^(?:export\s+)?(?:declare\s+)?(?:namespace|module)\s+([A-Za-z_$][\w$.]*)")),
    ("function", re.compile(
        r"^(?:export\s+)?(?:const|let|var)\s+([A-Za-z_$][\w$]*)\s*(?::[^=]*)?=\s*"
        r"(?:async\s*)?(?:function\b|\(|[A-Za-z_$][\w$]*\s*=>)")),
    ("type", re.compile(r"^(?:export\s+)?type\s+([A-Za-z_$][\w$]*)")),
]
_GO_PATTERNS = [
    ("function", re.compile(r"^func\s+(?:\([^)]*\)\s*)?([A-Za-z_]\w*)")),
    ("struct", re.compile(r"^type\s+([A-Za-z_]\w*)\s+struct\b")),
    ("interface", re.compile(r"^type\s+([A-Za-z_]\w*)\s+interface\b")),
    ("type", re.compile(r"^type\s+([A-Za-z_]\w*)\b")),
]
_JAVA_MODS = r"(?:(?:public|private|protected|static|final|abstract|sealed|non-sealed|strictfp)\s+)*"
_JAVA_PATTERNS = [
    ("class", re.compile(rf"^{_JAVA_MODS}class\s+([A-Za-z_]\w*)")),
    ("interface", re.compile(rf"^{_JAVA_MODS}(?:@\s*)?interface\s+([A-Za-z_]\w*)")),
    ("enum", re.compile(rf"^{_JAVA_MODS}enum\s+([A-Za-z_]\w*)")),
    ("class", re.compile(rf"^{_JAVA_MODS}record\s+([A-Za-z_]\w*)")),
]
_RUST_VIS = r"(?:pub(?:\s*\([^)]*\))?\s+)?"
_RUST_PATTERNS = [
    ("function", re.compile(
        rf"^{_RUST_VIS}(?:const\s+)?(?:async\s+)?(?:unsafe\s+)?(?:extern\s+\"[^\"]*\"\s+)?fn\s+([A-Za-z_]\w*)")),
    ("struct", re.compile(rf"^{_RUST_VIS}struct\s+([A-Za-z_]\w*)")),
    ("enum", re.compile(rf"^{_RUST_VIS}enum\s+([A-Za-z_]\w*)")),
    ("trait", re.compile(rf"^{_RUST_VIS}(?:unsafe\s+)?trait\s+([A-Za-z_]\w*)")),
    ("mod", re.compile(rf"^{_RUST_VIS}mod\s+([A-Za-z_]\w*)")),
    ("impl", re.compile(r"^(?:unsafe\s+)?impl\b\s*(?:<[^>]*>\s*)?([A-Za-z_][\w:<>, ]*?)?\s*(?:\{|for\b|$)")),
    ("type", re.compile(rf"^{_RUST_VIS}type\s+([A-Za-z_]\w*)")),
]
_PATTERNS = {"js": _JS_PATTERNS, "go": _GO_PATTERNS,
             "java": _JAVA_PATTERNS, "rust": _RUST_PATTERNS}

# method patterns inside an oversized class/impl body (applied at depth 1)
_JS_METHOD = re.compile(
    r"^(?:(?:public|private|protected|static|readonly|abstract|async|override|get|set)\s+)*"
    r"\*?\s*(#?[A-Za-z_$][\w$]*)\s*(?:<[^>]*>)?\s*\(")
_JAVA_METHOD = re.compile(
    r"^(?:(?:public|private|protected|static|final|abstract|synchronized|native|default)\s+)*"
    r"(?:<[^>]*>\s*)?[\w<>\[\],.\s]*?([A-Za-z_]\w*)\s*\(")
_RUST_METHOD = _RUST_PATTERNS[0][1]
_METHOD_PATTERNS = {"js": _JS_METHOD, "java": _JAVA_METHOD, "rust": _RUST_METHOD}
# annotation/attribute lines that attach to the following declaration
_ATTACH = {
    "java": re.compile(r"^@\s*[A-Za-z_][\w.]*(?:\(.*)?$"),
    "rust": re.compile(r"^#!?\[.*$"),
    "js": re.compile(r"^@\s*[A-Za-z_$][\w$.]*(?:\(.*)?$"),  # ts decorators
}
_CONTAINER_TYPES = {"class", "interface", "enum", "namespace", "trait", "impl", "mod",
                    "struct"}


def _decl_end(masked: str, line_start: list[int], s_line: int, n_lines: int) -> int:
    """Last 0-based line of the declaration starting at ``s_line``:
    scan the masked text from the line start; a ``{`` opens a body that
    ends at its matching ``}``; a ``;`` (or ``=`` for Go ``type A =``)
    before any ``{`` ends the statement; fall back to the first of
    either, else the single line."""
    i = line_start[s_line]
    end_of_input = line_start[-1] - 1
    depth = 0
    paren = 0
    seen_brace = False
    while i < end_of_input and i < len(masked):
        ch = masked[i]
        if ch == "(" or ch == "[":
            paren += 1
        elif ch == ")" or ch == "]":
            paren = max(0, paren - 1)
        elif ch == "{":
            # braces inside parens/brackets are destructuring patterns,
            # TS object types or `= {}` defaults — not the body
            if paren == 0:
                depth += 1
                seen_brace = True
        elif ch == "}":
            if paren == 0:
                depth -= 1
                if seen_brace and depth == 0:
                    return min(n_lines - 1, masked.count("\n", 0, i + 1))
                if depth < 0:  # unbalanced: treat as statement end
                    return min(n_lines - 1, masked.count("\n", 0, i))
        elif ch == ";" and depth == 0 and paren == 0:
            return min(n_lines - 1, masked.count("\n", 0, i))
        elif ch == "\n" and not seen_brace and depth == 0 and paren == 0:
            # statement without braces and without `;` (Go `type A B`):
            # ends at this line unless the next non-ws char is `{`
            rest = masked[i + 1:]
            nxt = rest.lstrip()
            if not nxt.startswith("{"):
                return min(n_lines - 1, masked.count("\n", 0, i))
        i += 1
    return n_lines - 1


def _signature_of(masked_lines: list[str], raw_lines: list[str], s_line: int) -> str:
    """Declaration header: the raw first line up to (not including) the
    opening brace / trailing ``=>`` body, whitespace-collapsed."""
    raw = raw_lines[s_line]
    cut = len(raw)
    m = masked_lines[s_line]
    for stop in ("{",):
        j = m.find(stop)
        if j >= 0:
            cut = min(cut, j)
    return _WS.sub(" ", raw[:cut]).strip()


def _attach_start(lines_masked: list[str], s_line: int, family: str,
                  floor: int) -> int:
    """Walk annotation/attribute lines directly above a declaration
    (Java ``@Anno``, Rust ``#[attr]``, TS decorators) — they belong to
    the entity, like Python decorators."""
    pat = _ATTACH.get(family)
    if pat is None:
        return s_line
    s = s_line
    while s - 1 >= floor and pat.match(lines_masked[s - 1].strip()):
        s -= 1
    return s


def _find_entities(masked_lines: list[str], raw_lines: list[str],
                   depth_at: list[int], masked: str, line_start: list[int],
                   family: str, lo: int, hi: int, base_depth: int,
                   patterns) -> list[tuple[int, int, dict]]:
    """(start_line, end_line, entity) for declarations at
    ``base_depth`` within lines [lo, hi]."""
    n_lines = len(raw_lines)
    out = []
    i = lo
    while i <= hi:
        if depth_at[i] != base_depth:
            i += 1
            continue
        stripped = masked_lines[i].strip()
        hit = None
        for typ, pat in patterns:
            m = pat.match(stripped)
            if m:
                name = next((g for g in m.groups() if g), "") or "anonymous"
                hit = (typ, name.strip())
                break
        if hit is None:
            i += 1
            continue
        e = _decl_end(masked, line_start, i, n_lines)
        e = min(max(e, i), hi)
        s = _attach_start(masked_lines, i, family, lo)
        ent = {"name": hit[1], "type": hit[0],
               "signature": _signature_of(masked_lines, raw_lines, i)}
        out.append((s, e, ent))
        i = e + 1
    return out


def chunk_braces_ast(code: str, lang: str,
                     max_chunk_size: int = 1000) -> list[AstChunk] | None:
    """Semantic chunks for a brace language; ``None`` = unsupported
    language (caller falls back to character windows).  Same contract
    as :func:`coderag_ray.functions.ast_chunker.chunk_python_ast`:
    chunks exactly partition the source."""
    family = BRACE_LANGUAGES.get((lang or "").lower())
    if family is None:
        return None
    if code.strip() == "":
        return []

    lines = code.split("\n")
    n_lines = len(lines)
    line_start = line_starts(code, lines)
    masked = _mask_code(code, family)
    masked_lines = masked.split("\n")

    # brace depth at the start of each line (from masked text)
    depth_at = [0] * n_lines
    d = 0
    for li, ml in enumerate(masked_lines):
        depth_at[li] = d
        d += ml.count("{") - ml.count("}")

    patterns = _PATTERNS[family]
    entities = _find_entities(masked_lines, lines, depth_at, masked,
                              line_start, family, 0, n_lines - 1, 0, patterns)

    # entity + filler segments exactly covering [0, n_lines)
    segs: list[_Seg] = []
    cursor = 0
    for s, e, ent in entities:
        if s < cursor:  # overlapping match (shouldn't happen) — skip
            continue
        if s > cursor:
            segs.append(_Seg(cursor, s - 1, "chunk", [], []))
        segs.append(_Seg(s, e, ent["type"], [ent], []))
        cursor = e + 1
    if cursor < n_lines:
        segs.append(_Seg(cursor, n_lines - 1, "chunk", [], []))
    segs = _merge_blank_fillers(segs, lines)

    # oversized container bodies: header + per-method segments
    method_pat = _METHOD_PATTERNS.get(family)
    expanded: list[_Seg] = []
    for seg in segs:
        size = line_start[seg.end + 1] - line_start[seg.start]
        if (seg.entities and seg.entities[0]["type"] in _CONTAINER_TYPES
                and size > max_chunk_size and method_pat is not None
                and seg.end > seg.start):
            ent = seg.entities[0]
            inner = _find_entities(
                masked_lines, lines, depth_at, masked, line_start, family,
                seg.start + 1, seg.end, 1,
                [("function", method_pat)] if family != "rust"
                else _RUST_PATTERNS[:1])
            if not inner:
                expanded.append(seg)
                continue
            scope = [{"name": ent["name"], "type": ent["type"]}]
            subs: list[_Seg] = []
            cursor = seg.start
            for ms, me, ment in inner:
                if ms > cursor:
                    ents = seg.entities if cursor == seg.start else []
                    subs.append(_Seg(cursor, ms - 1, "chunk", ents, list(seg.scope)))
                subs.append(_Seg(ms, me, "function", [ment], scope))
                cursor = me + 1
            if cursor <= seg.end:
                subs.append(_Seg(cursor, seg.end, "chunk", [], scope))
            expanded.extend(_merge_blank_fillers(subs, lines))
        else:
            expanded.append(seg)

    return emit_chunks(expanded, code, line_start, max_chunk_size)
