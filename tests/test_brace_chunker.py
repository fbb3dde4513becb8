"""Brace-language semantic chunker (M6 for TS/JS/Go/Java/Rust) —
mirrors the reference's ``ast-chunking.test.ts`` cases plus the frozen
exact-partition layout contract shared with the Python chunker."""

import json

import pytest

from coderag_ray.functions.brace_chunker import BRACE_LANGUAGES, chunk_braces_ast


def _reassemble(chunks):
    return "".join(c.content for c in chunks)


# --- getSupportedLanguages parity (ast-chunking.ts:47-54) -----------------

def test_supported_languages():
    langs = {"typescript", "javascript", "python", "rust", "go", "java"}
    assert set(BRACE_LANGUAGES) | {"python"} >= langs


# --- JavaScript (ast-chunking.test.ts:64-127) -----------------------------

JS_FUNCS = """function foo() {
  return 1;
}

function bar() {
  return 2;
}

function baz() {
  return 3;
}
"""


def test_js_splits_by_functions():
    chunks = chunk_braces_ast(JS_FUNCS, "javascript")
    texts = [c.content for c in chunks]
    assert len(chunks) >= 1
    assert any("function foo" in t for t in texts)
    assert any("function bar" in t for t in texts)
    assert any("function baz" in t for t in texts)
    # boundary metadata: one entity per function chunk
    names = [json.loads(c.meta)["entities"][0]["name"]
             for c in chunks if c.type == "function"]
    assert names == ["foo", "bar", "baz"]
    assert _reassemble(chunks) == JS_FUNCS


def test_js_classes():
    code = """class MyClass {
  constructor() {
    this.value = 0;
  }

  increment() {
    this.value++;
  }
}
"""
    chunks = chunk_braces_ast(code, "javascript")
    assert len(chunks) > 0
    assert any("class MyClass" in c.content for c in chunks)
    cls = next(c for c in chunks if c.type == "class")
    ent = json.loads(cls.meta)["entities"][0]
    assert ent == {"name": "MyClass", "type": "class", "signature": "class MyClass"}


def test_js_line_ranges_meaningful():
    code = """function first() {
  return 1;
}

function second() {
  return 2;
}
"""
    chunks = chunk_braces_ast(code, "javascript")
    assert len(chunks) > 0
    for c in chunks:
        assert c.start_line >= 1
        assert c.end_line >= c.start_line
        assert c.content
        assert json.loads(c.meta)["fallback"] is False


# --- size constraints (ast-chunking.test.ts:129-146) ----------------------

def test_respects_max_chunk_size():
    code = "function veryLargeFunction() {\n" + "  return 1;\n" * 100 + "}\n"
    chunks = chunk_braces_ast(code, "javascript", max_chunk_size=500)
    assert len(chunks) > 1
    for c in chunks:
        assert len(c.content) <= 800  # reference allows slight overshoot
    assert _reassemble(chunks) == code
    parts = [json.loads(c.meta).get("part") for c in chunks]
    assert parts == list(range(len(chunks)))  # split parts are indexed


# --- fallback / resilience (ast-chunking.test.ts:148-173) -----------------

def test_unknown_language_returns_none():
    assert chunk_braces_ast("a" * 2000, "unknown") is None
    assert chunk_braces_ast("<div></div>", "html") is None


def test_broken_syntax_still_chunks():
    chunks = chunk_braces_ast("function { syntax error }", "javascript")
    assert len(chunks) > 0
    assert chunks[0].content


def test_empty_input():
    assert chunk_braces_ast("", "javascript") == []
    assert chunk_braces_ast("   \n  ", "go") == []


def test_single_line_content():
    chunks = chunk_braces_ast("const x = 42;", "javascript")
    assert len(chunks) > 0
    assert chunks[0].content == "const x = 42;"


# --- TypeScript specifics --------------------------------------------------

def test_ts_interface_enum_arrow_decorator():
    code = """export interface Shape {
  area(): number;
}

export enum Color {
  Red,
  Green,
}

@Component({selector: 'x'})
export class Widget {
  render() { return 1; }
}

export const compute = async (n: number): Promise<number> => {
  return n * 2;
};
"""
    chunks = chunk_braces_ast(code, "typescript")
    assert _reassemble(chunks) == code
    types = [c.type for c in chunks]
    assert "interface" in types and "enum" in types and "class" in types
    assert "function" in types  # the arrow const
    w = next(c for c in chunks if c.type == "class")
    assert w.content.startswith("\n@Component")  # decorator attaches


# --- lexer: braces in strings/comments/templates must not split ------------

def test_braces_in_literals_ignored():
    code = """function a() {
  const s = "} not a close {";
  const t = 'nor } this';
  const u = `tpl } ${ {x: 1}.x } end`;
  // } comment brace
  /* } block
     { comment */
  return s;
}

function b() {
  return 2;
}
"""
    chunks = chunk_braces_ast(code, "javascript")
    assert _reassemble(chunks) == code
    fn = [c for c in chunks if c.type == "function"]
    assert [json.loads(c.meta)["entities"][0]["name"] for c in fn] == ["a", "b"]
    assert fn[0].content.rstrip().endswith("}")


# --- Go --------------------------------------------------------------------

def test_go_funcs_and_types():
    code = """package main

func Greet(name string) string {
\treturn "hi } " + name
}

type Server struct {
\tAddr string
}

func (s *Server) Run() error {
\treturn nil
}
"""
    chunks = chunk_braces_ast(code, "go")
    assert _reassemble(chunks) == code
    ents = [json.loads(c.meta)["entities"][0] for c in chunks
            if json.loads(c.meta)["entities"]]
    names = [e["name"] for e in ents]
    assert names == ["Greet", "Server", "Run"]
    assert [e["type"] for e in ents] == ["function", "struct", "function"]
    # method signature keeps the receiver
    assert ents[2]["signature"] == "func (s *Server) Run() error"


# --- Java ------------------------------------------------------------------

def test_java_class_annotation_and_oversize_split():
    methods = "\n".join(f"""    public int method{i}() {{
        return {i};
    }}""" for i in range(12))
    code = f"""package com.example;

@Service
public class Big {{
{methods}
}}
"""
    chunks = chunk_braces_ast(code, "java", max_chunk_size=300)
    assert _reassemble(chunks) == code
    methods_out = [c for c in chunks if c.type == "function"]
    assert len(methods_out) == 12
    for c in methods_out:
        assert json.loads(c.meta)["scope"] == [{"name": "Big", "type": "class"}]
    # header chunk keeps the class entity + annotation
    header = next(c for c in chunks if "@Service" in c.content)
    assert json.loads(header.meta)["entities"][0]["name"] == "Big"


# --- Rust ------------------------------------------------------------------

def test_rust_entities_and_literals():
    code = """use std::fmt;

#[derive(Debug)]
pub struct Point { x: i64 }

impl Point {
    pub fn new(x: i64) -> Self {
        let s = "brace } in string";
        let r = r#"raw " and } brace"#;
        let c = '}';
        Point { x }
    }
}

pub fn free<'a>(p: &'a Point) -> i64 {
    p.x
}
"""
    chunks = chunk_braces_ast(code, "rust")
    assert _reassemble(chunks) == code
    types = [c.type for c in chunks]
    assert "struct" in types and "impl" in types and "function" in types
    free = next(c for c in chunks if c.type == "function")
    assert json.loads(free.meta)["entities"][0]["name"] == "free"
    st = next(c for c in chunks if c.type == "struct")
    assert "#[derive(Debug)]" in st.content  # attribute attaches


# --- chunk stage wires brace languages through chunker="ast" ---------------

def test_chunk_stage_routes_brace_languages(ray_session):
    import pyarrow as pa
    import ray.data

    from coderag_ray.config import IndexConfig
    from coderag_ray.stages.chunk import make_chunker
    from coderag_ray.stages.ingest import make_ingest

    js = "function a() {\n  return 1;\n}\n\nclass C {\n  m() {}\n}\n"
    go = "package p\n\nfunc A() {\n\treturn\n}\n"
    md = "# doc\n\n" + "x" * 1500
    tbl = pa.table({
        "repo": ["r"] * 3,
        "path": ["a.js", "b.go", "c.md"],
        "commit": ["c1"] * 3,
        "lang": ["javascript", "go", "markdown"],
        "content": [js, go, md],
    })
    cfg = IndexConfig(chunker="ast", num_partitions=2)
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(make_ingest(cfg), batch_format="pyarrow")
        .map_batches(make_chunker(cfg), batch_format="pyarrow")
        .to_pandas()
    )
    jsc = out[out.lang == "javascript"].sort_values("chunk_id")
    assert set(jsc.chunk_type) >= {"function", "class"}
    assert "".join(jsc.content) == js
    goc = out[out.lang == "go"].sort_values("chunk_id")
    assert "function" in set(goc.chunk_type)
    assert "".join(goc.content) == go
    mdc = out[out.lang == "markdown"]
    assert set(mdc.chunk_type) == {"text"}  # char-window fallback
    assert len(mdc) > 1
    assert all(json.loads(m)["fallback"] for m in mdc.chunk_meta)


# --- exact partition property over all languages ---------------------------

@pytest.mark.parametrize("lang,snippet", [
    ("javascript", JS_FUNCS),
    ("typescript", "export type A = {x: number};\nexport function f(){}\n"),
    ("go", "package p\n\nfunc A() {}\n\nfunc B() {}\n"),
    ("java", "class A { void m() {} }\n"),
    ("rust", "fn a() {}\n\nmod b { pub fn c() {} }\n"),
])
def test_exact_partition(lang, snippet):
    chunks = chunk_braces_ast(snippet, lang)
    assert _reassemble(chunks) == snippet
    # offsets are contiguous
    offs = [(c.start_offset, c.end_offset) for c in chunks]
    assert offs[0][0] == 0 and offs[-1][1] == len(snippet)
    for (a, b), (c_, d) in zip(offs, offs[1:]):
        assert b == c_
