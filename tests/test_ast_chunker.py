"""Python AST chunker tests — mirrors the reference's
``ast-chunking.test.ts`` cases (function splits, classes, line ranges,
maxChunkSize, fallback, empty input) plus the exact-partition invariant
the SQL oracle relies on."""

import json

import numpy as np
import pyarrow as pa

from coderag_ray.functions.ast_chunker import chunk_python_ast


def _meta(c):
    return json.loads(c.meta)


def test_splits_by_functions():
    code = "def foo():\n    return 1\n\ndef bar():\n    return 2\n\ndef baz():\n    return 3\n"
    chunks = chunk_python_ast(code)
    assert len(chunks) >= 1
    texts = [c.content for c in chunks]
    assert any("def foo" in t for t in texts)
    assert any("def bar" in t for t in texts)
    assert any("def baz" in t for t in texts)
    # one entity chunk per function, each typed by its first entity
    funcs = [c for c in chunks if c.type == "function"]
    assert [e["name"] for c in funcs for e in _meta(c)["entities"]] == ["foo", "bar", "baz"]


def test_handles_classes_with_entities_and_signature():
    code = (
        "class MyClass:\n"
        "    def __init__(self):\n"
        "        self.value = 0\n"
        "\n"
        "    def increment(self):\n"
        "        self.value += 1\n"
    )
    chunks = chunk_python_ast(code)
    assert len(chunks) > 0
    cls = [c for c in chunks if c.type == "class"]
    assert len(cls) == 1
    ent = _meta(cls[0])["entities"][0]
    assert ent == {"name": "MyClass", "type": "class", "signature": "class MyClass"}
    assert "class MyClass" in cls[0].content


def test_line_ranges_are_one_based_and_ordered():
    code = "def first():\n    return 1\n\ndef second():\n    return 2\n"
    chunks = chunk_python_ast(code)
    assert chunks
    for c in chunks:
        assert c.start_line >= 1
        assert c.end_line >= c.start_line
        assert c.content
        assert _meta(c)["fallback"] is False
    # first() starts on line 1
    assert chunks[0].start_line == 1


def test_exact_partition_reassembles_source():
    code = (
        "import os\n\n@property\ndef deco():\n    return os\n\n"
        "class A:\n    x = 1\n\nasync def later(a, *, b=2, **kw):\n    return a\n\ntail = 1\n"
    )
    chunks = chunk_python_ast(code)
    assert "".join(c.content for c in chunks) == code
    # offsets are contiguous
    offs = [(c.start_offset, c.end_offset) for c in chunks]
    assert offs[0][0] == 0 and offs[-1][1] == len(code)
    for (s0, e0), (s1, e1) in zip(offs, offs[1:]):
        assert e0 == s1
    # signature captures kwonly/kwargs
    ent = [e for c in chunks for e in _meta(c)["entities"] if e["name"] == "later"][0]
    assert ent["signature"] == "async def later(a, *, b, **kw)"


def test_respects_max_chunk_size():
    large = "def veryLargeFunction():\n" + "    x = 1\n" * 200
    chunks = chunk_python_ast(large, max_chunk_size=500)
    assert len(chunks) > 1
    assert all(len(c.content) <= 500 for c in chunks)
    assert "".join(c.content for c in chunks) == large
    # split parts keep entity identity + gain part indices
    parts = [_meta(c).get("part") for c in chunks]
    assert parts == list(range(len(chunks)))


def test_oversized_class_splits_per_method_with_scope():
    code = "class Big:\n" + "".join(
        f"    def m{i}(self):\n        return {i}\n\n" for i in range(40)
    )
    chunks = chunk_python_ast(code, max_chunk_size=300)
    assert "".join(c.content for c in chunks) == code
    methods = [c for c in chunks if c.type == "function"]
    assert len(methods) == 40
    for c in methods:
        assert _meta(c)["scope"] == [{"name": "Big", "type": "class"}]


def test_empty_input_returns_no_chunks():
    assert chunk_python_ast("") == []
    assert chunk_python_ast("   \n\t\n") == []


def test_syntax_error_returns_none_for_fallback():
    assert chunk_python_ast("def f(:\n  broken") is None
    assert chunk_python_ast("function { syntax error }") is None


def test_single_line_content():
    chunks = chunk_python_ast("x = 42")
    assert len(chunks) == 1
    assert chunks[0].content == "x = 42"
    assert chunks[0].type == "chunk"


def test_monster_line_hard_split():
    mono = "x = [" + ",".join(str(i) for i in range(3000)) + "]\n"
    chunks = chunk_python_ast(mono, max_chunk_size=400)
    assert "".join(c.content for c in chunks) == mono
    assert max(len(c.content) for c in chunks) <= 400


def test_ast_chunker_stage_python_and_fallback(ray_session):
    """The 'ast' chunker stage AST-chunks python docs and char-falls-back
    for other languages / unparseable content (ast-chunking.ts:59-68)."""
    import ray.data

    from coderag_ray.config import IndexConfig
    from coderag_ray.stages.chunk import make_chunker
    from coderag_ray.stages.ingest import make_ingest

    py = "def alpha():\n    return 1\n\ndef beta():\n    return 2\n"
    md = "# Title\n\n" + "a" * 2500  # > max_chunk_size → multiple fallback windows
    tbl = pa.table(
        {
            "repo": ["r", "r"],
            "path": ["a.py", "b.md"],
            "commit": ["c1", "c1"],
            "lang": ["python", "markdown"],
            "content": [py, md],
        }
    )
    cfg = IndexConfig(chunker="ast", num_partitions=4)
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(make_ingest(cfg), batch_format="pyarrow")
        .map_batches(make_chunker(cfg), batch_format="pyarrow")
        .to_pandas()
    )
    pyc = out[out.lang == "python"].sort_values("chunk_id")
    assert set(pyc.chunk_type) == {"function"}
    assert "".join(pyc.content) == py
    assert (pyc.start_line >= 1).all()
    mdc = out[out.lang == "markdown"].sort_values("chunk_id")
    assert set(mdc.chunk_type) == {"text"}
    assert len(mdc) > 1  # windowed fallback
    assert (mdc.start_line == 0).all()
    metas = [json.loads(m) for m in mdc.chunk_meta]
    assert all(m["fallback"] is True for m in metas)
    assert [m["index"] for m in metas] == list(range(len(mdc)))
