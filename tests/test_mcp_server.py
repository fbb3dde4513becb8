"""MCP stdio server tests — argv contract (mirrors the reference's
``mcp-server/src/index.test.ts``), JSON-RPC handler unit coverage, and
one real subprocess stdio round-trip over a built index."""

import json
import os
import subprocess
import sys

import pytest

from coderag_ray.mcp_server import SERVER_CONFIG, McpServer, parse_args


def test_server_config_fields():
    assert SERVER_CONFIG["name"] == "coderag-ray-mcp"
    assert SERVER_CONFIG["version"]
    assert SERVER_CONFIG["description"]


def test_argv_parsing_reference_cases():
    # index.test.ts "command line argument parsing"
    cfg = parse_args(["--root=/test/path", "--max-size=2097152", "--no-auto-index"])
    assert cfg["index_dir"] == "/test/path"
    assert cfg["max_file_size"] == 2097152
    assert cfg["auto_index"] is False
    # index.test.ts "default values when no arguments provided"
    cfg = parse_args([])
    assert cfg["max_file_size"] == 1048576
    assert cfg["auto_index"] is True
    assert cfg["index_only"] is False
    # ours: --index= names the index dir
    assert parse_args(["--index=/idx"])["index_dir"] == "/idx"


def test_jsonrpc_lifecycle_without_index(tmp_path):
    srv = McpServer(str(tmp_path / "missing"))
    init = srv.handle({"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}})
    assert init["result"]["serverInfo"]["name"] == "coderag-ray-mcp"
    assert srv.handle({"jsonrpc": "2.0", "method": "notifications/initialized"}) is None
    tools = srv.handle({"jsonrpc": "2.0", "id": 2, "method": "tools/list"})
    names = [t["name"] for t in tools["result"]["tools"]]
    assert names == ["codebase_search", "get_indexing_status"]
    schema = tools["result"]["tools"][0]["inputSchema"]
    assert set(schema["properties"]) >= {
        "query", "limit", "include_content", "file_extensions", "path_filter",
        "exclude_paths", "context_lines", "max_snippet_chars", "max_snippet_blocks"}
    # searching a missing index answers with the reference's error text
    res = srv.handle({"jsonrpc": "2.0", "id": 3, "method": "tools/call",
                      "params": {"name": "codebase_search",
                                 "arguments": {"query": "foo"}}})
    assert "Index Not Available" in res["result"]["content"][0]["text"]
    # unknown method / unknown tool
    assert srv.handle({"jsonrpc": "2.0", "id": 4, "method": "nope"})["error"]["code"] == -32601
    bad = srv.handle({"jsonrpc": "2.0", "id": 5, "method": "tools/call",
                      "params": {"name": "bogus", "arguments": {}}})
    assert bad["error"]["code"] == -32602
    status = srv.handle({"jsonrpc": "2.0", "id": 6, "method": "tools/call",
                         "params": {"name": "get_indexing_status", "arguments": {}}})
    st = json.loads(status["result"]["content"][0]["text"])
    assert st["isIndexing"] is False and st["indexedCount"] == 0


@pytest.fixture(scope="module")
def built_index(ray_session, tmp_path_factory):
    from coderag_ray.config import IndexConfig
    from coderag_ray.corpus import corpus_from_documents
    from coderag_ray.index.build import build_index

    idx = str(tmp_path_factory.mktemp("mcp_idx"))
    build_index(corpus_from_documents("/root/testdata/sf0.001"), idx,
                IndexConfig(tokenizer="code", num_partitions=4))
    return idx


def test_search_over_built_index(built_index):
    srv = McpServer(built_index)
    res = srv.handle({"jsonrpc": "2.0", "id": 1, "method": "tools/call",
                      "params": {"name": "codebase_search",
                                 "arguments": {"query": "authenticate merge",
                                               "limit": 5}}})
    text = res["result"]["content"][0]["text"]
    assert text.startswith('# Search: "authenticate merge"')
    assert "## " in text and "**Score:**" in text and "```" in text
    # filters surface
    res2 = srv.handle({"jsonrpc": "2.0", "id": 2, "method": "tools/call",
                       "params": {"name": "codebase_search",
                                  "arguments": {"query": "authenticate merge",
                                                "limit": 5,
                                                "file_extensions": [".zz"]}}})
    assert "(0 results)" in res2["result"]["content"][0]["text"]
    status = srv.handle({"jsonrpc": "2.0", "id": 3, "method": "tools/call",
                         "params": {"name": "get_indexing_status", "arguments": {}}})
    st = json.loads(status["result"]["content"][0]["text"])
    assert st["indexedCount"] > 0 and st["totalChunks"] > 0


def test_stdio_subprocess_round_trip(built_index):
    """Drive the real stdio protocol end-to-end: initialize →
    tools/list → codebase_search → status, over pipes."""
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.Popen(
        [sys.executable, "-m", "coderag_ray.mcp_server", f"--index={built_index}"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=env, cwd="/root/repo",
    )
    try:
        msgs = [
            {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
            {"jsonrpc": "2.0", "method": "notifications/initialized"},
            {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
            {"jsonrpc": "2.0", "id": 3, "method": "tools/call",
             "params": {"name": "codebase_search",
                        "arguments": {"query": "authenticate", "limit": 3}}},
            {"jsonrpc": "2.0", "id": 4, "method": "tools/call",
             "params": {"name": "get_indexing_status", "arguments": {}}},
        ]
        stdin = "".join(json.dumps(m) + "\n" for m in msgs)
        out, err = proc.communicate(stdin, timeout=120)
        lines = [json.loads(ln) for ln in out.splitlines() if ln.strip()]
        by_id = {m["id"]: m for m in lines}
        assert by_id[1]["result"]["protocolVersion"]
        assert [t["name"] for t in by_id[2]["result"]["tools"]] == [
            "codebase_search", "get_indexing_status"]
        assert '# Search: "authenticate"' in by_id[3]["result"]["content"][0]["text"]
        assert json.loads(by_id[4]["result"]["content"][0]["text"])["indexedCount"] > 0
        assert proc.returncode == 0  # clean EOF shutdown
    finally:
        proc.kill()
