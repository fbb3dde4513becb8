"""Snippet extraction (M13/M14/M16) and CLI (S10) tests."""

import json
import os
import subprocess
import sys

import pytest

from coderag_ray.query.snippets import (
    extract_snippet,
    format_results_markdown,
    numbered_snippet,
    truncate_head_tail,
)


CODE = "\n".join(
    [f"line {i}" for i in range(10)]
    + ["function authenticate(user) {"]
    + [f"line {i}" for i in range(11, 30)]
    + ["  return validateCredentials(user)"]
    + [f"line {i}" for i in range(31, 40)]
)


def test_extract_snippet_contains_matches_with_context():
    s = extract_snippet(CODE, ["authenticate", "validatecredentials"])
    assert "function authenticate(user) {" in s
    assert "validateCredentials" in s
    assert "..." in s  # two separated blocks
    # ±3 context lines around the first hit
    assert "line 8" in s and "line 13" in s
    assert "line 5" not in s


def test_extract_snippet_no_match_falls_back_to_head():
    s = extract_snippet(CODE, ["zzz_missing"])
    assert s.startswith("line 0")


def test_extract_snippet_empty():
    assert extract_snippet("", ["x"]) == ""


def test_extract_snippet_caps_chars():
    big = "\n".join(f"hit term line {i} " + "x" * 120 for i in range(100))
    s = extract_snippet(big, ["term"], max_chars=500)
    assert len(s) <= 600


def test_numbered_snippet():
    assert numbered_snippet("a\nb", 5) == "5: a\n6: b"
    assert numbered_snippet("a\nb") == "0: a\n1: b"  # fallback chunks start at 0


def test_truncate_head_tail():
    text = "H" * 1400 + "M" * 1000 + "T" * 600
    out = truncate_head_tail(text, 2000)
    assert out.startswith("H" * 100)
    assert out.endswith("T" * 100)
    assert "chars omitted" in out
    assert truncate_head_tail("short", 2000) == "short"


def test_format_results_markdown():
    rows = [{"rank": 1, "path": "a.py", "score": 1.5, "matched_terms": ["x"]}]
    md = format_results_markdown(rows, ["snippet body"])
    assert "### 1. a.py (score 1.5000)" in md
    assert "snippet body" in md


@pytest.mark.slow
def test_cli_build_search_status(tmp_path):
    """Drive the CLI end-to-end in a subprocess (owns its Ray session)."""
    import pyarrow.parquet as pq

    from coderag_ray.corpus import make_corpus

    docs = tmp_path / "docs.parquet"
    pq.write_table(make_corpus(80, seed=3), str(docs))
    idx = tmp_path / "idx"

    def run(*args):
        return subprocess.run(
            [sys.executable, "-m", "coderag_ray.cli", *args],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    r = run("build", str(docs), str(idx), "--partitions", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["n_docs"] > 0

    r = run("search", str(idx), "authenticate user", "-k", "3", "--json")
    assert r.returncode == 0, r.stderr[-2000:]
    rows = json.loads(r.stdout.strip().splitlines()[-1])
    assert 0 < len(rows) <= 3 and rows[0]["rank"] == 1

    r = run("search", str(idx), "authenticate user", "-k", "2")
    assert r.returncode == 0 and "### 1." in r.stdout

    r = run("status", str(idx))
    assert r.returncode == 0
    st = json.loads(r.stdout)
    assert st["partitions_complete"] == 3


def test_job_submit_entrypoint(tmp_path):
    """scripts/submit_build.py — the `ray job submit` entrypoint — runs
    standalone (RAY_ADDRESS=local) and re-submits resumably: the second
    identical submission is a tier-1 no-op (zero dirty partitions)."""
    import pyarrow.parquet as pq

    from coderag_ray.corpus import make_corpus

    docs = tmp_path / "docs.parquet"
    pq.write_table(make_corpus(60, seed=4), str(docs))
    idx = tmp_path / "idx"

    def submit():
        r = subprocess.run(
            [sys.executable, "scripts/submit_build.py", str(docs), str(idx),
             "--partitions", "3"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
            env={**os.environ, "PYTHONPATH": "/root/repo"},
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    rep = submit()
    assert rep["n_docs"] > 0 and rep["dirty_partitions"] == 3
    rep2 = submit()  # resumable re-submission: nothing recomputed
    assert rep2["dirty_partitions"] == 0
    assert rep2["fingerprint_mode"] == "file"
    assert rep2["n_chunks"] == rep["n_chunks"]
