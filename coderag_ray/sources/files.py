"""Filesystem corpus source — the reference's codebase scan re-expressed
as a Ray Data source (``scanFiles`` / ``loadGitignore``,
``/root/reference/packages/core/src/utils.ts:100-230``).

Two phases, like the reference's memory-optimized indexer
(``indexer.ts:437-470``):

1. **metadata walk** (driver): recursive directory listing with the
   reference's default ignore set + ``.gitignore`` patterns and the
   max-file-size stat guard — paths and sizes only, no content.  The
   listing is driver-side metadata (what ``read_binary_files`` does
   internally too); content never touches the driver.
2. **distributed read**: ``ray.data.read_binary_files`` over the kept
   paths → ``map_batches`` decode (UTF-8; undecodable files are dropped
   like the reference's text-file guard) → the engine's input-hint
   schema ``(repo, path, commit, lang, content)``.

The gitignore matcher implements the subset the reference's default
patterns and ordinary ``.gitignore`` files use: comments/blanks,
``!``-negation (last match wins), leading-``/`` anchoring,
trailing-``/`` directory patterns, and ``*``/``?`` globs, matched
against every path suffix segment-prefix like the ``ignore`` npm
package does for unanchored patterns.
"""

from __future__ import annotations

import fnmatch
import os

import pyarrow as pa

from coderag_ray.functions.language import detect_language, is_text_file

# utils.ts:104-127
DEFAULT_IGNORES = [
    "node_modules", ".git", ".svn", ".hg", ".DS_Store", ".idea", ".vscode",
    "*.suo", "*.ntvs*", "*.njsproj", "*.sln", "*.swp", ".cache", "dist",
    "build", "coverage", ".nyc_output", "*.log", "tmp", "temp", ".coderag",
]
DEFAULT_MAX_FILE_SIZE = 1024 * 1024  # 1 MiB, utils.ts:179


class GitignoreFilter:
    """Ordered gitignore-style matcher (last matching pattern wins)."""

    def __init__(self, patterns: list[str] | None = None):
        self._rules: list[tuple[bool, bool, bool, str]] = []
        # (negated, anchored, dir_only, pattern)
        for raw in patterns or []:
            p = raw.rstrip()
            if not p or p.startswith("#"):
                continue
            neg = p.startswith("!")
            if neg:
                p = p[1:]
            dir_only = p.endswith("/")
            p = p.rstrip("/")
            anchored = p.startswith("/") or "/" in p
            p = p.lstrip("/")
            if p:
                self._rules.append((neg, anchored, dir_only, p))

    @classmethod
    def load(cls, root: str, extra_defaults: bool = True) -> "GitignoreFilter":
        pats = list(DEFAULT_IGNORES) if extra_defaults else []
        gi = os.path.join(root, ".gitignore")
        if os.path.isfile(gi):
            with open(gi, encoding="utf-8", errors="replace") as f:
                pats.extend(f.read().splitlines())
        return cls(pats)

    def _match_one(self, rel: str, is_dir: bool, rule) -> bool:
        _, anchored, dir_only, pat = rule
        if dir_only and not is_dir:
            # a dir-only pattern still ignores files UNDER a matching dir —
            # handled by the caller testing each parent directory
            return False
        if anchored:
            return fnmatch.fnmatch(rel, pat) or rel.startswith(pat + "/")
        # unanchored: match any path segment suffix (like `ignore` npm pkg)
        parts = rel.split("/")
        return any(
            fnmatch.fnmatch("/".join(parts[i:]), pat) or fnmatch.fnmatch(parts[i], pat)
            for i in range(len(parts))
        )

    def ignores(self, rel: str, is_dir: bool = False) -> bool:
        """True if ``rel`` (posix relative path) is ignored; checks the
        path itself and every parent directory."""
        rel = rel.replace(os.sep, "/")
        candidates = [(rel, is_dir)]
        parts = rel.split("/")
        for i in range(1, len(parts)):
            candidates.append(("/".join(parts[:i]), True))
        verdict = False
        for rule in self._rules:
            neg = rule[0]
            # each candidate keeps its REAL is_dir: a dir-only pattern
            # (`build/`) must not match a plain file named `build` —
            # files underneath are covered by the parent-dir candidates
            if any(self._match_one(c, d, rule) for c, d in candidates):
                verdict = not neg
        return verdict


def list_files(root: str, *, max_file_size: int = DEFAULT_MAX_FILE_SIZE,
               use_gitignore: bool = True) -> list[str]:
    """Phase-1 metadata walk: relative paths of text files that pass the
    ignore filter and the size guard (``utils.ts:175-230``)."""
    ig = GitignoreFilter.load(root) if use_gitignore else GitignoreFilter(DEFAULT_IGNORES)
    out: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        rel_dir = os.path.relpath(dirpath, root)
        rel_dir = "" if rel_dir == "." else rel_dir.replace(os.sep, "/")
        dirnames[:] = sorted(
            d for d in dirnames
            if not ig.ignores(f"{rel_dir}/{d}" if rel_dir else d, is_dir=True)
        )
        for name in sorted(filenames):
            rel = f"{rel_dir}/{name}" if rel_dir else name
            if ig.ignores(rel):
                continue
            if not is_text_file(rel):
                continue
            try:
                if os.path.getsize(os.path.join(dirpath, name)) > max_file_size:
                    continue
            except OSError:
                continue
            out.append(rel)
    return out


def scan_directory(root: str, *, repo: str | None = None, commit: str = "workdir",
                   max_file_size: int = DEFAULT_MAX_FILE_SIZE,
                   use_gitignore: bool = True):
    """→ Ray Dataset with the engine's input-hint schema
    ``(repo, path, commit, lang, content)`` for a real directory tree.
    Feed straight into :func:`coderag_ray.index.build.build_index`."""
    import ray.data

    root = os.path.abspath(root)
    repo = repo or os.path.basename(root)
    rels = list_files(root, max_file_size=max_file_size, use_gitignore=use_gitignore)
    if not rels:
        return ray.data.from_arrow(pa.table({
            "repo": pa.array([], type=pa.string()),
            "path": pa.array([], type=pa.string()),
            "commit": pa.array([], type=pa.string()),
            "lang": pa.array([], type=pa.string()),
            "content": pa.array([], type=pa.string()),
        }))
    ds = ray.data.read_binary_files([os.path.join(root, r) for r in rels],
                                    include_paths=True)
    prefix = root.rstrip("/") + "/"

    def decode(t: pa.Table) -> pa.Table:
        repos, paths, commits, langs, contents = [], [], [], [], []
        for raw, full in zip(t["bytes"].to_pylist(), t["path"].to_pylist()):
            try:
                text = raw.decode("utf-8")
            except UnicodeDecodeError:
                continue  # binary content that slipped past the extension guard
            rel = full[len(prefix):] if full.startswith(prefix) else full
            repos.append(repo)
            paths.append(rel)
            commits.append(commit)
            langs.append(detect_language(rel) or "text")
            contents.append(text)
        return pa.table({
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array(contents, type=pa.string()),
        })

    return ds.map_batches(decode, batch_format="pyarrow")
