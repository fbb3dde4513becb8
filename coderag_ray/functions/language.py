"""Language / file-type registry (M1–M3).

Mirrors the reference's three layers:

- ``detectLanguage`` extension → display-language map
  (``/root/reference/packages/core/src/utils.ts:14-42``),
- ``isTextFile`` extension allowlist + special basenames
  (``utils.ts:47-95``: dockerfile, makefile, ``.env*`` etc.),
- ``LANGUAGE_REGISTRY`` language ↔ extensions
  (``language-config.ts:28-104``).

The input corpus already carries a ``lang`` column, so these serve as
ingest guards and metadata normalization; all lookups are static dicts
plus vectorized Arrow predicates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# extension → display language — utils.ts:14-42
EXT_LANGUAGE: dict[str, str] = {
    ".ts": "TypeScript", ".tsx": "TypeScript", ".js": "JavaScript",
    ".jsx": "JavaScript", ".py": "Python", ".rs": "Rust", ".go": "Go",
    ".java": "Java", ".c": "C", ".h": "C", ".cpp": "C++", ".hpp": "C++",
    ".cs": "C#", ".rb": "Ruby", ".php": "PHP", ".swift": "Swift",
    ".kt": "Kotlin", ".scala": "Scala", ".sh": "Shell", ".md": "Markdown",
    ".json": "JSON", ".yaml": "YAML", ".yml": "YAML",
}

# text-file extension allowlist — utils.ts:47-95 (abridged to the same spirit)
TEXT_EXTENSIONS: set[str] = set(EXT_LANGUAGE) | {
    ".txt", ".toml", ".xml", ".html", ".css", ".scss", ".sql", ".proto",
    ".graphql", ".vue", ".svelte", ".cfg", ".ini", ".lock",
}
SPECIAL_BASENAMES: set[str] = {"dockerfile", "makefile", "rakefile", "gemfile",
                               "procfile", "license", "readme"}

# language ↔ extensions registry — language-config.ts:28-104
LANGUAGE_REGISTRY: dict[str, list[str]] = {
    "typescript": [".ts", ".tsx"], "javascript": [".js", ".jsx"],
    "python": [".py"], "rust": [".rs"], "go": [".go"], "java": [".java"],
    "c": [".c", ".h"], "cpp": [".cpp", ".hpp"], "csharp": [".cs"],
    "ruby": [".rb"], "php": [".php"], "swift": [".swift"],
    "kotlin": [".kt"], "shell": [".sh"], "markdown": [".md"],
}


def _ext(path: str) -> str:
    base = path.rsplit("/", 1)[-1]
    i = base.rfind(".")
    return base[i:].lower() if i >= 0 else ""


def detect_language(path: str) -> str | None:
    return EXT_LANGUAGE.get(_ext(path))


def is_text_file(path: str) -> bool:
    base = path.rsplit("/", 1)[-1].lower()
    if base in SPECIAL_BASENAMES or base.startswith(".env"):
        return True
    return _ext(path) in TEXT_EXTENSIONS


def language_for_extension(ext: str) -> str | None:
    ext = ext if ext.startswith(".") else f".{ext}"
    for lang, exts in LANGUAGE_REGISTRY.items():
        if ext.lower() in exts:
            return lang
    return None


def batch_is_text_file(paths: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized text-file predicate for an ingest guard stage."""
    if isinstance(paths, pa.ChunkedArray):
        paths = paths.combine_chunks()
    return np.array([is_text_file(p) for p in paths.to_pylist()], dtype=bool)


def make_text_file_guard():
    """map_batches filter keeping only text files (M1 ingest guard)."""

    def guard(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(batch_is_text_file(t["path"])))

    return guard
