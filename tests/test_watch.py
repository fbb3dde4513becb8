"""Live incremental indexing (ST7) — debounce + refresh semantics of
the reference watcher (`indexer.ts:708-766,840-860`) over the polling
implementation, with an injectable clock (no sleeps)."""

import os

from coderag_ray.config import IndexConfig
from coderag_ray.query.search import search
from coderag_ray.sources.watch import DirectoryWatcher


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def _write(root, rel, text):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write(text)


def test_watcher_debounce_and_incremental_refresh(ray_session, tmp_path):
    root = str(tmp_path / "proj")
    idx = str(tmp_path / "idx")
    _write(root, "src/auth.py", "def validate_credentials(user):\n    return user\n")
    _write(root, "src/db.js", "function connectDatabase() {\n  return 1;\n}\n")
    _write(root, "node_modules/x.js", "function ignoredJunk() {}\n")  # default-ignored

    clock = FakeClock()
    w = DirectoryWatcher(root, idx, IndexConfig(num_partitions=2),
                         debounce_s=0.5, clock=clock)
    w._refresh()  # initial build (the reference indexes before watching)
    assert w.refreshes == 1
    assert search(idx, "validate_credentials", 5, with_doc_columns=False).num_rows > 0

    # burst of writes within the debounce window → NO refresh yet
    _write(root, "src/auth.py", "def validate_credentials(u):\n    return u\n"
                                "def freshlyWatchedSymbol():\n    return 7\n")
    assert w.poll() == []
    clock.t += 0.3
    _write(root, "src/auth.py", "def validate_credentials(u):\n    return u\n"
                                "def freshlyWatchedSymbol():\n    return 8\n")
    assert w.poll() == []          # timer reset by the second write
    clock.t += 0.3
    assert w.poll() == []          # still only 0.3s since last change
    clock.t += 0.3                 # now 0.6s settled → one refresh
    refreshed = w.poll()
    assert refreshed == ["src/auth.py"]
    assert w.refreshes == 2
    assert search(idx, "freshlyWatchedSymbol", 5, with_doc_columns=False).num_rows > 0

    # idle polls do nothing
    clock.t += 5
    assert w.poll() == [] and w.refreshes == 2

    # deletion is detected and the doc leaves the index
    os.remove(os.path.join(root, "src/db.js"))
    w.poll()
    clock.t += 1
    assert w.poll() == ["src/db.js"]
    assert w.refreshes == 3
    assert search(idx, "connectDatabase", 5, with_doc_columns=False).num_rows == 0

    # churn in an ignored path never schedules work
    _write(root, "node_modules/x.js", "function ignoredJunkChanged() {}\n")
    w.poll()
    clock.t += 1
    assert w.poll() == [] and w.refreshes == 3


def test_watcher_churner_does_not_starve_other_files(ray_session, tmp_path):
    root = str(tmp_path / "proj")
    idx = str(tmp_path / "idx")
    _write(root, "a.py", "def stableFunctionOne():\n    return 1\n")
    _write(root, "churn.py", "def churny():\n    return 0\n")
    clock = FakeClock()
    w = DirectoryWatcher(root, idx, IndexConfig(num_partitions=2),
                         debounce_s=0.5, clock=clock)
    w._refresh()
    # edit a.py once; churn.py keeps changing every 0.3 s (< debounce)
    _write(root, "a.py", "def stableFunctionOne():\n    return 1\n"
                         "def starvedSymbol():\n    return 2\n")
    _write(root, "churn.py", "def churny():\n    return 1\n")
    w.poll()
    for i in range(3):
        clock.t += 0.3
        _write(root, "churn.py", f"def churny():\n    return {i + 2}\n")
        refreshed = w.poll()
        if i == 0:
            assert refreshed == []  # a.py not settled yet (0.3 s)
        else:
            # a.py settled at 0.6 s and refreshes despite churn.py churning
            assert "a.py" in refreshed and "churn.py" not in refreshed
            break
    assert search(idx, "starvedSymbol", 5, with_doc_columns=False).num_rows > 0


def test_watcher_failed_refresh_keeps_pending(ray_session, tmp_path):
    root = str(tmp_path / "proj")
    idx = str(tmp_path / "idx")
    _write(root, "a.py", "def firstSymbol():\n    return 1\n")
    clock = FakeClock()
    w = DirectoryWatcher(root, idx, IndexConfig(num_partitions=2),
                         debounce_s=0.5, clock=clock)
    w._refresh()
    _write(root, "a.py", "def firstSymbol():\n    return 1\n"
                         "def retriedSymbol():\n    return 2\n")
    w.poll()
    clock.t += 1
    boom = {"n": 0}
    orig = w._refresh

    def failing():
        boom["n"] += 1
        raise RuntimeError("transient")

    w._refresh = failing
    assert w.poll() == []          # failed → change stays pending
    assert boom["n"] == 1
    assert w._consecutive_failures == 1
    w._refresh = orig
    assert w.poll() == []          # inside the 2 s failure backoff
    clock.t += 2.0                 # past the backoff → retried
    assert w.poll() == ["a.py"]
    assert w._consecutive_failures == 0
    assert search(idx, "retriedSymbol", 5, with_doc_columns=False).num_rows > 0
