"""Shared bench provenance log (VERDICT r3 #8).

Every on-chip measurement — bench.py, scripts/bench_diffusion.py,
scripts/bench_gan.py — appends one line to artifacts/bench_history.jsonl
with timestamp + git SHA + the full result row, so any perf claim in
BASELINE.md can be audited against the raw run that produced it.

Reference analog: the reference has no perf provenance at all (numbers in
its README are hand-pasted); this is a deliberate improvement required by
SURVEY.md §6 ("performance baseline must be measured, not copied").
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _git_sha() -> str | None:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=_REPO_ROOT, timeout=10,
        ).stdout.strip()
        return out or None
    except Exception:
        return None


def rgie_env() -> dict:
    """All RGIE_* env vars active for this process (VERDICT r4 #3: every
    perf lever that can change a number must appear in the row itself)."""
    return {k: v for k, v in sorted(os.environ.items())
            if k.startswith("RGIE_")}


def record(bench: str, row: dict, path: str | None = None) -> None:
    """Append one measurement row under `bench` provenance.

    The row's ``detail`` dict is augmented with ``rgie_env`` (every RGIE_*
    env var) so a bench row is reproducible from its JSONL line alone —
    benches additionally record the exact ``compiler_options`` dict they
    passed to jit. Never raises: a provenance write failing must not fail
    the bench.
    """
    detail = dict(row.get("detail") or {})
    detail.setdefault("rgie_env", rgie_env())
    entry = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
             "git_sha": _git_sha(), "bench": bench, **row, "detail": detail}
    if path is None:
        path = os.path.join(_REPO_ROOT, "artifacts", "bench_history.jsonl")
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps(entry) + "\n")
    except OSError as exc:
        print(f"bench_history: could not append: {exc!r}", file=sys.stderr)
