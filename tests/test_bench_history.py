"""Unit tests for the shared bench provenance recorder (VERDICT r3 #8).

The recorder backs the auditability contract: every BASELINE.md perf row
cites a raw artifacts/bench_history.jsonl entry written by this module.
No jax import — pure host-side I/O.
"""
import json

from rgie_tpu.utils.bench_history import record


def test_record_appends_jsonl_with_provenance(tmp_path):
    path = tmp_path / "hist.jsonl"
    row = {"metric": "m", "value": 1.5, "unit": "u",
           "detail": {"batch": 2}}
    record("bench_test.py", row, path=str(path))
    record("bench_test.py", {"metric": "m2", "value": 2.0}, path=str(path))

    lines = path.read_text().strip().splitlines()
    assert len(lines) == 2
    e0 = json.loads(lines[0])
    assert e0["bench"] == "bench_test.py"
    assert e0["metric"] == "m" and e0["value"] == 1.5
    assert e0["detail"] == {"batch": 2}
    # provenance fields present: timestamp + git SHA (repo is a checkout)
    assert e0["ts"] and "T" in e0["ts"]
    assert e0["git_sha"] is None or len(e0["git_sha"]) >= 7
    e1 = json.loads(lines[1])
    assert e1["metric"] == "m2"


def test_record_never_raises_on_unwritable_path(capsys):
    # a provenance write failing must not fail the bench
    record("bench_test.py", {"metric": "m", "value": 0},
           path="/proc/definitely/not/writable/h.jsonl")
    assert "could not append" in capsys.readouterr().err
