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
    assert e0["detail"]["batch"] == 2
    # provenance fields present: timestamp + git SHA (repo is a checkout)
    assert e0["ts"] and "T" in e0["ts"]
    assert e0["git_sha"] is None or len(e0["git_sha"]) >= 7
    e1 = json.loads(lines[1])
    assert e1["metric"] == "m2"
    # env-lever provenance auto-injected even when the caller omits detail
    assert "rgie_env" in e1["detail"]


def test_record_captures_rgie_env_levers(tmp_path, monkeypatch):
    """VERDICT r4 #3: a bench row must be reproducible from its JSONL line
    alone — every RGIE_* env var active at measurement time is in the row."""
    monkeypatch.setenv("RGIE_SCOPED_VMEM_KIB", "65536")
    monkeypatch.setenv("RGIE_TENCROP_S2D", "1")
    path = tmp_path / "hist.jsonl"
    record("bench_test.py", {"metric": "m", "value": 1.0,
                             "detail": {"compiler_options":
                                        {"xla_tpu_scoped_vmem_limit_kib": "65536"}}},
           path=str(path))
    e = json.loads(path.read_text().strip())
    env = e["detail"]["rgie_env"]
    assert env["RGIE_SCOPED_VMEM_KIB"] == "65536"
    assert env["RGIE_TENCROP_S2D"] == "1"
    # the exact compiler_options dict the bench passed to jit survives
    assert e["detail"]["compiler_options"] == {
        "xla_tpu_scoped_vmem_limit_kib": "65536"}


def test_record_never_raises_on_unwritable_path(capsys):
    # a provenance write failing must not fail the bench
    record("bench_test.py", {"metric": "m", "value": 0},
           path="/proc/definitely/not/writable/h.jsonl")
    assert "could not append" in capsys.readouterr().err
