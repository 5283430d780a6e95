"""bench.py parent orchestrator: merge/retry/skip semantics.

The subprocess isolation exists so one wedged TPU client costs one
stage group, not the run (BENCH_r04 was zeroed by exactly that).
These tests drive main() with run_group_subprocess monkeypatched, so
no JAX client or TPU is involved.
"""

import importlib
import json
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    import bench as b

    importlib.reload(b)
    # fast wall clock: no real waiting
    monkeypatch.setattr(b, "BUDGET_S", 1e6)
    return b


def run_main(bench, capsys, script):
    """script: dict name -> list of (fragment, err) per attempt."""
    calls = {}

    def fake(name, cap_s, env):
        i = calls.get(name, 0)
        calls[name] = i + 1
        seq = script.get(name, [({}, None)])
        frag, err = seq[min(i, len(seq) - 1)]
        return (dict(frag) if frag is not None else None), err

    bench.run_group_subprocess = fake
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out), calls


def test_clean_fragments_merge(bench, capsys):
    script = {name: [({"x_" + name: 1}, None)]
              for name, _, _ in bench.GROUPS}
    script["stream_bw"] = [({"hbm_stream_gb_s": 600.0}, None)]
    script["oneshot"] = [({"value": 100.0, "vs_baseline": 0.9}, None)]
    result, calls = run_main(bench, capsys, script)
    assert result["value"] == 100.0
    assert result["roofline_denominator"] == "measured_stream"
    assert result["hbm_gb_s"] == 600.0
    assert all(n == 1 for n in calls.values())  # no spurious retries
    assert "group_errors" not in result


def test_wedged_group_retries_once_and_rest_survive(bench, capsys):
    script = {name: [({}, None)] for name, _, _ in bench.GROUPS}
    # oneshot: first attempt times out (no fragment), second succeeds
    script["oneshot"] = [(None, "timeout after 150s"),
                         ({"value": 90.0}, None)]
    result, calls = run_main(bench, capsys, script)
    assert calls["oneshot"] == 2
    assert result["value"] == 90.0
    assert "group_errors" not in result


def test_double_failure_keeps_partial_and_records_error(bench, capsys):
    script = {name: [({}, None)] for name, _, _ in bench.GROUPS}
    script["spmm"] = [
        ({"errors": {"spmm": "TPU INTERNAL"}, "spmm_k128_gnnzk_s": 1.0},
         None),
        ({"errors": {"spmm": "TPU INTERNAL"}, "spmm_k128_gnnzk_s": 2.0},
         None),
    ]
    result, calls = run_main(bench, capsys, script)
    assert calls["spmm"] == 2  # internal stage error triggers the retry
    # the LAST attempt's partial fields are kept, the failure recorded
    assert result["spmm_k128_gnnzk_s"] == 2.0
    assert "spmm" in result["group_errors"]
    # other groups unaffected
    assert "stream_bw" in {n for n, _, _ in bench.GROUPS}


def test_stream_probe_failure_falls_back_to_spec(bench, capsys):
    script = {name: [({}, None)] for name, _, _ in bench.GROUPS}
    script["stream_bw"] = [(None, "timeout after 90s"),
                           (None, "timeout after 90s")]
    result, _ = run_main(bench, capsys, script)
    assert result["roofline_denominator"] == "spec"
    assert "stream_bw" in result["group_errors"]


def test_partial_then_timeout_keeps_first_attempts_fields(bench, capsys):
    script = {name: [({}, None)] for name, _, _ in bench.GROUPS}
    # attempt 1 delivers real measurements + an internal error;
    # attempt 2 wedges entirely (no fragment) — attempt 1's fields
    # must survive (the reverse order already did)
    script["spmm"] = [
        ({"errors": {"spmm": "TPU INTERNAL"}, "spmm_k128_gnnzk_s": 1.0},
         None),
        (None, "timeout after 100s"),
    ]
    result, calls = run_main(bench, capsys, script)
    assert calls["spmm"] == 2
    assert result["spmm_k128_gnnzk_s"] == 1.0
    assert "spmm" in result["group_errors"]
