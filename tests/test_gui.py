"""E2 GUI smoke tests — the dependency-free terminal dashboard's
subprocess → stdout-keying loop (reference run_gui.py:140-165), driven
by a scripted child process so no Spark JVM spins up."""

from __future__ import annotations

import io
import subprocess
import sys

from juniper_syslog_filter_spark.gui import Progress, iter_progress, render_term

SCRIPT = r"""
import sys
print("26/08/18 WARN noise line")
print("[jsf-phase] plan-build: 1.23s")
print("[jsf-phase] fanout-write: 4.56s")
print('{"cmd": "run", "rows_routed": 42, "routed": "/tmp/out/routed", "sec": 6.0}')
"""


def _fake_cli() -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-u", "-c", SCRIPT],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, bufsize=1,
    )


def test_iter_progress_keys_phases_and_result():
    proc = _fake_cli()
    events = list(iter_progress(proc.stdout))
    assert proc.wait() == 0
    phases = [e.phase for e in events if e.phase]
    assert phases == [("plan-build", 1.23), ("fanout-write", 4.56)]
    results = [e.result for e in events if e.result]
    assert results == [
        {"cmd": "run", "rows_routed": 42, "routed": "/tmp/out/routed", "sec": 6.0}
    ]
    # noise lines pass through untouched, keyed as neither
    noise = [e for e in events if e.phase is None and e.result is None]
    assert any("WARN noise" in e.line for e in noise)


def test_render_term_prints_phases_and_returns_summary():
    proc = _fake_cli()
    buf = io.StringIO()
    result = render_term(iter_progress(proc.stdout), buf)
    assert proc.wait() == 0
    assert result["rows_routed"] == 42
    text = buf.getvalue()
    assert "plan-build" in text and "1.23s" in text
    assert "fanout-write" in text and "elapsed" in text


def test_malformed_json_line_is_not_a_result():
    events = list(
        iter_progress(io.StringIO('{"cmd": broken}\n{"no_cmd": 1}\nplain\n'))
    )
    assert all(e.result is None for e in events)
    assert [e.line for e in events] == ['{"cmd": broken}', '{"no_cmd": 1}', "plain"]
    assert isinstance(events[0], Progress)
