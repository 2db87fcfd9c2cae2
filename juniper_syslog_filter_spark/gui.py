"""GUI entry point — twin of the reference's run_gui.py (Streamlit
front-end that shells out to the CLI and tails its progress,
run_gui.py:26-295).

Two front-ends over the SAME process boundary (subprocess → parse
progress from stdout, the reference's stdout-keying at
run_gui.py:140-165, where "[OK] Phase N" lines drive the status box):

* ``main_term`` — dependency-free terminal dashboard (default).
  Launches the Spark CLI unbuffered with ``JSF_TRACE_PHASES=1``, tails
  its stdout, turns ``[jsf-phase] <label>: <sec>s`` markers into status
  lines with elapsed time, and prints a final summary from the CLI's
  result JSON (exit code + rows routed + output dir), mirroring the
  reference's phase ticker / elapsed clock / completion banner.

      python -m juniper_syslog_filter_spark.gui \
          --pages /tmp/pages --out /tmp/out

* ``main`` — Streamlit page with the same two knobs (keyword,
  severity; run_with_args.py:45-51). Import-gated: streamlit is not in
  this sandbox, so with it absent the terminal dashboard is the GUI.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from dataclasses import dataclass, field
from typing import Iterator, TextIO

try:  # pragma: no cover - sandbox has no streamlit
    import streamlit as st

    HAVE_STREAMLIT = True
except ImportError:
    HAVE_STREAMLIT = False

SEVERITY_CHOICES = ["CRITICAL", "WARNING", "INFO"]  # run_with_args.py:45-51

# The CLI's phase markers (pipeline.py `mark`) and final result line.
PHASE_RE = re.compile(r"\[jsf-phase\] (?P<label>[\w+-]+): (?P<sec>[\d.]+)s")


@dataclass
class Progress:
    """One parsed stdout event: a raw line, optionally a recognized
    phase completion and/or the final result JSON."""

    line: str
    phase: tuple[str, float] | None = None
    result: dict | None = field(default=None)


def launch_run(
    pages: str, out: str, keyword: str | None, severity: str | None
) -> subprocess.Popen:
    """Start the pipeline CLI unbuffered, exactly as the reference GUI
    launches run_with_args (run_gui.py:106-128): ``-u`` + line
    buffering + PYTHONUNBUFFERED, stderr folded into stdout."""
    cmd = [
        sys.executable, "-u", "-m", "juniper_syslog_filter_spark", "run",
        "--pages", pages, "--out", out,
    ]
    if keyword:
        cmd += ["--keyword", keyword]
    if severity:
        cmd += ["--severity", severity]
    env = {**os.environ, "PYTHONUNBUFFERED": "1", "JSF_TRACE_PHASES": "1"}
    return subprocess.Popen(
        cmd,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        encoding="utf-8",
        errors="replace",
        bufsize=1,
        env=env,
    )


def iter_progress(stdout: TextIO) -> Iterator[Progress]:
    """Tail a CLI stdout stream into :class:`Progress` events — the
    stdout-keying contract: phase markers update the status, the last
    JSON object line carries the run summary."""
    for raw in iter(stdout.readline, ""):
        line = raw.rstrip("\n")
        ev = Progress(line=line)
        m = PHASE_RE.search(line)
        if m:
            ev.phase = (m.group("label"), float(m.group("sec")))
        elif line.startswith("{") and line.endswith("}"):
            try:
                obj = json.loads(line)
                if isinstance(obj, dict) and "cmd" in obj:
                    ev.result = obj
            except json.JSONDecodeError:
                pass
        yield ev


def render_term(events: Iterator[Progress], out: TextIO, t0: float | None = None) -> dict | None:
    """Terminal renderer: a line per phase with its duration and the
    wall clock so far; returns the run-summary dict (or None)."""
    t0 = time.time() if t0 is None else t0
    result = None
    for ev in events:
        if ev.phase:
            label, sec = ev.phase
            elapsed = time.time() - t0
            out.write(f"  ✔ {label:<24} {sec:7.2f}s   (elapsed {elapsed:6.1f}s)\n")
            out.flush()
        elif ev.result:
            result = ev.result
    return result


def main_term(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="juniper_syslog_filter_spark.gui")
    p.add_argument("--pages", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--keyword", default="RT_IDP_ATTACK")
    p.add_argument("--severity", default=None, choices=SEVERITY_CHOICES)
    args = p.parse_args(argv)

    sys.stdout.write(
        f"juniper-syslog-filter (Spark) — pages={args.pages} out={args.out} "
        f"keyword={args.keyword!r} severity={args.severity!r}\n"
    )
    t0 = time.time()
    proc = launch_run(args.pages, args.out, args.keyword, args.severity)
    assert proc.stdout is not None
    result = render_term(iter_progress(proc.stdout), sys.stdout, t0=t0)
    code = proc.wait()
    total = time.time() - t0
    if code == 0 and result:
        sys.stdout.write(
            f"✅ done in {int(total // 60)}m{int(total % 60):02d}s — "
            f"{result.get('rows_routed', '?')} rows routed → {result.get('routed', args.out)}\n"
        )
    else:
        sys.stdout.write(f"❌ exit code {code} after {total:.1f}s\n")
    return code


def main() -> None:  # pragma: no cover - needs streamlit runtime
    if not HAVE_STREAMLIT:
        raise SystemExit(
            "streamlit is not installed; the dependency-free GUI is: "
            "python -m juniper_syslog_filter_spark.gui --pages ... --out ..."
        )
    st.title("juniper-syslog-filter (Spark)")
    pages = st.text_input("pages table path", "/tmp/pages")
    out = st.text_input("output dir", "/tmp/out")
    keyword = st.text_input("filter keyword", "RT_IDP_ATTACK")
    severity = st.selectbox("severity", SEVERITY_CHOICES)
    if st.button("Run"):
        proc = launch_run(pages, out, keyword, severity)
        log = st.empty()
        status = st.empty()
        lines: list[str] = []
        t0 = time.time()
        assert proc.stdout is not None
        for ev in iter_progress(proc.stdout):
            lines.append(ev.line)
            log.code("\n".join(lines[-20:]))
            if ev.phase:
                status.info(f"🔄 {ev.phase[0]} done — ⏱️ {time.time() - t0:.0f}s")
        st.success(f"exit code {proc.wait()}")


if __name__ == "__main__":  # pragma: no cover
    if HAVE_STREAMLIT and os.environ.get("JSF_GUI_STREAMLIT"):
        main()
    else:
        sys.exit(main_term())
