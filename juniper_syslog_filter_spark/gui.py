"""GUI entry point — twin of the reference's run_gui.py (Streamlit
front-end that shells out to the CLI and tails its progress,
run_gui.py:26-295).

Streamlit is not installed in this sandbox, so the module is
import-gated; with the lib present, run:

    streamlit run juniper_syslog_filter_spark/gui.py

Same two knobs as the reference (keyword, severity), same process
boundary (subprocess → parse progress from stdout), with the Spark CLI
(`python -m juniper_syslog_filter_spark run ...`) underneath instead of
the 12-phase pandas loop.
"""

from __future__ import annotations

import subprocess
import sys

try:  # pragma: no cover - sandbox has no streamlit
    import streamlit as st

    HAVE_STREAMLIT = True
except ImportError:
    HAVE_STREAMLIT = False

SEVERITY_CHOICES = ["CRITICAL", "WARNING", "INFO"]  # run_with_args.py:45-51


def launch_run(pages: str, out: str, keyword: str, severity: str) -> subprocess.Popen:
    """Start the pipeline CLI unbuffered, exactly as the reference GUI
    launches run_with_args (run_gui.py:106-128)."""
    return subprocess.Popen(
        [
            sys.executable, "-u", "-m", "juniper_syslog_filter_spark", "run",
            "--pages", pages, "--out", out,
            "--keyword", keyword, "--severity", severity,
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        bufsize=1,
    )


def main() -> None:  # pragma: no cover - needs streamlit runtime
    if not HAVE_STREAMLIT:
        raise SystemExit(
            "streamlit is not installed; use the CLI: "
            "python -m juniper_syslog_filter_spark run ..."
        )
    st.title("juniper-syslog-filter (Spark)")
    pages = st.text_input("pages table path", "/tmp/pages")
    out = st.text_input("output dir", "/tmp/out")
    keyword = st.text_input("filter keyword", "RT_IDP_ATTACK")
    severity = st.selectbox("severity", SEVERITY_CHOICES)
    if st.button("Run"):
        proc = launch_run(pages, out, keyword, severity)
        log = st.empty()
        lines: list[str] = []
        assert proc.stdout is not None
        for line in proc.stdout:
            lines.append(line.rstrip())
            log.code("\n".join(lines[-20:]))
        st.success(f"exit code {proc.wait()}")


if __name__ == "__main__":  # pragma: no cover
    main()
