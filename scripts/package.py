"""Build the --py-files artifact: dist/jsf_spark.zip containing the
``juniper_syslog_filter_spark`` package (north rule: "packaged for
spark-submit --py-files").

Usage: python scripts/package.py  →  dist/jsf_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "juniper_syslog_filter_spark"


def build(out_path: str | None = None) -> str:
    out_dir = os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out_path = out_path or os.path.join(out_dir, "jsf_spark.zip")
    pkg_dir = os.path.join(ROOT, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                z.write(full, rel)
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
