"""Build the --py-files artifact for cluster submission.

    python scripts/package_pyfiles.py [out.zip]
    spark-submit --py-files nobletools_spark.zip your_job.py

The zip carries the pure-Python package only — no data, no tests; the
dictionaries ship separately as the persisted terminology parquet
directory (terminology/persist.py) readable from any shared filesystem.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> int:
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(ROOT, "nobletools_spark")
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    rel = os.path.relpath(full, ROOT)
                    zf.write(full, rel)
                    n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "nobletools_spark.zip"
    print(f"{build(out)} files -> {out}")
