"""Build the spark-submit artifacts (north_rule "ships via spark-submit --py-files").

Produces:
  dist/pdfsearch_spark.zip  -- the package, zipimport-safe (data files are read
                               via importlib.resources, see analyzer._load_tables_npz)
  dist/cli_entry.py         -- thin driver script for spark-submit

Usage:
  python scripts/make_pyfiles.py
  spark-submit --master <cluster> --py-files dist/pdfsearch_spark.zip \
      dist/cli_entry.py build_index -d <pages> -o <index> --master submit
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "pdfsearch_spark")
DIST = os.path.join(ROOT, "dist")

ENTRY = '''\
"""spark-submit driver for pdfsearch_spark (shipped next to the --py-files zip)."""
import sys

from pdfsearch_spark.cli import main

sys.exit(main())
'''


def build() -> str:
    os.makedirs(DIST, exist_ok=True)
    zpath = os.path.join(DIST, "pdfsearch_spark.zip")
    # fixed mtime → byte-identical zip for identical package contents, so
    # rebuilding in an unrelated commit can't churn binary history
    fixed_date = (2026, 1, 1, 0, 0, 0)
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(PKG):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                info = zipfile.ZipInfo(rel, date_time=fixed_date)
                info.compress_type = zipfile.ZIP_DEFLATED
                info.external_attr = 0o644 << 16
                with open(full, "rb") as src:
                    z.writestr(info, src.read())
    with open(os.path.join(DIST, "cli_entry.py"), "w") as f:
        f.write(ENTRY)
    return zpath


if __name__ == "__main__":
    print(build())
