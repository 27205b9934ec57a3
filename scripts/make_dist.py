#!/usr/bin/env python
"""Build ``dist/engine.zip`` — the ``spark-submit --py-files`` artifact.

The north rule launches the engine as
``spark-submit --py-files dist/engine.zip <job>.py`` on a multi-executor
cluster (BASELINE.md protocol lines 33-34). This packager produces that
artifact deterministically:

- only ``graph_data_science_spark/**/*.py`` goes in (no tests, no scripts,
  no caches) — the zip is importable via zipimport, which is exactly the
  mechanism spark-submit uses for ``--py-files`` on the driver and every
  executor's PYTHONPATH;
- entries are sorted and timestamps zeroed (1980-01-01, the zip epoch), so
  the same tree always produces byte-identical archives — rebuilds don't
  churn checksums and a cluster's artifact cache stays warm.

Usage: python scripts/make_dist.py [dest.zip]   (default: dist/engine.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "graph_data_science_spark"


def build(dest: str | None = None) -> str:
    """Write the deterministic engine zip; returns the path written."""
    if dest is None:
        dest = os.path.join(REPO, "dist", "engine.zip")
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)

    pkg_root = os.path.join(REPO, PACKAGE)
    entries: list[tuple[str, str]] = []  # (arcname, abspath)
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            ap = os.path.join(dirpath, fn)
            arc = os.path.relpath(ap, REPO)
            entries.append((arc, ap))

    # ZIP_STORED keeps zipimport cheap (no per-import inflate) and the
    # archive is pure text anyway; fixed date_time => byte-determinism
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_STORED) as zf:
        for arc, ap in entries:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(ap, "rb") as fh:
                zf.writestr(info, fh.read())
    return dest


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)
