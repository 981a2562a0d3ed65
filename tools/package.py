#!/usr/bin/env python
"""Build the --py-files artifact for cluster submission.

    python tools/package.py [out.zip]
    spark-submit --py-files osm_poi_cloud_spark.zip \
        -m osm_poi_cloud_spark.app --pages ... --out ... --stage all

Plain stdlib zip of the package's .py files — no build backend needed
on an airgapped edge node. Deterministic output (fixed timestamps,
sorted entries) so re-packaging an unchanged tree is byte-identical.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "osm_poi_cloud_spark"


def build(out_path: str) -> int:
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in sorted(os.walk(os.path.join(REPO, PKG))):
            dirs.sort()
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                arc = os.path.relpath(full, REPO)
                info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_DEFLATED
                with open(full, "rb") as f:
                    zf.writestr(info, f.read())
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, f"{PKG}.zip")
    n = build(out)
    print(f"wrote {out} ({n} files)")
