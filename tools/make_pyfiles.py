#!/usr/bin/env python
"""Build the --py-files artifact: a zip of the esda_spark package.

    python tools/make_pyfiles.py [out.zip]

The zip is what a cluster submit ships to every executor:

    spark-submit --py-files esda_spark.zip tools/submit_lisa.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "esda_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "esda_spark.zip"
    print(build(out))
