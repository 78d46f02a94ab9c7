"""Build the ``--py-files`` archive for spark-submit deployment.

    python3 tools/make_pyfiles_zip.py [dist/skewer_spark.zip]

Zips the ``skewer_spark`` package (source only) with deterministic
timestamps so repeated builds are byte-identical.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(dest: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    pkg = os.path.join(REPO, "skewer_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                arc = os.path.relpath(full, REPO)
                with open(full, "rb") as fh:
                    data = fh.read()
                info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_DEFLATED
                z.writestr(info, data)
    return dest


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "skewer_spark.zip"
    )
    print(build_zip(out))
