"""Build the ``--py-files`` archive: the progquery_spark package, zipped at
top level so ``import progquery_spark`` resolves from the archive root.

Usage: python tools/build_zip.py [out_zip]  (default dist/progquery_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(out_zip)), exist_ok=True)
    pkg = os.path.join(REPO, "progquery_spark")
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return out_zip


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "progquery_spark.zip"
    )
    print(build(out))
