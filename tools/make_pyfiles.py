"""Package tokenkit_spark for ``spark-submit --py-files``.

Produces dist/tokenkit_spark.zip containing the package tree (no tests,
no caches). Usage:

    python tools/make_pyfiles.py
    spark-submit --py-files dist/tokenkit_spark.zip tools/submit_index_build.py ...
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "tokenkit_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(ROOT, "tokenkit_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    print(make_zip())
