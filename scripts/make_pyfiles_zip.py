"""Package the engine for spark-submit --py-files.

    python scripts/make_pyfiles_zip.py [out.zip]
"""

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "text_indexing_and_retrieval_system_spark"


def build(out: str) -> str:
    with zipfile.ZipFile(out, "w") as zf:
        for dirpath, _, files in os.walk(os.path.join(ROOT, PKG)):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "tirs.zip")
    print(build(out))
