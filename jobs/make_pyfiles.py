"""Build the ``--py-files`` zip of the engine package.

Usage: ``python jobs/make_pyfiles.py [dist/kgengine.zip]``
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "cross_sentence_relation_extraction_idepnn_spark"


def build(out_path: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(os.path.join(root, PKG)):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith((".py", ".json")):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/kgengine.zip"
    print(build(out))
