"""Package relation_extraction_spark into a --py-files zip for spark-submit.

Usage: python scripts/package_pyfiles.py [out.zip]

The north-rule deployment path is `spark-submit --py-files rex.zip job.py`
on a multi-executor cluster: the zip ships the package to every executor's
PYTHONPATH, so the Arrow kernels (decode/rewrite/scorer) import on workers
without any cluster-side install. scripts/submit_extract.py is the matching
job entry; tests/test_submit.py smoke-runs the pair via spark-submit from a
directory OUTSIDE the repo to prove the zip is self-contained.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "relation_extraction_spark"


def build(out_path: str) -> str:
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(os.path.join(ROOT, PKG)):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                zf.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rex_pyfiles.zip"
    print(build(out))
