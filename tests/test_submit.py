"""spark-submit --py-files deployment smoke test (north-rule run shape):
package the library into a zip, run the job from OUTSIDE the repo so only
the zip provides the package, and check the triples written."""

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles(tmp_path):
    zip_path = str(tmp_path / "rex.zip")
    subprocess.run([sys.executable, os.path.join(ROOT, "scripts/package_pyfiles.py"),
                    zip_path], check=True, cwd=ROOT)
    job = str(tmp_path / "job.py")
    shutil.copy(os.path.join(ROOT, "scripts/submit_extract.py"), job)
    out_dir = str(tmp_path / "out")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    res = subprocess.run(
        ["spark-submit", "--master", "local[4]", "--py-files", zip_path,
         job, "--docs", "500", "--out", out_dir],
        check=True, cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300)
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["triples_written"] > 500  # ~2.6 triples/doc
