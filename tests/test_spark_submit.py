"""North-rule deployment shape: the job must run via spark-submit
--py-files (BASELINE.json north_rule).  This drives the real binary with
the engine shipped ONLY as a zip — PYTHONPATH is stripped so any import
that leaks to the source tree fails."""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit binary")
def test_spark_submit_pyfiles_pipeline(tmp_path):
    subprocess.run(["sh", os.path.join(REPO, "tools", "build_pyfiles.sh")],
                   check=True, capture_output=True)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    # run from an empty cwd so `liblognorm_spark/` can't resolve implicitly
    shutil.copy(os.path.join(REPO, "examples", "submit_job.py"), tmp_path / "job.py")
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", os.path.join(REPO, "dist", "liblognorm_spark.zip"),
         str(tmp_path / "job.py"), "4000"],
        capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    counts = json.loads(line)
    assert sum(counts.values()) == 4000
    assert set(counts) == {"fallback", "ftp", "fw", "ident", "json", "kv", "net", "ssh"}
