"""The spark-submit --py-files deployment path (north rule: "runs via
spark-submit --py-files on multi-executor clusters").

Packages crawlspark into a zip, then spark-submits scripts/submit_job.py
from a NEUTRAL working directory with the repo scrubbed from PYTHONPATH —
the engine must reach the job through the --py-files archive exactly as it
would reach cluster executors. Asserts the crawl ran and that the imported
module really resolved from the zip."""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_zip(tmp: str) -> str:
    zpath = os.path.join(tmp, "crawlspark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "crawlspark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_with_pyfiles_zip():
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark
        spark_submit = os.path.join(os.path.dirname(pyspark.__file__),
                                    "bin", "spark-submit")
        assert os.path.exists(spark_submit), "no spark-submit available"
    tmp = tempfile.mkdtemp(prefix="submit_test_",
                           dir="/dev/shm" if os.path.isdir("/dev/shm")
                           else None)
    try:
        zpath = _make_zip(tmp)
        env = {k: v for k, v in os.environ.items()
               if k not in ("PYTHONPATH",)}
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        proc = subprocess.run(
            [spark_submit, "--master", "local[8]",
             "--conf", "spark.driver.memory=6g",
             "--py-files", zpath,
             os.path.join(REPO, "scripts", "submit_job.py")],
            cwd=tmp, env=env, capture_output=True, text=True, timeout=600)
        lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("SUBMIT_RESULT ")]
        assert proc.returncode == 0 and lines, proc.stderr[-3000:]
        result = json.loads(lines[-1][len("SUBMIT_RESULT "):])
        assert result["ok"] and result["scheduled"] > 0
        # the engine must have been imported out of the zip, not the repo
        assert "crawlspark.zip" in result["engine_module"], result
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
