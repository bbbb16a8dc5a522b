"""Prove the north-rule packaging claim: the engine runs under
``spark-submit --py-files s2spark.zip`` from OUTSIDE the repo —
no repo-layout imports, no filesystem dependencies in the deployable
package (the driver-contract goldens live in tests/, not the
package)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())

from rust_s2_spark.functions import (
    s2_biased, s2_cell_from_latlng, s2_parent, s2_cell_to_token,
)
from rust_s2_spark.functions.sql_registry import register_sql_functions
from rust_s2_spark.geometry import Cap
from rust_s2_spark.operators.covering_join import region_filter

df = (
    spark.createDataFrame(
        [(0, 40.71, -74.00), (1, 40.80, -73.95), (2, -33.87, 151.21)],
        "id long, lat double, lng double",
    )
    .withColumn("cell_id", s2_cell_from_latlng("lat", "lng"))
    .withColumn("cell_id_biased", s2_biased("cell_id"))
)

hits = region_filter(df, Cap.from_latlng_degrees(40.7, -74.0, 1.0))
n = hits.count()
tok = df.select(s2_cell_to_token(s2_parent("cell_id", 7)).alias("t")).collect()

register_sql_functions(spark)
df.createOrReplaceTempView("t")
m = spark.sql("SELECT count(DISTINCT s2_token(s2_parent(cell_id, 5))) AS c FROM t").collect()[0].c

print(f"PYFILES_OK n={n} toks={len(tok)} cells5={m}")
spark.stop()
"""


def test_spark_submit_pyfiles_runs_engine():
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        import pytest

        pytest.skip("spark-submit not available")
    tmp = tempfile.mkdtemp(prefix="s2pyfiles_")
    try:
        zpath = os.path.join(tmp, "s2spark.zip")
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
            pkg = os.path.join(REPO, "rust_s2_spark")
            for root, _dirs, files in os.walk(pkg):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, REPO))
        job = os.path.join(tmp, "job.py")
        with open(job, "w") as f:
            f.write(JOB)
        env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("PYTHONPATH",)  # nothing may leak the repo path
        }
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        out = subprocess.run(
            [
                spark_submit,
                "--master",
                "local[2]",
                "--py-files",
                zpath,
                job,
            ],
            cwd=tmp,  # NOT the repo: imports must resolve from the zip
            env=env,
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert "PYFILES_OK" in out.stdout, (out.stdout[-2000:], out.stderr[-2000:])
        line = [ln for ln in out.stdout.splitlines() if "PYFILES_OK" in ln][0]
        assert "n=2" in line and "toks=3" in line, line
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
