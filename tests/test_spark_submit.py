"""North_rule submission path: the engine must run via
``spark-submit --py-files <zip>`` on a cluster. This test executes that
path literally — builds the archive with tools/package_pyfiles.py, then
spark-submits a job that imports the package ONLY from the zip (cwd is
elsewhere, repo root stripped from PYTHONPATH) and runs the mapping
pipeline end-to-end."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """\
import json, sys
from pyspark.sql import SparkSession

# the package must come from the --py-files zip, not a repo checkout
import ontology_mapper_spark as oms
assert ".zip" in (oms.__file__ or ""), f"loaded from {oms.__file__}"

from ontology_mapper_spark.sources.ontology import fixture_onto_terms

spark = (
    SparkSession.builder.appName("submit-e2e")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
df = oms.map_terms(
    spark,
    ["asthma", "mojito"],
    fixture_onto_terms(spark),
    oms.MappingConfig(incl_unmapped=True),
)
rows = [r.asDict() for r in df.collect()]
with open(sys.argv[1], "w") as f:
    json.dump(rows, f, default=str)
spark.stop()
"""


@pytest.mark.spark
def test_spark_submit_py_files_end_to_end(tmp_path):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(os.path.dirname(os.__file__)),
        "site-packages", "pyspark", "bin", "spark-submit",
    )
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not on PATH")

    zip_path = str(tmp_path / "oms.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package_pyfiles.py"),
         zip_path],
        check=True, capture_output=True,
    )
    job = tmp_path / "job.py"
    job.write_text(JOB)
    out_json = str(tmp_path / "out.json")

    env = dict(os.environ)
    # strip any repo-root leakage so the import can only resolve via the zip
    env["PYTHONPATH"] = ""
    env.pop("SPARK_HOME", None)
    proc = subprocess.run(
        [spark_submit, "--master", "local[2]", "--py-files", zip_path,
         str(job), out_json],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    rows = json.load(open(out_json))
    by_term = {}
    for r in rows:
        by_term.setdefault(r["source_term"], []).append(r)
    assert any(
        m["mapping_score"] == 1.0 and m["mapped_term_curie"] == "EFO:0000270"
        for m in by_term["asthma"]
    )
    assert "unmapped" in str(by_term["mojito"][0]["tags"])
