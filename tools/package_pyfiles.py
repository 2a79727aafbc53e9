"""Build the --py-files archive for cluster submission (north_rule):

    python tools/package_pyfiles.py dist/ontology_mapper_spark.zip
    spark-submit --py-files dist/ontology_mapper_spark.zip \
        --master <cluster> your_job.py

The zip contains the package only (no tests/bench); Python imports it
directly from the archive on every executor.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pkg = os.path.join(REPO, "ontology_mapper_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/ontology_mapper_spark.zip"
    print(build(out))
