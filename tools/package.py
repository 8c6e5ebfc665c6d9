"""Package the engine for spark-submit --py-files (north_rule shipping path).

Builds dist/solarpos_spark.zip and prints the submit command. The job entry
point jobs/token_pipeline_job.py runs the flagship streaming pipeline.
Usage: python tools/package.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "solarpos_spark.zip")
    pkg = os.path.join(REPO, "solarpos_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    path = build_zip()
    print(f"built {path}")
    print(
        "submit with:\n"
        f"  spark-submit --py-files {path} "
        "jobs/token_pipeline_job.py "
        "--input /data/tokens --output /data/out --checkpoint /data/ckpt"
    )
