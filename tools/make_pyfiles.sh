#!/bin/sh
# Package the engine for spark-submit --py-files (north_rule ships the
# suite as spark-submit jobs). Produces dist/search_suite_spark.zip.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/search_suite_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/search_suite_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("search_suite_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote dist/search_suite_spark.zip")
EOF
cat <<'EOF'
Usage on a cluster:
  spark-submit --py-files dist/search_suite_spark.zip \
    --conf spark.sql.adaptive.enabled=true \
    jobs/build_index_job.py --pages <iceberg-table> --seg-dir <out>
EOF
