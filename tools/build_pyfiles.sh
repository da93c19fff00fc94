#!/bin/sh
# Package the engine for cluster submission:
#   tools/build_pyfiles.sh && \
#   spark-submit --py-files dist/liblognorm_spark.zip \
#     --conf spark.sql.execution.arrow.pyspark.enabled=true \
#     your_job.py
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/liblognorm_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/liblognorm_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("liblognorm_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/liblognorm_spark.zip")
EOF
