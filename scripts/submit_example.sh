#!/usr/bin/env bash
# Example cluster submission: package the library and run the flagship
# sketch build via spark-submit --py-files (north-star deployment shape).
# On a real cluster swap --master local[32] for yarn/k8s and size executors.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
ZIP=/tmp/grenier_spark.zip
rm -f "$ZIP"
python - <<'PY'
import zipfile, os
with zipfile.ZipFile("/tmp/grenier_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("grenier_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            p = os.path.join(root, f)
            z.write(p, p)
PY
exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.driver.extraJavaOptions=-XX:+UseZGC \
  --py-files "$ZIP" \
  scripts/sketch_job.py "$@"
