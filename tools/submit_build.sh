#!/usr/bin/env bash
# Launch the index build the way a real cluster run does (north_rule:
# spark-submit --py-files). On the sandbox this still runs local-mode, but
# the packaging path is identical to a cluster submit:
#
#   tools/submit_build.sh <corpus_parquet> <out_index_dir> [master]
#
set -euo pipefail
CORPUS="${1:?corpus parquet path}"
OUT="${2:?output index dir}"
MASTER="${3:-local[32]}"

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=$(python - <<PY
import sys; sys.path.insert(0, "$REPO")
from goldenretriever_spark.deploy import package_zip
print(package_zip())
PY
)

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions=64 \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC \
  "$REPO/tools/submit_build_main.py" "$CORPUS" "$OUT"
