#!/usr/bin/env bash
# North-rule launch path: spark-submit --py-files on a (multi-executor)
# cluster. On a real cluster replace --master local[N] with yarn/k8s;
# the packaged zip is all the engine needs on executors.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
rm -f /tmp/nx_neptune_spark.zip
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('/tmp/nx_neptune_spark.zip', 'w') as z:
    for root, _, files in os.walk('nx_neptune_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
"
exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --py-files /tmp/nx_neptune_spark.zip \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE:-32}" \
  "${1:-bench.py}"
