#!/usr/bin/env bash
# Run the benchmark via spark-submit --py-files (the cluster-shaped launch
# path per BASELINE.json): package the engine as a zip, submit bench.py.
# Usage: scripts/submit_bench.sh [--scaling] [extra spark-submit confs...]
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/datavec_spark_pkg.zip
rm -f "$ZIP"
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("/tmp/datavec_spark_pkg.zip", "w") as z:
    for root, _, files in os.walk("datavec_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
    z.write("__spark_entry__.py", "__spark_entry__.py")
EOF

MASTER="${SPARK_GRAFT_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
exec spark-submit \
  --master "$MASTER" \
  --driver-memory "${SPARK_GRAFT_DRIVER_MEM:-48g}" \
  --py-files "$ZIP" \
  bench.py "$@"
