#!/usr/bin/env bash
# Package the engine as a --py-files zip and run the KG pipeline via
# spark-submit — the north rule's deployment form. On a real cluster,
# replace --master with your cluster manager URL; everything else is
# identical.
#
#   tools/submit.sh --workdir /tmp/kg_out [--input transcripts.parquet] \
#                   [pipeline args...]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/ramp_shapes_spark.zip"
MASTER="${SPARK_MASTER:-local[8]}"

# library zip: importable package root at the zip root (--py-files
# prepends it to every executor's and the driver's sys.path)
(cd "$REPO" && zip -qr "$ZIP" ramp_shapes_spark -x '*__pycache__*')

exec spark-submit \
    --master "$MASTER" \
    --py-files "$ZIP" \
    "$REPO/ramp_shapes_spark/pipeline/job.py" \
    "$@"
