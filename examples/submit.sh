#!/usr/bin/env bash
# spark-submit launcher: ships pregel_rs_spark to executors via --py-files
# (north rule: "runs via spark-submit --py-files on a multi-executor
# cluster").  Locally this uses local[*]; on a real cluster pass
# --master/--deploy-mode etc. through EXTRA_SPARK_ARGS.
#
#   ./examples/submit.sh examples/webtext_pagerank.py --pages 100000
#   EXTRA_SPARK_ARGS="--master yarn --num-executors 200" \
#       ./examples/submit.sh examples/webtext_pagerank.py --pages 1000000000
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
SCRIPT="$1"; shift

ZIP="$(mktemp -d)/pregel_rs_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" pregel_rs_spark)

exec spark-submit \
    --master "${SPARK_MASTER:-local[*]}" \
    --py-files "$ZIP" \
    ${EXTRA_SPARK_ARGS:-} \
    "$REPO/$SCRIPT" "$@"
