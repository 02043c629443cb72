#!/usr/bin/env bash
# Launch the flagship pipeline via spark-submit --py-files on a
# multi-executor master (default: local-cluster with 2 executors x 4
# cores — the sandbox stand-in for a real cluster; pass any master).
#
#   tools/submit.sh <input_dir> <output_dir> <checkpoint_dir> [master]
set -euo pipefail
cd "$(dirname "$0")/.."
INPUT=${1:?input dir}
OUTPUT=${2:?output dir}
CKPT=${3:?checkpoint dir}
MASTER=${4:-local-cluster[2,4,4096]}

tools/package.sh

SPARK_SUBMIT=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'bin', 'spark-submit'))")

"$SPARK_SUBMIT" \
  --master "$MASTER" \
  --conf spark.executor.memory=4g \
  --conf spark.executor.extraJavaOptions="-XX:+UseParallelGC -XX:ParallelGCThreads=8" \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.files.maxPartitionBytes=33554432 \
  --conf spark.ui.enabled=false \
  --py-files dist/kaskada_spark.zip \
  tools/submit_pipeline.py \
  --input "$INPUT" --output "$OUTPUT" --checkpoint "$CKPT" \
  --metrics "$OUTPUT/_metrics/progress.jsonl"
