#!/usr/bin/env bash
# North-rule scaling evidence, run LITERALLY as the rule words it: the
# same CQF build job submitted via spark-submit to a multi-executor
# cluster at two cluster sizes (N and 4N executor JVMs). Spark's
# local-cluster master launches real separate executor processes (own
# heap/GC/JIT, partials crossing JVMs through netty shuffle) — the
# closest thing to a standalone cluster a single sandbox host can hold.
#
# Usage: tools/scaling_submit.sh [N] [docs]
#   N     lo executor count (hi = 4N), default 1
#   docs  generator doc count, default 10000000 (~1.35B tokens: large
#         enough that per-level stage constants stay <5% — see
#         BASELINE.md "linear-region input choice")
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-1}"
DOCS="${2:-10000000}"
sbt -batch package
exec env \
  SPARK_GRAFT_SCALE_MODE=executors \
  SPARK_GRAFT_SCALE_LO="$N" \
  SPARK_GRAFT_SCALE_HI="$((4 * N))" \
  SPARK_GRAFT_EXEC_CORES="${SPARK_GRAFT_EXEC_CORES:-2}" \
  SPARK_GRAFT_EXEC_MEM_MB="${SPARK_GRAFT_EXEC_MEM_MB:-8192}" \
  SPARK_GRAFT_BENCH_DOCS="$DOCS" \
  SPARK_GRAFT_SCALE_REPS="${SPARK_GRAFT_SCALE_REPS:-3}" \
  /opt/spark/bin/spark-submit \
    --master "local[4]" \
    --driver-memory "${SPARK_GRAFT_DRIVER_MEM:-16g}" \
    --conf "spark.executor.memory=${SPARK_GRAFT_EXEC_MEM_MB:-8192}m" \
    --class graft.ScalingBench \
    target/scala-2.13/cqfrsspark_2.13-0.1.0.jar
# Notes on the local-cluster memory model (learned the hard way):
#  - the third field of local-cluster[n,cores,memMB] is only the WORKER's
#    capacity; the executor JVM heap comes from spark.executor.memory
#    (default 1g). Without the --conf above, every recorded run's
#    executors were 1 GB JVMs — fine at 2 cores/executor (the recorded
#    r4-r6 protocol), but 8 concurrent tasks per 1 GB executor OOMs the
#    4B-token build (exit code 52). Cores default is therefore 2.
