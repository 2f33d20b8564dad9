#!/bin/bash
# Build ipydataclean_spark/jars/ipydataclean-fastagg.jar from jvm/*.scala
# using the Scala compiler that ships inside the Spark distribution
# (no external toolchain). Re-run after editing jvm/ sources; the jar is
# committed so environments without a compiler (the driver) load it as-is.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
SPARK_JARS="${SPARK_HOME:-/opt/spark}/jars"
OUT="$REPO/ipydataclean_spark/jars/ipydataclean-fastagg.jar"
BUILD="$(mktemp -d)"
trap 'rm -rf "$BUILD"' EXIT

CP="$(ls "$SPARK_JARS"/*.jar | tr '\n' ':')"

java -cp "$CP" scala.tools.nsc.Main \
  -classpath "$CP" \
  -release 17 \
  -d "$BUILD" \
  "$REPO"/jvm/*.scala

jar cf "$OUT" -C "$BUILD" .
echo "built $OUT"
jar tf "$OUT"
