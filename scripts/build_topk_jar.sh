#!/usr/bin/env bash
# Build jvm/sivbp-topk.jar (the Scala bounded-heap top-k Aggregator) against
# the Spark jars bundled with the installed pyspark, using a scala-compiler
# jar found in the local coursier/ivy cache. No network access required.
set -euo pipefail

cd "$(dirname "$0")/.."

SPARK_JARS_DIR=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")

find_cached() { # newest matching jar in the usual local caches
  { find ~/.cache/coursier ~/.ivy2 -name "$1" 2>/dev/null || true; } | sort -V | tail -1
}

SCALA_COMPILER=$(find_cached 'scala-compiler-2.13*.jar')
SCALA_REFLECT=$(find_cached 'scala-reflect-2.13*.jar')
if [[ -z "$SCALA_COMPILER" || -z "$SCALA_REFLECT" ]]; then
  echo "scala-compiler/scala-reflect 2.13 jars not found in local caches" >&2
  exit 1
fi
SCALA_LIBRARY=$(ls "$SPARK_JARS_DIR"/scala-library-2.13*.jar)

CLASSPATH=$(ls "$SPARK_JARS_DIR"/*.jar | tr '\n' ':')
OUT=jvm/classes
rm -rf "$OUT" && mkdir -p "$OUT"

java -cp "$SCALA_COMPILER:$SCALA_REFLECT:$SCALA_LIBRARY" scala.tools.nsc.Main \
  -classpath "$CLASSPATH" -d "$OUT" jvm/src/*.scala

jar cf jvm/sivbp-topk.jar -C "$OUT" .
rm -rf "$OUT"
echo "built jvm/sivbp-topk.jar"
