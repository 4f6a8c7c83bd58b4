#!/usr/bin/env bash
# Run a graft main class via plain `java -cp` — NO sbt involvement, so a
# long-running bench/verify/datagen never holds the sbt build lock (the
# r10 post-mortem: the driver's correctness artifact landed empty because
# the 17-minute bench held the sbt lock at round close).
#
# Usage: tools/run_main.sh <mainClass> [args...]
#   e.g. tools/run_main.sh graft.Bench
#        tools/run_main.sh graft.tools.GenSf /tmp/gensf1 10
#        tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
#
# Requires `sbt compile` to have produced target/scala-2.13/classes.
# Env passthrough: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_BENCH_OUT,
# SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$REPO/target/scala-2.13/classes"
[ -d "$CLASSES" ] || { echo "run 'sbt compile' first ($CLASSES missing)" >&2; exit 1; }
# Staleness guard: with uncompiled source changes this script would
# silently run OLD bytecode — and a verify run would then emit a
# correctness artifact that doesn't correspond to HEAD. Compare the
# newest .scala mtime under src/main against the newest .class mtime;
# refuse to run stale classes (set GRAFT_ALLOW_STALE=1 to override,
# e.g. to rerun a long bench while editing unrelated sources).
NEWEST_SRC="$(find "$REPO/src/main" -name '*.scala' -printf '%T@\n' 2>/dev/null | sort -n | tail -1)"
NEWEST_CLS="$(find "$CLASSES" -name '*.class' -printf '%T@\n' 2>/dev/null | sort -n | tail -1)"
if [ -n "${NEWEST_SRC:-}" ] && [ -n "${NEWEST_CLS:-}" ] \
   && [ "${GRAFT_ALLOW_STALE:-0}" != "1" ] \
   && [ "$(printf '%s\n%s\n' "$NEWEST_CLS" "$NEWEST_SRC" | sort -g | tail -1)" = "$NEWEST_SRC" ] \
   && [ "$NEWEST_SRC" != "$NEWEST_CLS" ]; then
  echo "classes are STALE (src newer than target) — run 'sbt compile' first," >&2
  echo "or GRAFT_ALLOW_STALE=1 to run old bytecode deliberately" >&2
  exit 2
fi
# Scala 2.13 library comes from the coursier cache (same jar sbt uses).
SCALA_LIB="$(find "$HOME/.cache/coursier" -name 'scala-library-2.13*.jar' 2>/dev/null | head -1)"
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:$SCALA_LIB:/opt/spark/jars/*" \
  "$MAIN" "$@"
