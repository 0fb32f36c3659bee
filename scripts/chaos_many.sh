#!/usr/bin/env bash
# N-trial flakiness harness (VERDICT r10 #5) — the reference's
# src/main/test-mr-many.sh:15-22 ported: the chaos/timing suites and the
# streaming drain-equality suites run N full trials, each under a hard
# timeout (the reference's 900 s bound), with per-trial pass/fail and
# duration archived to bench_history/CHAOS_TRIALS.txt. A suite passing
# once per `sbt test` says nothing about retry/timing flakiness; N green
# trials is the reference's stability bound.
#
# Usage: scripts/chaos_many.sh [N]      (default 10)
# Exit nonzero iff any trial fails or times out.
set -uo pipefail
cd "$(dirname "$0")/.."

N="${1:-10}"
TIMEOUT_S="${CHAOS_TRIAL_TIMEOUT:-900}"
SUITES=(
  graft.mr.ChaosSpec
  graft.mr.TimingSpec
  graft.streaming.EventStreamsSpec
  graft.streaming.StreamingEraseSpec
  graft.streaming.StreamingAbSpec
  # the standing-state algebra (VERDICT r11 #4): the ingest==rebuild /
  # erase==rebuild / restart==continuous equalities must hold under the
  # same N-trial flakiness bound as the chaos/timing suites
  graft.queries.EraseStateSpec
  graft.queries.RecommendSpec
  graft.queries.DurableStateSpec
  graft.streaming.StreamingCfSpec
  # real multi-JVM commit/liveness races (round 13): the OS-lock legs of
  # the protocol only light up across process boundaries
  graft.core.DurableStateCrossProcessSpec
  # forced crash-replay of the foreachBatch standing stores (round 13):
  # at-least-once re-delivery must rewrite, never double-append
  graft.streaming.StreamingReplaySpec
)

# Compiled classes + Spark + the offline-cache scalatest family. Runner
# is invoked directly (no sbt): each trial is its own JVM, so the chaos
# retry machinery starts from a cold SparkContext every time.
CP="target/scala-2.13/classes:target/scala-2.13/test-classes:/opt/spark/jars/*"
while IFS= read -r j; do CP="$CP:$j"; done < <(
  find /root/.cache/coursier -name '*.jar' 2>/dev/null \
    | grep -E 'scalatest|scalactic|scala-xml_2\.13|scalacheck' \
    | grep -v sources)

ADD_OPENS=(
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens=java.base/java.io=ALL-UNNAMED
  --add-opens=java.base/java.net=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED
)

SARGS=()
for s in "${SUITES[@]}"; do SARGS+=(-s "$s"); done

mkdir -p bench_history
ART=bench_history/CHAOS_TRIALS.txt
{
  echo "# chaos_many: $N trials x {${SUITES[*]}}, timeout ${TIMEOUT_S}s/trial"
  echo "# started $(date -u +%Y-%m-%dT%H:%M:%SZ) at commit $(git rev-parse --short HEAD 2>/dev/null || echo unknown)"
} > "$ART"

pass=0
for i in $(seq 1 "$N"); do
  start=$(date +%s)
  timeout "$TIMEOUT_S" java "${ADD_OPENS[@]}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g \
    -cp "$CP" org.scalatest.tools.Runner \
    -R target/scala-2.13/test-classes -oW "${SARGS[@]}" \
    > "/tmp/chaos_trial_$i.log" 2>&1
  rc=$?
  dur=$(( $(date +%s) - start ))
  if [ $rc -eq 0 ]; then pass=$((pass+1)); st=PASS
  elif [ $rc -eq 124 ]; then st="TIMEOUT(${TIMEOUT_S}s)"
  else st="FAIL(rc=$rc)"; fi
  echo "trial $i: $st ${dur}s" | tee -a "$ART"
  if [ $rc -ne 0 ]; then
    tail -5 "/tmp/chaos_trial_$i.log" | sed 's/^/    /' >> "$ART"
  fi
done
echo "passed $pass/$N" | tee -a "$ART"
[ "$pass" -eq "$N" ]
